"""Pallas fused KL-NMF kernel: parity with the XLA path (interpret mode on
the CPU test platform; the compiled path is exercised on TPU by bench)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gccnmf_tpu.ops import nmf
from gccnmf_tpu.ops.nmf_pallas import kl_nmf_pallas, pad_to_multiple


class TestPallasNMF:
    def _problem(self, t=48, f=33, k=8, seed=0):
        rng = np.random.default_rng(seed)
        v = (rng.random((t, f)) + 0.05).astype(np.float32)
        w0, h0 = nmf.nmf_init_numpy(f, k, t)
        return v, w0, h0

    def test_matches_xla_path(self):
        v, w0, h0 = self._problem()
        w_ref, h_ref = nmf.kl_nmf(v, w0, h0, 15)
        w_p, h_p = kl_nmf_pallas(
            jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 15,
            matmul_dtype="float32", interpret=True
        )
        np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_ref), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_ref), rtol=1e-4)

    def test_batched(self):
        v, w0, h0 = self._problem()
        vb = jnp.stack([v, 1.5 * v])
        wb = jnp.stack([w0, w0])
        hb = jnp.stack([h0, h0])
        w_p, h_p = kl_nmf_pallas(vb, wb, hb, 5, matmul_dtype="float32", interpret=True)
        assert w_p.shape == (2, 33, 8) and h_p.shape == (2, 48, 8)
        # each batch element matches its own single run
        w1, _ = nmf.kl_nmf(1.5 * v, w0, h0, 5)
        np.testing.assert_allclose(np.asarray(w_p[1]), np.asarray(w1), rtol=1e-4)

    def test_sparsity_alpha(self):
        v, w0, h0 = self._problem()
        w_ref, h_ref = nmf.kl_nmf(v, w0, h0, 8, sparsity_alpha=0.3)
        w_p, h_p = kl_nmf_pallas(
            jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 8,
            sparsity_alpha=0.3, matmul_dtype="float32", interpret=True,
        )
        np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_ref), rtol=1e-4)

    def test_unpadded_tile_aligned_shapes(self):
        """Shapes already tile-aligned take the no-pad path."""
        v, w0, h0 = self._problem(t=16, f=128, k=128, seed=1)
        w_ref, _ = nmf.kl_nmf(v, w0, h0, 3)
        w_p, _ = kl_nmf_pallas(
            jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 3,
            matmul_dtype="float32", interpret=True
        )
        np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_ref), rtol=1e-4)

    def test_pad_to_multiple(self):
        x = jnp.ones((5, 7))
        y, orig = pad_to_multiple(x, 0, 8, 0.5)
        assert y.shape == (8, 7) and orig == 5
        assert float(y[5, 0]) == 0.5
        z, orig2 = pad_to_multiple(x, 0, 5, 0.5)
        assert z is x and orig2 == 5


class TestBf16Mode:
    """bfloat16-operand GEMM mode: not bit-parity, but must preserve the
    KL objective and the learned dictionary to within quantization noise."""

    def _problem(self, t=64, f=129, k=16, seed=0):
        rng = np.random.default_rng(seed)
        # synthetic low-rank-ish positive data: W*H + noise floor
        wt = rng.random((f, 4)) + 0.1
        ht = rng.random((t, 4)) + 0.1
        v = (ht @ wt.T + 0.01).astype(np.float32)
        w0, h0 = nmf.nmf_init_numpy(f, k, t)
        return v, w0, h0

    @staticmethod
    def _kl(v, w, h):
        wh = np.asarray(h) @ np.asarray(w).T + 1e-12
        v = np.asarray(v)
        return float(np.sum(v * np.log(v / wh + 1e-12) - v + wh))

    def test_quality_matches_f32(self):
        v, w0, h0 = self._problem()
        args = (jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 30)
        w_f32, h_f32 = kl_nmf_pallas(*args, matmul_dtype="float32", interpret=True)
        w_bf, h_bf = kl_nmf_pallas(
            *args, matmul_dtype="bfloat16", interpret=True
        )
        kl_f32 = self._kl(v, w_f32, h_f32)
        kl_bf = self._kl(v, w_bf, h_bf)
        # same objective value to within a few percent of the f32 fit
        assert kl_bf <= kl_f32 * 1.1 + 1e-3
        # atoms stay unit-norm and finite
        norms = np.linalg.norm(np.asarray(w_bf), axis=0)
        np.testing.assert_allclose(norms, 1.0, atol=5e-2)
        assert np.isfinite(np.asarray(h_bf)).all()

    def test_monotone_kl_decrease(self):
        v, w0, h0 = self._problem(seed=3)
        prev = None
        for iters in (5, 15, 30):
            w, h = kl_nmf_pallas(
                jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), iters,
                matmul_dtype="bfloat16", interpret=True,
            )
            cur = self._kl(v, w, h)
            if prev is not None:
                assert cur <= prev * 1.02
            prev = cur

    def test_offline_config_plumbs_dtype(self):
        from gccnmf_tpu.models.offline import OfflineConfig

        cfg = OfflineConfig(nmf_matmul_dtype="bfloat16")
        assert cfg.nmf_matmul_dtype == "bfloat16"

    def test_gemm_dtype_maps_bf16q_for_non_nmf_kernels(self):
        from gccnmf_tpu.models.offline import OfflineConfig, gemm_dtype

        assert gemm_dtype(OfflineConfig()) == "bfloat16"
        assert gemm_dtype(OfflineConfig(nmf_matmul_dtype="bfloat16_q")) == "bfloat16"
        assert gemm_dtype(OfflineConfig(nmf_matmul_dtype="float32")) == "float32"


class TestBf16QMode:
    """bfloat16_q mode (V and q=V/WH resident in bf16): same KL-objective
    guarantees as the bf16 GEMM mode. Trajectory drifts ~4% from f32 —
    a different, equally valid stationary point — so assertions are on the
    objective, unit norms, and finiteness, not elementwise parity."""

    def test_quality_matches_f32(self):
        v, w0, h0 = TestBf16Mode()._problem(seed=1)
        args = (jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 30)
        w_f32, h_f32 = kl_nmf_pallas(*args, matmul_dtype="float32", interpret=True)
        w_q, h_q = kl_nmf_pallas(*args, matmul_dtype="bfloat16_q", interpret=True)
        kl_f32 = TestBf16Mode._kl(v, w_f32, h_f32)
        kl_q = TestBf16Mode._kl(v, w_q, h_q)
        assert kl_q <= kl_f32 * 1.1 + 1e-3
        norms = np.linalg.norm(np.asarray(w_q), axis=0)
        np.testing.assert_allclose(norms, 1.0, atol=5e-2)
        assert np.isfinite(np.asarray(h_q)).all()

    def test_monotone_kl_decrease(self):
        v, w0, h0 = TestBf16Mode()._problem(seed=4)
        prev = None
        for iters in (5, 15, 30):
            w, h = kl_nmf_pallas(
                jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), iters,
                matmul_dtype="bfloat16_q", interpret=True,
            )
            cur = TestBf16Mode._kl(v, w, h)
            if prev is not None:
                assert cur <= prev * 1.02
            prev = cur


class TestSimulTurboMode:
    """"bfloat16_q_simul": shared-Q simultaneous updates (3 GEMMs + 1 divide
    per iteration vs the reference's 4 + 2; +14% e2e on TPU). A different
    algorithm, opt-in only — these tests pin its invariants: scale
    calibration, KL reduction, and unchanged localization/masks e2e."""

    def _problem(self, t=48, f=33, k=8, seed=0):
        rng = np.random.default_rng(seed)
        v = (rng.random((t, f)) + 0.05).astype(np.float32)
        w0, h0 = nmf.nmf_init_numpy(f, k, t)
        return v, w0, h0

    def test_finite_and_scale_calibrated(self):
        v, w0, h0 = self._problem()
        w, h = kl_nmf_pallas(
            jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 20,
            matmul_dtype="bfloat16_q_simul", interpret=True,
        )
        w, h = np.asarray(w), np.asarray(h)
        assert np.isfinite(w).all() and np.isfinite(h).all()
        assert (w >= 0).all() and (h >= 0).all()
        # the closed-form gain calibration holds: sum(WH) == sum(V)
        mass = float((w.sum(0) * h.sum(0)).sum())
        assert mass == pytest.approx(float(v.sum()), rel=2e-2)

    def test_kl_reduces_comparably_to_standard(self):
        v, w0, h0 = self._problem()
        kl0 = float(nmf.kl_divergence(jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0)))
        w_s, h_s = kl_nmf_pallas(
            jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 25,
            matmul_dtype="bfloat16_q", interpret=True,
        )
        w_t, h_t = kl_nmf_pallas(
            jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 25,
            matmul_dtype="bfloat16_q_simul", interpret=True,
        )
        kl_std = float(nmf.kl_divergence(jnp.asarray(v), w_s, h_s))
        kl_sim = float(nmf.kl_divergence(jnp.asarray(v), w_t, h_t))
        assert kl_sim < kl0 * 0.5, (kl_sim, kl0)
        assert kl_sim < kl_std * 3.0, (kl_sim, kl_std)

    def test_e2e_same_localization_as_standard(self, stereo_signal):
        from gccnmf_tpu.models.offline import GCCNMFSeparator, OfflineConfig

        mix, sr = stereo_signal
        mix = mix[:, : sr]  # 1 s keeps interpret mode quick
        base_cfg = dict(
            sample_rate=sr, num_sources=2, mic_separation_m=0.5,
            dictionary_size=16, num_iterations=20, num_tdoas=32,
            nmf_backend="pallas",
        )
        std = GCCNMFSeparator(
            OfflineConfig(**base_cfg, nmf_matmul_dtype="bfloat16_q")
        ).separate(mix)
        turbo = GCCNMFSeparator(
            OfflineConfig(**base_cfg, nmf_matmul_dtype="bfloat16_q_simul")
        ).separate(mix)
        assert list(turbo["target_tdoa_indexes"]) == list(
            std["target_tdoa_indexes"]
        )
        assert np.isfinite(turbo["estimates"]).all()
        # masked outputs stay energy-bounded mixtures
        assert 0 < (turbo["estimates"] ** 2).sum() <= (mix**2).sum() * 4

    def test_xla_twin_matches_pallas_simul(self):
        """kl_nmf_simul (the XLA fallback for non-TPU backends) runs the
        same algorithm as the Pallas bfloat16_q_simul kernel — same
        fixed-point structure, close trajectories in f32-vs-bf16 terms."""
        v, w0, h0 = self._problem()
        w_x, h_x = nmf.kl_nmf_simul(
            jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 15
        )
        w_p, h_p = kl_nmf_pallas(
            jnp.asarray(v), jnp.asarray(w0), jnp.asarray(h0), 15,
            matmul_dtype="bfloat16_q_simul", interpret=True,
        )
        assert np.isfinite(np.asarray(w_x)).all()
        # bf16 V/q vs f32: same algorithm, quantization-level drift only
        np.testing.assert_allclose(
            np.asarray(w_p), np.asarray(w_x), rtol=0.2, atol=1e-3
        )
        mass = float(
            (np.asarray(w_x).sum(0) * np.asarray(h_x).sum(0)).sum()
        )
        assert mass == pytest.approx(float(v.sum()), rel=1e-3)
