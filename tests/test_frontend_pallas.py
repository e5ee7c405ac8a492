"""Fused analysis front-end kernel: parity vs the composed XLA ops and
end-to-end equivalence through the separation/enhancement pipelines
(interpret mode on the CPU test backend)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gccnmf_tpu.ops import gcc, stft as stft_ops, windows as win_ops
from gccnmf_tpu.ops.frontend_pallas import stft_gcc_frontend_pallas

SR = 16000.0
WIN, HOP, F, D = 1024, 128, 513, 128


def _signal(b=2, t_frames=77, seed=0):
    rng = np.random.default_rng(seed)
    n = WIN + HOP * (t_frames - 1)
    return (rng.standard_normal((b, 2, n)) * 0.1).astype(np.float32)


def _reference(x, window, cos_m, sin_m):
    spec = stft_ops.stft(
        jnp.asarray(x), window, HOP, conjugate=True, method="matmul"
    )
    v = jnp.abs(spec)
    coh = gcc.coherence(spec)
    ang = gcc.angular_spectrogram(coh, cos_m, sin_m)
    return spec, v, coh, ang


class TestFrontendKernel:
    def test_parity_with_xla_ops(self):
        x = _signal(t_frames=77)  # not a tile multiple: padding exercised
        window = win_ops.hann_symmetric(WIN)
        cos_m, sin_m = gcc.steering_cos_sin(SR, F, 1.0, D)
        spec_r, v_r, coh_r, ang_r = _reference(x, window, cos_m, sin_m)
        sre, sim, v, cre, cim, ang = stft_gcc_frontend_pallas(
            jnp.asarray(x), jnp.asarray(window), jnp.asarray(cos_m),
            jnp.asarray(sin_m), hop_size=HOP, matmul_dtype="float32",
            tile_t=32, interpret=True,
        )
        # planes are lane-padded to the 128 tile; padded lanes are zeros
        assert sre.shape[-1] == 640 and ang.shape == ang_r.shape
        assert float(jnp.max(jnp.abs(sre[..., F:]))) == 0.0
        np.testing.assert_allclose(
            np.asarray(jax.lax.complex(sre, sim)[..., :F]), np.asarray(spec_r),
            atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(v[..., :F]), np.asarray(v_r), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(jax.lax.complex(cre, cim)[..., :F]), np.asarray(coh_r),
            atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(ang), np.asarray(ang_r),
            atol=2e-3 * float(jnp.max(jnp.abs(ang_r))),
        )

    def test_conjugate_false(self):
        x = _signal(b=1, t_frames=32)
        window = win_ops.hann_symmetric(WIN)
        cos_m, sin_m = gcc.steering_cos_sin(SR, F, 1.0, D)
        spec_r = stft_ops.stft(
            jnp.asarray(x), window, HOP, conjugate=False, method="matmul"
        )
        sre, sim, *_ = stft_gcc_frontend_pallas(
            jnp.asarray(x), jnp.asarray(window), jnp.asarray(cos_m),
            jnp.asarray(sin_m), hop_size=HOP, conjugate=False,
            matmul_dtype="float32", tile_t=32, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(jax.lax.complex(sre, sim)[..., :F]),
            np.asarray(spec_r), atol=2e-5,
        )

    def test_rejects_non_divisible_hop(self):
        x = _signal(b=1, t_frames=8)
        window = win_ops.hann_symmetric(WIN)
        cos_m, sin_m = gcc.steering_cos_sin(SR, F, 1.0, D)
        with pytest.raises(ValueError, match="hop"):
            stft_gcc_frontend_pallas(
                jnp.asarray(x), jnp.asarray(window), jnp.asarray(cos_m),
                jnp.asarray(sin_m), hop_size=100, interpret=True,
            )


class TestFrontendPipelines:
    def test_separation_e2e_matches_xla_frontend(self):
        import dataclasses

        from gccnmf_tpu.models.offline import GCCNMFSeparator, OfflineConfig
        from gccnmf_tpu.ops import nmf

        rng = np.random.default_rng(1)
        n = 16000
        s1, s2 = rng.standard_normal((2, n)).astype(np.float32) * 0.1
        stereo = np.stack([s1 + s2, np.roll(s1, 4) + np.roll(s2, -6)])
        base = OfflineConfig(
            num_iterations=8, dictionary_size=16, num_tdoas=32,
            nmf_backend="xla", synthesis_backend="xla",
            nmf_matmul_dtype="float32",
        )
        out = {}
        for fe in ("xla", "pallas"):
            cfg = dataclasses.replace(base, frontend_backend=fe)
            sep = GCCNMFSeparator(cfg)
            res = sep.separate(stereo, num_sources=2)
            out[fe] = res
        assert list(out["xla"]["target_tdoa_indexes"]) == list(
            out["pallas"]["target_tdoa_indexes"]
        )
        a, b = out["xla"]["estimates"], out["pallas"]["estimates"]
        np.testing.assert_allclose(a, b, atol=5e-4)

    def test_batched_separation_planes_path(self):
        import dataclasses

        from gccnmf_tpu.models.offline import GCCNMFSeparator, OfflineConfig

        rng = np.random.default_rng(2)
        n = 8000
        s1 = rng.standard_normal(n).astype(np.float32) * 0.1
        stereo = np.stack([s1, np.roll(s1, 5)])
        batch = np.stack([stereo, stereo * 0.7])
        base = OfflineConfig(
            num_iterations=5, dictionary_size=8, num_tdoas=16,
            nmf_backend="xla", nmf_matmul_dtype="float32",
        )
        outs = {}
        for fe in ("xla", "pallas"):
            cfg = dataclasses.replace(base, frontend_backend=fe)
            est, targets = GCCNMFSeparator(cfg).separate_batch(
                batch, num_sources=2
            )
            outs[fe] = (est, targets)
        np.testing.assert_array_equal(outs["xla"][1], outs["pallas"][1])
        np.testing.assert_allclose(outs["xla"][0], outs["pallas"][0], atol=5e-4)

    def test_enhancement_planes_path(self):
        import dataclasses

        from gccnmf_tpu.models.offline import GCCNMFEnhancer, OfflineConfig

        rng = np.random.default_rng(3)
        n = 8000
        stereo = (rng.standard_normal((2, n)) * 0.1).astype(np.float32)
        k = 16
        w = rng.random((513, k)).astype(np.float32) + 1e-3
        base = OfflineConfig(
            mic_separation_m=0.1, num_tdoas=32, dictionary_size=k,
            nmf_matmul_dtype="float32",
        )
        outs = {}
        for fe in ("xla", "pallas"):
            cfg = dataclasses.replace(base, frontend_backend=fe)
            outs[fe] = GCCNMFEnhancer(w, cfg).enhance(stereo)
        assert int(outs["xla"]["target_tdoa_index"]) == int(
            outs["pallas"]["target_tdoa_index"]
        )
        np.testing.assert_allclose(
            outs["xla"]["enhanced"], outs["pallas"]["enhanced"], atol=5e-4
        )

    def test_lane_padded_v_through_pallas_nmf(self):
        """The fused front-end's lane-padded V must feed the Pallas NMF
        directly (zero columns inert, dictionary sliced back to F)."""
        from gccnmf_tpu.ops import nmf
        from gccnmf_tpu.ops.nmf_pallas import kl_nmf_pallas

        rng = np.random.default_rng(5)
        t, f, k = 24, 513, 8
        v = (rng.random((2, t, f)) + 1e-3).astype(np.float32)
        fp = 640
        v_padded = np.zeros((2, t, fp), np.float32)
        v_padded[..., :f] = v
        w0, h0 = nmf.nmf_init_numpy(f, k, t)
        w0b = np.broadcast_to(w0, (2,) + w0.shape)
        h0b = np.broadcast_to(h0, (2,) + h0.shape)
        w_a, h_a = kl_nmf_pallas(
            jnp.asarray(v), jnp.asarray(w0b), jnp.asarray(h0b), 10,
            matmul_dtype="float32", interpret=True,
        )
        w_b, h_b = kl_nmf_pallas(
            jnp.asarray(v_padded), jnp.asarray(w0b), jnp.asarray(h0b), 10,
            matmul_dtype="float32", interpret=True,
        )
        assert w_b.shape == w_a.shape and h_b.shape == h_a.shape
        np.testing.assert_allclose(np.asarray(w_a), np.asarray(w_b), atol=2e-5)
        np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b), atol=2e-5)


class TestBf16Planes:
    def test_bf16_planes_match_f32(self):
        """plane_dtype='bfloat16' stores the five spec/V/coherence planes in
        bf16 (the angular spectrogram stays f32); values match the f32
        planes to bf16 rounding."""
        x = _signal(b=1, t_frames=40)
        window = win_ops.hann_symmetric(WIN)
        cos_m, sin_m = gcc.steering_cos_sin(SR, F, 1.0, D)
        kw = dict(hop_size=HOP, matmul_dtype="bfloat16", tile_t=32,
                  interpret=True)
        f32 = stft_gcc_frontend_pallas(
            jnp.asarray(x), jnp.asarray(window), jnp.asarray(cos_m),
            jnp.asarray(sin_m), plane_dtype="float32", **kw,
        )
        b16 = stft_gcc_frontend_pallas(
            jnp.asarray(x), jnp.asarray(window), jnp.asarray(cos_m),
            jnp.asarray(sin_m), plane_dtype="bfloat16", **kw,
        )
        for i in range(5):
            assert b16[i].dtype == jnp.bfloat16
            scale = float(jnp.max(jnp.abs(f32[i]))) + 1e-12
            np.testing.assert_allclose(
                np.asarray(b16[i], np.float32), np.asarray(f32[i]),
                atol=8e-3 * scale,
            )
        assert b16[5].dtype == jnp.float32  # angular spectrogram
        np.testing.assert_allclose(np.asarray(b16[5]), np.asarray(f32[5]))

    def test_bf16_v_stays_resident_in_nmf_bf16q(self):
        """A bf16 V plane feeds kl_nmf_pallas without upcasting in
        'bfloat16_q' mode and lands at the same result as f32 V (the loop
        quantizes V to bf16 either way)."""
        from gccnmf_tpu.ops import nmf
        from gccnmf_tpu.ops.nmf_pallas import kl_nmf_pallas

        rng = np.random.default_rng(7)
        t, f, k = 24, 513, 8
        v = (rng.random((t, f)) + 1e-3).astype(np.float32)
        v16 = jnp.asarray(v, jnp.bfloat16)
        w0, h0 = nmf.nmf_init_numpy(f, k, t)
        w_a, h_a = kl_nmf_pallas(
            jnp.asarray(v16.astype(jnp.float32)), jnp.asarray(w0),
            jnp.asarray(h0), 10, matmul_dtype="bfloat16_q", interpret=True,
        )
        w_b, h_b = kl_nmf_pallas(
            v16, jnp.asarray(w0), jnp.asarray(h0), 10,
            matmul_dtype="bfloat16_q", interpret=True,
        )
        assert w_b.dtype == jnp.float32 and h_b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(w_a), np.asarray(w_b),
                                   rtol=2e-2, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b),
                                   rtol=2e-2, atol=1e-5)

    def test_throughput_pipeline_bf16_planes_quality(self):
        """End-to-end separation with the default throughput config (bf16
        planes + bf16_q NMF) stays close to the exact-plane pipeline:
        same localization, waveforms within bf16 noise."""
        import dataclasses

        from gccnmf_tpu.models.offline import (
            GCCNMFSeparator, OfflineConfig, plane_dtype,
        )

        rng = np.random.default_rng(11)
        n = 16000
        s1, s2 = rng.standard_normal((2, n)).astype(np.float32) * 0.1
        stereo = np.stack([s1 + s2, np.roll(s1, 4) + np.roll(s2, -6)])
        base = OfflineConfig(
            num_iterations=8, dictionary_size=16, num_tdoas=32,
            nmf_backend="pallas", synthesis_backend="pallas",
            frontend_backend="pallas",
        )
        assert plane_dtype(base) == "bfloat16"
        assert plane_dtype(
            dataclasses.replace(base, nmf_matmul_dtype="float32")
        ) == "float32"
        res = GCCNMFSeparator(base).separate(stereo, num_sources=2)
        exact = GCCNMFSeparator(
            dataclasses.replace(base, nmf_matmul_dtype="float32")
        ).separate(stereo, num_sources=2)
        assert list(res["target_tdoa_indexes"]) == list(
            exact["target_tdoa_indexes"]
        )
        a = np.asarray(exact["estimates"], np.float32)
        b = np.asarray(res["estimates"], np.float32)
        # bf16 trajectory ≠ f32 trajectory, but the waveforms must stay
        # within a few percent RMS (the TPU bench pins ~31 dB vs oracle)
        rms = float(np.sqrt(np.mean(a**2))) + 1e-12
        assert float(np.sqrt(np.mean((a - b) ** 2))) / rms < 0.25
