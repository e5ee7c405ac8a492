"""Direct unit tests for helpers previously covered only through pipelines.

Pipeline tests catch integration breakage but blur WHERE a regression
lives; these pin each helper's own contract.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gccnmf_tpu.ops import gcc, localize, masks, nmf, windows as win_ops


class TestNmfInitJax:
    def test_shapes_positivity_determinism(self):
        key = jax.random.PRNGKey(0)
        w0, h0 = nmf.nmf_init_jax(key, 513, 32, 100)
        assert w0.shape == (513, 32) and h0.shape == (100, 32)
        assert float(jnp.min(w0)) > 0 and float(jnp.min(h0)) > 0
        w0b, h0b = nmf.nmf_init_jax(key, 513, 32, 100)
        np.testing.assert_array_equal(np.asarray(w0), np.asarray(w0b))

    def test_feeds_kl_nmf(self):
        rng = np.random.default_rng(0)
        v = jnp.asarray((rng.random((40, 65)) + 1e-3).astype(np.float32))
        w0, h0 = nmf.nmf_init_jax(jax.random.PRNGKey(1), 65, 8, 40)
        w, h = nmf.kl_nmf(v, w0, h0, 5)
        assert np.isfinite(np.asarray(w)).all()
        # monotone KL decrease from the on-device init too
        d0 = nmf.kl_divergence(v, w0, h0)
        d1 = nmf.kl_divergence(v, w, h)
        assert float(d1) < float(d0)


class TestWindows:
    def test_hamming_symmetric_matches_numpy(self):
        np.testing.assert_allclose(
            win_ops.hamming_symmetric(64), np.hamming(64).astype(np.float32),
            atol=1e-6,
        )
        assert win_ops.hamming_symmetric(1).tolist() == [1.0]

    def test_sqrt_hamming_squares_to_hamming(self):
        w = win_ops.sqrt_hamming(128)
        np.testing.assert_allclose(w * w, np.hamming(128), atol=1e-6)


class TestLocalizeHelpers:
    def test_peak_count(self):
        a = jnp.asarray([0.0, 1.0, 0.0, 2.0, 0.0, 3.0, 0.0])
        assert int(localize.peak_count(a)) == 3
        flat = jnp.zeros(16)
        assert int(localize.peak_count(flat)) == 0

    def test_top_k_peaks_fill_duplicates_dominant(self):
        """With fewer peaks than k the missing slots repeat the global
        argmax (deterministic), never -inf fill garbage."""
        a = jnp.asarray([0.0, 5.0, 0.0, 1.0, 0.0])  # two peaks: 1 and 3
        got = np.asarray(localize.top_k_peaks(a, 4))
        assert sorted(got.tolist()) == [1, 1, 1, 3]


class TestAttributionHelpers:
    def _setup(self):
        rng = np.random.default_rng(0)
        f, d, k, t = 65, 16, 8, 30
        cos_m, sin_m = gcc.steering_cos_sin(16000.0, f, 0.5, d)
        w = jnp.asarray(rng.random((f, k)).astype(np.float32) + 1e-3)
        coh = jnp.asarray(
            (rng.standard_normal((t, f)) + 1j * rng.standard_normal((t, f)))
            .astype(np.complex64)
        )
        return cos_m, sin_m, w, coh, d, k

    def test_argmax_tdoa_matches_dense_scores(self):
        cos_m, sin_m, w, coh, d, k = self._setup()
        cos_w, sin_w = masks.fold_steering_dictionary(cos_m, sin_m, w)
        got = masks.argmax_tdoa(
            jnp.real(coh), jnp.imag(coh), cos_w, sin_w, d
        )
        # dense formulation: scores[t,d,k] = Σ_f Re(c·e^{-iωτ})·W
        scores = np.einsum(
            "tf,fd,fk->tdk", np.real(np.asarray(coh)), np.asarray(cos_m),
            np.asarray(w),
        ) + np.einsum(
            "tf,fd,fk->tdk", np.imag(np.asarray(coh)), np.asarray(sin_m),
            np.asarray(w),
        )
        np.testing.assert_array_equal(
            np.asarray(got), np.argmax(scores, axis=1)
        )

    def test_argmax_tdoa_nan_guard(self):
        cos_m, sin_m, w, coh, d, k = self._setup()
        cos_w, sin_w = masks.fold_steering_dictionary(cos_m, sin_m, w)
        bad = jnp.full_like(jnp.real(coh), jnp.nan)
        got = masks.argmax_tdoa(bad, bad, cos_w, sin_w, d)
        assert np.isfinite(np.asarray(got)).all()  # argmax stays defined

    def test_winner_planes_matches_complex_winner(self):
        cos_m, sin_m, w, coh, d, k = self._setup()
        targets = jnp.asarray([[2, 9]], jnp.int32)
        a = masks.attribution_winner(coh[None], cos_m, sin_m, targets, w[None])
        b = masks.attribution_winner_planes(
            jnp.real(coh)[None], jnp.imag(coh)[None], cos_m, sin_m,
            targets, w[None],
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_mean_angular_spectrum(self):
        rng = np.random.default_rng(1)
        ang = jnp.asarray(rng.random((12, 7)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(gcc.mean_angular_spectrum(ang)),
            np.asarray(ang).mean(axis=0), atol=1e-6,
        )


class TestHostGlue:
    def test_gather_to_host_single_process(self):
        from gccnmf_tpu.parallel import mesh as mesh_lib

        x = jnp.arange(12.0).reshape(3, 4)
        got = mesh_lib.gather_to_host(x)
        assert isinstance(got, np.ndarray)
        np.testing.assert_array_equal(got, np.arange(12.0).reshape(3, 4))

    def test_file_player_seek(self, tmp_path, stereo_signal):
        from gccnmf_tpu.realtime.audio import FilePlayerSource
        from gccnmf_tpu.utils import wav as wavio

        mix, sr = stereo_signal
        path = str(tmp_path / "a.wav")
        wavio.write_wav(mix, path, sr)
        src = FilePlayerSource(path, block_size=512)
        src.seek(1024)
        first = next(src.blocks())
        np.testing.assert_allclose(
            first, src.samples[:, 1024:1536], atol=1e-7
        )

    def test_default_config_is_reference_defaults(self):
        from gccnmf_tpu.config import default_config

        cfg = default_config()
        # reference defaults (realtime/config.py:46-82)
        assert cfg.window_size == 1024
        assert cfg.block_size == 512
        assert cfg.num_tdoas == 64
        assert cfg.dictionary_type == "Pretrained"
