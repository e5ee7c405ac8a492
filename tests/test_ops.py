"""Parity tests for GCC-PHAT, KL-NMF, localization and masking ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gccnmf_tpu.ops import gcc, localize, masks, nmf, stft as stft_ops, windows as win_ops

import oracle


@pytest.fixture(scope="module")
def spec_and_coh(stereo_signal):
    mix, sr = stereo_signal
    x_ref = oracle.mixture_spectrogram_ref(mix, 1024, 128)  # (2, F, T)
    spec = jnp.asarray(x_ref.transpose(0, 2, 1))  # (2, T, F) time-major
    coh_ref = oracle.coherence_ref(x_ref)
    return mix, sr, x_ref, spec, coh_ref


class TestGCC:
    def test_tdoa_grid_matches(self):
        np.testing.assert_allclose(gcc.tdoa_grid(1.0, 128), oracle.tdoas_ref(1.0, 128))

    def test_coherence_matches(self, spec_and_coh):
        _, _, _, spec, coh_ref = spec_and_coh
        got = np.asarray(gcc.coherence(spec))
        np.testing.assert_allclose(got.T, coh_ref.astype(np.complex64), atol=2e-5)

    def test_angular_spectrogram_matches(self, spec_and_coh):
        _, sr, x_ref, spec, coh_ref = spec_and_coh
        freqs = gcc.frequency_grid(sr, 513)
        want = oracle.angular_spectrogram_ref(coh_ref, freqs, 1.0, 128)  # (D, T)
        cos_m, sin_m = gcc.steering_cos_sin(sr, 513, 1.0, 128)
        got = np.asarray(gcc.angular_spectrogram(gcc.coherence(spec), cos_m, sin_m))
        np.testing.assert_allclose(got.T, want, atol=1e-3 * np.abs(want).max())

    def test_steering_matrix_complex(self, spec_and_coh):
        _, sr, *_ = spec_and_coh
        e = gcc.steering_matrix(sr, 513, 1.0, 128)
        want = oracle.steering_ref(gcc.frequency_grid(sr, 513), 1.0, 128)
        np.testing.assert_allclose(e, want.astype(np.complex64), atol=1e-6)


class TestNMF:
    def test_matches_reference_100_iters(self, spec_and_coh):
        _, _, x_ref, _, _ = spec_and_coh
        v_ref = np.concatenate(np.abs(x_ref), axis=-1)  # (F, 2T)
        w_want, h_want = oracle.kl_nmf_ref(v_ref, 64, 100)
        w0, h0 = nmf.nmf_init_numpy(v_ref.shape[0], 64, v_ref.shape[1])
        w_got, h_got = nmf.kl_nmf(jnp.asarray(v_ref.T), jnp.asarray(w0), jnp.asarray(h0), 100)
        w_got, h_got = np.asarray(w_got), np.asarray(h_got)
        # float32 accumulation-order drift over 100 multiplicative iterations
        # bounds parity at ~1e-2 relative on W (unit-normalized columns).
        np.testing.assert_allclose(w_got, w_want, atol=2e-2 * np.abs(w_want).max())
        np.testing.assert_allclose(h_got.T, h_want, atol=2e-2 * np.abs(h_want).max())

    def test_kl_monotone_decrease(self, spec_and_coh):
        _, _, x_ref, _, _ = spec_and_coh
        v = jnp.asarray(np.concatenate(np.abs(x_ref), axis=-1).T)
        w0, h0 = nmf.nmf_init_numpy(513, 32, v.shape[0])
        w0, h0 = jnp.asarray(w0), jnp.asarray(h0)
        prev = float(nmf.kl_divergence(v, w0, h0))
        w, h = w0, h0
        for _ in range(5):
            w, h = nmf.kl_nmf(v, w, h, 1)
            cur = float(nmf.kl_divergence(v, w, h))
            assert cur < prev * 1.0001
            prev = cur

    def test_minibatch_w_matches_unbatched_when_batch1(self, spec_and_coh):
        _, _, x_ref, _, _ = spec_and_coh
        v = jnp.asarray(np.abs(x_ref[0]).T)  # (T, F)
        w0, h0 = nmf.nmf_init_numpy(513, 16, v.shape[0])
        w0, h0 = jnp.asarray(w0), jnp.asarray(h0)
        w_a, h_a = nmf.kl_nmf(v, w0, h0, 10)
        w_b, h_b = nmf.kl_nmf_minibatch_w(v[None], w0, h0[None], 10)
        np.testing.assert_allclose(np.asarray(w_a), np.asarray(w_b)[...], rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b)[0], rtol=2e-4, atol=1e-5)

    def test_h_infer_reduces_divergence(self, spec_and_coh):
        _, _, x_ref, _, _ = spec_and_coh
        v = jnp.asarray(np.abs(x_ref[0]).T)
        w0, h0 = nmf.nmf_init_numpy(513, 32, v.shape[0])
        w, _ = nmf.kl_nmf(v, jnp.asarray(w0), jnp.asarray(h0), 30)
        h_start = jnp.ones((v.shape[0], 32), jnp.float32)
        before = float(nmf.kl_divergence(v, w, h_start))
        h = nmf.h_infer(v, w, h_start, 10)
        after = float(nmf.kl_divergence(v, w, h))
        assert after < before

    def test_order_atoms_by_centroid(self):
        rng = np.random.default_rng(0)
        w = rng.random((64, 8)).astype(np.float32)
        ordered = nmf.order_atoms_by_centroid(w)
        cents = (np.arange(64)[:, None] * ordered).sum(0) / ordered.sum(0)
        assert np.all(np.diff(cents) >= 0)


class TestLocalize:
    def test_local_maxima_matches_scipy(self, rng):
        from scipy.signal import argrelmax

        a = rng.standard_normal(128)
        got = np.nonzero(np.asarray(localize.local_maxima_mask(jnp.asarray(a))))[0]
        want = argrelmax(a)[0]
        np.testing.assert_array_equal(got, want)

    def test_top_k_peaks_match_oracle(self, spec_and_coh):
        _, sr, x_ref, spec, coh_ref = spec_and_coh
        freqs = gcc.frequency_grid(sr, 513)
        ang = oracle.angular_spectrogram_ref(coh_ref, freqs, 0.086, 64)
        mean_spec = ang.mean(-1)
        want = oracle.peaks_ref(mean_spec, 2)
        got = np.asarray(localize.top_k_peaks(jnp.asarray(mean_spec), 2))
        np.testing.assert_array_equal(got, want)
        host = localize.estimate_target_tdoa_indexes(mean_spec, 2)
        assert host == list(want)

    def test_auto_source_count_two_means(self):
        a = np.zeros(64)
        for idx, h in ((10, 5.0), (30, 4.8), (50, 0.4), (20, 0.5)):
            a[idx] = h  # isolated peaks
        found = localize.estimate_target_tdoa_indexes(a, None)
        assert found == [10, 30]

    def test_insufficient_peaks_raises(self):
        with pytest.raises(ValueError):
            localize.estimate_target_tdoa_indexes(np.linspace(0, 1, 32), 2)

    def test_sliding_argmax(self):
        hist = np.zeros((12, 7), np.float32)
        hist[-3:, 4] = 1.0
        assert int(localize.sliding_argmax_tdoa(jnp.asarray(hist), 3)) == 4


class TestMasks:
    def test_attribution_matches_oracle(self, spec_and_coh):
        _, sr, x_ref, spec, coh_ref = spec_and_coh
        freqs = gcc.frequency_grid(sr, 513)
        rng = np.random.default_rng(3)
        w = rng.random((513, 32)).astype(np.float32)
        targets = [20, 64, 100]
        want = oracle.target_gccnmf_ref(coh_ref, freqs, 1.0, 128, targets, w)  # (N,K,T)
        cos_m, sin_m = gcc.steering_cos_sin(sr, 513, 1.0, 128)
        got = np.asarray(
            masks.target_attribution(gcc.coherence(spec), cos_m, sin_m, np.array(targets), jnp.asarray(w))
        )  # (N, T, K)
        np.testing.assert_allclose(
            got.transpose(0, 2, 1), want, atol=2e-3 * np.abs(want).max()
        )

    def test_hard_masks_match_oracle(self, rng):
        scores = rng.standard_normal((3, 50, 16)).astype(np.float32)
        scores[0, 0, 0] = np.nan
        want = oracle.coefficient_masks_ref(scores.transpose(0, 2, 1))  # (N,K,T)
        got = np.asarray(masks.hard_coefficient_masks(jnp.asarray(scores)))
        np.testing.assert_array_equal(got.transpose(0, 2, 1), want)

    def test_masked_reconstruction_matches_oracle(self, spec_and_coh):
        _, _, x_ref, spec, _ = spec_and_coh
        t = x_ref.shape[-1]
        rng = np.random.default_rng(5)
        w = rng.random((513, 16)).astype(np.float32)
        h = rng.random((16, 2 * t)).astype(np.float32)
        stereo_h = np.array(np.hsplit(h, 2))  # (2, K, T)
        scores = rng.standard_normal((3, 16, t)).astype(np.float32)
        m_ref = oracle.coefficient_masks_ref(scores)
        want = np.stack(
            [
                np.stack(
                    [
                        (w @ (stereo_h[c] * m_ref[n])) * np.exp(1j * np.angle(x_ref[c]))
                        for c in range(2)
                    ]
                )
                for n in range(3)
            ]
        )  # (N, 2, F, T)
        got = np.asarray(
            masks.masked_reconstruction(
                jnp.asarray(m_ref.transpose(0, 2, 1)),
                spec,
                jnp.asarray(w),
                jnp.asarray(stereo_h.transpose(0, 2, 1)),
            )
        )  # (N, 2, T, F)
        np.testing.assert_allclose(
            got.transpose(0, 1, 3, 2), want.astype(np.complex64),
            atol=2e-4 * np.abs(want).max(),
        )

    def test_soft_mask_and_wiener(self, rng):
        w = rng.random((129, 8)).astype(np.float32) + 0.1
        argmax_d = jnp.asarray(rng.integers(0, 64, (4, 8)))
        hm = masks.soft_tdoa_coefficient_mask(argmax_d, 30.0, 5.0, 2.0, 0.1)
        assert hm.shape == (4, 8)
        assert float(hm.min()) >= 0.1 / 1.0 - 1e-6
        tf = masks.wiener_tf_mask(jnp.asarray(w), hm)
        assert tf.shape == (4, 129)
        assert np.all(np.asarray(tf) >= 0)
        box = masks.boxcar_tdoa_coefficient_mask(argmax_d, 30.0, 5.0)
        assert set(np.unique(np.asarray(box))) <= {0.0, 1.0}


class TestPrecisionPolicy:
    def test_levels_resolve(self):
        from gccnmf_tpu.ops import xprec
        import jax

        assert xprec.current_level() in ("default", "high", "highest")
        # CPU backend in tests -> exact f32, policy must be highest
        assert xprec.current_level() == "highest"
        assert xprec.get() == jax.lax.Precision.HIGHEST

    def test_set_and_restore(self):
        from gccnmf_tpu.ops import xprec

        old = xprec.current_level()
        try:
            xprec.set_matmul_precision("high")
            assert xprec.current_level() == "high"
            with pytest.raises(ValueError):
                xprec.set_matmul_precision("bogus")
        finally:
            xprec.set_matmul_precision(old)


class TestHInferSilence:
    def test_h_infer_finite_on_zero_frames(self):
        """Digital silence must not NaN-poison H inference: H collapses to
        zero after one update and an unguarded second update divides 0/0
        (the bug a concurrent-reconfig stress test caught in the streaming
        engine with num_h_updates >= 2 on idle blocks)."""
        import jax.numpy as jnp

        from gccnmf_tpu.ops import nmf

        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.random((17, 4)).astype(np.float32) + 1e-3)
        v = jnp.zeros((6, 17), jnp.float32)
        h = nmf.h_infer(v, w, jnp.ones((6, 4), jnp.float32), 3)
        assert np.isfinite(np.asarray(h)).all()
        np.testing.assert_array_equal(np.asarray(h), 0.0)

    def test_h_infer_positive_data_unchanged_by_guard(self):
        """The guard is a no-op on strictly positive data: identical to the
        unguarded multiplicative updates."""
        import jax.numpy as jnp

        from gccnmf_tpu.ops import nmf

        rng = np.random.default_rng(1)
        w = rng.random((17, 4)).astype(np.float32) + 1e-3
        v = rng.random((6, 17)).astype(np.float32) + 1e-3
        h0 = np.ones((6, 4), np.float32)
        got = np.asarray(nmf.h_infer(jnp.asarray(v), jnp.asarray(w), jnp.asarray(h0), 4))
        h = h0.copy()
        wsum = w.sum(0) + 1e-16
        for _ in range(4):
            q = v / (h @ w.T)
            h = h * (q @ w) / wsum
        np.testing.assert_allclose(got, h, rtol=1e-5)
