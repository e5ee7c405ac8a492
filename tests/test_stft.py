"""STFT/ISTFT parity and round-trip tests."""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from gccnmf_tpu.ops import stft as stft_ops
from gccnmf_tpu.ops import windows as win_ops

import oracle


class TestWindows:
    def test_hann_symmetric_matches_numpy(self):
        for n in (8, 511, 1024):
            np.testing.assert_allclose(
                win_ops.hann_symmetric(n), np.hanning(n).astype(np.float32), atol=1e-7
            )

    def test_hann_periodic_matches_scipy(self):
        for n in (16, 1024):
            np.testing.assert_allclose(
                win_ops.hann_periodic(n),
                scipy.signal.windows.hann(n, sym=False).astype(np.float32),
                atol=1e-7,
            )

    def test_sqrt_hamming_matches_numpy(self):
        np.testing.assert_allclose(
            win_ops.sqrt_hamming(1024),
            np.sqrt(np.hamming(1024)).astype(np.float32),
            atol=1e-7,
        )

    def test_asymmetric_pair_cola(self):
        wa, ws = win_ops.asymmetric_analysis_synthesis_pair(1024, 256, 128)
        assert wa.shape == ws.shape == (1024,)
        assert np.all(ws[:-256] == 0)
        assert win_ops.cola_check(wa * ws, 128) < 1e-6

    def test_asymmetric_pair_rejects_bad_hop(self):
        with pytest.raises(ValueError):
            win_ops.asymmetric_analysis_synthesis_pair(1024, 250, 128)


class TestSTFT:
    @pytest.mark.parametrize("method", ["fft", "matmul", "conv"])
    def test_matches_reference_stft(self, stereo_signal, method):
        mix, _ = stereo_signal
        w = win_ops.hann_symmetric(1024)
        got = np.asarray(stft_ops.stft(jnp.asarray(mix), w, 128, conjugate=True, method=method))
        want = oracle.mixture_spectrogram_ref(mix, 1024, 128)
        # got is (2, T, F); oracle is (2, F, T)
        np.testing.assert_allclose(
            got.transpose(0, 2, 1), want, atol=2e-4 * np.abs(want).max()
        )

    def test_batched_shapes(self, stereo_signal):
        mix, _ = stereo_signal
        batch = np.stack([mix, mix * 0.5])  # (2, 2, n)
        w = win_ops.hann_symmetric(1024)
        spec = stft_ops.stft(jnp.asarray(batch), w, 128)
        t = stft_ops.num_frames(mix.shape[-1], 1024, 128)
        assert spec.shape == (2, 2, t, 513)

    @pytest.mark.parametrize("method", ["fft", "matmul", "conv"])
    def test_istft_matches_reference(self, stereo_signal, method):
        mix, _ = stereo_signal
        spec_ref = oracle.stft_ref(mix[0], 1024, 128)
        want = oracle.istft_ref(spec_ref, 1024, 128)
        w = win_ops.hann_symmetric(1024)
        got = np.asarray(
            stft_ops.istft(
                jnp.asarray(spec_ref.T[None]), w, 128,
                conjugate=True, center_trim=True, method=method,
            )
        )[0]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=5e-5 * np.abs(want).max())

    def test_round_trip_cola(self, stereo_signal):
        """stft -> istft with hann^2 at 1/8 hop reconstructs interior samples
        up to a constant gain. With the reference's hop/window*2 factor the
        net gain is ~0.749 (sum of hann^2 at 8x overlap is ~3, times 0.25) —
        a reference quirk preserved for waveform parity."""
        mix, _ = stereo_signal
        y = mix[0][: 1024 * 8]
        w = win_ops.hann_symmetric(1024)
        cola_const = float((np.hanning(1024) ** 2)[::128].sum())  # ~2.997
        spec = stft_ops.stft(jnp.asarray(y), w, 128, conjugate=True)
        rec = np.asarray(
            stft_ops.istft(spec, w, 128, conjugate=True, center_trim=True)
        ) * (128 / 1024.0 * 2)
        # istft center-trims 512 each side; rec[i] corresponds to y[i + 512].
        interior = slice(1024, len(rec) - 1024)
        ref = y[512:][: len(rec)] * (cola_const * 0.25)
        np.testing.assert_allclose(rec[interior], ref[interior], atol=2e-3)

    def test_overlap_add_scatter_fallback_matches(self):
        rng = np.random.default_rng(0)
        frames = rng.standard_normal((3, 7, 96)).astype(np.float32)
        fast = np.asarray(stft_ops.overlap_add(jnp.asarray(frames), 32))
        # hop that does not divide frame length -> scatter path
        slow = np.asarray(stft_ops.overlap_add(jnp.asarray(frames), 40))
        n = 96 + 6 * 40
        assert slow.shape == (3, n)
        # verify both against a naive loop
        for hop, got in ((32, fast), (40, slow)):
            want = np.zeros((3, 96 + 6 * hop), np.float32)
            for t in range(7):
                want[:, t * hop : t * hop + 96] += frames[:, t]
            np.testing.assert_allclose(got, want, atol=1e-5)


class TestRoundTripSweep:
    """Reconstruction property over a sweep of window/hop/method combos —
    pins COLA correctness away from the reference's single 1024/128 shape
    (including the high-overlap ratios the synthesis kernels' OLA lookahead
    was once hard-coded against)."""

    @pytest.mark.parametrize("win,hop", [
        (256, 32), (256, 64), (512, 64), (1024, 64),  # ratio 16: >9 overlap
        (1024, 256), (128, 16),
    ])
    @pytest.mark.parametrize("method", ["fft", "matmul"])
    def test_unit_gain_round_trip(self, win, hop, method):
        """Analysis hann with a COLA-normalized synthesis window gives a
        unit-gain interior reconstruction at any hop dividing the window."""
        rng = np.random.default_rng(win + hop)
        y = (rng.standard_normal(win * 10) * 0.3).astype(np.float32)
        w = win_ops.hann_periodic(win)
        cola = float(np.sum((w * w)[::hop]))
        spec = stft_ops.stft(jnp.asarray(y), w, hop, method=method)
        rec = np.asarray(
            stft_ops.istft(spec, w / cola, hop, center_trim=True,
                           method=method)
        )
        interior = slice(win, len(rec) - win)
        offset = win // 2
        np.testing.assert_allclose(
            rec[interior], y[offset:][: len(rec)][interior], atol=5e-4
        )

    def test_asymmetric_pair_sweep(self):
        """COLA holds for asymmetric pairs across synthesis lengths."""
        for win, syn in [(1024, 256), (1024, 64), (512, 128), (1024, 24)]:
            hop = syn // 2
            wa, ws = win_ops.asymmetric_analysis_synthesis_pair(win, syn, hop)
            assert win_ops.cola_check(wa * ws, hop) < 1e-6, (win, syn)


class TestPadCenterWindow:
    """The reference's ``fftSize != windowSize`` corner: its ``fftSize``
    argument lands in librosa's ``win_length`` slot, giving a
    ``hanning(fftSize)`` window pad-centered to the frame length
    (gccNMFFunctions.py:61-67 + librosaSTFT.py:125-160, 297-368)."""

    def test_matches_librosa_doc_example(self):
        # reference librosaSTFT.py:303-306: ones(5) centered into 10
        got = np.asarray(stft_ops.pad_center_window(np.ones(5), 10))
        np.testing.assert_array_equal(
            got, [0, 0, 1, 1, 1, 1, 1, 0, 0, 0]
        )

    def test_equal_length_is_identity(self):
        w = np.hanning(64)
        np.testing.assert_array_equal(
            np.asarray(stft_ops.pad_center_window(w, 64)), w.astype(np.float32)
        )

    def test_window_longer_than_frame_raises(self):
        with pytest.raises(ValueError, match="exceeds"):
            stft_ops.pad_center_window(np.ones(65), 64)

    def test_stft_short_window_matches_numpy(self, rng):
        y = rng.standard_normal(4000).astype(np.float32)
        win = np.hanning(384)
        got = np.asarray(stft_ops.stft(y, win, 128, fft_size=512, conjugate=True))
        wpad = np.zeros(512)
        wpad[64 : 64 + 384] = win  # lpad = (512-384)//2
        t = 1 + (4000 - 512) // 128
        frames = np.stack([y[i * 128 : i * 128 + 512] for i in range(t)])
        want = np.fft.rfft(frames * wpad, axis=-1).conj()
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_istft_short_window_equals_prepadded(self, rng):
        spec = (
            rng.standard_normal((20, 257)) + 1j * rng.standard_normal((20, 257))
        ).astype(np.complex64)
        win = np.hanning(384)
        wpad = np.zeros(512, np.float32)
        wpad[64 : 64 + 384] = win
        got = np.asarray(stft_ops.istft(spec, win, 128))
        want = np.asarray(stft_ops.istft(spec, wpad, 128))
        np.testing.assert_allclose(got, want, atol=1e-6)
