"""Quality-metric tests."""

import numpy as np
import pytest

from gccnmf_tpu import metrics


class TestMetrics:
    def test_snr_perfect(self):
        x = np.sin(np.linspace(0, 30, 4000))
        assert metrics.snr(x, x) > 100

    def test_snr_known_noise(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal(8000)
        noisy = x + 0.1 * rng.standard_normal(8000)
        got = metrics.snr(x, noisy)
        assert 19 < got < 21  # 10*log10(1/0.01) = 20 dB

    def test_si_sdr_scale_invariance(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(4000)
        est = x + 0.05 * rng.standard_normal(4000)
        a = metrics.si_sdr(x, est)
        b = metrics.si_sdr(x, 3.7 * est)
        assert a == pytest.approx(b, abs=1e-6)
        # plain SNR is NOT scale invariant
        assert metrics.snr(x, 3.7 * est) < metrics.snr(x, est)

    def test_permutation_invariant_finds_order(self):
        rng = np.random.default_rng(2)
        refs = rng.standard_normal((3, 4000))
        ests = refs[[2, 0, 1]] + 0.01 * rng.standard_normal((3, 4000))
        score, perm = metrics.permutation_invariant(refs, ests)
        assert perm == (2, 0, 1)
        assert score > 30


class TestStoi:
    def _speech_like(self, seconds=6, sr=16000, seed=0):
        rng = np.random.default_rng(seed)
        t = np.arange(int(seconds * sr)) / sr
        env = 0.5 + 0.5 * np.sin(2 * np.pi * 4 * t)  # 4 Hz syllabic modulation
        return rng.standard_normal(t.size) * env

    def test_identity_is_one(self):
        x = self._speech_like()
        assert metrics.stoi(x, x, 16000) == pytest.approx(1.0, abs=1e-9)

    def test_monotone_in_snr(self):
        x = self._speech_like()
        rng = np.random.default_rng(1)
        scores = []
        for snr_db in [20, 10, 0, -10]:
            n = rng.standard_normal(x.size)
            n *= np.linalg.norm(x) / np.linalg.norm(n) * 10 ** (-snr_db / 20)
            scores.append(metrics.stoi(x, x + n, 16000))
        assert scores == sorted(scores, reverse=True)
        assert scores[0] > 0.95 and scores[-1] < 0.6

    def test_scale_invariant(self):
        x = self._speech_like()
        rng = np.random.default_rng(2)
        n = rng.standard_normal(x.size) * x.std() * 0.3
        a = metrics.stoi(x, x + n, 16000)
        b = metrics.stoi(x, 7.3 * (x + n), 16000)
        assert a == pytest.approx(b, abs=1e-9)

    def test_stereo_averages_channels(self):
        x = self._speech_like()
        stereo_ref = np.stack([x, x])
        rng = np.random.default_rng(3)
        n = rng.standard_normal(x.size) * x.std() * 0.5
        stereo_est = np.stack([x + n, x])
        got = metrics.stoi(stereo_ref, stereo_est, 16000)
        expect = 0.5 * (metrics.stoi(x, x + n, 16000) + 1.0)
        assert got == pytest.approx(expect, abs=1e-9)

    def test_native_10k_skips_resample(self):
        x = self._speech_like(sr=10000)
        assert metrics.stoi(x, x, 10000) == pytest.approx(1.0, abs=1e-9)

    def test_too_short_raises(self):
        with pytest.raises(ValueError):
            metrics.stoi(np.zeros(100), np.zeros(100), 16000)

    def test_shape_mismatch_raises(self):
        x = self._speech_like()
        with pytest.raises(ValueError):
            metrics.stoi(np.stack([x, x, x]), np.stack([x, x]), 16000)
