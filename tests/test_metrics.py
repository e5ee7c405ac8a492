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
