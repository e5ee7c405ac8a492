"""Online (causal frame-wise) enhancement tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from gccnmf_tpu.models.online import OnlineConfig, OnlineGCCNMFEnhancer
from gccnmf_tpu.models.offline import stft_gain


@pytest.fixture(scope="module")
def dictionary():
    g = np.random.default_rng(1234)
    return g.random((513, 48)).astype(np.float32) + 1e-3


class TestCausalSmoothing:
    @pytest.mark.parametrize("mode", ["sliding", "cumulative", "exponential"])
    def test_smoothing_matches_naive(self, mode, rng):
        from gccnmf_tpu.models.online import _causal_smooth

        ang = rng.standard_normal((20, 8)).astype(np.float32)
        cfg = OnlineConfig(smoothing=mode, smoothing_window=4, smoothing_alpha=0.8)
        got = np.asarray(_causal_smooth(jnp.asarray(ang), cfg))
        want = np.zeros_like(ang)
        for t in range(20):
            if mode == "cumulative":
                want[t] = ang[: t + 1].mean(0)
            elif mode == "sliding":
                want[t] = ang[max(0, t - 3) : t + 1].mean(0)
            else:
                acc = np.zeros(8)
                for i in range(t + 1):
                    acc = 0.8 * acc + 0.2 * ang[i]
                want[t] = acc
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestOnlineEnhancer:
    def test_shapes_and_masking(self, stereo_signal, dictionary):
        mix, sr = stereo_signal
        enh = OnlineGCCNMFEnhancer(dictionary, OnlineConfig(sample_rate=sr))
        res = enh.enhance(mix)
        out = res["enhanced"]
        assert out.shape[0] == 2
        assert 0 < (out ** 2).sum() < (mix ** 2).sum()
        t = res["target_tdoa_index"].shape[-1]
        assert res["coefficient_masks"].shape[-2] == t

    def test_causality(self, stereo_signal, dictionary):
        """Corrupting the input after sample n must not change the output
        before n - window (the STFT lookahead)."""
        mix, sr = stereo_signal
        cfg = OnlineConfig(sample_rate=sr, smoothing="cumulative")
        enh = OnlineGCCNMFEnhancer(dictionary, cfg)
        a = enh.enhance(mix)["enhanced"]
        corrupted = mix.copy()
        n_cut = mix.shape[-1] // 2
        corrupted[:, n_cut:] = np.random.default_rng(0).standard_normal(
            corrupted[:, n_cut:].shape
        )
        b = enh.enhance(corrupted)["enhanced"]
        safe = n_cut - 2 * 1024  # frames fully before the corruption
        np.testing.assert_allclose(a[:, :safe], b[:, :safe], atol=1e-5)

    def test_h_inference_mode(self, stereo_signal, dictionary):
        mix, sr = stereo_signal
        res0 = OnlineGCCNMFEnhancer(
            dictionary, OnlineConfig(sample_rate=sr, num_h_updates=0)
        ).enhance(mix)
        res1 = OnlineGCCNMFEnhancer(
            dictionary, OnlineConfig(sample_rate=sr, num_h_updates=10)
        ).enhance(mix)
        # Both produce valid outputs; H inference changes the mask.
        assert res0["enhanced"].shape == res1["enhanced"].shape
        assert not np.allclose(res0["enhanced"], res1["enhanced"])

    def test_batched(self, stereo_signal, dictionary):
        mix, sr = stereo_signal
        enh = OnlineGCCNMFEnhancer(dictionary, OnlineConfig(sample_rate=sr))
        single = enh.enhance(mix)["enhanced"]
        batch = enh.enhance(np.stack([mix, mix]))["enhanced"]
        np.testing.assert_allclose(batch[0], single, atol=1e-5)
        np.testing.assert_allclose(batch[0], batch[1], atol=1e-6)

    def test_localization_tracks_moving_source(self, dictionary):
        """Target index follows a source that switches sides mid-signal."""
        sr = 16000
        rng = np.random.default_rng(11)
        n = sr * 2
        s = rng.standard_normal(n).astype(np.float32)
        half = n // 2
        left = s.copy()
        right = np.concatenate([np.roll(s[:half], 4), np.roll(s[half:], -4)])
        mix = np.stack([left, right])
        cfg = OnlineConfig(sample_rate=sr, smoothing="sliding", smoothing_window=4)
        res = OnlineGCCNMFEnhancer(dictionary, cfg).enhance(mix)
        idx = res["target_tdoa_index"]
        t = len(idx)
        early, late = idx[t // 4], idx[-1]
        assert early != late  # tracked the move
        assert (early - 31.5) * (late - 31.5) < 0  # opposite sides of center
