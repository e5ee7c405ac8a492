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


class TestBssEval:
    """BSS-Eval (Vincent et al. 2006): 512-tap allowed distortion, error
    split into interference vs artifacts — the SiSEC/paper SDR."""

    @pytest.fixture()
    def refs(self):
        rng = np.random.default_rng(0)
        n = 16000
        s = rng.standard_normal((2, n))
        s[:, -700:] = 0  # zero tails keep delayed/filtered copies in-span
        return s

    def test_perfect_estimates(self, refs):
        sdr, sir, sar, perm = metrics.bss_eval_sources(refs, refs)
        assert (sdr > 100).all() and (sir > 100).all() and (sar > 100).all()
        assert list(perm) == [0, 1]

    def test_allowed_distortion_is_forgiven(self, refs):
        """A causal delay or short filter (within the 512-tap span) is
        allowed distortion: BSS-Eval SDR stays huge where SI-SDR collapses."""
        n = refs.shape[-1]
        delayed = np.concatenate([np.zeros(100), refs[0, :-100]])
        est = np.stack([delayed, refs[1]])
        sdr, *_ = metrics.bss_eval_sources(refs, est)
        assert sdr[0] > 100
        assert metrics.si_sdr(refs[0], delayed) < 0

        rng = np.random.default_rng(1)
        filt = np.convolve(rng.standard_normal(64) * 0.1, refs[0])[:n]
        sdr, *_ = metrics.bss_eval_sources(refs, np.stack([filt, refs[1]]))
        assert sdr[0] > 100

    def test_interference_vs_artifact_split(self, refs):
        rng = np.random.default_rng(2)
        n = refs.shape[-1]
        # interference: leakage of the other source -> SIR ~ 10log10(1/0.09)
        est = np.stack([refs[0] + 0.3 * refs[1], refs[1]])
        sdr, sir, sar, _ = metrics.bss_eval_sources(refs, est)
        assert sir[0] == pytest.approx(10.46, abs=0.7)
        assert sar[0] > 100  # leakage is NOT an artifact
        # artifacts: noise outside every source's span -> SAR ~ 20 dB
        est = np.stack([refs[0] + 0.1 * rng.standard_normal(n), refs[1]])
        sdr, sir, sar, _ = metrics.bss_eval_sources(refs, est)
        assert sar[0] == pytest.approx(20.0, abs=0.7)
        assert sir[0] > 25  # noise barely projects onto the other source

    def test_permutation_recovered(self, refs):
        sdr, sir, sar, perm = metrics.bss_eval_sources(refs, refs[::-1])
        assert list(perm) == [1, 0]
        assert (sdr > 100).all()

    def test_stereo_sources_flatten(self, refs):
        stereo_refs = np.stack([np.stack([r, r]) for r in refs])  # (2, 2, n)
        sdr, *_ = metrics.bss_eval_sources(stereo_refs, stereo_refs)
        assert (sdr > 100).all()


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


class TestPesq:
    """Behavioral validation of the clean-room P.862 implementation (the
    ITU conformance vectors are not redistributable/present in this image;
    see gccnmf_tpu/pesq_p862.py module docstring for the calibration)."""

    @staticmethod
    def _speech_like(seconds=4, sr=16000, seed=0):
        """The segment-structured synthetic utterance the committed curve
        artifact uses (silences, formant vowels, fricatives): degradation
        audibility depends on speech-like time-frequency sparsity, which a
        plain periodic tone lacks (see examples/render_pesq_curves.py)."""
        import os
        import sys

        sys.path.insert(
            0, os.path.join(os.path.dirname(__file__), "..", "examples")
        )
        try:
            from render_pesq_curves import speech_like
        finally:
            sys.path.pop(0)
        return speech_like(seconds=seconds, sr=sr, seed=seed)

    def test_identity_scores_max(self):
        x = self._speech_like()
        assert metrics.pesq(x, x, 16000) == pytest.approx(4.64, abs=0.02)
        x8 = self._speech_like(sr=8000)
        assert metrics.pesq(x8, x8, 8000) == pytest.approx(4.55, abs=0.02)

    def test_noise_monotone_and_ranges(self):
        """White additive noise: scores decrease monotonically with SNR and
        land in the bands published P.862 studies report (~4.2-4.5 at 40 dB
        down to ~1.4-1.9 at 0 dB); the full five-point band check is
        TestPesqCurves::test_additive_noise_curve_in_published_bands."""
        x = self._speech_like(seconds=8)
        rng = np.random.default_rng(1)
        scores = []
        for snr_db in [40, 30, 20, 10, 0]:
            n = rng.standard_normal(x.size)
            n *= np.sqrt((x ** 2).mean() / (n ** 2).mean()) * 10 ** (-snr_db / 20)
            scores.append(metrics.pesq(x, x + n, 16000))
        assert scores == sorted(scores, reverse=True), scores
        assert 3.9 < scores[0] < 4.6, scores  # 40 dB: slightly audible
        assert 1.0 < scores[-1] < 2.2, scores  # 0 dB: bad but non-floor

    def test_delay_and_gain_invariance(self):
        """Constant misalignment and level offsets are the aligner's and
        level-normalizer's job; neither should move the score much."""
        x = self._speech_like()
        base = metrics.pesq(x, x, 16000)
        delayed = np.concatenate([np.zeros(777), x])[: x.size]
        assert metrics.pesq(x, delayed, 16000) > base - 0.1
        advanced = x[500:]
        assert metrics.pesq(x, advanced, 16000) > base - 0.1
        assert metrics.pesq(x, 0.31 * x, 16000) == pytest.approx(base, abs=0.02)

    def test_enhancement_improves_score(self):
        """A crude spectral-subtraction denoise of a noisy mixture must
        score between the noisy input and the clean reference."""
        x = self._speech_like()
        rng = np.random.default_rng(2)
        noise = rng.standard_normal(x.size)
        noise *= np.sqrt((x ** 2).mean() / (noise ** 2).mean()) * 10 ** (-5 / 20)
        noisy = x + noise
        # oracle Wiener mask at 32 ms frames: the "enhanced" signal
        frame, hop = 512, 256
        nf = (x.size - frame) // hop + 1
        idx = np.arange(frame)[None] + hop * np.arange(nf)[:, None]
        win = np.hanning(frame)
        xs = np.fft.rfft(x[idx] * win, axis=-1)
        ns = np.fft.rfft(noisy[idx] * win, axis=-1)
        mask = np.abs(xs) ** 2 / (np.abs(xs) ** 2 + np.abs(ns - xs) ** 2 + 1e-12)
        est_frames = np.fft.irfft(ns * mask, n=frame, axis=-1) * win
        est = np.zeros_like(x)
        norm = np.zeros_like(x)
        for i in range(nf):
            est[i * hop : i * hop + frame] += est_frames[i]
            norm[i * hop : i * hop + frame] += win ** 2
        est /= np.maximum(norm, 1e-8)
        p_noisy = metrics.pesq(x, noisy, 16000)
        p_enh = metrics.pesq(x, est, 16000)
        assert p_enh > p_noisy + 0.3, (p_noisy, p_enh)

    def test_multichannel_accepted(self):
        x = self._speech_like()
        st = np.stack([x, x])
        assert metrics.pesq(st, st, 16000) == pytest.approx(
            metrics.pesq(x, x, 16000), abs=1e-9
        )

    def test_invalid_inputs_raise(self):
        x = self._speech_like()
        with pytest.raises(ValueError, match="8 kHz and 16 kHz"):
            metrics.pesq(x, x, 44100)
        with pytest.raises(ValueError, match="mode"):
            metrics.pesq(x, x, 16000, mode="superwideband")
        with pytest.raises(ValueError, match="too short"):
            metrics.pesq(x[:1000], x[:1000], 16000)


class TestPesqCurves:
    """Degradation-curve anchoring of the PESQ calibration (VERDICT r2
    item 5): the three canonical families must land inside the
    published-behavior bands committed with the curve artifact
    (docs/pesq_curves.png/.json; regenerate with
    examples/render_pesq_curves.py). Band definitions live in the
    generator so artifact and test can never drift apart."""

    @classmethod
    def setup_class(cls):
        import os
        import sys

        sys.path.insert(
            0, os.path.join(os.path.dirname(__file__), "..", "examples")
        )
        try:
            import render_pesq_curves as rc
        finally:
            sys.path.pop(0)
        cls.rc = rc
        cls.x = rc.speech_like()

    def _sweep(self, degrade, keys):
        return {k: metrics.pesq(self.x, degrade(self.x, k), 16000)
                for k in keys}

    def test_additive_noise_curve_in_published_bands(self):
        rc = self.rc
        scores = self._sweep(rc.additive_noise, sorted(rc.NOISE_BANDS))
        for snr, s in scores.items():
            lo, hi = rc.NOISE_BANDS[snr]
            assert lo <= s <= hi, (snr, s, (lo, hi))
        ordered = [scores[k] for k in sorted(scores)]
        assert ordered == sorted(ordered), scores  # monotone in SNR

    def test_mnru_curve_in_published_bands(self):
        rc = self.rc
        scores = self._sweep(rc.mnru, sorted(rc.MNRU_BANDS))
        for q, s in scores.items():
            lo, hi = rc.MNRU_BANDS[q]
            assert lo <= s <= hi, (q, s, (lo, hi))
        ordered = [scores[k] for k in sorted(scores)]
        assert ordered == sorted(ordered), scores  # monotone in Q

    def test_lowpass_curve_in_published_bands(self):
        rc = self.rc
        scores = self._sweep(rc.lowpass, sorted(rc.LOWPASS_BANDS))
        for c, s in scores.items():
            lo, hi = rc.LOWPASS_BANDS[c]
            assert lo <= s <= hi, (c, s, (lo, hi))
        ordered = [scores[k] for k in sorted(scores)]
        assert ordered == sorted(ordered), scores  # monotone in cutoff

    def test_committed_artifact_matches_model(self):
        """The committed JSON must reproduce under the current model — a
        drifted calibration without a regenerated artifact fails here."""
        import json
        import os

        path = os.path.join(
            os.path.dirname(__file__), "..", "docs", "pesq_curves.json"
        )
        with open(path) as fh:
            committed = json.load(fh)
        rc = self.rc
        got = rc.compute_curves()
        assert got == committed
