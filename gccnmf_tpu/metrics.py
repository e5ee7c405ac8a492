"""Separation/enhancement quality metrics.

The reference repo publishes no metrics code — SDR/PESQ/STOI numbers live
only in its papers (reference: README.md:39-52). This module provides the
metrics used for parity checking against the NumPy oracle and for quality
tracking across benchmark runs:

- ``si_sdr``: scale-invariant SDR (Le Roux et al. 2019 definition);
- ``sdr``: classic BSS-eval-style SDR with a time-invariant scalar
  projection (the component of the estimate explained by the target);
- ``snr``: plain signal-to-noise ratio of estimate vs reference — the
  waveform-parity number quoted in this repo's tests;
- ``permutation_invariant``: best-permutation wrapper for multi-source
  separation (source order is arbitrary in blind separation).

All are pure NumPy (host-side, evaluation-only).
"""

from __future__ import annotations

import itertools

import numpy as np

__all__ = ["snr", "si_sdr", "sdr", "permutation_invariant", "stoi"]


def _flatten_channels(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    return x.reshape(-1)


def snr(reference: np.ndarray, estimate: np.ndarray, eps: float = 1e-12) -> float:
    """SNR (dB) of estimate against reference: 10 log10 ||ref||²/||ref−est||²."""
    ref = _flatten_channels(reference)
    est = _flatten_channels(estimate)
    noise = ref - est
    return float(10.0 * np.log10((np.sum(ref**2) + eps) / (np.sum(noise**2) + eps)))


def si_sdr(reference: np.ndarray, estimate: np.ndarray, eps: float = 1e-12) -> float:
    """Scale-invariant SDR (dB): project estimate onto reference first."""
    ref = _flatten_channels(reference)
    est = _flatten_channels(estimate)
    ref = ref - ref.mean()
    est = est - est.mean()
    alpha = np.dot(est, ref) / (np.dot(ref, ref) + eps)
    target = alpha * ref
    noise = est - target
    return float(
        10.0 * np.log10((np.sum(target**2) + eps) / (np.sum(noise**2) + eps))
    )


def sdr(reference: np.ndarray, estimate: np.ndarray, eps: float = 1e-12) -> float:
    """BSS-eval-style SDR with scalar (time-invariant, gain-only) allowed
    distortion: the target is the least-squares scalar projection of the
    estimate on the reference, everything else counts as error."""
    return si_sdr(reference, estimate, eps)  # scalar projection == SI-SDR


def permutation_invariant(
    references: np.ndarray, estimates: np.ndarray, metric=si_sdr
) -> tuple[float, tuple[int, ...]]:
    """Best mean metric over source permutations.

    ``references``/``estimates``: (num_sources, ...) waveforms. Returns
    (best mean metric, best permutation mapping estimate i → reference
    perm[i]).
    """
    n = references.shape[0]
    best, best_perm = -np.inf, tuple(range(n))
    for perm in itertools.permutations(range(n)):
        score = float(
            np.mean([metric(references[p], estimates[i]) for i, p in enumerate(perm)])
        )
        if score > best:
            best, best_perm = score, perm
    return best, best_perm


# ---------------------------------------------------------------------------
# STOI — Short-Time Objective Intelligibility (Taal et al. 2011)
# ---------------------------------------------------------------------------

_STOI_SR = 10000
_STOI_FRAME = 256
_STOI_FFT = 512
_STOI_HOP = 128
_STOI_NUM_BANDS = 15
_STOI_MIN_FREQ = 150.0
_STOI_SEG = 30  # analysis segment length in frames (384 ms at 10 kHz)
_STOI_BETA_DB = -15.0  # SDR clipping bound
_STOI_DYN_RANGE_DB = 40.0  # silent-frame removal threshold


def _stoi_resample(x: np.ndarray, sample_rate: int) -> np.ndarray:
    if sample_rate == _STOI_SR:
        return x
    from scipy.signal import resample_poly

    g = np.gcd(int(sample_rate), _STOI_SR)
    return resample_poly(x, _STOI_SR // g, int(sample_rate) // g)


def _stoi_frames(x: np.ndarray) -> np.ndarray:
    """Hann-windowed rFFT magnitudes, (num_frames, 257)."""
    n = (len(x) - _STOI_FRAME) // _STOI_HOP + 1
    if n < 1:
        raise ValueError("signal too short for STOI")
    idx = np.arange(_STOI_FRAME)[None, :] + _STOI_HOP * np.arange(n)[:, None]
    win = np.hanning(_STOI_FRAME + 2)[1:-1]
    return np.abs(np.fft.rfft(x[idx] * win, n=_STOI_FFT, axis=-1))


def _stoi_octave_bands() -> np.ndarray:
    """(15, 257) one-third-octave band matrix at 10 kHz / 512-point FFT."""
    freqs = np.linspace(0, _STOI_SR / 2, _STOI_FFT // 2 + 1)
    centers = _STOI_MIN_FREQ * 2.0 ** (np.arange(_STOI_NUM_BANDS) / 3.0)
    lo = centers * 2.0 ** (-1.0 / 6.0)
    hi = centers * 2.0 ** (1.0 / 6.0)
    bands = np.zeros((_STOI_NUM_BANDS, freqs.size))
    for b in range(_STOI_NUM_BANDS):
        bands[b] = (freqs >= lo[b]) & (freqs < hi[b])
    return bands


def _stoi_remove_silent(clean: np.ndarray, degraded: np.ndarray):
    """Drop frames whose clean energy is >40 dB below the loudest frame."""
    win = np.hanning(_STOI_FRAME + 2)[1:-1]
    n = (len(clean) - _STOI_FRAME) // _STOI_HOP + 1
    idx = np.arange(_STOI_FRAME)[None, :] + _STOI_HOP * np.arange(n)[:, None]
    energy_db = 20.0 * np.log10(
        np.linalg.norm(clean[idx] * win, axis=-1) / np.sqrt(_STOI_FRAME) + 1e-30
    )
    keep = energy_db >= energy_db.max() - _STOI_DYN_RANGE_DB
    if not np.any(keep):
        raise ValueError("no active speech frames found for STOI")

    def rebuild(x):
        frames = x[idx[keep]] * win
        out = np.zeros((keep.sum() - 1) * _STOI_HOP + _STOI_FRAME)
        norm = np.zeros_like(out)
        for f in range(keep.sum()):
            s = f * _STOI_HOP
            out[s : s + _STOI_FRAME] += frames[f] * win
            norm[s : s + _STOI_FRAME] += win * win
        return out / np.maximum(norm, 1e-12)

    return rebuild(clean), rebuild(degraded)


def stoi(
    clean: np.ndarray, degraded: np.ndarray, sample_rate: int = 16000
) -> float:
    """Short-Time Objective Intelligibility (Taal et al., ICASSP 2010 /
    IEEE TASL 2011), classic (non-extended) variant.

    Both signals are resampled to 10 kHz, silent clean frames are removed,
    both are decomposed into 15 one-third-octave band envelopes, and
    normalized+clipped 384 ms envelope segments are correlated. Returns a
    score in roughly [0, 1]; ~1 for perfectly intelligible. The reference
    repo publishes STOI only in its papers (reference: README.md:39-52);
    this implementation makes the number reproducible in-framework.
    Accepts mono ``(n,)`` or multichannel ``(channels, n)`` (averaged).
    """
    clean = np.asarray(clean, np.float64)
    degraded = np.asarray(degraded, np.float64)
    if clean.shape != degraded.shape:
        raise ValueError("clean/degraded shape mismatch")
    if clean.ndim == 2:
        return float(
            np.mean(
                [stoi(c, d, sample_rate) for c, d in zip(clean, degraded)]
            )
        )
    clean = _stoi_resample(clean, sample_rate)
    degraded = _stoi_resample(degraded, sample_rate)
    clean, degraded = _stoi_remove_silent(clean, degraded)

    bands = _stoi_octave_bands()
    # (frames, bands) band envelopes: sqrt of in-band energy
    x = np.sqrt(np.maximum(_stoi_frames(clean) ** 2 @ bands.T, 1e-30))
    y = np.sqrt(np.maximum(_stoi_frames(degraded) ** 2 @ bands.T, 1e-30))
    if x.shape[0] < _STOI_SEG:
        raise ValueError("too few active frames for a 384 ms STOI segment")

    beta = 10.0 ** (-_STOI_BETA_DB / 20.0)
    scores = []
    for m in range(_STOI_SEG, x.shape[0] + 1):
        xs = x[m - _STOI_SEG : m]  # (30, bands)
        ys = y[m - _STOI_SEG : m]
        alpha = np.linalg.norm(xs, axis=0) / (np.linalg.norm(ys, axis=0) + 1e-30)
        ys_n = np.minimum(ys * alpha, xs * (1.0 + beta))  # normalize + clip
        xc = xs - xs.mean(axis=0)
        yc = ys_n - ys_n.mean(axis=0)
        denom = np.linalg.norm(xc, axis=0) * np.linalg.norm(yc, axis=0) + 1e-30
        scores.append(np.sum(xc * yc, axis=0) / denom)
    return float(np.mean(scores))
