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

__all__ = ["snr", "si_sdr", "sdr", "permutation_invariant"]


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
