"""TDOA localization: peak picking and source counting.

The jit-able parts (local-maxima mask, top-k peak selection, sliding-window
streaming localization) are static-shaped; the auto-source-count path
(2-means on peak heights) runs host-side on a length-``num_tdoas`` vector —
it is O(D) work on tiny data and inherently data-dependent.

Reference: gccNMFFunctions.estimateTargetTDOAIndexesFromAngularSpectrum
(gccNMFFunctions.py:94-116). The reference's auto-count branch is broken as
written (sklearn ``KMeans`` never imported, ``os`` missing for the abort
path, gccNMFFunctions.py:104-106); here both paths are implemented and
working: a fixed-point 2-means on peak heights replaces sklearn.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "local_maxima_mask",
    "top_k_peaks",
    "peak_count",
    "estimate_target_tdoa_indexes",
    "sliding_argmax_tdoa",
]


def local_maxima_mask(a: jax.Array) -> jax.Array:
    """Boolean mask of strict interior local maxima along the last axis.

    Matches scipy.signal.argrelmax(order=1, mode='clip') on interior points;
    endpoints are never maxima (same as the reference's usage)."""
    mid = a[..., 1:-1]
    mask = (mid > a[..., :-2]) & (mid > a[..., 2:])
    pad = jnp.zeros_like(a[..., :1], dtype=bool)
    return jnp.concatenate([pad, mask, pad], axis=-1)


def top_k_peaks(a: jax.Array, k: int) -> jax.Array:
    """Indexes of the ``k`` highest local maxima, sorted ascending (i.e.
    left-to-right in TDOA, like the reference's sorted() at
    gccNMFFunctions.py:113). If fewer than ``k`` peaks exist, the missing
    slots repeat the global argmax (a deterministic duplicate target —
    its estimate duplicates too) rather than whatever indexes top_k uses
    as -inf fill; use :func:`peak_count` to detect the shortfall (the
    host path raises instead, ops/localize.estimate_target_tdoa_indexes)."""
    heights = jnp.where(local_maxima_mask(a), a, -jnp.inf)
    vals, idx = jax.lax.top_k(heights, k)
    best = jnp.argmax(a, axis=-1).astype(idx.dtype)[..., None]
    idx = jnp.where(jnp.isneginf(vals), best, idx)
    return jnp.sort(idx, axis=-1)


def peak_count(a: jax.Array) -> jax.Array:
    """Number of interior local maxima along the last axis (int32)."""
    return jnp.sum(local_maxima_mask(a), axis=-1).astype(jnp.int32)


def _two_means_1d(values: np.ndarray, num_iterations: int = 50):
    """Lloyd's algorithm, 2 clusters, 1-D. Returns (labels, centers)."""
    lo, hi = float(values.min()), float(values.max())
    centers = np.array([lo, hi])
    labels = np.zeros(len(values), np.int32)
    for _ in range(num_iterations):
        labels = (np.abs(values - centers[0]) > np.abs(values - centers[1])).astype(
            np.int32
        )
        new_centers = centers.copy()
        for c in (0, 1):
            sel = values[labels == c]
            if sel.size:
                new_centers[c] = sel.mean()
        if np.allclose(new_centers, centers):
            break
        centers = new_centers
    return labels, centers


def estimate_target_tdoa_indexes(
    mean_angular_spectrum: np.ndarray, num_sources: int | None = None
) -> list[int]:
    """Pick target TDOA indexes from a time-averaged angular spectrum.

    With ``num_sources`` given: the N highest interior local maxima
    (raises if fewer exist — the reference's equivalent path aborts the
    process, gccNMFFunctions.py:102-104). With ``num_sources=None``:
    2-means clustering on peak heights, keep the high cluster.
    Returns indexes sorted left-to-right.
    """
    a = np.asarray(mean_angular_spectrum)
    mask = np.zeros(len(a), bool)
    mask[1:-1] = (a[1:-1] > a[:-2]) & (a[1:-1] > a[2:])
    peak_idx = np.nonzero(mask)[0]

    if num_sources:
        if len(peak_idx) < num_sources:
            raise ValueError(
                f"found only {len(peak_idx)} angular-spectrum peaks, "
                f"need {num_sources}"
            )
        chosen = peak_idx[np.argsort(a[peak_idx])[-num_sources:]]
    else:
        if len(peak_idx) == 0:
            raise ValueError("no angular-spectrum peaks found")
        labels, centers = _two_means_1d(a[peak_idx].astype(np.float64))
        chosen = peak_idx[labels == int(np.argmax(centers))]
    return sorted(int(i) for i in chosen)


def sliding_argmax_tdoa(gcc_phat_history: jax.Array, window: int) -> jax.Array:
    """Streaming localization: argmax over the mean of the last ``window``
    frames of GCC-PHAT history ``(..., T_hist, D)``
    (reference: gccNMF/realtime/gccNMFProcessor.py:220-226)."""
    recent = gcc_phat_history[..., -window:, :]
    return jnp.argmax(jnp.mean(recent, axis=-2), axis=-1)
