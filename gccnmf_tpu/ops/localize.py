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
    "auto_count_targets",
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


def auto_count_targets(
    a: jax.Array, max_sources: int, num_iterations: int = 50
) -> tuple[jax.Array, jax.Array]:
    """On-device auto source counting: fixed-iteration 2-means on interior
    local-max heights (the jitted analogue of the reference's broken
    sklearn-KMeans branch, gccNMFFunctions.py:105-108, and of the host path
    :func:`estimate_target_tdoa_indexes`).

    ``a``: angular spectrum, shape ``(..., D)``. Returns
    ``(targets (..., max_sources) int32, counts (...,) int32)``: the
    high-cluster peak count (clamped to ``[1, max_sources]``) and that many
    highest peaks sorted left-to-right in positions ``[0, count)``, the
    remaining slots filled with the dominant peak. A duplicated target's
    attribution score column equals the original's, and the hard-mask
    ``nanargmax`` picks the FIRST of equal columns (ops/masks.py) — so pad
    slots produce exactly-zero masks and silent estimates; only rows
    ``[0, count)`` carry audio.
    """
    mask = local_maxima_mask(a)
    heights = jnp.where(mask, a, -jnp.inf)
    vals, idx = jax.lax.top_k(heights, max_sources)
    # degenerate (peakless) spectra fall back to the global argmax, like
    # top_k_peaks
    best = jnp.argmax(a, axis=-1).astype(idx.dtype)[..., None]
    idx = jnp.where(jnp.isneginf(vals), best, idx)

    # --- masked 1-D Lloyd's, 2 clusters, centers init = (min, max) peak ---
    w = mask.astype(jnp.float32)
    c_lo = jnp.min(jnp.where(mask, a, jnp.inf), axis=-1)
    c_hi = jnp.max(heights, axis=-1)
    # peakless rows: give both centers the global max so count clamps to 1
    fallback = jnp.max(a, axis=-1)
    has_peak = jnp.any(mask, axis=-1)
    c_lo = jnp.where(has_peak, c_lo, fallback)
    c_hi = jnp.where(has_peak, c_hi, fallback)

    def body(_, centers):
        c0, c1 = centers
        in_hi = jnp.abs(a - c0[..., None]) > jnp.abs(a - c1[..., None])
        w1 = w * in_hi
        w0 = w * (1.0 - in_hi)
        n0 = jnp.sum(w0, axis=-1)
        n1 = jnp.sum(w1, axis=-1)
        c0n = jnp.where(
            n0 > 0, jnp.sum(w0 * a, axis=-1) / jnp.maximum(n0, 1.0), c0
        )
        c1n = jnp.where(
            n1 > 0, jnp.sum(w1 * a, axis=-1) / jnp.maximum(n1, 1.0), c1
        )
        return c0n, c1n

    c0, c1 = jax.lax.fori_loop(0, num_iterations, body, (c_lo, c_hi))
    hi = jnp.maximum(c0, c1)
    lo = jnp.minimum(c0, c1)
    in_hi = mask & (jnp.abs(a - lo[..., None]) > jnp.abs(a - hi[..., None]))
    counts = jnp.clip(jnp.sum(in_hi, axis=-1), 1, max_sources).astype(jnp.int32)

    # positions [0, count): the count highest peaks, ascending in TDOA;
    # positions [count, max): the dominant peak (zero-mask pads)
    pos = jnp.arange(max_sources)
    keep = pos < counts[..., None]
    sentinel = a.shape[-1] + 1  # sorts after every real index
    sorted_idx = jnp.sort(jnp.where(keep, idx, sentinel), axis=-1)
    dominant = idx[..., :1]
    targets = jnp.where(keep, sorted_idx, dominant).astype(jnp.int32)
    return targets, counts


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
