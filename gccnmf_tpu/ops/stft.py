"""Batched STFT / ISTFT for TPU.

Canonical layout throughout this framework is **time-major**:
spectrograms are ``(..., num_frames, num_freq)`` — frames along the
second-to-last axis, frequency bins along the (fast) last axis. This maps
overlap-add and the DFT to plain GEMMs on the MXU. (The NumPy reference
uses frequency-major ``(F, T)``; parity tests transpose at the boundary.)

Reference semantics replicated behind flags:

- ``conjugate=True`` reproduces the reference STFT's output conjugation
  (reference: gccNMF/librosaSTFT.py:177-179 "RFFT and Conjugate here to
  match phase from DPWE code"); its ISTFT undoes it by conjugating the
  half-spectrum before inverse transform (librosaSTFT.py:278).
- left-aligned frames, ``1 + (n - frame_len)//hop`` frames total
  (librosaSTFT.py:425), i.e. ``center=False`` framing as used by the
  offline pipeline (gccNMFFunctions.py:65).
- ``center_trim=True`` on the ISTFT trims ``fft_size//2`` samples from
  both ends, matching the reference ISTFT's default ``center=True``
  behavior (librosaSTFT.py:283-284) that the offline pipeline hits via
  getTargetSignalEstimates (gccNMFFunctions.py:161).

Two compute paths:

- ``method="fft"``: XLA's native FFT.
- ``method="matmul"``: the real DFT as two f32 GEMMs against precomputed
  cos/sin matrices — more FLOPs but rides the MXU, which on TPU is often
  faster than the FFT lowering for these small (1024-point) transforms,
  and fuses with the surrounding windowing/masking elementwise work.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "num_frames",
    "frame_signal",
    "stft",
    "istft",
    "overlap_add",
    "dft_matrices",
    "idft_matrices",
]

_HIGHEST = jax.lax.Precision.HIGHEST


def num_frames(n: int, frame_length: int, hop_size: int) -> int:
    """Number of left-aligned frames fully contained in a length-n signal."""
    return 1 + (n - frame_length) // hop_size


def frame_signal(y: jax.Array, frame_length: int, hop_size: int) -> jax.Array:
    """Slice ``(..., n)`` into overlapping frames ``(..., T, frame_length)``."""
    n = y.shape[-1]
    t = num_frames(n, frame_length, hop_size)
    starts = np.arange(t) * hop_size
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    return y[..., idx]


@functools.lru_cache(maxsize=None)
def dft_matrices(fft_size: int, dtype=np.float32):
    """(cos, sin) forward rDFT matrices of shape ``(fft_size, F)``.

    ``X[f] = frames @ cos - 1j * (frames @ sin)`` equals ``rfft(frames)``.
    """
    f = np.arange(fft_size // 2 + 1)
    n = np.arange(fft_size)
    ang = 2.0 * np.pi * np.outer(n, f) / fft_size
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


@functools.lru_cache(maxsize=None)
def idft_matrices(fft_size: int, dtype=np.float32):
    """(A, B) inverse rDFT matrices of shape ``(F, fft_size)``.

    ``y = Re(X) @ A + Im(X) @ B`` equals ``irfft(X, n=fft_size)``.
    """
    num_freq = fft_size // 2 + 1
    f = np.arange(num_freq)
    n = np.arange(fft_size)
    coef = np.full(num_freq, 2.0)
    coef[0] = 1.0
    if fft_size % 2 == 0:
        coef[-1] = 1.0
    ang = 2.0 * np.pi * np.outer(f, n) / fft_size
    a = (coef[:, None] * np.cos(ang) / fft_size).astype(dtype)
    b = (-coef[:, None] * np.sin(ang) / fft_size).astype(dtype)
    return a, b


def stft(
    y: jax.Array,
    window: jax.Array | np.ndarray,
    hop_size: int,
    *,
    fft_size: Optional[int] = None,
    conjugate: bool = False,
    method: str = "fft",
) -> jax.Array:
    """Left-aligned STFT of ``(..., n)`` real audio → ``(..., T, F)`` complex64.

    ``window`` must have length ``fft_size`` (it is applied to each frame
    before the transform). ``F = fft_size//2 + 1``.
    """
    window = jnp.asarray(window, jnp.float32)
    if fft_size is None:
        fft_size = window.shape[-1]
    frames = frame_signal(y.astype(jnp.float32), fft_size, hop_size)
    frames = frames * window
    if method == "fft":
        spec = jnp.fft.rfft(frames, n=fft_size, axis=-1).astype(jnp.complex64)
    elif method == "matmul":
        cos_m, sin_m = dft_matrices(fft_size)
        real = jnp.matmul(frames, cos_m, precision=_HIGHEST)
        imag = -jnp.matmul(frames, sin_m, precision=_HIGHEST)
        spec = jax.lax.complex(real, imag)
    else:
        raise ValueError(f"unknown stft method: {method}")
    if conjugate:
        spec = jnp.conj(spec)
    return spec


def overlap_add(frames: jax.Array, hop_size: int) -> jax.Array:
    """Overlap-add ``(..., T, L)`` frames at ``hop_size`` → ``(..., n)``.

    ``n = L + (T - 1) * hop_size``. When ``hop_size`` divides ``L`` this is
    a static stack of shifted adds (no scatter); otherwise falls back to a
    segment-sum formulation.
    """
    *batch, t, length = frames.shape
    n_out = length + (t - 1) * hop_size
    if length % hop_size == 0:
        r = length // hop_size
        chunks = frames.reshape(*batch, t, r, hop_size)
        out = jnp.zeros((*batch, t + r - 1, hop_size), frames.dtype)
        for k in range(r):
            out = out.at[..., k : k + t, :].add(chunks[..., :, k, :])
        return out.reshape(*batch, n_out)
    # General fallback: scatter-add each frame at its start offset.
    idx = (np.arange(t) * hop_size)[:, None] + np.arange(length)[None, :]
    out = jnp.zeros((*batch, n_out), frames.dtype)
    return out.at[..., idx].add(frames)


def istft(
    spec: jax.Array,
    window: jax.Array | np.ndarray,
    hop_size: int,
    *,
    conjugate: bool = False,
    center_trim: bool = False,
    method: str = "fft",
) -> jax.Array:
    """Inverse STFT of ``(..., T, F)`` complex → ``(..., n)`` float32.

    ``window`` is the synthesis window (length ``fft_size = 2*(F-1)``),
    applied to each inverse-transformed frame before overlap-add. With
    ``conjugate=True`` the half-spectrum is conjugated first (undoing a
    conjugated forward transform). ``center_trim=True`` drops
    ``fft_size//2`` samples at each end (reference librosaSTFT.py:283-284).
    """
    window = jnp.asarray(window, jnp.float32)
    fft_size = 2 * (spec.shape[-1] - 1)
    if conjugate:
        spec = jnp.conj(spec)
    if method == "fft":
        frames = jnp.fft.irfft(spec, n=fft_size, axis=-1).astype(jnp.float32)
    elif method == "matmul":
        a, b = idft_matrices(fft_size)
        frames = jnp.matmul(jnp.real(spec), a, precision=_HIGHEST) + jnp.matmul(
            jnp.imag(spec), b, precision=_HIGHEST
        )
    else:
        raise ValueError(f"unknown istft method: {method}")
    y = overlap_add(frames * window, hop_size)
    if center_trim:
        half = fft_size // 2
        y = y[..., half:-half]
    return y
