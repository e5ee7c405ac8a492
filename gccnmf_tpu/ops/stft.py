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

Three compute paths:

- ``method="fft"``: XLA's native FFT.
- ``method="matmul"``: the real DFT as two f32 GEMMs against precomputed
  cos/sin matrices — more FLOPs but rides the MXU, which on TPU is often
  faster than the FFT lowering for these small (1024-point) transforms,
  and fuses with the surrounding windowing/masking elementwise work.
- ``method="conv"``: framing + windowing + real DFT fused into ONE strided
  convolution (filters = window ⊙ cos/sin DFT rows, stride = hop). This
  avoids materializing the (…, T, window) frame tensor entirely and maps
  straight onto the MXU's native convolution path — the TPU-canonical
  formulation. The inverse (``istft method="conv"``) is the matching
  transposed convolution, whose scatter-accumulate IS overlap-add.
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
    "pad_center_window",
    "stft",
    "istft",
    "inverse_frames",
    "overlap_add",
    "dft_matrices",
    "idft_matrices",
]

from gccnmf_tpu.ops import xprec as _xprec


def _HIGHEST():  # trace-time MXU precision policy (ops/xprec.py)
    return _xprec.get()


def num_frames(n: int, frame_length: int, hop_size: int) -> int:
    """Number of left-aligned frames fully contained in a length-n signal."""
    return 1 + (n - frame_length) // hop_size


def frame_signal(y: jax.Array, frame_length: int, hop_size: int) -> jax.Array:
    """Slice ``(..., n)`` into overlapping frames ``(..., T, frame_length)``.

    When ``hop_size`` divides ``frame_length`` this is a static stack of
    shifted slices (the dual of :func:`overlap_add`'s fast path) — no
    gather, and no index matrix. The fallback gather builds its indexes
    on device: a host-side ``np.arange`` index matrix would be embedded
    in the program as a ``(T, frame_length)`` constant, which at
    hour-scale T is gigabytes of HLO (it overflowed the remote-compile
    transport on 30-minute single-shard runs).
    """
    n = y.shape[-1]
    t = num_frames(n, frame_length, hop_size)
    if frame_length % hop_size == 0:
        r = frame_length // hop_size
        usable = (t + r - 1) * hop_size
        chunks = y[..., :usable].reshape(*y.shape[:-1], t + r - 1, hop_size)
        segs = [chunks[..., k : k + t, :] for k in range(r)]
        return jnp.stack(segs, axis=-2).reshape(
            *y.shape[:-1], t, frame_length
        )
    starts = jnp.arange(t) * hop_size
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
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


def _stft_conv(y: jax.Array, window: jax.Array, hop_size: int, fft_size: int):
    """Fused frame+window+rDFT as one strided conv on the MXU.

    Filters are the windowed DFT basis rows: output channel ``f`` of the
    first F channels is ``Σ_tap y[t*hop+tap]·window[tap]·cos(2π f tap/N)``,
    channels F..2F the sin part. Returns (real, imag) of the
    (non-conjugated) rfft, shapes ``(..., T, F)``.
    """
    cos_m, sin_m = dft_matrices(fft_size)  # (fft, F)
    w = jnp.asarray(window, jnp.float32)[:, None]
    filt = jnp.concatenate(
        [jnp.asarray(cos_m) * w, jnp.asarray(sin_m) * w], axis=1
    )  # (fft, 2F)
    *batch, n = y.shape
    lhs = y.reshape(-1, 1, n).astype(jnp.float32)  # (N, C=1, n)
    out = jax.lax.conv_general_dilated(
        lhs,
        filt[:, None, :],  # (fft, 1, 2F) in HIO order below
        window_strides=(hop_size,),
        padding="VALID",
        dimension_numbers=("NCH", "HIO", "NHC"),
        precision=_HIGHEST(),
    )  # (N, T, 2F)
    num_freq = fft_size // 2 + 1
    out = out.reshape(*batch, out.shape[-2], 2 * num_freq)
    return out[..., :num_freq], -out[..., num_freq:]


def pad_center_window(
    window: jax.Array | np.ndarray, fft_size: int
) -> jax.Array:
    """Center-pad a window shorter than the frame with zeros — librosa's
    ``pad_center`` semantics (reference librosaSTFT.py:297-368, left pad
    ``(size - n) // 2``). This is the reference's ``fftSize != windowSize``
    path: ``computeComplexMixtureSpectrogram``'s ``fftSize`` argument lands
    in librosa's ``win_length`` slot (gccNMFFunctions.py:61-67), producing
    a ``hanning(fftSize)`` window pad-centered to the frame length."""
    window = jnp.asarray(window, jnp.float32)
    n = window.shape[-1]
    if n == fft_size:
        return window
    if n > fft_size:
        raise ValueError(
            f"window length {n} exceeds frame length {fft_size}"
        )
    lpad = (fft_size - n) // 2
    return jnp.pad(window, (lpad, fft_size - n - lpad))


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

    A ``window`` shorter than ``fft_size`` is zero-pad-centered to the
    frame length (librosa semantics; see :func:`pad_center_window`).
    ``F = fft_size//2 + 1``.
    """
    window = jnp.asarray(window, jnp.float32)
    if fft_size is None:
        fft_size = window.shape[-1]
    window = pad_center_window(window, fft_size)
    if method == "conv":
        real, imag = _stft_conv(y, window, hop_size, fft_size)
        spec = jax.lax.complex(real, imag)
        return jnp.conj(spec) if conjugate else spec
    frames = frame_signal(y.astype(jnp.float32), fft_size, hop_size)
    frames = frames * window
    if method == "fft":
        spec = jnp.fft.rfft(frames, n=fft_size, axis=-1).astype(jnp.complex64)
    elif method == "matmul":
        cos_m, sin_m = dft_matrices(fft_size)
        real = jnp.matmul(frames, cos_m, precision=_HIGHEST())
        imag = -jnp.matmul(frames, sin_m, precision=_HIGHEST())
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
    # General fallback: scatter-add each frame at its start offset
    # (on-device iota — a np.arange index matrix would be a (T, L)
    # constant embedded in the program).
    idx = (jnp.arange(t) * hop_size)[:, None] + jnp.arange(length)[None, :]
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
    window = pad_center_window(window, fft_size)
    if conjugate:
        spec = jnp.conj(spec)
    if method == "conv":
        a, b = idft_matrices(fft_size)  # (F, fft)
        w_row = jnp.asarray(window, jnp.float32)[None, :]
        filt = jnp.concatenate(
            [jnp.asarray(a) * w_row, jnp.asarray(b) * w_row], axis=0
        )  # (2F, fft)
        *batch, t, f = spec.shape
        lhs = jnp.concatenate([jnp.real(spec), jnp.imag(spec)], axis=-1)
        lhs = lhs.reshape(-1, t, 2 * f)  # (N, T, 2F)
        # transposed conv: the scatter-accumulate of windowed inverse-DFT
        # frames at hop offsets IS overlap-add (tap axis flipped because
        # conv_transpose convolves with the spatially-reversed kernel)
        y = jax.lax.conv_transpose(
            lhs,
            jnp.flip(filt.T, axis=0)[:, :, None],  # (fft, 2F, 1) HIO
            strides=(hop_size,),
            padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
            precision=_HIGHEST(),
        )  # (N, n, 1)
        y = y.reshape(*batch, -1)
        if center_trim:
            half = fft_size // 2
            y = y[..., half:-half]
        return y
    y = overlap_add(inverse_frames(spec, fft_size, method) * window, hop_size)
    if center_trim:
        half = fft_size // 2
        y = y[..., half:-half]
    return y


def inverse_frames(
    spec: jax.Array, fft_size: int, method: str = "fft"
) -> jax.Array:
    """Per-frame inverse rDFT: ``(..., T, F)`` complex → ``(..., T,
    fft_size)`` float32 frames (no window, no overlap-add). The shared
    spectrum→frames step of :func:`istft` and the sequence-parallel
    seam-exchange OLA (parallel/long_audio.py), kept in one place so the
    two paths cannot drift."""
    if method == "fft":
        return jnp.fft.irfft(spec, n=fft_size, axis=-1).astype(jnp.float32)
    if method == "matmul":
        a, b = idft_matrices(fft_size)
        return jnp.matmul(jnp.real(spec), a, precision=_HIGHEST()) + jnp.matmul(
            jnp.imag(spec), b, precision=_HIGHEST()
        )
    raise ValueError(f"unknown istft method: {method}")
