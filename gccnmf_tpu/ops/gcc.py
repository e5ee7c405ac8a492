"""GCC-PHAT: coherence, steering matrices, angular spectrograms.

TPU formulation: the angular spectrogram is a pair of real GEMMs
(``Re(C)@cos + Im(C)@sin``) instead of the reference's complex einsum
(reference: gccNMF/gccNMFFunctions.py:85-92), so it rides the MXU in
float32 with no complex arithmetic.

Layout: spectrograms/coherence are time-major ``(..., T, F)``; angular
spectrograms are ``(..., T, D)`` with ``D = num_tdoas``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gccnmf_tpu.defs import SPEED_OF_SOUND_M_S

__all__ = [
    "max_tdoa",
    "tdoa_grid",
    "frequency_grid",
    "steering_cos_sin",
    "steering_matrix",
    "coherence",
    "angular_spectrogram",
    "mean_angular_spectrum",
]

from gccnmf_tpu.ops import xprec as _xprec


def _HIGHEST():  # trace-time MXU precision policy (ops/xprec.py)
    return _xprec.get()


def max_tdoa(mic_separation_m: float) -> float:
    """Largest possible |TDOA| in seconds (reference gccNMFFunctions.py:50)."""
    return mic_separation_m / SPEED_OF_SOUND_M_S


def tdoa_grid(mic_separation_m: float, num_tdoas: int) -> np.ndarray:
    """Uniform TDOA candidate grid in seconds, ±max_tdoa inclusive."""
    m = max_tdoa(mic_separation_m)
    return np.linspace(-m, m, num_tdoas)


def frequency_grid(sample_rate: float, num_freq: int) -> np.ndarray:
    """rFFT bin center frequencies in Hz: linspace(0, sr/2, F)."""
    return np.linspace(0, sample_rate / 2.0, num_freq)


@functools.lru_cache(maxsize=None)
def steering_cos_sin(
    sample_rate: float, num_freq: int, mic_separation_m: float, num_tdoas: int
):
    """Real/imag parts of the steering matrix ``exp(-i 2π f τ)``.

    Returns ``(cos_m, sin_m)`` float32 arrays of shape ``(F, D)`` where the
    complex steering matrix is ``cos_m - 1j*sin_m``.
    """
    freqs = frequency_grid(sample_rate, num_freq)
    ang = 2.0 * np.pi * np.outer(freqs, tdoa_grid(mic_separation_m, num_tdoas))
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def steering_matrix(
    sample_rate: float, num_freq: int, mic_separation_m: float, num_tdoas: int
) -> np.ndarray:
    """Complex64 steering matrix ``(F, D)``: exp(-i 2π f τ_d)."""
    cos_m, sin_m = steering_cos_sin(sample_rate, num_freq, mic_separation_m, num_tdoas)
    return (cos_m - 1j * sin_m).astype(np.complex64)


def coherence(
    spec: jax.Array, eps: float = 0.0, guard_zeros: bool = False
) -> jax.Array:
    """PHAT-weighted cross-spectral coherence.

    ``spec``: ``(..., 2, T, F)`` complex stereo spectrogram →
    ``(..., T, F)`` complex coherence ``X0 · conj(X1) / (|X0||X1|)``
    (reference: runGCCNMF.py:44, realtime gccNMFProcessor.py:253).
    ``eps > 0`` regularizes the magnitude product (the reference divides
    unprotected, producing NaNs at exact zeros; pass 0 for bit-parity).
    ``guard_zeros`` maps exact-zero bins to 0 coherence instead of NaN —
    bit-identical on nonzero bins — for streaming paths where an
    all-zero block (an idle serving slot, digital silence in a WAV)
    would otherwise write a NaN row into the GCC-PHAT localization
    history and poison the windowed mean for the whole history length.
    """
    x0 = spec[..., 0, :, :]
    x1 = spec[..., 1, :, :]
    cross = x0 * jnp.conj(x1)
    denom = jnp.abs(x0) * jnp.abs(x1)
    if eps:
        denom = denom + eps
    if guard_zeros:
        ok = denom > 0.0
        return jnp.where(ok, cross / jnp.where(ok, denom, 1.0), 0.0)
    return cross / denom


def angular_spectrogram(
    coh: jax.Array, cos_m: jax.Array | np.ndarray, sin_m: jax.Array | np.ndarray
) -> jax.Array:
    """Angular spectrogram ``(..., T, D)`` from coherence ``(..., T, F)``.

    ``Re( Σ_f coh[t,f] · exp(-i 2π f τ_d) ) = Re(C)@cos + Im(C)@sin``
    — two real MXU GEMMs (reference computes this as a complex einsum then
    discards the imaginary part, gccNMFFunctions.py:92).
    """
    cos_m = jnp.asarray(cos_m, jnp.float32)
    sin_m = jnp.asarray(sin_m, jnp.float32)
    return jnp.matmul(jnp.real(coh), cos_m, precision=_HIGHEST()) + jnp.matmul(
        jnp.imag(coh), sin_m, precision=_HIGHEST()
    )


def mean_angular_spectrum(angular: jax.Array) -> jax.Array:
    """Time-averaged angular spectrum ``(..., D)``."""
    return jnp.mean(angular, axis=-2)
