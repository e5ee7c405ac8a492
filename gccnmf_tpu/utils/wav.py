"""Host-side WAV I/O and PCM <-> float conversion.

Matches the reference's numeric conventions so waveform parity holds end
to end (reference: gccNMF/wavfile.py):

- PCM -> float: ``(x - offset) / 2^(bits-1)`` with ``offset = min + 2^(bits-1)``
  (wavfile.py:86-89), i.e. int16 maps to [-1, 1).
- float -> PCM: scale by ``2^(bits-1)``, clip to the integer range
  (wavfile.py:128-131). No dithering.
- clip protection on write: if max |x| >= 1, rescale to 0.99 with a warning
  (wavfile.py:32,40-44).

Channel convention: ``read_wav`` returns ``(channels, n)`` float32.
"""

from __future__ import annotations

import logging

import numpy as np
from scipy.io import wavfile as _sp_wavfile

logger = logging.getLogger(__name__)

CLIP_PROTECTION_MAX = 0.99

__all__ = ["pcm_to_float", "float_to_pcm", "read_wav", "write_wav"]


def pcm_to_float(sig: np.ndarray, dtype="float32") -> np.ndarray:
    """Integer PCM -> float in [-1, 1)."""
    sig = np.asarray(sig)
    if sig.dtype.kind not in "iu":
        raise TypeError("pcm_to_float expects an integer array")
    info = np.iinfo(sig.dtype)
    half_range = 2 ** (info.bits - 1)
    offset = info.min + half_range
    return (sig.astype(dtype) - offset) / half_range


def float_to_pcm(sig: np.ndarray, dtype="int16") -> np.ndarray:
    """Float in [-1, 1) -> integer PCM, clipped to the target range."""
    sig = np.asarray(sig)
    if sig.dtype.kind != "f":
        raise TypeError("float_to_pcm expects a float array")
    info = np.iinfo(np.dtype(dtype))
    half_range = 2 ** (info.bits - 1)
    offset = info.min + half_range
    return (sig * half_range + offset).clip(info.min, info.max).astype(dtype)


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV file -> ``((channels, n) float32, sample_rate)``."""
    sample_rate, pcm = _sp_wavfile.read(path)
    if pcm.dtype.kind == "f":
        samples = pcm.astype(np.float32)
    else:
        samples = pcm_to_float(pcm)
    return samples.T, sample_rate


def write_wav(
    samples: np.ndarray, path: str, sample_rate: int, clip_protection: bool = True
) -> None:
    """Write ``(channels, n)`` float32 samples to 16-bit PCM WAV."""
    samples = np.asarray(samples)
    max_abs = np.max(np.abs(samples)) if samples.size else 0.0
    if max_abs >= 1.0:
        if not clip_protection:
            raise ValueError("write_wav: max abs sample value exceeds 1")
        logger.warning(
            "write_wav: max abs sample %.3f exceeds 1, rescaling to %.2f",
            max_abs,
            CLIP_PROTECTION_MAX,
        )
        samples = samples / max_abs * CLIP_PROTECTION_MAX
    _sp_wavfile.write(path, sample_rate, float_to_pcm(samples.astype(np.float32)).T)
