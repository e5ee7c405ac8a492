"""Central MXU matmul-precision policy for the DSP GEMMs.

TPU fp32 matmuls are emulated with bf16 passes: ``HIGHEST`` ≈ 6 passes
(near-exact f32), ``HIGH`` = 3 passes (bf16x3, ~1e-6 relative error),
``DEFAULT`` = 1 pass (raw bf16 operands). The STFT/ISTFT/GCC/attribution
GEMMs are accuracy-sensitive enough that single-pass hurts, but bf16x3 is
audibly transparent: end-to-end separation at ``high`` agrees with
``highest`` to ~50 dB SI-SDR while running ~12% faster overall (measured
on v5e, batch 128). Policy:

- ``auto`` (default): ``high`` on TPU, ``highest`` elsewhere (CPU ignores
  precision, so oracle-parity tests always see exact f32).
- Override with ``GCCNMF_TPU_MATMUL_PRECISION=(default|high|highest)`` or
  :func:`set_matmul_precision` — **before building models**: the policy is
  read at trace time, and jit caches are keyed on model instances, not on
  this setting.

The KL-NMF inner loop has its own independent knob
(``kl_nmf_pallas(matmul_dtype=...)``; see ops/nmf_pallas.py) because its
multiplicative updates tolerate single-pass bf16.
"""

from __future__ import annotations

import os

import jax

__all__ = ["get", "set_matmul_precision", "current_level"]

_LEVELS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

_level: str | None = None  # resolved lazily


def _resolve() -> str:
    env = os.environ.get("GCCNMF_TPU_MATMUL_PRECISION", "auto").lower()
    if env != "auto":
        if env not in _LEVELS:
            raise ValueError(
                f"GCCNMF_TPU_MATMUL_PRECISION={env!r}: want default|high|highest"
            )
        return env
    return "high" if jax.default_backend() == "tpu" else "highest"


def current_level() -> str:
    global _level
    if _level is None:
        _level = _resolve()
    return _level


def set_matmul_precision(level: str) -> None:
    """Set the DSP GEMM precision ('default' | 'high' | 'highest').

    Call before constructing models — already-traced programs keep the
    precision they were traced with.
    """
    if level not in _LEVELS:
        raise ValueError(f"unknown precision level: {level!r}")
    global _level
    _level = level


def get() -> jax.lax.Precision:
    """The precision to pass to matmul/einsum/conv in DSP kernels."""
    return _LEVELS[current_level()]
