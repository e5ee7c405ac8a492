"""Shared helpers for the Pallas TPU kernels.

One definition of the dtype-dispatched tile matmul that every fused kernel
uses: f32 operands run at ``Precision.HIGHEST`` (the parity numerics);
bf16-family modes quantize the GEMM operands only, accumulating in f32 on
the MXU. Previously copy-pasted in five kernels (frontend/nmf/synthesis/
enhance) — a precision fix in one had to be re-applied in each twin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["make_mm"]

_CONTRACT_LAST_FIRST = ((((1,), (0,))), ((), ()))


def make_mm(matmul_dtype):
    """Tile matmul ``(m, k) @ (k, n) -> (m, n) f32`` for a VMEM kernel.

    ``matmul_dtype == float32``: exact (``Precision.HIGHEST``).
    Otherwise: operands cast to ``matmul_dtype`` (bf16 family), f32
    accumulation via ``preferred_element_type``.
    """
    if jnp.dtype(matmul_dtype) == jnp.float32:

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, _CONTRACT_LAST_FIRST,
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

    else:
        md = jnp.dtype(matmul_dtype)

        def mm(a, b):
            return jax.lax.dot_general(
                a.astype(md), b.astype(md), _CONTRACT_LAST_FIRST,
                preferred_element_type=jnp.float32,
            )

    return mm
