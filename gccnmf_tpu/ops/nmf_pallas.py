"""Pallas TPU kernel: fused KL-NMF multiplicative-update loop.

The XLA formulation (:func:`gccnmf_tpu.ops.nmf.kl_nmf`) streams V, Q and
W·H through HBM every iteration (~30 MB per iteration per problem at the
reference's offline shape), which makes the 100-iteration loop
bandwidth-bound. This kernel keeps the whole problem resident in VMEM —
V ``(T, F)``, W ``(F, K)``, H ``(T, K)`` all fit comfortably for the
reference configuration (T≈2500, F=513, K=128 ⇒ ≈8 MB) — and runs every
iteration out of on-chip memory: HBM is touched exactly once on the way
in and once on the way out.

Grid: one program per batch element (the offline pipeline vmaps over
utterances). Shapes are padded host-side to TPU tile multiples
(T → ×16, F → ×128, K → ×128) with ``epsilon`` magnitudes so the
multiplicative updates stay strictly positive (exact zeros would produce
0/0 in the V/WH ratio); the padding columns/rows carry ~epsilon² weight
and are sliced off on return.

Update rules and atom renormalization follow the reference exactly
(reference: gccNMF/gccNMFFunctions.py:69-83); parity with the XLA path is
tested to ~1e-5 relative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["kl_nmf_pallas", "pad_to_multiple"]


def pad_to_multiple(x: np.ndarray | jax.Array, axis: int, multiple: int,
                    value: float):
    """Pad ``axis`` up to the next multiple of ``multiple`` with ``value``."""
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value), size


def _nmf_kernel(num_iterations, sparsity_alpha, epsilon, matmul_dtype,
                v_ref, w0_ref, h0_ref, w_out_ref, h_out_ref):
    if matmul_dtype in ("bfloat16_q", "bfloat16_q_simul"):
        return _nmf_kernel_bf16q(
            num_iterations, sparsity_alpha, epsilon,
            v_ref, w0_ref, h0_ref, w_out_ref, h_out_ref,
            shared_q=(matmul_dtype == "bfloat16_q_simul"),
        )
    v = v_ref[:]
    # Two GEMM modes (all accumulation and multiplicative state stay f32):
    # - "bfloat16": operands quantized to bf16, single-pass MXU issue —
    #   Mosaic's own default lowering for f32 dots, measured bit-identical
    #   to leaving operands f32 without a precision request. The ~0.4%
    #   operand quantization perturbs the update trajectory, not the KL
    #   fixed-point structure (validated in test_nmf_pallas).
    # - "float32": true f32 GEMMs via Precision.HIGHEST (bf16x-pass
    #   decomposition) — the oracle-parity trajectory, ~= the XLA path.
    # All GEMMs are expressed as dot_general with explicit contraction
    # dimension numbers rather than jnp.dot on transposed operands:
    # materializing q.T — a (T, F) VMEM transpose, ~6 MB at the reference
    # shape — every iteration costs ~13% of kernel time (measured
    # benchmarks/nmf_variants.py: 297 → 259 ms at batch 128×100 iters,
    # bit-identical results). dims = ((lhs_contract,), (rhs_contract,)).
    if jnp.dtype(matmul_dtype) == jnp.float32:

        def mm(a, b, dims):
            return jax.lax.dot_general(
                a, b, (dims, ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
    else:
        md = jnp.dtype(matmul_dtype)

        def mm(a, b, dims):
            return jax.lax.dot_general(
                a.astype(md), b.astype(md), (dims, ((), ())),
                preferred_element_type=jnp.float32,
            )

    # ε-padded rows/columns underflow to exact 0 over iterations; naive
    # guards like ``maximum(x, tiny)`` are defeated by XLA algebraic
    # rewrites under jit (e.g. a/max(sqrt(s),t) → a·rsqrt(s), rsqrt(0)=inf
    # → 0·inf=NaN). The double-where pattern survives rewrites: degenerate
    # denominators take an explicit 0 branch, never an inf. Real (unpadded)
    # rows never hit the 0 branch, so results there are bit-identical.
    tiny = 1e-30

    def safe_div(a, b):
        ok = b > tiny
        return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)

    def body(_, wh):
        w, h = wh
        # H update; (T,K)·(F,K) contracting K ≡ h @ w.T, no transpose
        q = safe_div(v, mm(h, w, ((1,), (1,))))
        h = h * mm(q, w, ((1,), (0,))) / (
            jnp.sum(w, axis=0, keepdims=True) + sparsity_alpha + epsilon
        )
        # W update; (T,F)·(T,K) contracting T ≡ q.T @ h, no transpose
        q = safe_div(v, mm(h, w, ((1,), (1,))))
        num = mm(q, h, ((0,), (0,)))  # (F, K)
        w = w * safe_div(num, jnp.sum(h, axis=0, keepdims=True))
        # per-atom unit-L2 renorm, H compensated
        norms = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
        return safe_div(w, norms), h * norms

    w, h = jax.lax.fori_loop(
        0, num_iterations, body, (w0_ref[:], h0_ref[:])
    )
    w_out_ref[:] = w
    h_out_ref[:] = h


def _nmf_kernel_bf16q(num_iterations, sparsity_alpha, epsilon,
                      v_ref, w0_ref, h0_ref, w_out_ref, h_out_ref,
                      shared_q=False):
    """Aggressive-throughput variant: V resident in bf16 and the ratio
    q = V/WH built as V times approx-reciprocal(WH) — the reciprocal runs
    on the f32 GEMM accumulation, the product in bf16, and the GEMMs
    consume q with no cast. W/H state, row sums, and GEMM
    accumulation stay f32. Measured 1.30x over the bf16-GEMM mode at the
    reference shape (benchmarks/nmf_variants.py, batch 128 x 100 iters)
    with ~4% max relative W trajectory drift — a different but equally
    valid KL stationary point, not a degradation (the reference itself,
    gccNMF/gccNMFFunctions.py:69-83, runs plain f32 with no precision
    guarantee).

    ``shared_q`` (the "bfloat16_q_simul" turbo mode): ONE Q = V/WH per
    iteration feeds both updates, with the W update built from pre-update
    H statistics — simultaneous (Jacobi-style) multiplicative updates: 3
    GEMMs + 1 big divide per iteration instead of the reference's 4 + 2.
    Measured 1.26x over "bfloat16_q"; a different algorithm (opt-in, never
    the parity path), quality-gated end-to-end in tests/test_nmf_pallas."""
    from jax.experimental import pallas as pl

    bf = jnp.bfloat16
    v = v_ref[:].astype(bf)
    tiny = 1e-30

    def safe_div_bf(a, b):
        # q = a·(1/b) with the VPU's approximate-reciprocal unit instead of
        # a true divide. b is the raw f32 GEMM accumulation (no bf16 round
        # trip before the reciprocal); the ~2^-12 reciprocal error sits
        # below the bf16 quantization of q itself. Measured on v5e at the
        # reference shape (batch 128 × 100 iters, interleaved A/B):
        # bf16_q 138.7 → 132.4 ms, turbo 117.6 → 113.6 ms (~1.04×), max W
        # drift 2.4% — inside the ~4% trajectory tolerance these modes
        # already carry. Applying the same trick to the (·,K)-row divides
        # (H/W denominators, atom renorm) measured 1.00×: dead end, the
        # planes there are 5–20× smaller.
        ok = b > tiny
        r = pl.reciprocal(jnp.where(ok, b, 1.0), approx=True).astype(bf)
        return jnp.where(ok, a * r, bf(0.0))

    def safe_div(a, b):
        ok = b > tiny
        return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)

    def mm(a, b, dims):
        return jax.lax.dot_general(
            a.astype(bf), b.astype(bf), (dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dg(a, b, dims):
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=jnp.float32
        )

    # loop-invariant L1 mass of V for the shared-Q scale calibration
    v_sum = jnp.sum(v.astype(jnp.float32))

    def body(_, wh):
        w, h = wh
        wbf = w.astype(bf)
        q = safe_div_bf(v, mm(h, w, ((1,), (1,))))
        h_new = h * dg(q, wbf, ((1,), (0,))) / (
            jnp.sum(w, axis=0, keepdims=True) + sparsity_alpha + epsilon
        )
        if shared_q:
            # pre-update H rides the SAME Q: no second WH/divide. Both
            # updates then apply the same gain correction (double-counted
            # → scale overshoot), so recalibrate the global scale in
            # closed form: Σ(WH) = Σ_k (Σ_f W)·(Σ_t H), O(K) from the row
            # sums — H absorbs the factor that makes Σ(WH) = Σ(V).
            h_for_w = h
        else:
            h_for_w = h_new
            q = safe_div_bf(v, mm(h_new, w, ((1,), (1,))))
        num = dg(q, h_for_w.astype(bf), ((0,), (0,)))
        w = w * safe_div(num, jnp.sum(h_for_w, axis=0, keepdims=True))
        norms = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
        w, h_new = safe_div(w, norms), h_new * norms
        if shared_q:
            mass = jnp.sum(jnp.sum(w, axis=0) * jnp.sum(h_new, axis=0))
            gain = jnp.where(mass > tiny, v_sum / jnp.where(mass > tiny, mass, 1.0), 1.0)
            h_new = h_new * gain
        return w, h_new

    w, h = jax.lax.fori_loop(0, num_iterations, body, (w0_ref[:], h0_ref[:]))
    w_out_ref[:] = w
    h_out_ref[:] = h


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_iterations", "sparsity_alpha", "epsilon", "matmul_dtype", "interpret"
    ),
)
def kl_nmf_pallas(
    v: jax.Array,
    w0: jax.Array,
    h0: jax.Array,
    num_iterations: int,
    sparsity_alpha: float = 0.0,
    epsilon: float = 1e-16,
    matmul_dtype: str = "bfloat16",
    interpret: bool = False,
):
    """Fused-VMEM KL-NMF. ``v``: (..., T, F); ``w0``: (..., F, K);
    ``h0``: (..., T, K); leading batch dims are mapped to the Pallas grid.
    Returns (W, H) matching :func:`gccnmf_tpu.ops.nmf.kl_nmf`.

    ``matmul_dtype`` picks the loop numerics:
    - ``"bfloat16_q"`` (pipeline default): GEMM operands bf16 AND V/q
      resident in bf16 (W/H state + accumulation f32) — 1.30x over
      "bfloat16" at the reference shape, identical e2e separation quality
      (same localization, 31.44 vs 31.43 dB min SNR vs the NumPy oracle);
    - ``"bfloat16"``: operands quantized to bf16 at each GEMM, everything
      else f32 (what Mosaic lowers un-annotated f32 dots to anyway);
    - ``"float32"``: Precision.HIGHEST GEMMs for trajectory parity with
      the XLA/NumPy oracle (max rel deviation ~2e-3 after 30 iterations,
      e2e separation output unaffected at >130 dB SI-SDR agreement).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # Mosaic is TPU-only; CPU runs use the interpreter

    batch = v.shape[:-2]
    t, f_v = v.shape[-2:]  # V may arrive lane-padded wider than F
    f = w0.shape[-2]  # true bin count from the dictionary
    if f_v < f:
        raise ValueError("V has fewer frequency bins than W")
    k = w0.shape[-1]
    # A bf16 V plane (the fused front-end's throughput currency) stays
    # bf16 in HBM and VMEM when the loop is going to quantize it anyway
    # ("bfloat16_q" keeps V resident in bf16): half the HBM read and half
    # the VMEM footprint, zero extra quantization. Other modes keep their
    # f32 trajectory: upcast at the boundary.
    keep_bf16 = (
        v.dtype == jnp.bfloat16
        and matmul_dtype in ("bfloat16_q", "bfloat16_q_simul")
    )
    v_dt = jnp.bfloat16 if keep_bf16 else jnp.float32
    v2 = v.reshape((-1, t, f_v)).astype(v_dt)
    w2 = w0.reshape((-1, f, k)).astype(jnp.float32)
    h2 = h0.reshape((-1, t, k)).astype(jnp.float32)
    b = v2.shape[0]

    # pad to TPU tile multiples with epsilon (strict positivity; V planes
    # from the fused front-end arrive pre-padded with exact zeros — zero
    # columns are inert through the guarded updates). T pads to x16 (the
    # bf16 sublane tile; also a valid f32 tile) so both V dtypes share
    # one layout.
    v2, _ = pad_to_multiple(v2, 1, 16, epsilon)
    v2, _ = pad_to_multiple(v2, 2, 128, epsilon)
    fp = v2.shape[2]
    w2, _ = pad_to_multiple(w2, 1, fp, epsilon)  # match V's padded bins
    w2, _ = pad_to_multiple(w2, 2, 128, epsilon)
    h2, _ = pad_to_multiple(h2, 1, 16, epsilon)  # T pad must match V's
    h2, _ = pad_to_multiple(h2, 2, 128, epsilon)
    tp = v2.shape[1]
    kp = w2.shape[2]

    kernel = functools.partial(
        _nmf_kernel, num_iterations, sparsity_alpha, epsilon, matmul_dtype
    )
    grid = (b,)
    spec3 = lambda shape: pl.BlockSpec(
        (1, *shape), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    w_out, h_out = pl.pallas_call(
        lambda v_r, w_r, h_r, wo_r, ho_r: kernel(
            v_r.at[0], w_r.at[0], h_r.at[0], wo_r.at[0], ho_r.at[0]
        ),
        grid=grid,
        in_specs=[spec3((tp, fp)), spec3((fp, kp)), spec3((tp, kp))],
        out_specs=(spec3((fp, kp)), spec3((tp, kp))),
        out_shape=(
            jax.ShapeDtypeStruct((b, fp, kp), jnp.float32),
            jax.ShapeDtypeStruct((b, tp, kp), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * num_iterations * tp * fp * kp,
            bytes_accessed=b * (
                v2.dtype.itemsize * tp * fp + 8 * (fp * kp + tp * kp)
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(v2, w2, h2)
    w_res = w_out[:, :f, :k].reshape(*batch, f, k)
    h_res = h_out[:, :t, :k].reshape(*batch, t, k)
    return w_res, h_res
