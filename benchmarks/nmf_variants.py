"""Microbenchmark: NMF Pallas kernel GEMM formulations.

Compares the shipped kernel against a dot_general formulation that avoids
materializing ``q.T`` (a (T, F) VMEM transpose per iteration) and ``w.T``,
by expressing the transposed GEMMs with contraction dimension numbers the
MXU consumes directly.

Run on TPU; prints one JSON line per variant.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _dg(a, b, dims, md):
    return jax.lax.dot_general(
        a.astype(md), b.astype(md), (dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _nmf_kernel_dg(num_iterations, sparsity_alpha, epsilon, matmul_dtype,
                   v_ref, w0_ref, h0_ref, w_out_ref, h_out_ref):
    v = v_ref[:]
    md = jnp.dtype(matmul_dtype)
    tiny = 1e-30

    def safe_div(a, b):
        ok = b > tiny
        return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)

    def body(_, wh):
        w, h = wh
        # (T,K)·(F,K) contracting K ≡ h @ w.T, no transpose materialized
        q = safe_div(v, _dg(h, w, ((1,), (1,)), md))
        h = h * _dg(q, w, ((1,), (0,)), md) / (
            jnp.sum(w, axis=0, keepdims=True) + sparsity_alpha + epsilon
        )
        q = safe_div(v, _dg(h, w, ((1,), (1,)), md))
        # (T,F)·(T,K) contracting T ≡ q.T @ h, no transpose materialized
        num = _dg(q, h, ((0,), (0,)), md)
        w = w * safe_div(num, jnp.sum(h, axis=0, keepdims=True))
        norms = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
        return safe_div(w, norms), h * norms

    w, h = jax.lax.fori_loop(0, num_iterations, body, (w0_ref[:], h0_ref[:]))
    w_out_ref[:] = w
    h_out_ref[:] = h


@functools.partial(jax.jit, static_argnames=("num_iterations",))
def kl_nmf_dg(v, w0, h0, num_iterations):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gccnmf_tpu.ops.nmf_pallas import pad_to_multiple

    eps = 1e-16
    b, t, f = v.shape
    k = w0.shape[-1]
    v2, _ = pad_to_multiple(v.astype(jnp.float32), 1, 8, eps)
    v2, _ = pad_to_multiple(v2, 2, 128, eps)
    w2, _ = pad_to_multiple(w0.astype(jnp.float32), 1, 128, eps)
    w2, _ = pad_to_multiple(w2, 2, 128, eps)
    h2, _ = pad_to_multiple(h0.astype(jnp.float32), 1, 8, eps)
    h2, _ = pad_to_multiple(h2, 2, 128, eps)
    tp, fp = v2.shape[1:]
    kp = w2.shape[2]

    kernel = functools.partial(_nmf_kernel_dg, num_iterations, 0.0, eps,
                               "bfloat16")
    spec3 = lambda shape: pl.BlockSpec(
        (1, *shape), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    w_out, h_out = pl.pallas_call(
        lambda v_r, w_r, h_r, wo_r, ho_r: kernel(
            v_r.at[0], w_r.at[0], h_r.at[0], wo_r.at[0], ho_r.at[0]
        ),
        grid=(b,),
        in_specs=[spec3((tp, fp)), spec3((fp, kp)), spec3((tp, kp))],
        out_specs=(spec3((fp, kp)), spec3((tp, kp))),
        out_shape=(
            jax.ShapeDtypeStruct((b, fp, kp), jnp.float32),
            jax.ShapeDtypeStruct((b, tp, kp), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(v2, w2, h2)
    return w_out[:, :f, :k], h_out[:, :t, :k]


def _nmf_kernel_fmajor(num_iterations, sparsity_alpha, epsilon, matmul_dtype,
                       v_ref, w0_ref, h0_ref, w_out_ref, h_out_ref):
    """F-major layout: V (F,T), W (F,K), H (K,T).

    F sits in the sublane (second-minor) dim so its pad is ×8 (513→520)
    instead of ×128 (513→640): ~17% fewer MXU flops and VPU elementwise
    lanes per iteration at the reference shape.

    MEASURED (v5e, batch 128 × 100 iters): 961 ms vs 259 ms shipped —
    3.7× SLOWER despite the flop savings. Mosaic lowers the (K,T)-output
    GEMMs and the sublane-broadcast denominators far worse than the
    T-major orientation; kept here as a documented negative result.
    """
    v = v_ref[:]
    md = jnp.dtype(matmul_dtype)
    tiny = 1e-30

    def safe_div(a, b):
        ok = b > tiny
        return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)

    def body(_, wh):
        w, h = wh
        # WH: (F,K)·(K,T) → (F,T)
        q = safe_div(v, _dg(w, h, ((1,), (0,)), md))
        # H numerator: Wᵀ·q → (K,T), contracting F
        h = h * _dg(w, q, ((0,), (0,)), md) / (
            jnp.sum(w, axis=0)[:, None] + sparsity_alpha + epsilon
        )
        q = safe_div(v, _dg(w, h, ((1,), (0,)), md))
        # W numerator: q·Hᵀ → (F,K), contracting T
        num = _dg(q, h, ((1,), (1,)), md)
        w = w * safe_div(num, jnp.sum(h, axis=1)[None, :])
        norms = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
        return safe_div(w, norms), h * norms.reshape(-1, 1)

    w, h = jax.lax.fori_loop(0, num_iterations, body, (w0_ref[:], h0_ref[:]))
    w_out_ref[:] = w
    h_out_ref[:] = h


@functools.partial(jax.jit, static_argnames=("num_iterations",))
def kl_nmf_fmajor(v, w0, h0, num_iterations):
    """v: (B,T,F), w0: (B,F,K), h0: (B,T,K) — transposed to F-major at the
    boundary (one-time XLA transposes, not per-iteration)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gccnmf_tpu.ops.nmf_pallas import pad_to_multiple

    eps = 1e-16
    b, t, f = v.shape
    k = w0.shape[-1]
    v2 = jnp.swapaxes(v.astype(jnp.float32), 1, 2)      # (B,F,T)
    h2 = jnp.swapaxes(h0.astype(jnp.float32), 1, 2)     # (B,K,T)
    w2 = w0.astype(jnp.float32)                          # (B,F,K)
    v2, _ = pad_to_multiple(v2, 1, 8, eps)
    v2, _ = pad_to_multiple(v2, 2, 128, eps)
    w2, _ = pad_to_multiple(w2, 1, 8, eps)
    w2, _ = pad_to_multiple(w2, 2, 128, eps)
    h2, _ = pad_to_multiple(h2, 1, 8, eps)
    h2, _ = pad_to_multiple(h2, 2, 128, eps)
    fp, tp = v2.shape[1:]
    kp = w2.shape[2]

    kernel = functools.partial(_nmf_kernel_fmajor, num_iterations, 0.0, eps,
                               "bfloat16")
    spec3 = lambda shape: pl.BlockSpec(
        (1, *shape), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    w_out, h_out = pl.pallas_call(
        lambda v_r, w_r, h_r, wo_r, ho_r: kernel(
            v_r.at[0], w_r.at[0], h_r.at[0], wo_r.at[0], ho_r.at[0]
        ),
        grid=(b,),
        in_specs=[spec3((fp, tp)), spec3((fp, kp)), spec3((kp, tp))],
        out_specs=(spec3((fp, kp)), spec3((kp, tp))),
        out_shape=(
            jax.ShapeDtypeStruct((b, fp, kp), jnp.float32),
            jax.ShapeDtypeStruct((b, kp, tp), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(v2, w2, h2)
    return w_out[:, :f, :k], jnp.swapaxes(h_out[:, :k, :t], 1, 2)


def _nmf_kernel_interleaved(num_iterations, sparsity_alpha, epsilon,
                            matmul_dtype, ways,
                            v_ref, w0_ref, h0_ref, w_out_ref, h_out_ref):
    """``ways`` independent problems per program, updates interleaved in one
    loop body. The single-problem kernel is a serial dependency chain
    (GEMM → big (T,F) divide → GEMM …) so the MXU idles during VPU work
    and vice versa; interleaving gives the scheduler independent chains
    to overlap."""
    md = jnp.dtype(matmul_dtype)
    tiny = 1e-30

    def safe_div(a, b):
        ok = b > tiny
        return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)

    vs = [v_ref[i] for i in range(ways)]

    def one(v, w, h):
        q = safe_div(v, _dg(h, w, ((1,), (1,)), md))
        h = h * _dg(q, w, ((1,), (0,)), md) / (
            jnp.sum(w, axis=0, keepdims=True) + sparsity_alpha + epsilon
        )
        q = safe_div(v, _dg(h, w, ((1,), (1,)), md))
        num = _dg(q, h, ((0,), (0,)), md)
        w = w * safe_div(num, jnp.sum(h, axis=0, keepdims=True))
        norms = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
        return safe_div(w, norms), h * norms

    def body(_, whs):
        return tuple(one(vs[i], *whs[i]) for i in range(ways))

    whs = jax.lax.fori_loop(
        0, num_iterations, body,
        tuple((w0_ref[i], h0_ref[i]) for i in range(ways)),
    )
    for i in range(ways):
        w_out_ref[i] = whs[i][0]
        h_out_ref[i] = whs[i][1]


@functools.partial(jax.jit, static_argnames=("num_iterations", "ways"))
def kl_nmf_interleaved(v, w0, h0, num_iterations, ways=2):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gccnmf_tpu.ops.nmf_pallas import pad_to_multiple

    eps = 1e-16
    b, t, f = v.shape
    k = w0.shape[-1]
    v2, _ = pad_to_multiple(v.astype(jnp.float32), 1, 8, eps)
    v2, _ = pad_to_multiple(v2, 2, 128, eps)
    w2, _ = pad_to_multiple(w0.astype(jnp.float32), 1, 128, eps)
    w2, _ = pad_to_multiple(w2, 2, 128, eps)
    h2, _ = pad_to_multiple(h0.astype(jnp.float32), 1, 8, eps)
    h2, _ = pad_to_multiple(h2, 2, 128, eps)
    tp, fp = v2.shape[1:]
    kp = w2.shape[2]
    assert b % ways == 0

    kernel = functools.partial(_nmf_kernel_interleaved, num_iterations, 0.0,
                               eps, "bfloat16", ways)
    spec3 = lambda shape: pl.BlockSpec(
        (ways, *shape), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    w_out, h_out = pl.pallas_call(
        kernel,
        grid=(b // ways,),
        in_specs=[spec3((tp, fp)), spec3((fp, kp)), spec3((tp, kp))],
        out_specs=(spec3((fp, kp)), spec3((tp, kp))),
        out_shape=(
            jax.ShapeDtypeStruct((b, fp, kp), jnp.float32),
            jax.ShapeDtypeStruct((b, tp, kp), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )(v2, w2, h2)
    return w_out[:, :f, :k], h_out[:, :t, :k]


def _nmf_kernel_bf16q(num_iterations, sparsity_alpha, epsilon,
                      v_ref, w0_ref, h0_ref, w_out_ref, h_out_ref):
    """q = V/WH computed directly in bf16: V resident in bf16, WH cast once,
    divide and guard selects run at 2x VPU lanes, and the GEMMs consume q
    with no further cast. W/H state and accumulation stay f32."""
    bf = jnp.bfloat16
    v = v_ref[:].astype(bf)
    tiny = 1e-30

    def safe_div_bf(a, b):
        # Mosaic can't cmpf bf16 on this target; compare in f32.
        ok = b.astype(jnp.float32) > tiny
        return jnp.where(ok, a / jnp.where(ok, b, bf(1.0)), bf(0.0))

    def safe_div(a, b):
        ok = b > tiny
        return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)

    def body(_, wh):
        w, h = wh
        wbf = w.astype(bf)
        hbf = h.astype(bf)
        q = safe_div_bf(v, _dg(hbf, wbf, ((1,), (1,)), bf).astype(bf))
        h = h * _dg(q, wbf, ((1,), (0,)), bf) / (
            jnp.sum(w, axis=0, keepdims=True) + sparsity_alpha + epsilon
        )
        hbf = h.astype(bf)
        q = safe_div_bf(v, _dg(hbf, wbf, ((1,), (1,)), bf).astype(bf))
        num = _dg(q, hbf, ((0,), (0,)), bf)
        w = w * safe_div(num, jnp.sum(h, axis=0, keepdims=True))
        norms = jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
        return safe_div(w, norms), h * norms

    w, h = jax.lax.fori_loop(0, num_iterations, body, (w0_ref[:], h0_ref[:]))
    w_out_ref[:] = w
    h_out_ref[:] = h


@functools.partial(jax.jit, static_argnames=("num_iterations",))
def kl_nmf_bf16q(v, w0, h0, num_iterations):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gccnmf_tpu.ops.nmf_pallas import pad_to_multiple

    eps = 1e-16
    b, t, f = v.shape
    k = w0.shape[-1]
    v2, _ = pad_to_multiple(v.astype(jnp.float32), 1, 8, eps)
    v2, _ = pad_to_multiple(v2, 2, 128, eps)
    w2, _ = pad_to_multiple(w0.astype(jnp.float32), 1, 128, eps)
    w2, _ = pad_to_multiple(w2, 2, 128, eps)
    h2, _ = pad_to_multiple(h0.astype(jnp.float32), 1, 8, eps)
    h2, _ = pad_to_multiple(h2, 2, 128, eps)
    tp, fp = v2.shape[1:]
    kp = w2.shape[2]

    kernel = functools.partial(_nmf_kernel_bf16q, num_iterations, 0.0, eps)
    spec3 = lambda shape: pl.BlockSpec(
        (1, *shape), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    w_out, h_out = pl.pallas_call(
        lambda v_r, w_r, h_r, wo_r, ho_r: kernel(
            v_r.at[0], w_r.at[0], h_r.at[0], wo_r.at[0], ho_r.at[0]
        ),
        grid=(b,),
        in_specs=[spec3((tp, fp)), spec3((fp, kp)), spec3((tp, kp))],
        out_specs=(spec3((fp, kp)), spec3((tp, kp))),
        out_shape=(
            jax.ShapeDtypeStruct((b, fp, kp), jnp.float32),
            jax.ShapeDtypeStruct((b, tp, kp), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(v2, w2, h2)
    return w_out[:, :f, :k], h_out[:, :t, :k]


def _nmf_kernel_simul(num_iterations, sparsity_alpha, epsilon,
                      v_ref, w0_ref, h0_ref, w_out_ref, h_out_ref):
    """Shared-Q ("simultaneous"/Jacobi) multiplicative updates: ONE
    Q = V/WH per iteration feeds both the H and the W update (the W update
    uses pre-update H statistics). 3 GEMMs + 1 big divide per iteration
    instead of the reference's 4 + 2 — a different algorithm, probed as an
    opt-in turbo mode, not a parity path. bf16_q numerics (V/q bf16,
    state + accumulation f32) to compare against the production mode."""
    bf = jnp.bfloat16
    v = v_ref[:].astype(bf)
    tiny = 1e-30

    def safe_div_bf(a, b):
        ok = b.astype(jnp.float32) > tiny
        return jnp.where(ok, a / jnp.where(ok, b, bf(1.0)), bf(0.0))

    def safe_div(a, b):
        ok = b > tiny
        return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)

    def mm(a, b, dims):
        return jax.lax.dot_general(
            a.astype(bf), b.astype(bf), (dims, ((), ())),
            preferred_element_type=jnp.float32,
        )

    def body(_, wh):
        w, h = wh
        q = safe_div_bf(v, mm(h, w, ((1,), (1,))).astype(bf))
        h_new = h * jax.lax.dot_general(
            q, w.astype(bf), ((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.float32,
        ) / (jnp.sum(w, axis=0, keepdims=True) + sparsity_alpha + epsilon)
        num = jax.lax.dot_general(
            q, h.astype(bf), ((((0,), (0,))), ((), ())),
            preferred_element_type=jnp.float32,
        )
        w_new = w * safe_div(num, jnp.sum(h, axis=0, keepdims=True))
        norms = jnp.sqrt(jnp.sum(w_new * w_new, axis=0, keepdims=True))
        return safe_div(w_new, norms), h_new * norms

    w, h = jax.lax.fori_loop(0, num_iterations, body, (w0_ref[:], h0_ref[:]))
    w_out_ref[:] = w
    h_out_ref[:] = h


@functools.partial(jax.jit, static_argnames=("num_iterations",))
def kl_nmf_simul(v, w0, h0, num_iterations):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gccnmf_tpu.ops.nmf_pallas import pad_to_multiple

    eps = 1e-16
    b, t, f = v.shape
    k = w0.shape[-1]
    v2, _ = pad_to_multiple(v.astype(jnp.float32), 1, 16, eps)
    v2, _ = pad_to_multiple(v2, 2, 128, eps)
    w2, _ = pad_to_multiple(w0.astype(jnp.float32), 1, v2.shape[2], eps)
    w2, _ = pad_to_multiple(w2, 2, 128, eps)
    h2, _ = pad_to_multiple(h0.astype(jnp.float32), 1, 16, eps)
    h2, _ = pad_to_multiple(h2, 2, 128, eps)
    tp, fp = v2.shape[1:]
    kp = w2.shape[2]

    kernel = functools.partial(_nmf_kernel_simul, num_iterations, 0.0, eps)
    spec3 = lambda shape: pl.BlockSpec(
        (1, *shape), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    w_out, h_out = pl.pallas_call(
        lambda v_r, w_r, h_r, wo_r, ho_r: kernel(
            v_r.at[0], w_r.at[0], h_r.at[0], wo_r.at[0], ho_r.at[0]
        ),
        grid=(b,),
        in_specs=[spec3((tp, fp)), spec3((fp, kp)), spec3((tp, kp))],
        out_specs=(spec3((fp, kp)), spec3((tp, kp))),
        out_shape=(
            jax.ShapeDtypeStruct((b, fp, kp), jnp.float32),
            jax.ShapeDtypeStruct((b, tp, kp), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(v2, w2, h2)
    return w_out[:, :f, :k], h_out[:, :t, :k]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from gccnmf_tpu.ops import nmf
    from gccnmf_tpu.ops.nmf_pallas import kl_nmf_pallas

    t, f, k = 2500, 513, 128
    rng = np.random.default_rng(0)
    v = jnp.asarray(np.abs(rng.standard_normal((args.batch, t, f))).astype(np.float32) + 1e-3)
    w0, h0 = nmf.nmf_init_numpy(f, k, t)
    w0 = jnp.broadcast_to(jnp.asarray(w0), (args.batch, f, k))
    h0 = jnp.broadcast_to(jnp.asarray(h0), (args.batch, t, k))

    # reuse bench.py's fence + async-queued timing (fencing INSIDE the loop
    # pays the ~30 ms tunnel round trip per repeat, understating every
    # variant and skewing the speedup ratios)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    def timed(fn):
        out = fn()
        bench._fence(out)
        return bench._timed_loop(fn, args.repeats), out

    dt0, (w_a, h_a) = timed(lambda: kl_nmf_pallas(v, w0, h0, args.iters))
    print(json.dumps(dict(variant="shipped(jnp.dot+T)", ms=round(dt0 * 1e3, 2))))

    dt1, (w_b, h_b) = timed(lambda: kl_nmf_dg(v, w0, h0, args.iters))
    print(json.dumps(dict(variant="dot_general", ms=round(dt1 * 1e3, 2),
                          speedup=round(dt0 / dt1, 3))))

    rel = float(jnp.max(jnp.abs(w_a - w_b) / (jnp.abs(w_a) + 1e-12)))
    print(json.dumps(dict(check="max_rel_w_diff", value=rel)))

    dt2, (w_c, h_c) = timed(lambda: kl_nmf_fmajor(v, w0, h0, args.iters))
    print(json.dumps(dict(variant="f_major", ms=round(dt2 * 1e3, 2),
                          speedup=round(dt0 / dt2, 3))))
    rel_c = float(jnp.max(jnp.abs(w_a - w_c) / (jnp.abs(w_a) + 1e-12)))
    print(json.dumps(dict(check="max_rel_w_diff_fmajor", value=rel_c)))

    dt4, (w_e, h_e) = timed(lambda: kl_nmf_bf16q(v, w0, h0, args.iters))
    rel_e = float(jnp.max(jnp.abs(w_a - w_e) / (jnp.abs(w_a) + 1e-12)))
    print(json.dumps(dict(variant="bf16_q", ms=round(dt4 * 1e3, 2),
                          speedup=round(dt0 / dt4, 3),
                          max_rel_w_diff=rel_e)))

    dt5, (w_s, h_s) = timed(lambda: kl_nmf_simul(v, w0, h0, args.iters))
    rel_s = float(jnp.max(jnp.abs(w_a - w_s) / (jnp.abs(w_a) + 1e-12)))
    print(json.dumps(dict(variant="simul_sharedQ", ms=round(dt5 * 1e3, 2),
                          speedup_vs_shipped=round(dt0 / dt5, 3),
                          speedup_vs_bf16q=round(dt4 / dt5, 3),
                          max_rel_w_diff=rel_s)))

    for ways in (2, 4):
        dt3, (w_d, h_d) = timed(
            lambda: kl_nmf_interleaved(v, w0, h0, args.iters, ways=ways)
        )
        rel_d = float(jnp.max(jnp.abs(w_a - w_d) / (jnp.abs(w_a) + 1e-12)))
        print(json.dumps(dict(variant=f"interleave{ways}",
                              ms=round(dt3 * 1e3, 2),
                              speedup=round(dt0 / dt3, 3),
                              max_rel_w_diff=rel_d)))


if __name__ == "__main__":
    sys.exit(main())
