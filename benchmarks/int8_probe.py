"""Probe: can int8 MXU GEMMs (2x bf16 peak on v5e) accelerate the NMF
multiplicative-update loop?

Stage 1 (this file, --micro): isolate the GEMM chain. A Pallas kernel runs
``iters`` iterations of the three NMF-shaped GEMMs (the shared-Q turbo
loop's chain: WH (T,F) <- H(T,K)xW(F,K)^T, HQ (T,K) <- Q(T,F)xW(F,K),
WQ (F,K) <- Q(T,F)^T x H(T,K)) with operands in bf16 vs int8
(f32/int32 accumulation), including the per-iteration quantize cost for
int8 (scalar dynamic scale + round + cast on the VPU). If int8 isn't
clearly faster HERE, it can't help the full kernel and the probe is a
measured dead end.

Stage 2 (--full, only if stage 1 wins): the full "int8_q" NMF mode's
quality/perf is measured in benchmarks/nmf_variants.py and the offline
quality gates.

Run ON THE REAL TPU (Mosaic int8 dots are target-dependent).
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _gemm_chain_kernel(iters, mode, v_ref, w_ref, h_ref, out_ref):
    """iters x the turbo NMF GEMM chain; elementwise work kept minimal so
    the measurement isolates GEMM throughput + quantize overhead."""
    v = v_ref[:]
    if mode == "bf16":
        cast = lambda x: x.astype(jnp.bfloat16)

        def mm(a, b, dims):
            return jax.lax.dot_general(
                cast(a), cast(b), (dims, ((), ())),
                preferred_element_type=jnp.float32,
            )
    elif mode == "int8":
        def quant(x):
            # nonneg operands: symmetric scale off the max, round to int8
            s = jnp.max(x) / 127.0 + 1e-30
            xi = jnp.round(x / s).astype(jnp.int8)
            return xi, s

        def mm(a, b, dims):
            ai, sa = quant(a)
            bi, sb = quant(b)
            acc = jax.lax.dot_general(
                ai, bi, (dims, ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc.astype(jnp.float32) * (sa * sb)
    elif mode == "int8_noquant":
        # upper bound: pure int8 MXU throughput, quantization assumed free
        # (operands cast once, scales constant 1)
        def mm(a, b, dims):
            acc = jax.lax.dot_general(
                a.astype(jnp.int8), b.astype(jnp.int8), (dims, ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc.astype(jnp.float32)
    else:
        raise ValueError(mode)

    def body(_, wh):
        w, h = wh
        wh_rec = mm(h, w, ((1,), (1,)))          # (T, F)
        q = v - 1e-6 * wh_rec                    # stand-in for V/WH (VPU)
        h2 = h * (1e-3 * mm(q, w, ((1,), (0,))))  # (T, K)
        w2 = w * (1e-3 * mm(q, h2, ((0,), (0,))))  # (F, K)
        # keep magnitudes bounded so the loop can't over/underflow
        w2 = w2 / (jnp.max(w2) + 1e-30)
        h2 = h2 / (jnp.max(h2) + 1e-30)
        return w2, h2

    w, h = jax.lax.fori_loop(0, iters, body, (w_ref[:], h_ref[:]))
    out_ref[:] = jnp.full((8, 128), jnp.sum(w) + jnp.sum(h), jnp.float32)


@functools.partial(jax.jit, static_argnames=("iters", "mode", "t", "f", "k", "b"))
def gemm_chain(v, w, h, iters, mode, t, f, k, b):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec3 = lambda shape: pl.BlockSpec(
        (1, *shape), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        lambda v_r, w_r, h_r, o_r: _gemm_chain_kernel(
            iters, mode, v_r.at[0], w_r.at[0], h_r.at[0], o_r.at[0]
        ),
        grid=(b,),
        in_specs=[spec3((t, f)), spec3((f, k)), spec3((t, k))],
        out_specs=spec3((8, 128)),
        out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=jax.default_backend() != "tpu",
    )(v, w, h)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--t", type=int, default=1264)  # 10 s file, hop 128, padded
    ap.add_argument("--f", type=int, default=640)   # 513 padded to 128x
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    b, t, f, k = args.batch, args.t, args.f, args.k
    v = jnp.asarray(rng.random((b, t, f), np.float32))
    w = jnp.asarray(rng.random((b, f, k), np.float32))
    h = jnp.asarray(rng.random((b, t, k), np.float32))

    results = {}
    for mode in ("bf16", "int8", "int8_noquant"):
        try:
            out = gemm_chain(v, w, h, args.iters, mode, t, f, k, b)
            np.asarray(out)  # fence
            times = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                out = gemm_chain(v, w, h, args.iters, mode, t, f, k, b)
                np.asarray(out)
                times.append(time.perf_counter() - t0)
            results[mode] = dict(
                ms=round(min(times) * 1e3, 2),
                all_ms=[round(x * 1e3, 2) for x in times],
            )
        except Exception as e:  # Mosaic may reject int8 dots on this target
            results[mode] = dict(error=f"{type(e).__name__}: {e}"[:2500])
    flops = 6 * b * args.iters * t * f * k  # 3 GEMMs x 2 flops
    for mode, r in results.items():
        if "ms" in r:
            r["tflops"] = round(flops / (r["ms"] / 1e3) / 1e12, 2)
    if all("ms" in r for r in results.values()):
        results["int8_speedup"] = round(
            results["bf16"]["ms"] / results["int8"]["ms"], 3
        )
    results["shape"] = dict(b=b, t=t, f=f, k=k, iters=args.iters)
    results["backend"] = jax.default_backend()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
