#!/usr/bin/env python
"""Scaling studies: batch sweep, multi-stream sweep, DP mesh scaling.

Complements the headline `bench.py` (which the driver runs) with the
BASELINE.json comparison axes: throughput vs batch size, streaming
multi-stream scaling, and data-parallel scaling efficiency over a device
mesh. On a CPU host, pass ``--virtual-devices N`` to emulate an N-chip
mesh (XLA host-platform device count) — the same path a multi-host TPU
slice takes, minus the ICI.

Usage:
  python benchmarks/scaling.py --mode batch --batches 1 4 16
  python benchmarks/scaling.py --mode streams --streams 1 8 32
  python benchmarks/scaling.py --mode dp --virtual-devices 8
Prints one JSON line per configuration.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["batch", "streams", "dp", "serving"], default="batch")
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--streams", type=int, nargs="+", default=[1, 8, 32])
    ap.add_argument("--virtual-devices", type=int, default=0,
                    help="force an N-device virtual CPU platform")
    ap.add_argument("--seconds", type=int, default=10, help="audio length")
    ap.add_argument("--quick", action="store_true")
    return ap.parse_args()


def _fence(out):
    """Force completion with a 1-element host fetch — block_until_ready
    alone returns early through the axon TPU tunnel (see bench.py _fence),
    which would time only the dispatch."""
    leaf = out
    while getattr(leaf, "ndim", 0) > 1:
        leaf = leaf[0]
    np.asarray(leaf[:1])


def _audio(seconds, sr=16000):
    rng = np.random.default_rng(0)
    n = seconds * sr
    s1, s2 = rng.standard_normal((2, n)).astype(np.float32) * 0.1
    return np.stack([s1 + s2, np.roll(s1, 8) + np.roll(s2, -11)]).astype(np.float32), sr


def bench_batch_sweep(args):
    """Device-throughput batch sweep: inputs resident on the chip, repeats
    queued asynchronously and fenced once with the tunnel round trip
    subtracted (bench.py's `_timed_loop` — a host-inclusive `separate_batch`
    call on this harness measures the axon tunnel, not the chip)."""
    import importlib.util

    import jax.numpy as jnp

    from gccnmf_tpu.models.offline import GCCNMFSeparator, OfflineConfig
    from gccnmf_tpu.ops import nmf, stft as stft_ops

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench._setup_jax()

    stereo, sr = _audio(args.seconds)
    cfg = (
        OfflineConfig(sample_rate=sr, num_iterations=10, dictionary_size=32,
                      num_tdoas=64)
        if args.quick
        else OfflineConfig(sample_rate=sr)
    )
    sep = GCCNMFSeparator(cfg)
    t = stft_ops.num_frames(stereo.shape[-1], cfg.window_size, cfg.hop_size)
    w0, h0 = nmf.nmf_init_numpy(cfg.num_freq, cfg.dictionary_size, 2 * t)
    for b in args.batches:
        dev_in = jnp.asarray(
            np.ascontiguousarray(np.broadcast_to(stereo, (b,) + stereo.shape))
        )
        w0b = jnp.broadcast_to(jnp.asarray(w0), (b,) + w0.shape)
        h0b = jnp.broadcast_to(jnp.asarray(h0), (b,) + h0.shape)
        per_run = bench._timed_loop(
            lambda: sep._separate_batch_jit(dev_in, w0b, h0b, 3), 3
        )
        print(json.dumps(dict(
            mode="batch", batch=b,
            audio_s_per_s=round(b * args.seconds / per_run, 2),
            seconds_per_batch=round(per_run, 4),
        )), flush=True)


def bench_stream_sweep(args):
    import jax.numpy as jnp

    from gccnmf_tpu.models.realtime import (
        RTGCCNMFProcessor, StreamConfig, StreamParams,
    )

    stereo, sr = _audio(args.seconds)
    rng = np.random.default_rng(1)
    w = rng.random((513, 64)).astype(np.float32) + 1e-3
    cfg = StreamConfig(sample_rate=sr)
    proc = RTGCCNMFProcessor(w, cfg)
    params = StreamParams.default()
    for s in args.streams:
        batch = np.broadcast_to(stereo, (s,) + stereo.shape)
        blocks = jnp.asarray(proc.blocks_from_signal(batch))
        state = proc.init_state(s)
        _, outs = proc.scan_blocks(state, blocks, params)
        _fence(outs)
        t0 = time.perf_counter()
        _, outs = proc.scan_blocks(state, blocks, params)
        _fence(outs)
        dt = time.perf_counter() - t0
        nb = blocks.shape[0]
        print(json.dumps(dict(
            mode="streams", streams=s,
            ms_per_block=round(dt / nb * 1e3, 3),
            aggregate_realtime_factor=round(s * nb * cfg.block_size / sr / dt, 1),
        )))


def bench_serving(args):
    """StreamServer lockstep tick at increasing tenancy: per-tick wall time
    (one host dispatch per block interval) and aggregate realtime factor.
    Per-tick latency is dispatch-bound on tunneled harnesses; the point is
    that it stays flat as streams are added, so aggregate throughput
    scales linearly until device compute saturates."""
    from gccnmf_tpu.models.realtime import StreamConfig
    from gccnmf_tpu.serving import StreamServer

    rng = np.random.default_rng(1)
    cfg = StreamConfig()
    w = rng.random((cfg.num_freq, 64)).astype(np.float32) + 1e-3
    ticks = 20
    for s in args.streams:
        srv = StreamServer(w, cfg, max_streams=s)
        ids = [srv.open_stream() for _ in range(s)]
        block = (rng.standard_normal((cfg.num_channels, cfg.block_size))
                 .astype(np.float32) * 0.1)
        subs = {i: block for i in ids}
        srv.process(subs)  # compile/warm
        t0 = time.perf_counter()
        for _ in range(ticks):
            srv.process(subs)
        dt = time.perf_counter() - t0
        per_tick_ms = dt / ticks * 1e3
        print(json.dumps(dict(
            mode="serving", streams=s,
            ms_per_tick=round(per_tick_ms, 3),
            deadline_ms=round(cfg.block_size / cfg.sample_rate * 1e3, 1),
            aggregate_realtime_factor=round(
                s * ticks * cfg.block_size / cfg.sample_rate / dt, 1),
        )))


def bench_dp_scaling(args, virtual=False):
    """Data-parallel separation over a mesh: fixed per-device work,
    efficiency = throughput(N) / (N * throughput(1))."""
    import jax

    from gccnmf_tpu.models.offline import GCCNMFSeparator, OfflineConfig
    from gccnmf_tpu.parallel import mesh as mesh_lib

    stereo, sr = _audio(args.seconds)
    cfg = OfflineConfig(sample_rate=sr, num_iterations=10, dictionary_size=32,
                        num_tdoas=64)
    import jax.numpy as jnp

    from gccnmf_tpu.ops import nmf, stft as stft_ops

    sep = GCCNMFSeparator(cfg)
    n_dev = jax.device_count()
    per_dev_batch = 2
    base = None
    t_frames = stft_ops.num_frames(stereo.shape[-1], cfg.window_size, cfg.hop_size)
    w0, h0 = nmf.nmf_init_numpy(cfg.num_freq, cfg.dictionary_size, 2 * t_frames)
    for n in [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]:
        mesh = mesh_lib.make_mesh(data=n, model=1, devices=jax.devices()[:n])
        b = n * per_dev_batch
        batch = np.ascontiguousarray(np.broadcast_to(stereo, (b,) + stereo.shape))
        # shard the batch axis over the mesh; the jitted vmap computation
        # follows the input sharding (SPMD partitioning, no host round trip)
        sharded = mesh_lib.shard_batch(batch, mesh)
        w0b = mesh_lib.shard_batch(
            np.broadcast_to(w0, (b,) + w0.shape).copy(), mesh
        )
        h0b = mesh_lib.shard_batch(
            np.broadcast_to(h0, (b,) + h0.shape).copy(), mesh
        )
        est, _, _ = sep._separate_batch_jit(sharded, w0b, h0b, 3)
        _fence(est)
        t0 = time.perf_counter()
        est, _, _ = sep._separate_batch_jit(sharded, w0b, h0b, 3)
        _fence(est)
        dt = time.perf_counter() - t0
        thr = n * per_dev_batch * args.seconds / dt
        if base is None:
            base = thr
        rec = dict(
            mode="dp", devices=n,
            audio_s_per_s=round(thr, 2),
            efficiency=round(thr / (n * base), 3),
        )
        if virtual:
            # N virtual devices share ONE physical host CPU: aggregate
            # throughput cannot grow with N, so "efficiency" here only
            # validates that the sharded program compiles and runs — real
            # scaling numbers require real chips.
            rec["note"] = "virtual devices share one host; efficiency not meaningful"
        print(json.dumps(rec))


def main():
    args = _parse_args()
    # provenance row first (the sweeps are redirected into
    # docs/scaling/*.jsonl — a leading {"mode": "stamp", ...} row makes
    # every sweep file self-attributing; rows keep their "mode" key so
    # existing filters skip it)
    from gccnmf_tpu.utils.stamp import run_stamp

    print(json.dumps(dict(mode="stamp", **run_stamp())))
    if args.virtual_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual_devices}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.mode == "batch":
        bench_batch_sweep(args)
    elif args.mode == "streams":
        bench_stream_sweep(args)
    elif args.mode == "serving":
        bench_serving(args)
    else:
        bench_dp_scaling(args, virtual=bool(args.virtual_devices))


if __name__ == "__main__":
    main()
