#!/usr/bin/env python
"""Benchmark harness.

Measures the flagship workload — full offline GCC-NMF stereo separation at
the reference's own demo configuration (runGCCNMF.py:56-77: 1024 window,
128 hop, 128 TDOAs, 128-atom dictionary, 100 NMF iterations, 3 sources) —
as **audio-seconds processed per second per chip**, batched on one device.

``vs_baseline`` is the speedup over the reference-equivalent NumPy
implementation (gccnmf_tpu.baselines.numpy_ref) measured on this host at
the same configuration.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def _load_audio():
    from gccnmf_tpu import defs
    from gccnmf_tpu.utils import wav

    if os.path.exists(defs.DEFAULT_SEPARATION_FILE):
        stereo, sr = wav.read_wav(defs.DEFAULT_SEPARATION_FILE)
        return stereo, sr, "dev1_female3_liverec_130ms_1m_mix.wav"
    # synthetic fallback: 10 s stereo with two delayed sources
    sr = 16000
    n = 10 * sr
    rng = np.random.default_rng(0)
    s1, s2 = rng.standard_normal((2, n)).astype(np.float32) * 0.1
    stereo = np.stack([s1 + s2, np.roll(s1, 8) + np.roll(s2, -11)])
    return stereo.astype(np.float32), sr, "synthetic"


def bench_offline_tpu(stereo, sr, batch: int, repeats: int, quick: bool):
    from gccnmf_tpu.models.offline import GCCNMFSeparator, OfflineConfig

    cfg = OfflineConfig(sample_rate=sr)
    if quick:
        cfg = OfflineConfig(
            sample_rate=sr, num_iterations=10, dictionary_size=32, num_tdoas=64
        )
    sep = GCCNMFSeparator(cfg)
    batch_in = np.broadcast_to(stereo, (batch,) + stereo.shape)
    # warmup / compile
    est, _ = sep.separate_batch(batch_in, num_sources=3)
    t0 = time.perf_counter()
    for _ in range(repeats):
        est, _ = sep.separate_batch(batch_in, num_sources=3)
    elapsed = time.perf_counter() - t0
    audio_seconds = batch * repeats * stereo.shape[-1] / sr
    return audio_seconds / elapsed


def bench_offline_numpy(stereo, sr, quick: bool):
    from gccnmf_tpu.baselines import numpy_ref

    kwargs = dict(num_sources=3)
    if quick:
        kwargs.update(dictionary_size=32, num_iterations=10, num_tdoas=64)
    t0 = time.perf_counter()
    numpy_ref.separate_ref(stereo, sr, **kwargs)
    elapsed = time.perf_counter() - t0
    return (stereo.shape[-1] / sr) / elapsed


def bench_streaming_latency(sr):
    """p50 single-block step latency of the RT streaming engine (ms)."""
    import jax

    from gccnmf_tpu.models.realtime import (
        RTGCCNMFProcessor,
        StreamConfig,
        StreamParams,
    )

    rng = np.random.default_rng(0)
    w = rng.random((513, 64)).astype(np.float32) + 1e-3
    proc = RTGCCNMFProcessor(w, StreamConfig(sample_rate=sr))
    params = StreamParams.default()
    state = proc.init_state(1)
    block = np.asarray(rng.standard_normal((1, 2, 512)), np.float32) * 0.1
    import jax.numpy as jnp

    block = jnp.asarray(block)
    # warmup/compile
    state, out, _ = proc.step(state, block, params)
    out.block_until_ready()
    times = []
    for _ in range(200):
        t0 = time.perf_counter()
        state, out, _ = proc.step(state, block, params)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    return float(np.percentile(times, 50) * 1e3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small config smoke run")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    stereo, sr, source = _load_audio()

    tpu_throughput = bench_offline_tpu(stereo, sr, args.batch, args.repeats, args.quick)
    numpy_throughput = bench_offline_numpy(stereo, sr, args.quick)
    p50_ms = bench_streaming_latency(sr)

    import jax

    result = {
        "metric": "offline separation throughput",
        "value": round(tpu_throughput, 2),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(tpu_throughput / numpy_throughput, 2),
        "baseline_numpy_audio_s_per_s": round(numpy_throughput, 2),
        "realtime_factor": round(tpu_throughput, 2),
        "streaming_p50_block_latency_ms": round(p50_ms, 3),
        "streaming_block_deadline_ms": 32.0,
        "audio_source": source,
        "batch": args.batch,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
