#!/usr/bin/env python
"""NMF iteration count vs quality and throughput: the speed/quality frontier.

The 100-iteration count is a reference constant (runGCCNMF.py:60), not a
tuned choice — and the NMF loop is ~80% of end-to-end separation time, so
iterations are the single biggest throughput lever a deployment has. This
study commits the frontier so that choice can be made on data:

For each bundled dev WAV and each iteration count in {25, 50, 75, 100},
run the default (throughput-mode) pipeline and score it against the NumPy
oracle at the reference's 100 iterations — the "what the reference would
have produced" yardstick: localization match, per-source BSS-Eval SDR and
PESQ. Alongside, the measured batched device throughput at each count
(audio-s/s/chip at batch 32).

This is NOT a default change: the shipped default stays at the
reference's 100. The artifact (docs/iterations_quality.json) simply
records what e.g. 50 iterations costs in SDR/PESQ and buys in throughput.

Run on the real chip:  python benchmarks/iterations_quality.py
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
_DATA = os.environ.get("GCCNMF_DATA_DIR", "/root/reference/data")
_OUT = os.path.join(_REPO, "docs", "iterations_quality.json")

ITER_COUNTS = (25, 50, 75, 100)
BATCH = 32


def _setup_jax():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(_REPO, ".cache", "jaxcache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    return jax


def _score(ref, got, sr):
    from gccnmf_tpu.metrics import bss_eval_sources, pesq

    out = {
        "targets_tpu": [int(t) for t in got["target_tdoa_indexes"]],
        "localization_match": (
            [int(t) for t in got["target_tdoa_indexes"]]
            == [int(t) for t in ref["targets"]]
        ),
    }
    if not out["localization_match"]:
        return out
    ref_est = np.asarray(ref["estimates"])
    tpu_est = np.asarray(got["estimates"])
    n = min(ref_est.shape[-1], tpu_est.shape[-1])
    ref_est, tpu_est = ref_est[..., :n], tpu_est[..., :n]
    sdr, _, _, _ = bss_eval_sources(ref_est.mean(axis=1), tpu_est.mean(axis=1))
    out["bss_sdr_db"] = [round(float(x), 2) for x in np.asarray(sdr)]
    out["min_bss_sdr_db"] = round(float(np.min(np.asarray(sdr))), 2)
    pesqs = []
    for i in range(ref_est.shape[0]):
        try:
            pesqs.append(float(pesq(ref_est[i].mean(0), tpu_est[i].mean(0), sr)))
        except Exception as e:
            print(f"#   pesq failed source {i}: {e}", file=sys.stderr)
    if pesqs:
        out["pesq"] = [round(p, 3) for p in pesqs]
        out["min_pesq"] = round(min(pesqs), 3)
    return out


def _throughput(stereo, sr, num_iterations: int, repeats: int = 3) -> float:
    """Batched device audio-s/s at this iteration count (batch 32)."""
    import jax.numpy as jnp

    from gccnmf_tpu.models.offline import GCCNMFSeparator, OfflineConfig
    from gccnmf_tpu.ops import nmf, stft as stft_ops

    # bench.py's _timed_loop/_fence discipline, reused via a cached
    # import (repo root is on sys.path)
    import bench

    cfg = OfflineConfig(sample_rate=sr, num_iterations=num_iterations)
    sep = GCCNMFSeparator(cfg)
    batch_in = jnp.asarray(
        np.ascontiguousarray(np.broadcast_to(stereo, (BATCH,) + stereo.shape))
    )
    t = stft_ops.num_frames(stereo.shape[-1], cfg.window_size, cfg.hop_size)
    w0, h0 = nmf.nmf_init_numpy(cfg.num_freq, cfg.dictionary_size, 2 * t)
    w0b = jnp.broadcast_to(jnp.asarray(w0), (BATCH,) + w0.shape)
    h0b = jnp.broadcast_to(jnp.asarray(h0), (BATCH,) + h0.shape)
    per_run = bench._timed_loop(
        lambda: sep._separate_batch_jit(batch_in, w0b, h0b, 3), repeats
    )
    return BATCH * stereo.shape[-1] / sr / per_run


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=_OUT)
    ap.add_argument("--iters", type=int, nargs="*", default=list(ITER_COUNTS))
    args = ap.parse_args()

    jax = _setup_jax()

    from gccnmf_tpu.baselines import numpy_ref
    from gccnmf_tpu.models.offline import GCCNMFSeparator, OfflineConfig
    from gccnmf_tpu.utils import wav as wavio

    paths = sorted(glob.glob(os.path.join(_DATA, "*.wav")))
    if not paths:
        raise SystemExit(f"no WAVs under {_DATA}")

    wavs = {}
    first_stereo = first_sr = None
    for path in paths:
        name = os.path.basename(path)
        stereo, sr = wavio.read_wav(path)
        if first_stereo is None:
            first_stereo, first_sr = stereo, sr
        print(f"# {name}: oracle@100 ...", file=sys.stderr)
        ref = numpy_ref.separate_ref(stereo, sr, num_sources=3)
        per_iter = {}
        for n_it in args.iters:
            cfg = OfflineConfig(sample_rate=sr, num_iterations=n_it)
            got = GCCNMFSeparator(cfg).separate(stereo, num_sources=3)
            per_iter[str(n_it)] = _score(ref, got, sr)
            print(f"#   {n_it} it: {per_iter[str(n_it)]}", file=sys.stderr)
        wavs[name] = per_iter

    # throughput curve on the demo WAV (shape-identical across all six)
    throughput = {}
    for n_it in args.iters:
        thr = _throughput(first_stereo, first_sr, n_it)
        throughput[str(n_it)] = round(thr, 1)
        print(f"# throughput @{n_it} it: {thr:.0f} audio-s/s", file=sys.stderr)

    # the speedup baseline is the highest measured count; name the key by
    # what was actually measured so a custom --iters list without 100
    # cannot produce a "speedup_vs_100" that never saw 100 iterations
    base_iters = max(args.iters)

    def _mins(n_it):
        loc = all(wavs[n][str(n_it)]["localization_match"] for n in wavs)
        rows = [wavs[n][str(n_it)] for n in wavs]
        sdrs = [r["min_bss_sdr_db"] for r in rows if "min_bss_sdr_db" in r]
        pesqs = [r["min_pesq"] for r in rows if "min_pesq" in r]
        return dict(
            localization_match_all=loc,
            min_bss_sdr_db=min(sdrs) if sdrs else None,
            min_pesq=min(pesqs) if pesqs else None,
            throughput_audio_s_per_s=throughput[str(n_it)],
            **{
                f"speedup_vs_{base_iters}": round(
                    throughput[str(n_it)] / throughput[str(base_iters)], 2
                )
            },
        )

    result = dict(
        metric="iterations vs quality",
        yardstick="NumPy oracle at the reference's 100 iterations",
        batch=BATCH,
        backend=jax.default_backend(),
        device=str(jax.devices()[0]),
        summary={str(n): _mins(n) for n in args.iters},
        wavs=wavs,
    )
    from gccnmf_tpu.utils.stamp import run_stamp

    result["stamp"] = run_stamp()
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")
    print(json.dumps(result["summary"]))


if __name__ == "__main__":
    main()
