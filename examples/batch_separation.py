#!/usr/bin/env python
"""Production-style batch separation: many utterances per device program.

The per-file paths (`separate_file`, `gccnmf-separate a.wav b.wav ...`)
run one utterance per dispatch; the chip saturates only when utterances
are batched (docs/DESIGN.md "Batched throughput path", SCALING.md §1 —
batch ≈ 32 saturates a v5e). This example shows the two batch tiers:

- ``separate_batch``:  one fully on-device program over a (B, 2, n)
  stack — device top-k localization, fixed source count;
- ``separate_batches``: the same program over an iterable of chunks with
  double-buffered host↔device I/O (upload of chunk k+1 and download of
  chunk k−1 overlap chunk k's compute) and optional int16 transport —
  half the bytes on the host link (``--io-dtype int16``).

All utterances in a batch must share one length; group real corpora by
length (or pad the *audio* and trim outputs — padding changes NMF
statistics slightly, so the exact-parity path is per-file).

Run:  python examples/batch_separation.py [mixture.wav] [--batch 8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gccnmf_tpu import defs
from gccnmf_tpu.models.offline import GCCNMFSeparator, OfflineConfig
from gccnmf_tpu.utils import wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mixture", nargs="?", default=defs.DEFAULT_SEPARATION_FILE)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--chunks", type=int, default=3)
    ap.add_argument("--num-sources", type=int, default=3)
    ap.add_argument("--io-dtype", choices=["float32", "int16"],
                    default="int16")
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()

    stereo, sr = wav.read_wav(args.mixture)
    sep = GCCNMFSeparator(
        OfflineConfig(sample_rate=sr, num_sources=args.num_sources)
    )

    # stand-in corpus: B copies per chunk (a real corpus would stack B
    # distinct same-length utterances)
    batch = np.broadcast_to(
        stereo, (args.batch,) + stereo.shape
    ).astype(np.float32)

    # tier 1: one on-device batch
    t0 = time.perf_counter()
    est, targets = sep.separate_batch(batch)
    est = np.asarray(est)
    dt = time.perf_counter() - t0
    audio_s = args.batch * stereo.shape[-1] / sr
    print(
        f"separate_batch:   B={args.batch}  {audio_s:.0f} audio-s in "
        f"{dt:.2f} s  ({audio_s / dt:,.0f} audio-s/s, first call "
        f"includes compile)"
    )
    print("  per-utterance targets:", np.asarray(targets)[0].tolist())

    # tier 2: pipelined chunks with device-side PCM transport
    chunks = (batch for _ in range(args.chunks))
    t0 = time.perf_counter()
    total = 0.0
    for k, (est_k, tg_k) in enumerate(
        sep.separate_batches(chunks, io_dtype=args.io_dtype)
    ):
        total += args.batch * stereo.shape[-1] / sr
        print(f"  chunk {k}: estimates {np.asarray(est_k).shape}")
    dt = time.perf_counter() - t0
    print(
        f"separate_batches: {args.chunks} chunks, io_dtype={args.io_dtype}"
        f"  {total:.0f} audio-s in {dt:.2f} s  ({total / dt:,.0f} audio-s/s)"
    )

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
        for i in range(est.shape[1]):
            path = os.path.join(args.out_dir, f"batch0_sim_{i + 1}.wav")
            wav.write_wav(est[0, i], path, sr)
            print("wrote", path)


if __name__ == "__main__":
    main()
