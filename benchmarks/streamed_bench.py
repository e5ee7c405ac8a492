"""Hour-scale disk-streamed separation benchmark (real chip).

Synthesizes a long stereo WAV (default 30 minutes), runs the
disk-streamed long-audio path (`LongAudioSeparator.separate_streamed` —
mmap ingest, per-shard device loads, incremental 16-bit writers) on the
single real chip, and reports audio-seconds/s plus peak host RSS — the
measured number behind the O(chunk)-RAM claim (docs/DESIGN.md
"Disk-streamed long audio").

The result JSON is written to ``docs/streamed_30min.json``; ``bench.py``
folds that committed artifact into its output under ``streamed_30min``
(marked as separately measured — a 30-minute ingest inside the driver's
bench run would be dominated by axon-tunnel variance).

Run: python benchmarks/streamed_bench.py [--minutes 30] [--shards 8]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthesize_wav(path: str, minutes: float, sr: int = 16000) -> int:
    """Write a long stereo mixture in 1-minute pieces (bounded host RAM):
    two moving-delay speech-band sources + noise, int16."""
    import wave

    n_total = int(minutes * 60 * sr)
    rng = np.random.default_rng(0)
    with wave.open(path, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        piece = 60 * sr
        for start in range(0, n_total, piece):
            n = min(piece, n_total - start)
            t = (start + np.arange(n)) / sr
            s1 = np.sin(2 * np.pi * 220 * t) * (
                0.5 + 0.5 * np.sin(2 * np.pi * 0.37 * t)
            )
            s2 = np.sin(2 * np.pi * 330 * t) * (
                0.5 + 0.5 * np.cos(2 * np.pi * 0.23 * t)
            )
            noise = rng.standard_normal((2, n)).astype(np.float32) * 0.01
            left = s1 + s2 + noise[0]
            right = np.roll(s1, 7) + np.roll(s2, -9) + noise[1]
            stereo = np.stack([left, right]) * 0.4
            pcm = (np.clip(stereo, -1, 1) * 32767).astype("<i2")
            wf.writeframes(pcm.T.tobytes())
    return n_total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--chunk-frames", type=int, default=8192,
                    help="macro-chunk width for the single-device driver")
    ap.add_argument("--repeats", type=int, default=2,
                    help="raw repeats recorded; best-of used for the "
                         "headline (tunnel variance)")
    ap.add_argument("--num-iterations", type=int, default=100)
    ap.add_argument("--dictionary-size", type=int, default=128)
    ap.add_argument("--wav", default="/tmp/streamed_bench_mix.wav")
    ap.add_argument("--out-prefix", default="/tmp/streamed_bench_out")
    ap.add_argument("--save", default=None,
                    help="write the result JSON here (e.g. docs/streamed_30min.json)")
    args = ap.parse_args()

    if not os.path.exists(args.wav):
        print(f"# synthesizing {args.minutes:.0f} min WAV ...", file=sys.stderr)
        synthesize_wav(args.wav, args.minutes)
    file_mb = os.path.getsize(args.wav) / 1e6

    import jax

    from gccnmf_tpu.models.offline import OfflineConfig
    from gccnmf_tpu.parallel.long_audio import LongAudioSeparator
    from gccnmf_tpu.parallel import mesh as mesh_lib

    rss_before_kib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    mesh = mesh_lib.make_mesh(
        data=min(args.shards, jax.device_count()), model=1
    )
    cfg = OfflineConfig(
        num_iterations=args.num_iterations,
        dictionary_size=args.dictionary_size,
    )
    sep = LongAudioSeparator(cfg, mesh, chunk_frames=args.chunk_frames)
    # raw repeats recorded, best used for the headline: the axon tunnel's
    # bulk throughput swings by integer factors between identical runs
    # (docs/DESIGN.md "Harness caveats") and this path is transfer-bound
    repeats = []
    for _ in range(max(1, args.repeats)):
        t0 = time.perf_counter()
        result = sep.separate_streamed(args.wav, output_prefix=args.out_prefix)
        repeats.append(round(time.perf_counter() - t0, 1))
    elapsed = min(repeats)
    rss_after_kib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    audio_s = args.minutes * 60
    out = dict(
        minutes=args.minutes,
        input_mb=round(file_mb, 1),
        shards=mesh.shape["data"],
        chunk_frames=args.chunk_frames,
        elapsed_s=elapsed,
        elapsed_repeats_s=repeats,
        audio_s_per_s=round(audio_s / elapsed, 1),
        peak_rss_mib=round(rss_after_kib / 1024, 1),
        rss_growth_mib=round((rss_after_kib - rss_before_kib) / 1024, 1),
        samples_written=int(result.get("samples_written", 0)),
        outputs=[str(p) for p in result.get("paths", [])],
        backend=jax.default_backend(),
        device=str(jax.devices()[0]),
    )
    print(json.dumps(out))
    if args.save:
        with open(args.save, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
