"""Hour-scale disk-streamed separation benchmark (real chip).

Synthesizes a long stereo WAV, runs the disk-streamed long-audio path
(`LongAudioSeparator.separate_streamed` — mmap ingest, chunked device
loads, incremental 16-bit writers) on the single real chip, and reports
audio-seconds/s plus host-memory accounting that actually separates the
two things RSS conflates:

- ``peak_anon_mib`` (``RssAnon``): anonymous memory — the heap, device
  transfer buffers, runtime state. This is what the O(chunk)-RAM claim
  is about; it must stay bounded as the input grows.
- ``peak_file_mib`` (``RssFile``): file-backed pages — the mmap'd input
  WAV riding the page cache. This grows with the input by design and is
  reclaimable by the kernel on memory pressure; counting it against the
  pipeline (as a bare RSS number does) misattributes ~90% of the
  footprint.

A sampler thread polls ``/proc/self/status`` once a second through the
run, so the peaks are observed, not end-state. The headline elapsed time
is the MEDIAN of the repeats (min/max recorded raw): the axon tunnel's
bulk throughput swings by integer factors between identical runs
(docs/DESIGN.md "Harness caveats"), and a best-of headline flattered the
transfer-bound number.

Results: ``docs/streamed_30min.json`` / ``docs/streamed_60min.json``;
``bench.py`` folds both committed artifacts in (a 30-60 minute ingest
inside the driver's bench run would be dominated by tunnel variance).

Run: python benchmarks/streamed_bench.py [--minutes 60] [--repeats 4]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import threading
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


def _read_status_kib() -> dict:
    """VmRSS / RssAnon / RssFile (+shmem) in KiB from /proc/self/status."""
    out = {}
    with open("/proc/self/status") as fh:
        for line in fh:
            for key in ("VmRSS", "RssAnon", "RssFile", "RssShmem"):
                if line.startswith(key + ":"):
                    out[key] = int(line.split()[1])
    return out


class MemSampler:
    """1 Hz peak tracker for anonymous vs file-backed resident memory."""

    def __init__(self, period_s: float = 1.0):
        self.period_s = period_s
        self.peaks = {"VmRSS": 0, "RssAnon": 0, "RssFile": 0}
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _sample(self):
        try:
            cur = _read_status_kib()
        except OSError:
            return
        for k in self.peaks:
            self.peaks[k] = max(self.peaks[k], cur.get(k, 0))

    def _run(self):
        while not self._stop.is_set():
            self._sample()
            self._stop.wait(self.period_s)

    def __enter__(self):
        self._sample()
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=5)
        self._sample()
        return False


def _recycle_supervisor(args):
    """Serialize one fresh subprocess per repeat (the tunnel is
    single-client, so children must never overlap). The parent imports no
    JAX — it owns nothing that can retain transfer buffers — and each
    child's retention dies with the child: peak anon is flat across
    repeats by construction. The per-repeat process cost (backend init +
    persistent-compile-cache load) is measured and published, not hidden."""
    import subprocess
    import tempfile

    # synthesize once here so children skip it (they see the file)
    if not os.path.exists(args.wav):
        print(f"# synthesizing {args.minutes:.0f} min WAV ...", file=sys.stderr)
        synthesize_wav(args.wav, args.minutes)

    child_results = []
    wall_times = []
    for i in range(max(1, args.repeats)):
        with tempfile.NamedTemporaryFile(
            suffix=".json", delete=False
        ) as tf:
            child_out = tf.name
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--minutes", str(args.minutes),
            "--shards", str(args.shards),
            "--chunk-frames", str(args.chunk_frames),
            "--repeats", "1",
            "--num-iterations", str(args.num_iterations),
            "--dictionary-size", str(args.dictionary_size),
            "--wav", args.wav,
            "--out-prefix", args.out_prefix,
            "--save", child_out,
        ]
        t0 = time.perf_counter()
        proc = subprocess.run(cmd, stdout=subprocess.DEVNULL)
        wall_times.append(round(time.perf_counter() - t0, 1))
        if proc.returncode != 0:
            raise SystemExit(f"repeat {i}: child failed rc={proc.returncode}")
        with open(child_out) as fh:
            child_results.append(json.load(fh))
        os.unlink(child_out)
        print(
            f"# repeat {i}: {child_results[-1]['elapsed_s']} s compute, "
            f"{wall_times[-1]} s wall, peak anon "
            f"{child_results[-1]['peak_anon_mib']} MiB",
            file=sys.stderr,
        )

    repeats = [c["elapsed_s"] for c in child_results]
    elapsed = float(np.median(repeats))
    audio_s = args.minutes * 60
    out = dict(
        minutes=args.minutes,
        mode="recycle_per_repeat",
        input_mb=child_results[0]["input_mb"],
        shards=child_results[0]["shards"],
        chunk_frames=args.chunk_frames,
        elapsed_s=elapsed,
        elapsed_statistic="median",
        elapsed_repeats_s=repeats,
        audio_s_per_s=round(audio_s / elapsed, 1),
        audio_s_per_s_best=round(audio_s / min(repeats), 1),
        # flat by construction: each repeat's transport retention dies
        # with its process — this is THE bounded operating mode for
        # repeat-style hour-scale workloads on this harness
        peak_anon_per_repeat_mib=[c["peak_anon_mib"] for c in child_results],
        anon_after_each_repeat_mib=[
            c["anon_after_each_repeat_mib"][-1] for c in child_results
        ],
        peak_file_backed_mib=max(
            c["peak_file_backed_mib"] for c in child_results
        ),
        # process-recycle price: wall time minus in-process compute =
        # interpreter + backend init + compile-cache load + the ~96 MB
        # link probe, per pass (axon init alone is documented 0.1 s–7 min
        # variable, so this is dominated by harness init, not the recycle
        # pattern itself)
        wall_per_repeat_s=wall_times,
        recycle_overhead_s=[
            round(w - c["elapsed_s"], 1)
            for w, c in zip(wall_times, child_results)
        ],
        samples_written=child_results[-1]["samples_written"],
        outputs=child_results[-1]["outputs"],
        stage_seconds_per_repeat=[
            c.get("stage_seconds") for c in child_results
        ],
        link_probe_per_repeat=[
            (c.get("link_probe_per_repeat") or [None])[0]
            for c in child_results
        ],
        transfer_mb=child_results[-1].get("transfer_mb"),
        backend=child_results[-1]["backend"],
        device=child_results[-1]["device"],
    )
    from gccnmf_tpu.utils.stamp import run_stamp

    out["stamp"] = run_stamp()
    print(json.dumps(out))
    if args.save:
        with open(args.save, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from linkprobe import measure_link_mb_s  # noqa: E402  (benchmarks/)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=60.0)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--chunk-frames", type=int, default=8192,
                    help="macro-chunk width for the single-device driver")
    ap.add_argument("--repeats", type=int, default=4,
                    help="raw repeats recorded; MEDIAN is the headline "
                         "(tunnel variance; best-of would flatter)")
    ap.add_argument("--num-iterations", type=int, default=100)
    ap.add_argument("--dictionary-size", type=int, default=128)
    ap.add_argument("--wav", default="/tmp/streamed_bench_mix.wav")
    ap.add_argument("--out-prefix", default="/tmp/streamed_bench_out")
    ap.add_argument("--save", default=None,
                    help="write the result JSON here (e.g. docs/streamed_60min.json)")
    ap.add_argument("--recycle-per-repeat", action="store_true",
                    help="run each repeat in a fresh subprocess (the "
                         "worker-recycle mitigation for the tunnel "
                         "client's process-lifetime staging retention, "
                         "docs/tunnel_probe.json). Anon memory is flat "
                         "per repeat by construction; the measured cost "
                         "is one backend init + compile-cache warm per "
                         "pass, reported as recycle_overhead_s.")
    args = ap.parse_args()

    if args.recycle_per_repeat:
        return _recycle_supervisor(args)

    # Synthesize ONLY when the file is missing — never overwrite an
    # existing path (it may be the user's real recording). A stale
    # synthetic file of the wrong length is the user's to delete; the
    # reported duration below comes from the actual file either way.
    if not os.path.exists(args.wav):
        print(f"# synthesizing {args.minutes:.0f} min WAV ...", file=sys.stderr)
        synthesize_wav(args.wav, args.minutes)
    file_mb = os.path.getsize(args.wav) / 1e6
    import wave as _wave

    with _wave.open(args.wav, "rb") as wf:
        actual_minutes = wf.getnframes() / wf.getframerate() / 60.0
    if abs(actual_minutes - args.minutes) > 0.01:
        print(
            f"# note: {args.wav} is {actual_minutes:.1f} min, not "
            f"{args.minutes:.1f}; reporting the actual duration",
            file=sys.stderr,
        )
        args.minutes = actual_minutes

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".cache", "jaxcache",
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from gccnmf_tpu.models.offline import OfflineConfig
    from gccnmf_tpu.parallel.long_audio import LongAudioSeparator
    from gccnmf_tpu.parallel import mesh as mesh_lib

    base = _read_status_kib()
    rss_before_kib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    mesh = mesh_lib.make_mesh(
        data=min(args.shards, jax.device_count()), model=1
    )
    cfg = OfflineConfig(
        num_iterations=args.num_iterations,
        dictionary_size=args.dictionary_size,
    )
    sep = LongAudioSeparator(cfg, mesh, chunk_frames=args.chunk_frames)
    repeats = []
    anon_after_repeat = []
    link_probes = []
    with MemSampler() as sampler:
        for _ in range(max(1, args.repeats)):
            link_probes.append(measure_link_mb_s())
            t0 = time.perf_counter()
            result = sep.separate_streamed(
                args.wav, output_prefix=args.out_prefix
            )
            repeats.append(round(time.perf_counter() - t0, 1))
            anon_after_repeat.append(
                round(_read_status_kib().get("RssAnon", 0) / 1024, 1)
            )
    elapsed = float(np.median(repeats))
    rss_after_kib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss

    audio_s = args.minutes * 60
    out = dict(
        minutes=args.minutes,
        input_mb=round(file_mb, 1),
        shards=mesh.shape["data"],
        chunk_frames=args.chunk_frames,
        elapsed_s=elapsed,
        elapsed_statistic="median",
        elapsed_repeats_s=repeats,
        audio_s_per_s=round(audio_s / elapsed, 1),
        audio_s_per_s_best=round(audio_s / min(repeats), 1),
        # memory accounting: anon = heap/transfer buffers (the O(chunk)
        # claim); file = mmap'd input riding the reclaimable page cache
        peak_rss_mib=round(max(rss_after_kib, sampler.peaks["VmRSS"]) / 1024, 1),
        rss_growth_mib=round((rss_after_kib - rss_before_kib) / 1024, 1),
        peak_anon_mib=round(sampler.peaks["RssAnon"] / 1024, 1),
        anon_growth_mib=round(
            (sampler.peaks["RssAnon"] - base.get("RssAnon", 0)) / 1024, 1
        ),
        # per-repeat anon ratchet: the axon tunnel CLIENT retains every
        # upload buffer (~1:1 with bytes uploaded — probe: 50 identical
        # 8 MB uploads grow RssAnon 389 MiB; downloads do not leak), so
        # anon grows by ~the repeat's upload volume (raw audio PCM + the
        # MT19937-seeded H0 blocks) per run. The framework's own working
        # set is the first-repeat growth minus that upload volume; the
        # ratchet is a harness property, not pipeline state.
        anon_after_each_repeat_mib=anon_after_repeat,
        upload_volume_per_repeat_mb=round(
            # raw int16 audio (both channels) + f32 H0 (2T x K) + W0
            (os.path.getsize(args.wav)
             + 8 * int(args.minutes * 60 * 16000 / 128) * args.dictionary_size
             ) / 1e6, 1
        ),
        peak_file_backed_mib=round(sampler.peaks["RssFile"] / 1024, 1),
        baseline_anon_mib=round(base.get("RssAnon", 0) / 1024, 1),
        samples_written=int(result.get("samples_written", 0)),
        outputs=[str(p) for p in result.get("paths", [])],
        # phase attribution (last repeat): where an hour of ingest goes —
        # async dispatch vs upload fence vs NMF+recon vs download drain
        stage_seconds=result.get("stage_seconds"),
        transfer_mb=result.get("transfer_mb"),
        # same-moment raw link rate before each repeat: the pipeline moves
        # ~920 MB/pass, so wall time tracks THIS, not pipeline structure
        link_probe_per_repeat=link_probes,
        host_heap_trims=result.get("host_heap_trims"),
        backend=jax.default_backend(),
        device=str(jax.devices()[0]),
    )
    from gccnmf_tpu.utils.stamp import run_stamp

    out["stamp"] = run_stamp()
    print(json.dumps(out))
    if args.save:
        with open(args.save, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")


if __name__ == "__main__":
    main()
