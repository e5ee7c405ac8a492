#!/usr/bin/env python
"""One-command evidence regeneration (VERDICT r4 #8).

Runs every artifact producer in docs/EVIDENCE.md's documented order, each
in its own subprocess, strictly serialized (the axon tunnel is
single-client — two concurrent TPU processes deadlock it), all sharing
the persistent compilation cache (.cache/jaxcache). The full evidence
base then regenerates with:

    python benchmarks/run_all.py            # everything (~30-60 min warm)
    python benchmarks/run_all.py --only six_wavs serving
    python benchmarks/run_all.py --list
    python benchmarks/run_all.py --quick    # smoke: tiny configs where supported

Each step's wall time and exit status are reported at the end and written
to docs/evidence_run.json (stamped), so "the artifacts were regenerated
together at SHA x" is itself an artifact.

Steps that only render committed data (pesq curves) run on CPU via the
producer's own forcing; everything else touches the real chip.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _py(*rel: str) -> list[str]:
    return [sys.executable, os.path.join(_REPO, *rel)]


# (name, argv, quick_argv_extra or None, quick_env or None).
# Quick extras REDIRECT artifact outputs to /tmp where the producer
# writes one — a smoke run must never overwrite a committed full-scale
# artifact. Steps whose quick form is None are skipped under --quick.
STEPS = (
    ("six_wavs", _py("benchmarks", "parity_six_wavs.py"),
     ["--quick", "--out", "/tmp/parity_six_wavs_quick.json"], None),
    ("serving", _py("benchmarks", "serving_capacity.py"),
     ["--ticks", "50", "--out", "/tmp/serving_capacity_quick.json"], None),
    (
        "streamed_60min",
        _py("benchmarks", "streamed_bench.py")
        + ["--minutes", "60", "--recycle-per-repeat",
           "--save", os.path.join(_REPO, "docs", "streamed_60min.json")],
        None,  # no meaningful quick form: the claim IS hour scale
        None,
    ),
    (
        "streamed_30min",
        _py("benchmarks", "streamed_bench.py")
        + ["--minutes", "30",
           "--wav", "/tmp/streamed_bench_mix30.wav",
           "--save", os.path.join(_REPO, "docs", "streamed_30min.json")],
        None,
        None,
    ),
    ("tunnel_probe",
     _py("benchmarks", "tunnel_probe.py")
     + ["--save", os.path.join(_REPO, "docs", "tunnel_probe.json")],
     ["--save", "/tmp/tunnel_probe_quick.json"], None),
    ("iterations_quality", _py("benchmarks", "iterations_quality.py"),
     ["--iters", "10", "100", "--out", "/tmp/iterations_quality_quick.json"],
     None),
    # writes docs/turbo_equivalence.json unconditionally -> full-only
    ("turbo_equivalence", _py("benchmarks", "turbo_equivalence.py"),
     None, None),
    # prints jsonl to stdout; the full run captures it into the committed
    # docs/scaling/batch_real.jsonl (see _STDOUT_TO), quick mode leaves
    # stdout alone
    ("batch_sweep",
     _py("benchmarks", "scaling.py") + ["--mode", "batch"],
     ["--quick"], None),
    ("collectives", _py("benchmarks", "collectives.py"), [], None),
    ("pesq_curves", _py("examples", "render_pesq_curves.py"), None, None),
    # bench.py runs LAST: it folds docs/parity_six_wavs.json,
    # docs/scaling/serving_capacity.json and docs/streamed_*.json into
    # bench_full.json, so it must consume the artifacts THIS run just
    # produced — with bench first, those sections lag one generation
    # behind the run's own stamp (found in the round-5 regeneration:
    # bench_full carried streamed sections from a 3-hour-older SHA).
    ("bench", _py("bench.py"), ["--quick"],
     {"GCCNMF_BENCH_FULL_OUT": "/tmp/bench_full_quick.json"}),
)

# full-mode stdout captures for producers whose committed artifact IS
# their stdout (never applied under --quick)
_STDOUT_TO = {
    "batch_sweep": os.path.join(_REPO, "docs", "scaling", "batch_real.jsonl"),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="subset of step names (see --list)")
    ap.add_argument("--skip", nargs="*", default=[],
                    help="step names to leave out")
    ap.add_argument("--quick", action="store_true",
                    help="smoke mode: tiny configs where a step supports "
                         "one; steps without a quick form are SKIPPED "
                         "(their committed artifacts keep full scale)")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--keep-going", action="store_true",
                    help="continue past a failing step (status recorded)")
    args = ap.parse_args()

    if args.list:
        for name, argv, quick, _env in STEPS:
            mode = "quick-capable" if quick is not None else "full-only"
            print(f"{name:20s} {mode:14s} {' '.join(argv[1:])}")
        return 0

    names = {s[0] for s in STEPS}
    for sel in (args.only or []) + list(args.skip):
        if sel not in names:
            ap.error(f"unknown step {sel!r}; see --list")

    results = []
    rc_all = 0
    for name, argv, quick, quick_env in STEPS:
        if args.only is not None and name not in args.only:
            continue
        if name in args.skip:
            continue
        env = None
        if args.quick:
            if quick is None:
                results.append(dict(step=name, status="skipped (no quick form)"))
                continue
            argv = argv + quick
            if quick_env:
                env = dict(os.environ, **quick_env)
        print(f"== {name}: {' '.join(argv[1:])}", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        stdout_to = None if args.quick else _STDOUT_TO.get(name)
        # serialized on purpose: the tunnel wedges under concurrent clients
        if stdout_to:
            with open(stdout_to, "w") as fh:
                proc = subprocess.run(argv, cwd=_REPO, env=env, stdout=fh)
        else:
            proc = subprocess.run(argv, cwd=_REPO, env=env)
        dt = time.perf_counter() - t0
        results.append(dict(
            step=name, status="ok" if proc.returncode == 0 else "FAILED",
            rc=proc.returncode, seconds=round(dt, 1),
        ))
        print(f"== {name}: rc={proc.returncode} in {dt:.0f}s",
              file=sys.stderr, flush=True)
        if proc.returncode != 0:
            rc_all = 1
            if not args.keep_going:
                break

    from gccnmf_tpu.utils.stamp import run_stamp

    report = dict(steps=results, quick=bool(args.quick), stamp=run_stamp())
    # docs/evidence_run.json certifies a FULL regeneration — a partial or
    # smoke run must not overwrite that record with its own subset
    partial = bool(args.quick or args.only is not None or args.skip)
    out_path = (
        "/tmp/evidence_run_partial.json" if partial
        else os.path.join(_REPO, "docs", "evidence_run.json")
    )
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
        fh.write("\n")
    print(json.dumps(report))
    return rc_all


if __name__ == "__main__":
    sys.exit(main())
