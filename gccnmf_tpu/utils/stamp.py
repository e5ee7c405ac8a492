"""Provenance stamp for benchmark artifacts.

Every JSON artifact produced by ``bench.py`` or ``benchmarks/*.py`` embeds
``run_stamp()`` under a ``"stamp"`` key so round-over-round drift (e.g. the
round-3 133 -> 106 audio-s/s host-I/O swing) is attributable from the
committed artifacts alone: which commit produced the number, with which
jax/jaxlib, on which device, at what time.

The reference publishes perf claims with no provenance at all
(/root/reference/README.md); this is the framework's replacement for
"trust the README".
"""

from __future__ import annotations

import os
import subprocess
import time


def git_sha(repo_dir: str | None = None) -> str | None:
    """Short git SHA of the repo containing this file (or ``repo_dir``),
    with a ``-dirty`` suffix when the working tree has modifications."""
    if repo_dir is None:
        repo_dir = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=repo_dir, capture_output=True, text=True, timeout=10,
        )
        sha = out.stdout.strip()
        if not sha:
            return None
        dirty = subprocess.run(
            ["git", "status", "--porcelain", "--untracked-files=no"],
            cwd=repo_dir, capture_output=True, text=True, timeout=10,
        )
        if dirty.stdout.strip():
            sha += "-dirty"
        return sha
    except Exception:
        return None


def config_fingerprint(cfg) -> str:
    """Stable 12-hex fingerprint of a config dataclass/dict — the same
    identity notion ``checkpoint.py`` uses to refuse mismatched resumes,
    here identifying WHICH configuration produced a benchmark number."""
    import dataclasses
    import hashlib
    import json

    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        d = dataclasses.asdict(cfg)
    elif isinstance(cfg, dict):
        d = cfg
    else:
        d = {"repr": repr(cfg)}
    blob = json.dumps(d, sort_keys=True, default=str)
    return hashlib.sha1(blob.encode()).hexdigest()[:12]


def run_stamp(config_fingerprint: str | None = None) -> dict:
    """Provenance dict: git SHA, jax/jaxlib versions, UTC timestamp, and
    (optionally) the producing config's fingerprint.  The device string is
    deliberately NOT queried here — that would initialize a backend.

    Never raises and never initializes a JAX backend that isn't already
    live — safe to call from CPU-forced subprocesses (the axon tunnel is
    single-client; see tests/conftest.py).
    """
    stamp: dict = {
        "git_sha": git_sha(),
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    try:
        import jax
        import jaxlib

        stamp["jax_version"] = jax.__version__
        stamp["jaxlib_version"] = jaxlib.__version__
    except Exception:
        pass
    if config_fingerprint is not None:
        stamp["config_fingerprint"] = config_fingerprint
    return stamp
