"""Profiling and per-stage timing utilities.

The reference's only telemetry is ad-hoc wall-clock logging of per-block
processing times (reference: gccNMF/realtime/audioProcessor.py:98-102,130;
a richer logProcessingTimes at :162-181 is dead code). TPU-native
observability is two layers:

- :func:`trace` — a context manager around ``jax.profiler`` producing
  TensorBoard-loadable device traces (XLA op timeline, HBM usage);
- :class:`StageTimer` — host-side wall-clock stage timing with proper
  ``block_until_ready`` fencing, for benchmark harnesses and pipeline
  stage breakdowns (compile vs steady-state separation).
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from dataclasses import dataclass, field

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["trace", "annotate", "StageTimer", "block_all"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace into ``log_dir``.

    View with TensorBoard's profile plugin or Perfetto. Wrap steady-state
    iterations only (compile inside a trace drowns the timeline).
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named host annotation visible in profiler traces
    (``jax.profiler.TraceAnnotation``)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


def block_all(tree) -> None:
    """``block_until_ready`` every array in a pytree (timing fence)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


@dataclass
class StageTimer:
    """Accumulates named stage durations; prints a breakdown.

    >>> timer = StageTimer()
    >>> with timer.stage("stft"):
    ...     out = stft(...); block_all(out)
    >>> timer.summary()
    """

    stages: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> dict:
        out = {}
        for name, times in self.stages.items():
            t = np.asarray(times)
            out[name] = dict(
                calls=len(t),
                total_s=round(float(t.sum()), 4),
                mean_ms=round(float(t.mean() * 1e3), 3),
                p50_ms=round(float(np.percentile(t, 50) * 1e3), 3),
                max_ms=round(float(t.max() * 1e3), 3),
            )
        return out

    def log_summary(self) -> None:
        logger.info("stage timing: %s", json.dumps(self.summary()))
