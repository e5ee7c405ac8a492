"""Tests for the profiling helpers (gccnmf_tpu.profiling)."""

import os
import time

import jax.numpy as jnp
import numpy as np

from gccnmf_tpu import profiling


def test_stage_timer_summary():
    timer = profiling.StageTimer()
    for _ in range(3):
        with timer.stage("a"):
            time.sleep(0.002)
    with timer.stage("b"):
        pass
    s = timer.summary()
    assert s["a"]["calls"] == 3 and s["b"]["calls"] == 1
    assert s["a"]["mean_ms"] >= 1.0
    assert s["a"]["p50_ms"] <= s["a"]["max_ms"]
    timer.log_summary()  # must not raise


def test_block_all_fences_pytree():
    tree = {"x": jnp.arange(4.0), "y": [jnp.ones((2, 2)), 3]}
    profiling.block_all(tree)  # must not raise on non-array leaves


def test_annotate_context():
    with profiling.annotate("unit-test-region"):
        _ = jnp.square(jnp.arange(8.0)).sum()


def test_trace_writes_files(tmp_path):
    log_dir = str(tmp_path / "trace")
    with profiling.trace(log_dir):
        x = jnp.arange(1024.0)
        (x * 2).block_until_ready()
    found = []
    for root, _dirs, files in os.walk(log_dir):
        found += files
    assert found, "profiler trace produced no files"
