"""Same-moment raw tunnel throughput probe, shared by the harness benches.

The axon link's bulk rate swings by integer factors between minutes
(measured 9–59 MB/s within one hour on 2026-08-21), and every
transfer-bound artifact (streamed ingest, serving capacity) tracks the
link's health at measurement time, not the pipeline's structure. Each
producer records this probe alongside its numbers so a degraded-window
run is attributable from the artifact alone.
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["measure_link_mb_s"]


def measure_link_mb_s(mb: int = 48) -> dict:
    """One ``mb``-MB int16 upload (fenced by a 1-element fetch) and one
    ``mb``-MB download, timed. ~2·mb MB of traffic per call — the caller
    pays it once per measurement block, not per iteration."""
    import jax
    import jax.numpy as jnp

    n = mb * 1000 * 1000 // 2
    buf = np.zeros(n, np.int16)
    up = jax.jit(lambda v: v[:1])
    np.asarray(up(np.zeros(4, np.int16)))  # compile outside the timing
    t0 = time.perf_counter()
    np.asarray(up(buf))  # 1-element fetch fences the full upload
    up_s = time.perf_counter() - t0
    down = jax.jit(
        lambda k: (jnp.arange(n, dtype=jnp.int32) % 128).astype(jnp.int16) + k
    )
    down(np.int16(0)).block_until_ready()
    t0 = time.perf_counter()
    arr = np.asarray(down(np.int16(1)))
    down_s = time.perf_counter() - t0
    del arr
    return dict(
        probe_mb=mb,
        upload_mb_s=round(mb / up_s, 1),
        download_mb_s=round(mb / down_s, 1),
    )
