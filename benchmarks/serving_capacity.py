#!/usr/bin/env python
"""Serving capacity on the real chip: tenancy vs p50/p99 tick latency.

The deployment question BENCH's aggregate realtime factor doesn't answer:
**how many concurrent streams can one chip serve while still meeting the
32 ms block deadline at p99?** (Deadline derivation: blockSize 512 @
16 kHz, reference gccNMF/realtime/config.py:63,68.)

Sweeps tenancy over the lockstep StreamServer at the production
configuration (pipeline_depth=2 — the dispatch round trip leaves the
deadline path; the consumer's blocking fetch of tick N−2's output is
*included*, it is the real output path). Per tenancy: 500 free-running
ticks (a stress superset of the paced 32 ms cadence), p50/p90/p99/max of
per-tick wall time, deadline misses, and the aggregate realtime factor.
The summary reports max streams meeting the deadline at p99.

Output: docs/scaling/serving_capacity.json (committed artifact; bench.py
folds the summary in).

Run on the real chip:  python benchmarks/serving_capacity.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
_OUT = os.path.join(_REPO, "docs", "scaling", "serving_capacity.json")

TENANCIES = (1, 8, 32, 64, 128)
TICKS = 500
WARMUP = 20
PIPELINE_DEPTH = 2


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


def device_tick_ms(n_streams: int) -> float:
    """Per-tick device compute at this tenancy: a whole-utterance scan
    over the lockstep batch (no host round trips inside — what a
    directly-attached host's tick would ride)."""
    import jax.numpy as jnp

    from gccnmf_tpu.models.realtime import (
        RTGCCNMFProcessor,
        StreamConfig,
        StreamParams,
    )

    rng = np.random.default_rng(0)
    w = rng.random((513, 64)).astype(np.float32) + 1e-3
    cfg = StreamConfig(sample_rate=16000)
    proc = RTGCCNMFProcessor(w, cfg)
    params = StreamParams.default()
    sigs = np.asarray(
        rng.standard_normal((n_streams, 2, 2 * 16000)), np.float32
    ) * 0.1
    blocks = jnp.asarray(proc.blocks_from_signal(sigs))
    nb = blocks.shape[0]
    state = proc.init_state(n_streams)

    import bench  # repo root is on sys.path; cached across calls

    scan_s = bench._timed_loop(
        lambda: proc.scan_blocks(state, blocks, params), 3
    )
    return scan_s / nb * 1e3


def sweep_one(
    n_streams: int,
    ticks: int = TICKS,
    warmup: int = WARMUP,
    pipeline_depth: int | None = None,
    async_fetch: bool = False,
    wire_dtype: str = "float32",
) -> dict:
    from gccnmf_tpu.serving import StreamServer, StreamSettings
    from gccnmf_tpu.models.realtime import StreamConfig

    if pipeline_depth is None:
        pipeline_depth = PIPELINE_DEPTH
    rng = np.random.default_rng(0)
    w = rng.random((513, 64)).astype(np.float32) + 1e-3
    cfg = StreamConfig(sample_rate=16000)
    server = StreamServer(
        w, cfg, max_streams=n_streams, pipeline_depth=pipeline_depth,
        async_fetch=async_fetch, wire_dtype=wire_dtype,
    )
    sids = [server.open_stream(StreamSettings()) for _ in range(n_streams)]

    # rotate through pre-generated block batches so host-side RNG stays
    # out of the measured tick (2-core host; generating 128x2x512 floats
    # per tick would be measurement noise)
    pool = [
        rng.standard_normal(
            (n_streams, cfg.num_channels, cfg.block_size)
        ).astype(np.float32)
        * 0.1
        for _ in range(8)
    ]

    def submit(i):
        batch = pool[i % len(pool)]
        return server.process({sid: batch[j] for j, sid in enumerate(sids)})

    for i in range(warmup):
        submit(i)
    times = []
    for i in range(ticks):
        t0 = time.perf_counter()
        submit(i)
        times.append(time.perf_counter() - t0)
    server.flush()

    times_ms = np.asarray(times) * 1e3
    deadline_ms = cfg.block_size / cfg.sample_rate * 1e3
    p50, p90, p99 = (float(np.percentile(times_ms, q)) for q in (50, 90, 99))
    row = dict(
        streams=n_streams,
        ticks=ticks,
        pipeline_depth=pipeline_depth,
        async_fetch=async_fetch,
        wire_dtype=wire_dtype,
        deadline_ms=deadline_ms,
        p50_ms=round(p50, 3),
        p90_ms=round(p90, 3),
        p99_ms=round(p99, 3),
        max_ms=round(float(times_ms.max()), 3),
        mean_ms=round(float(times_ms.mean()), 3),
        deadline_misses=int((times_ms > deadline_ms).sum()),
        meets_deadline_at_p99=bool(p99 < deadline_ms),
        aggregate_realtime_factor=round(
            n_streams * deadline_ms / float(np.mean(times_ms)), 1
        ),
        # stall census: the link exhibits sporadic multi-second freezes
        # (every configuration's max shows them); p99 capacity through
        # this harness is bounded by their frequency, not by throughput —
        # the top-5 makes that attributable per row
        stalls_over_3x_deadline=int((times_ms > 3 * deadline_ms).sum()),
        slowest_ticks_ms=[
            round(float(x), 1) for x in np.sort(times_ms)[-5:]
        ],
    )
    if async_fetch:
        # delivery latency (dispatch → output on host) from the server's
        # own window: the async tick no longer contains the fetch, so
        # capacity needs BOTH p99s — tick under deadline AND delivery
        # within the depth + 2-block latency budget (VERDICT r4 #3's
        # "within <=2 extra blocks")
        st = server.tick_stats()
        d = st.get("delivery_ms") or {}
        row["delivery_p50_ms"] = d.get("p50")
        row["delivery_p99_ms"] = d.get("p99")
        row["delivery_max_ms"] = d.get("max")
        budget_ms = (pipeline_depth + 2) * deadline_ms
        row["latency_budget_ms"] = budget_ms
        row["meets_deadline_and_latency_budget"] = bool(
            row["meets_deadline_at_p99"]
            and d.get("p99") is not None
            and d["p99"] <= budget_ms
        )
    server.close()
    return row


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ticks", type=int, default=TICKS)
    ap.add_argument("--out", default=_OUT)
    ap.add_argument(
        "--tenancies", type=int, nargs="*", default=list(TENANCIES)
    )
    ap.add_argument(
        "--depths", type=int, nargs="*", default=[PIPELINE_DEPTH, 4, 8],
        help="pipeline depths to sweep; the FIRST is the headline depth. "
             "Deeper pipelining absorbs the link's tail spikes at a cost "
             "of depth x 32 ms of serving latency",
    )
    ap.add_argument(
        "--replicas", type=int, default=3,
        help="replicas of the headline-depth sync and async sweeps; the "
             "published capacity is the MEDIAN of the per-replica "
             "capacities (same discipline as the streamed bench's "
             "median-of-4: the link's ~1%%-frequency multi-second stalls "
             "make any single 500-tick p99 a coin flip — single-sweep "
             "capacities measured {8,1,8,1} across one day)",
    )
    args = ap.parse_args()

    jax = _setup_jax()
    # link health bracket: this sweep is transfer-bound through the
    # tunnel, whose bulk rate swings by integer factors between minutes —
    # a degraded-window run must be attributable from the artifact alone
    from linkprobe import measure_link_mb_s

    link_before = measure_link_mb_s()
    print(f"# link before: {json.dumps(link_before)}", file=sys.stderr)
    headline_depth = args.depths[0]
    rows = []
    depth_rows = []
    replicas = max(1, args.replicas)
    for rep in range(replicas):
        for n in args.tenancies:
            row = sweep_one(
                n, ticks=args.ticks, pipeline_depth=headline_depth
            )
            row["replica"] = rep
            if rep == 0:
                row["device_ms_per_tick"] = round(device_tick_ms(n), 3)
                row["device_meets_deadline"] = bool(
                    row["device_ms_per_tick"] < row["deadline_ms"]
                )
            rows.append(row)
            print(f"# {json.dumps(row)}", file=sys.stderr)
    for depth in args.depths[1:]:
        for n in args.tenancies:
            row = sweep_one(n, ticks=args.ticks, pipeline_depth=depth)
            depth_rows.append(row)
            print(f"# {json.dumps(row)}", file=sys.stderr)

    # async-fetch sweep at the headline depth: the production default
    # (gccnmf-serve: pipeline_depth=2 + fetch thread) — ticks contain
    # only dispatch; capacity requires tick p99 < deadline AND delivery
    # p99 within (depth+2) blocks
    async_rows = []
    for rep in range(replicas):
        for n in args.tenancies:
            row = sweep_one(
                n, ticks=args.ticks, pipeline_depth=headline_depth,
                async_fetch=True,
            )
            row["replica"] = rep
            async_rows.append(row)
            print(f"# {json.dumps(row)}", file=sys.stderr)
    # int16 wire at the two highest tenancies: per-tick bytes halve,
    # which is the p50 driver once the batch transfer dominates
    for n in args.tenancies[-2:]:
        row = sweep_one(
            n, ticks=args.ticks, pipeline_depth=headline_depth,
            async_fetch=True, wire_dtype="int16",
        )
        async_rows.append(row)
        print(f"# {json.dumps(row)}", file=sys.stderr)

    def _median_capacity(all_rows, key) -> tuple[int, list[int]]:
        """Per-replica max tenancy passing ``key`` → (median, raw list)."""
        caps = []
        for rep in range(replicas):
            ok = [
                r["streams"] for r in all_rows
                if r.get("replica") == rep and r.get(key)
                and r.get("wire_dtype", "float32") == "float32"
            ]
            caps.append(max(ok) if ok else 0)
        return int(np.median(caps)), caps

    dev_meeting = [
        r["streams"] for r in rows if r.get("device_meets_deadline")
    ]
    depth_capacity = {
        str(headline_depth): _median_capacity(
            rows, "meets_deadline_at_p99"
        )[0],
    }
    for depth in args.depths[1:]:
        ok = [
            r["streams"]
            for r in depth_rows
            if r["pipeline_depth"] == depth and r["meets_deadline_at_p99"]
        ]
        depth_capacity[str(depth)] = max(ok) if ok else 0
    result = dict(
        metric="serving capacity",
        # two tiers, because this harness reaches the chip through the
        # axon tunnel whose ~26-30 ms round trip and tail spikes dominate
        # the host-loop p99 (p99 at tenancy 1 is already ~31 ms against
        # 0.04 ms of device compute): the host-loop number is what THIS
        # harness sustains; the device-compute number is what bounds a
        # directly-attached production host (+~0.2 ms dispatch)
        # MEDIAN of per-replica capacities (raw per-replica lists
        # alongside): a single 500-tick p99 through this link is a coin
        # flip on catching one of its multi-second stalls
        max_streams_meeting_deadline_at_p99=_median_capacity(
            rows, "meets_deadline_at_p99"
        )[0],
        sync_capacity_per_replica=_median_capacity(
            rows, "meets_deadline_at_p99"
        )[1],
        max_streams_by_device_compute=max(dev_meeting) if dev_meeting else 0,
        # the production default (async fetch thread at the headline
        # depth): max tenancy whose tick p99 meets the deadline AND whose
        # dispatch→delivery p99 stays within (depth+2) blocks
        max_streams_async_within_latency_budget=_median_capacity(
            async_rows, "meets_deadline_and_latency_budget"
        )[0],
        async_capacity_per_replica=_median_capacity(
            async_rows, "meets_deadline_and_latency_budget"
        )[1],
        # deeper pipelining amortizes link-tail spikes across more inflight
        # ticks (cost: depth x 32 ms of serving latency) — per-depth max
        # tenancy meeting the p99 deadline
        max_streams_at_p99_by_depth=depth_capacity,
        deadline_ms=rows[0]["deadline_ms"] if rows else 32.0,
        pipeline_depth=headline_depth,
        note=(
            "free-running ticks (stress superset of the paced 32 ms "
            "cadence); p99 over %d ticks/tenancy; sync rows include the "
            "blocking fetch of tick N-depth's output, async rows fetch on "
            "a consumer thread (tick = dispatch only, delivery_* = "
            "dispatch->output latency). CAPACITY CAVEAT: the tunnel "
            "freezes for multiple SECONDS sporadically (see "
            "slowest_ticks_ms / delivery_max_ms in every configuration, "
            "with healthy link_probe rates on both sides of the sweep) — "
            "at ~1%% frequency over 500 ticks, p99 through this harness "
            "is bounded by stall luck, not server structure; absorbing a "
            "3 s stall needs ~100 blocks of pipeline. On an attached "
            "host the async tick cost is the dispatch p50 (2-5 ms at "
            "8-32 streams), leaving capacity device-bound (>=128)."
            % args.ticks
        ),
        backend=jax.default_backend(),
        device=str(jax.devices()[0]),
        tenancies=rows,
        depth_sweep=depth_rows,
        async_sweep=async_rows,
        link_probe=dict(before=link_before, after=measure_link_mb_s()),
    )
    from gccnmf_tpu.utils.stamp import run_stamp

    result["stamp"] = run_stamp()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")
    print(json.dumps({k: result[k] for k in (
        "max_streams_meeting_deadline_at_p99", "deadline_ms")}))


if __name__ == "__main__":
    main()
