"""Multi-stream serving runtime for RT-GCC-NMF.

Production deployments enhance many independent audio streams on one chip:
the per-block device program is identical for every stream, so the
TPU-native serving shape is a **fixed-slot lockstep batch** — one compiled
``step`` over ``(max_streams, C, block)`` with per-slot state, run once per
block interval, slots joining and leaving without recompilation. The
reference has no serving story (its realtime app is one stream in one
process, reference: gccNMF/realtime/runRealtimeGCCNMF.py:41-120); this
module is the scale-out analogue of its audio/DSP process pair.

Design:

- ``StreamServer(w, config, max_streams)`` compiles ONE step for the full
  slot batch. Opening/closing a stream flips a host-side slot flag and
  resets that slot's device state with a jitted, traced-index reset —
  neither operation recompiles anything.
- Per-stream control (target TDOA window, separation toggle, localization)
  is expressed as *batched* ``StreamParams`` leaves (shapes ``(B,)`` /
  ``(B,1,1)``), exploiting the step's broadcasting — the multi-tenant
  generalization of the reference's single set of Theano shared variables
  (gccNMFProcessor.py:195-199).
- Inactive slots process silence and their outputs are discarded; activity
  masking costs nothing on the MXU (the batch is padded to ``max_streams``
  regardless) and guarantees deterministic per-block latency independent
  of tenancy.
- Stream isolation is structural: every state leaf carries a leading slot
  axis and the step never mixes slots (verified by
  tests/test_serving.py::test_stream_isolation).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gccnmf_tpu.models.realtime import (
    RTGCCNMFProcessor,
    StreamConfig,
    StreamParams,
)

__all__ = ["StreamSettings", "StreamServer"]


class _FetchWorker:
    """Serial device→host fetcher on its own thread (async_fetch mode).

    The tick's p99 killer is the blocking ``np.asarray`` of an inflight
    output landing on a tunnel round-trip spike (measured 40–100 ms tails,
    docs/scaling/serving_capacity.json). The worker moves that wait off
    the tick thread: dispatches enqueue ``(device_out, submitted, t)``;
    the worker fetches in FIFO order (the async D2H copy was already
    started at dispatch, so a fetch is usually a no-wait handoff) and
    parks completed results. ``take`` is non-blocking until the number of
    outstanding ticks exceeds the pipeline depth — then it waits for the
    OLDEST result only (bounded backpressure: a spike delays delivery,
    never corrupts order, and the pipelined copies behind it complete
    together)."""

    def __init__(self):
        import queue
        import threading

        self._in: "queue.Queue" = queue.Queue()
        self._done: "queue.Queue" = queue.Queue()
        self.outstanding = 0  # accessed from the tick thread only
        self._thread = threading.Thread(
            target=self._run, name="gccnmf-serving-fetch", daemon=True
        )
        self._thread.start()

    def _run(self):
        while True:
            item = self._in.get()
            if item is None:
                return
            out, submitted, t_dispatch = item
            try:
                out_np = np.asarray(out)  # waits on the transfer, not GIL
            except Exception as e:  # a failed fetch must surface on the
                # tick thread, not strand take(block=True) forever
                self._done.put(e)
                continue
            self._done.put((out_np, submitted, t_dispatch, time.perf_counter()))

    def submit(self, out, submitted: dict, t_dispatch: float) -> None:
        self.outstanding += 1
        self._in.put((out, submitted, t_dispatch))

    def take(self, block: bool):
        """Oldest completed (out_np, submitted, t_dispatch, t_done) or
        None when nothing is ready and ``block`` is False. Re-raises a
        fetch failure (device error mid-transfer) on the caller thread."""
        import queue

        try:
            item = self._done.get(block=block)
        except queue.Empty:
            return None
        self.outstanding -= 1
        if isinstance(item, Exception):
            raise item
        return item

    def drain(self) -> list:
        """Wait for every outstanding tick (flush/teardown path)."""
        items = []
        while self.outstanding:
            items.append(self.take(block=True))
        return items

    def stop(self) -> None:
        self._in.put(None)
        self._thread.join(timeout=5)


@dataclass
class StreamSettings:
    """Per-stream control settings (host-side; see StreamParams)."""

    target_tdoa_index: float = 32.0
    target_epsilon: float = 5.0
    target_beta: float = 2.0
    noise_floor: float = 0.0
    separation_enabled: bool = True
    localization_enabled: bool = True
    localization_window: int = 6


class StreamServer:
    """Lockstep multi-stream RT-GCC-NMF enhancement server."""

    def __init__(
        self,
        w: np.ndarray,
        config: StreamConfig = StreamConfig(),
        max_streams: int = 8,
        mesh=None,
        pipeline_depth: int = 0,
        async_fetch: bool = False,
        wire_dtype: str = "float32",
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``data`` axis —
        the slot batch (state, params, blocks) is sharded across it, scaling
        tenancy across a host's chips over ICI with zero per-tick
        collectives (the step is slot-local by construction). max_streams
        must be a multiple of the data-axis size.

        ``pipeline_depth``: N>0 makes :meth:`process` return the outputs of
        the tick submitted N calls ago (empty dict while the pipeline
        fills; :meth:`flush` drains the tail) — the per-tick host↔device
        round trip moves off the tick deadline path for N blocks of extra
        serving latency.

        ``async_fetch``: with ``pipeline_depth`` > 0, fetch inflight
        outputs on a dedicated thread instead of blocking the tick: a
        transport latency spike then delays that one delivery (bounded by
        backpressure at ``pipeline_depth`` outstanding) instead of
        stalling every tenant's tick. Delivery ordering is FIFO either
        way; ``tick_stats()['delivery_ms']`` reports dispatch→delivery
        latency in async mode. This is the recommended production
        configuration (``gccnmf-serve`` defaults to depth 2 + async;
        measured capacity: docs/scaling/serving_capacity.json).

        ``wire_dtype``: ``"int16"`` ships tick blocks and outputs as
        16-bit PCM (half the host↔device bytes — the driver of per-tick
        time at high tenancy: 128 streams move ~1 MB/tick as f32) with
        PCM↔float conversion on device. The API stays float32 in/out;
        outputs are quantized exactly as ``utils.wav.write_wav`` would
        quantize them, so a WAV-bound deployment loses nothing. Same
        design as ``separate_batches(io_dtype="int16")``."""
        self.processor = RTGCCNMFProcessor(w, config)
        self.config = config
        self.max_streams = max_streams
        self.mesh = mesh
        self._slot_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dp = mesh.shape["data"]
            if max_streams % dp:
                raise ValueError(
                    f"max_streams ({max_streams}) must be a multiple of the "
                    f"data-axis size ({dp})"
                )
            self._slot_sharding = NamedSharding(mesh, P("data"))
        self._reset_slot = jax.jit(self._reset_slot_impl)  # per-instance
        if wire_dtype not in ("float32", "int16"):
            raise ValueError(f"wire_dtype must be float32 or int16: {wire_dtype}")
        self.wire_dtype = wire_dtype
        if wire_dtype == "int16":
            # per-instance wrapper (never class-level static-self jit):
            # PCM->float on device, step, float->PCM on device
            self._step_wire = jax.jit(self._step_i16_impl)
        self._state = self._place(self.processor.init_state(max_streams))
        self._fresh_slot_state = self.processor.init_state(1)
        self._settings: list[StreamSettings | None] = [None] * max_streams
        self._next_id = 0
        self._ids: dict[int, int] = {}  # stream_id -> slot
        self._blocks_processed = 0
        # params are uploaded once per settings change, not per tick, and
        # telemetry is fetched lazily — the per-tick host<->device traffic
        # is exactly one block upload and one output download
        self._params_cache: StreamParams | None = None
        self._pending_telemetry = None
        self._telemetry_cache = None  # materialized copy of the above
        if pipeline_depth < 0:
            raise ValueError("pipeline_depth must be >= 0")
        self.pipeline_depth = pipeline_depth
        # (device_out, {stream_id: slot} at dispatch time) awaiting fetch
        self._inflight: list = []
        self._fetcher = (
            _FetchWorker() if (async_fetch and pipeline_depth > 0) else None
        )
        # per-tick deadline accounting on the serving clock: every tick
        # must complete within one block interval or every tenant glitches
        # at once (the single-stream analogue is run()'s deadline_misses,
        # realtime/app.py). Percentiles come from a bounded native window;
        # the miss/tick counters are cumulative so multi-minute soaks
        # don't grow host memory.
        from gccnmf_tpu import native

        self.deadline_s = config.block_size / config.sample_rate
        self._tick_times = native.BlockTimes(capacity=1024)
        # async_fetch: dispatch→delivery latency of each returned tick
        self._delivery_times = native.BlockTimes(capacity=1024)
        from gccnmf_tpu.utils.hostmem import HostMemWatchdog, PeriodicTrim

        self._heap_trimmer = PeriodicTrim()
        self._mem_watchdog = HostMemWatchdog()
        self.ticks = 0
        self.deadline_misses = 0

    def _place(self, tree):
        """Shard every leaf's leading slot axis over the mesh (no-op
        single-device)."""
        if self._slot_sharding is None:
            return tree
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._slot_sharding), tree
        )

    # ----------------------------------------------------------- lifecycle

    @property
    def active_streams(self) -> int:
        return len(self._ids)

    def open_stream(self, settings: StreamSettings | None = None) -> int:
        """Claim a free slot → stream id. Raises when fully tenanted."""
        try:
            slot = self._settings.index(None)
        except ValueError:
            raise RuntimeError(f"all {self.max_streams} stream slots busy") from None
        # private copy: a caller sharing one StreamSettings object across
        # open_stream calls must not have update_stream on one tenant
        # mutate every other tenant opened with it
        from dataclasses import replace as dc_replace

        self._settings[slot] = dc_replace(settings) if settings else StreamSettings()
        self._params_cache = None
        self._state = self._reset_slot(self._state, jnp.int32(slot))
        stream_id = self._next_id
        self._next_id += 1
        self._ids[stream_id] = slot
        return stream_id

    def close_stream(self, stream_id: int) -> None:
        slot = self._ids.pop(stream_id)
        self._settings[slot] = None
        self._params_cache = None

    def update_stream(self, stream_id: int, **changes) -> None:
        """Adjust a live stream's settings (no recompile — traced params).
        All-or-nothing: keys are validated before any is applied, so a typo
        can never leave the recorded settings half-updated (and desynced
        from the cached device params)."""
        s = self._settings[self._ids[stream_id]]
        unknown = [k for k in changes if not hasattr(s, k)]
        if unknown:
            raise AttributeError(
                f"unknown stream setting(s): {', '.join(sorted(unknown))}"
            )
        for key, value in changes.items():
            setattr(s, key, value)
        self._params_cache = None

    # ------------------------------------------------------------- stepping

    def _step_i16_impl(self, state, blocks_i16, params):
        """int16-wire tick: /32768 in, writer-exact quantization out
        (utils/wav.py:41-49 semantics — clip to [-1, 1-2^-15], scale,
        truncate), both on device so the link carries half the bytes."""
        blocks = blocks_i16.astype(jnp.float32) / 32768.0
        state, out, telemetry = self.processor._step_impl(
            state, blocks, params
        )
        out_i16 = (
            jnp.clip(out, -1.0, 1.0 - 2.0**-15) * 32768.0
        ).astype(jnp.int16)
        return state, out_i16, telemetry

    def _from_wire(self, out_np: np.ndarray) -> np.ndarray:
        """Materialized tick output -> float32 API currency."""
        if self.wire_dtype == "int16":
            return out_np.astype(np.float32) / 32768.0
        return out_np

    def _reset_slot_impl(self, state, slot):
        """Zero one slot's state leaves (traced index: one compile total).
        Jitted per instance in __init__ — a class-level static-self jit
        would retain every server ever built in one global cache."""
        fresh = self._fresh_slot_state
        return jax.tree_util.tree_map(
            lambda full, f1: jax.lax.dynamic_update_index_in_dim(
                full, f1[0], slot, 0
            ),
            state,
            fresh,
        )

    def _batched_params(self) -> StreamParams:
        b = self.max_streams
        cols = {f: np.empty(b, np.float64) for f in (
            "target_tdoa_index", "target_epsilon", "target_beta", "noise_floor",
            "localization_window",
        )}
        sep = np.zeros(b, bool)
        loc = np.zeros(b, bool)
        default = StreamSettings()
        for slot in range(b):
            s = self._settings[slot] or default
            for f in cols:
                cols[f][slot] = getattr(s, f)
            sep[slot] = s.separation_enabled and self._settings[slot] is not None
            loc[slot] = s.localization_enabled
        return StreamParams(
            target_tdoa_index=jnp.asarray(cols["target_tdoa_index"], jnp.float32),
            target_epsilon=jnp.asarray(
                cols["target_epsilon"], jnp.float32
            ).reshape(b, 1, 1),
            target_beta=jnp.asarray(cols["target_beta"], jnp.float32).reshape(
                b, 1, 1
            ),
            noise_floor=jnp.asarray(cols["noise_floor"], jnp.float32).reshape(
                b, 1, 1
            ),
            separation_enabled=jnp.asarray(sep).reshape(b, 1, 1),
            localization_enabled=jnp.asarray(loc),
            localization_window=jnp.asarray(cols["localization_window"], jnp.int32),
        )

    def process(self, blocks: dict[int, np.ndarray]) -> dict[int, np.ndarray]:
        """One lockstep tick: ``{stream_id: (C, block)}`` in → same out.

        Streams without a submitted block this tick receive silence (their
        OLA/localization state still advances, preserving timing). Unknown
        ids raise. Returns each submitted stream's enhanced block plus its
        current telemetry under ``server.telemetry[stream_id]`` — or, with
        ``pipeline_depth`` N>0, the outputs of the tick N calls ago (the
        empty dict while the pipeline fills).
        """
        t0 = time.perf_counter()
        cfg = self.config
        expect = (cfg.num_channels, cfg.block_size)
        batch = np.zeros((self.max_streams,) + expect, np.float32)
        for stream_id, block in blocks.items():
            block = np.asarray(block)
            if block.shape != expect:
                # a (block,) or (1, block) mono submission would silently
                # numpy-broadcast into both channels — degenerate GCC-PHAT
                # and a wrong "enhanced" output with no error
                raise ValueError(
                    f"stream {stream_id}: block shape {block.shape} != "
                    f"expected {expect}"
                )
            batch[self._ids[stream_id]] = block
        if self._params_cache is None:
            self._params_cache = self._place(self._batched_params())
        if self.wire_dtype == "int16":
            wire = np.clip(batch * 32768.0, -32768.0, 32767.0).astype(
                np.int16
            )
            state, out, telemetry = self._step_wire(
                self._state, self._place(jnp.asarray(wire)),
                self._params_cache,
            )
        else:
            state, out, telemetry = self.processor.step(
                self._state, self._place(jnp.asarray(batch)),
                self._params_cache,
            )
        self._state = state
        self._blocks_processed += 1
        # keep telemetry on device; materialize only if someone reads it
        self._pending_telemetry = (
            dict(self._ids),
            telemetry["target_tdoa_index"],
        )
        self._telemetry_cache = None  # new tick invalidates the fetch
        if self.pipeline_depth:
            try:
                out.copy_to_host_async()
            except Exception:
                pass
            # ids are recorded at dispatch time: a stream closed (or its
            # slot re-tenanted) before its output surfaces still gets its
            # own audio back
            if self._fetcher is not None:
                self._fetcher.submit(
                    out, {s: self._ids[s] for s in blocks}, t0
                )
                item = self._fetcher.take(
                    block=self._fetcher.outstanding > self.pipeline_depth
                )
                if item is None:
                    self._record_tick(t0)
                    return {}
                out_np, submitted, t_dispatch, t_done = item
                self._delivery_times.record(t_done - t_dispatch)
                out_np = self._from_wire(out_np)
                result = {
                    sid: out_np[slot] for sid, slot in submitted.items()
                }
                self._heap_trimmer.account(batch.nbytes + out_np.nbytes)
                self._record_tick(t0)
                return result
            self._inflight.append((out, {s: self._ids[s] for s in blocks}))
            if len(self._inflight) <= self.pipeline_depth:
                self._record_tick(t0)
                return {}
            out, submitted = self._inflight.pop(0)
        else:
            submitted = {s: self._ids[s] for s in blocks}
        out_np = self._from_wire(np.asarray(out))
        result = {sid: out_np[slot] for sid, slot in submitted.items()}
        # days-long serving: trim the server's own allocator churn every
        # ~256 MB of traffic; the transport's live staging retention is
        # reported via tick_stats' host_mem watchdog (docs/tunnel_probe.json)
        self._heap_trimmer.account(batch.nbytes + out_np.nbytes)
        self._record_tick(t0)
        return result

    def _record_tick(self, t0: float) -> None:
        dt = time.perf_counter() - t0
        self._tick_times.record(dt)
        self.ticks += 1
        if dt > self.deadline_s:
            self.deadline_misses += 1

    def tick_stats(self) -> dict:
        """Serving-clock health: cumulative tick/deadline-miss counters plus
        wall-time stats over the recent (bounded) window — the multi-tenant
        analogue of ``RealtimeGCCNMF.run``'s per-block stats. p50/p99 are
        the capacity metric (docs/scaling/serving_capacity.json's axis):
        the tenancy is serving safely while p99 stays under deadline_ms."""
        # ONE window snapshot for every statistic — separate stats() /
        # percentiles() calls could straddle a concurrent tick and report
        # internally inconsistent values (e.g. p99 > max)
        window = self._tick_times.snapshot()
        if window.size:
            mn, mx, mean = float(window.min()), float(window.max()), float(
                window.mean()
            )
            p50, p99 = (float(np.percentile(window, q)) for q in (50.0, 99.0))
        else:
            mn = mx = mean = p50 = p99 = 0.0
        return dict(
            ticks=self.ticks,
            deadline_ms=round(self.deadline_s * 1e3, 3),
            deadline_misses=self.deadline_misses,
            tick_ms=dict(
                min=round(mn * 1e3, 3),
                mean=round(mean * 1e3, 3),
                p50=round(p50 * 1e3, 3),
                p99=round(p99 * 1e3, 3),
                max=round(mx * 1e3, 3),
                window=int(window.size),
            ),
            # the tunnel transport retains ~1 MiB of live host heap per
            # MiB uploaded for the life of the process (un-releasable
            # from user code — docs/tunnel_probe.json); exceeded=True is
            # the deployment signal to recycle this worker
            host_mem=self._mem_watchdog.check(),
            host_heap_trims=self._heap_trimmer.trims,
            # async_fetch mode: dispatch→delivery latency of returned
            # ticks — the deployment metric once the blocking fetch is
            # off the tick path (tick_ms then measures only dispatch)
            delivery_ms=self._delivery_stats(),
        )

    def _delivery_stats(self) -> dict | None:
        window = self._delivery_times.snapshot()
        if not window.size:
            return None
        p50, p99 = (float(np.percentile(window, q)) for q in (50.0, 99.0))
        return dict(
            p50=round(p50 * 1e3, 3),
            p99=round(p99 * 1e3, 3),
            max=round(float(window.max()) * 1e3, 3),
            window=int(window.size),
        )

    def flush(self) -> list[dict[int, np.ndarray]]:
        """Drain pipelined ticks (oldest first) after the last submit."""
        if self._fetcher is not None:
            items = self._fetcher.drain()
            for _, _, t_dispatch, t_done in items:
                self._delivery_times.record(t_done - t_dispatch)
            return [
                {
                    sid: self._from_wire(out_np)[slot]
                    for sid, slot in submitted.items()
                }
                for out_np, submitted, _, _ in items
            ]
        pending, self._inflight = self._inflight, []
        return [
            {
                sid: self._from_wire(np.asarray(out))[slot]
                for sid, slot in submitted.items()
            }
            for out, submitted in pending
        ]

    def close(self) -> None:
        """Stop the async fetch worker. Outstanding tick outputs are
        waited for and DISCARDED — call :meth:`flush` first if you want
        them. Idempotent; only needed in async_fetch mode — the worker is
        a daemon thread, so process exit never hangs on it either way."""
        if self._fetcher is not None:
            self._fetcher.drain()
            self._fetcher.stop()
            self._fetcher = None

    @property
    def telemetry(self) -> dict[int, dict]:
        """Per-stream telemetry of the latest tick (lazy device fetch,
        cached — a monitor polling between ticks pays the device→host
        transfer once per tick, not per read)."""
        if self._pending_telemetry is None:
            return {}
        ids, tdoa_dev = self._pending_telemetry
        if self._telemetry_cache is None:
            self._telemetry_cache = np.asarray(tdoa_dev)
        tdoa = self._telemetry_cache
        return {
            sid: dict(target_tdoa_index=float(tdoa[slot]))
            for sid, slot in ids.items()
        }
