"""Headless realtime GCC-NMF application shell.

The reference's app (reference: gccNMF/realtime/runRealtimeGCCNMF.py:41-190)
spawns three OS processes — Qt GUI, PyAudio I/O, DSP — wired with
Queue+Event handshakes and shared-memory arrays. The TPU-native runtime is a
single host process:

- the audio layer is an iterator (:class:`FilePlayerSource`);
- the DSP is one jitted ``step`` whose state lives on device
  (:class:`gccnmf_tpu.models.realtime.RTGCCNMFProcessor`);
- control parameters are traced scalars (``StreamParams``) — updating them
  between blocks never recompiles, the analogue of the reference's Theano
  SharedVariable fast path (gccNMFProcessor.py:106-125);
- structural changes (dictionary size/type) rebuild the engine, the
  analogue of the reference's reset()/buildTheanoFunctions slow path
  (gccNMFProcessor.py:127-157, 233-270);
- telemetry histories are host ring buffers (:class:`CircularBuffer`)
  updated from the step's telemetry outputs, replacing the shared-memory
  buffers the reference GUI reads (runRealtimeGCCNMF.py:74-81);
- per-block wall times are logged every 2 s like the reference's audio
  process (audioProcessor.py:98-102).

No GUI: this is the ``RealtimeGCCNMFNoGUI`` equivalent
(runRealtimeGCCNMF.py:122-179) and the programmatic host for notebooks and
benchmarks. Visualization helpers live in :mod:`gccnmf_tpu.viz`.
"""

from __future__ import annotations

import logging
import threading
import time
from collections import deque
from dataclasses import replace as dc_replace

import numpy as np

from gccnmf_tpu import native, pretrain
from gccnmf_tpu.config import GCCNMFConfig, load_config
from gccnmf_tpu.models.realtime import (
    RTGCCNMFProcessor,
    StreamConfig,
    StreamParams,
)
from gccnmf_tpu.realtime.audio import FilePlayerSource, StreamingSink, WavSink
from gccnmf_tpu.realtime.buffers import CircularBuffer

logger = logging.getLogger(__name__)

__all__ = ["RealtimeGCCNMF"]

_TELEMETRY_LOG_INTERVAL_S = 2.0


class RealtimeGCCNMF:
    """Single-process realtime GCC-NMF speech enhancer over a WAV source."""

    def __init__(
        self,
        audio_path: str | None = None,
        config_path: str | None = None,
        config: GCCNMFConfig | None = None,
        dictionaries: dict | None = None,
        pipeline_depth: int = 0,
    ):
        """``pipeline_depth``: number of blocks the output is allowed to lag
        dispatch. 0 (default) fetches each block's output before the next
        dispatch — one full host↔device round trip on the deadline path per
        block. N>0 dispatches block n, starts an async device→host copy,
        and returns block n−N's (already-copied) output — the round trip
        leaves the deadline path entirely at the price of N blocks of extra
        latency (N·32 ms at the reference geometry). The reference pays a
        comparable price with its fixed 2-block OLA emission delay
        (utils.py:116) plus the Event-handshake round trip
        (audioProcessor.py:118-122)."""
        self.config = config or load_config(config_path, audio_path=audio_path)
        cfg = self.config
        self.audio_path = audio_path or cfg.audio_path
        if self.audio_path is None:
            from gccnmf_tpu import defs

            self.audio_path = defs.DEFAULT_AUDIO_FILE
        self._dictionaries = dictionaries  # {type: {size: W}} or None (lazy)
        self.dictionary_size = cfg.dictionary_size
        self.dictionary_type = cfg.dictionary_type
        self.params = StreamParams.default(
            target_epsilon=cfg.target_tdoa_epsilon,
            target_beta=cfg.target_tdoa_beta,
            noise_floor=cfg.target_tdoa_noise_floor,
            localization_enabled=cfg.localization_enabled,
            localization_window=cfg.localization_window_size,
            target_tdoa_index=cfg.num_tdoas / 2.0,
        )
        self._processor: RTGCCNMFProcessor | None = None
        self._state = None
        if pipeline_depth < 0:
            raise ValueError("pipeline_depth must be >= 0")
        self.pipeline_depth = pipeline_depth
        self._inflight: deque = deque()  # device outputs awaiting fetch
        # (old_state, keep_localization) to migrate into the next engine
        self._carry_state: tuple | None = None
        # serializes structural engine swaps (set_dictionary, called from a
        # GUI thread) against the audio thread's process_block — without it
        # the pump can observe _processor/_state mid-rebuild (None)
        self._engine_lock = threading.Lock()
        # per-block wall-time telemetry in the native tier (lock-free window
        # ring; reference logs the same min/avg/max, audioProcessor.py:98-102)
        self._block_times = native.BlockTimes(capacity=256)
        from gccnmf_tpu.utils.hostmem import PeriodicTrim

        self._heap_trimmer = PeriodicTrim()
        self._last_log = time.perf_counter()

        hist = cfg.num_tdoa_history
        spec_hist = cfg.num_spectrogram_history
        # one coefficient-mask history per dictionary size, kept across size
        # switches so flipping back restores the old waterfall (the reference
        # allocates one shared buffer per size up front,
        # runRealtimeGCCNMF.py:74-81); sizes are allocated lazily here
        self._mask_histories: dict[int, CircularBuffer] = {
            cfg.dictionary_size: CircularBuffer(cfg.dictionary_size, spec_hist)
        }
        self._histories = {
            "gcc_phat": CircularBuffer(cfg.num_tdoas, hist),
            "tdoa": CircularBuffer((), hist),
            "input_spectrogram": CircularBuffer(cfg.num_freq, spec_hist),
            "output_spectrogram": CircularBuffer(cfg.num_freq, spec_hist),
            "coefficient_mask": self._mask_histories[cfg.dictionary_size],
        }
        # telemetry stays device-side until someone reads `histories`
        # (the GUI's 100 ms timer, a notebook cell): the deadline-critical
        # block loop never pays device→host fetches for plots nobody is
        # watching. Bounded at the history depth so a late drain can still
        # fill the rings completely (a shorter bound silently truncated
        # headless runs' waterfalls to its length).
        self._pending_telemetry: deque = deque(
            maxlen=max(hist, spec_hist)
        )

    # ----------------------------------------------------------- dictionary

    def _activate_mask_history(self, size: int) -> None:
        """Point the active coefficient-mask history at ``size``'s buffer,
        allocating it on first use. Old sizes keep their waterfalls (the
        reference's per-size shared buffers, runRealtimeGCCNMF.py:74-81).
        Pending telemetry carries the *old* mask width, so it is dropped."""
        buf = self._mask_histories.setdefault(
            size, CircularBuffer(size, self.config.num_spectrogram_history)
        )
        if self._histories["coefficient_mask"] is not buf:
            self._histories["coefficient_mask"] = buf
            self._pending_telemetry.clear()

    @property
    def mask_histories(self) -> dict:
        """Per-dictionary-size coefficient-mask rings (lazily allocated)."""
        return self._mask_histories

    def peek_dictionary(self) -> np.ndarray | None:
        """The current engine's dictionary W, or None if no engine is built.

        Never triggers a (re)build — safe from the GUI thread. Building
        belongs to the audio thread's :meth:`process_block` under the
        engine lock; a GUI-thread ``self.processor`` access would race it
        (two engines built, one state lost, or a step on ``state=None``)."""
        proc = self._processor  # atomic reference read; None mid-rebuild
        return None if proc is None else np.asarray(proc.w)

    def _get_dictionary(self) -> np.ndarray:
        if self.config.dictionary_file:
            # explicit artifact (gccnmf-pretrain --save-dir handoff) wins
            # over the corpus-keyed pretraining cache
            w = pretrain.load_dictionary_file(
                self.config.dictionary_file, self.config.num_freq
            )
            k = w.shape[1]
            if k != self.dictionary_size:
                # the artifact's atom count is the truth: telemetry buffers
                # sized from cfg.dictionary_size would reject the engine's
                # (·, K) masks with a broadcast error otherwise
                self.dictionary_size = k
                self.config = dc_replace(self.config, dictionary_size=k)
                self._activate_mask_history(k)
            return w
        if self._dictionaries is None:
            self._dictionaries = {}
        bank = self._dictionaries.setdefault(self.dictionary_type, {})
        if self.dictionary_size not in bank:
            # fetch lazily, one size at a time — switching sizes later only
            # trains/loads what is actually used (the reference pretrains
            # every size up front, gccNMFPretraining.py:43-58)
            trained = pretrain.get_dictionaries(
                self.config.window_size, sizes=(self.dictionary_size,)
            )
            for dict_type, sizes in trained.items():
                self._dictionaries.setdefault(dict_type, {}).update(sizes)
        return self._dictionaries[self.dictionary_type][self.dictionary_size]

    @property
    def processor(self) -> RTGCCNMFProcessor:
        if self._processor is None:
            cfg = self.config
            self._processor = RTGCCNMFProcessor(
                self._get_dictionary(), StreamConfig.from_app_config(cfg)
            )
            fresh = self._processor.init_state(1)
            if self._carry_state is not None:
                old_state, keep_localization = self._carry_state
                self._carry_state = None
                fresh = self._migrate_state(fresh, old_state, keep_localization)
            self._state = fresh
        return self._processor

    @staticmethod
    def _migrate_state(fresh, old, keep_localization: bool):
        """Carry compatible state across a structural engine rebuild.

        Audio-path leaves (input carry, OLA accumulator, delay FIFO) are
        preserved whenever their shapes match, so a mid-stream rebuild does
        not open an audible gap; localization leaves (GCC-PHAT history,
        target index) are only meaningful when the TDOA grid is unchanged
        (same num_tdoas AND mic separation — the grid spans ±d/c, so old
        indexes point elsewhere after a geometry change). The reference
        resets everything on these changes (gccNMFProcessor.py:157->233)."""
        leaves = fresh._asdict()
        old_leaves = old._asdict()
        keys = ["carry_in", "ola_acc", "delay_buf"]
        if keep_localization:
            keys += ["gcc_history", "hist_count", "target_idx"]
        for k in keys:
            if old_leaves[k].shape == leaves[k].shape:
                leaves[k] = old_leaves[k]
        from gccnmf_tpu.models.realtime import StreamState

        return StreamState(**leaves)

    # ----------------------------------------------------- parameter control

    def set_target_window(
        self,
        target_tdoa_index: float | None = None,
        epsilon: float | None = None,
        beta: float | None = None,
        noise_floor: float | None = None,
    ) -> None:
        """Hot path: mask-window slider updates; no recompilation
        (reference gccNMFProcessor.py:106-125, setTargetTDOARange)."""
        import jax.numpy as jnp

        p = self.params
        if target_tdoa_index is not None:
            p = p._replace(target_tdoa_index=jnp.float32(target_tdoa_index))
        if epsilon is not None:
            p = p._replace(target_epsilon=jnp.float32(epsilon))
        if beta is not None:
            p = p._replace(target_beta=jnp.float32(beta))
        if noise_floor is not None:
            p = p._replace(noise_floor=jnp.float32(noise_floor))
        self.params = p

    def set_separation_enabled(self, enabled: bool) -> None:
        import jax.numpy as jnp

        self.params = self.params._replace(
            separation_enabled=jnp.asarray(enabled, bool)
        )

    def set_localization(self, enabled: bool, window_size: int | None = None) -> None:
        import jax.numpy as jnp

        p = self.params._replace(localization_enabled=jnp.asarray(enabled, bool))
        if window_size is not None:
            p = p._replace(localization_window=jnp.int32(window_size))
        self.params = p

    def set_dictionary(self, size: int | None = None, type: str | None = None) -> None:
        """Slow path: structural change → rebuild engine
        (reference gccNMFProcessor.py:127-157). OLA/localization state is
        carried over (shapes are unaffected by the dictionary), so the swap
        is gap-free mid-stream — the reference resets instead."""
        with self._engine_lock:
            if size is not None:
                self.dictionary_size = size
                self.config = dc_replace(self.config, dictionary_size=size)
                self._activate_mask_history(size)
            if type is not None:
                self.dictionary_type = type
            if self._state is not None:
                self._carry_state = (self._state, True)
            self._processor = None  # lazy rebuild on next block
            self._state = None

    def set_num_tdoas(self, num_tdoas: int) -> None:
        """Structural: new TDOA grid resolution (reference structural-reset
        list, gccNMFProcessor.py:131). Audio state survives; localization
        history/target reset (indexes are grid-relative); the target window
        center is re-centered on the new grid."""
        self._reconfigure(num_tdoas=int(num_tdoas))

    def set_mic_separation(self, metres: float) -> None:
        """Structural: new microphone geometry → new steering matrix. Audio
        state survives; localization state resets (the grid spans ±d/c, so
        history under the old d is meaningless)."""
        self._reconfigure(microphone_separation_in_metres=float(metres))

    def set_num_h_updates(self, n: int) -> None:
        """Structural: 0 = the reference's W-only realtime mask; N>0 adds N
        per-block H-inference steps and the H-aware Wiener mask (the
        reference plumbs numHUpdates but never uses it,
        gccNMFProcessor.py:195 vs :201-231). All state survives — only the
        mask computation changes."""
        if n < 0:
            raise ValueError("num_h_updates must be >= 0")
        self._reconfigure(num_h_updates=int(n))

    def set_target_mode(self, mode) -> None:
        """Structural: boxcar vs generalized-Gaussian coefficient mask
        (reference TARGET_MODE_* constants). All state survives — only the
        mask function changes."""
        from gccnmf_tpu.models.realtime import parse_target_mode

        parse_target_mode(mode)  # validate before committing
        self._reconfigure(target_mode=str(mode))

    def set_block_geometry(
        self,
        block_size: int | None = None,
        window_size: int | None = None,
        hop_size: int | None = None,
    ) -> None:
        """Structural: new STFT/block geometry. Everything rebuilds (every
        state shape depends on these); compatible leaves — e.g. the OLA
        accumulator when only the hop changes within the same window — are
        still carried."""
        changes = {
            k: int(v)
            for k, v in dict(
                block_size=block_size, window_size=window_size, hop_size=hop_size
            ).items()
            if v is not None
        }
        if not changes:
            return
        self._reconfigure(**changes)

    def _reconfigure(self, **changes) -> None:
        """Apply structural config changes and schedule an engine rebuild
        that preserves whatever state remains meaningful (the analogue of
        the reference's reset()-on-structural-param path,
        gccNMFProcessor.py:127-157, but state-preserving where possible)."""
        import jax.numpy as jnp

        with self._engine_lock:
            old_cfg = self.config
            cfg = dc_replace(old_cfg, **changes)
            # validate BEFORE committing: a bad geometry must be rejected
            # here at the caller (GUI handler, control surface), not
            # surface as an opaque engine-rebuild exception on the audio
            # thread at the next block (set_target_mode already follows
            # this validate-then-commit pattern)
            if cfg.block_size % cfg.hop_size:
                raise ValueError(
                    f"hop_size ({cfg.hop_size}) must divide block_size "
                    f"({cfg.block_size})"
                )
            if cfg.hop_size > cfg.window_size:
                raise ValueError(
                    f"hop_size ({cfg.hop_size}) must not exceed "
                    f"window_size ({cfg.window_size})"
                )
            if min(cfg.block_size, cfg.hop_size, cfg.window_size) < 1:
                raise ValueError("block/hop/window sizes must be positive")
            self.config = cfg
            # localization state is grid-relative: keep it only if the grid
            # (resolution AND physical span) is unchanged
            keep_localization = (
                cfg.num_tdoas == old_cfg.num_tdoas
                and cfg.microphone_separation_in_metres
                == old_cfg.microphone_separation_in_metres
            )
            stale_telemetry = False
            if cfg.num_tdoas != old_cfg.num_tdoas:
                self._histories["gcc_phat"] = CircularBuffer(
                    cfg.num_tdoas, cfg.num_tdoa_history
                )
                # the manual target window center is grid-relative too
                self.params = self.params._replace(
                    target_tdoa_index=jnp.float32(cfg.num_tdoas / 2.0)
                )
                stale_telemetry = True
            if cfg.num_freq != old_cfg.num_freq:
                for key in ("input_spectrogram", "output_spectrogram"):
                    self._histories[key] = CircularBuffer(
                        cfg.num_freq, cfg.num_spectrogram_history
                    )
                stale_telemetry = True
                # dictionaries are per-window-size ((F, K) rows = num_freq):
                # drop the cached bank so the next block re-resolves for the
                # new F (the reference pretrains per windowSize the same
                # way, gccNMFPretraining.py:43-58). An explicit
                # dictionary_file keeps its F validation and will raise.
                self._dictionaries = None
            if stale_telemetry:
                self._pending_telemetry.clear()
            if self._state is not None:
                self._carry_state = (self._state, keep_localization)
            self._processor = None
            self._state = None

    # ------------------------------------------------------------------ run

    @property
    def histories(self) -> dict:
        """Telemetry ring buffers; reading drains pending device telemetry
        (the fetch happens here, on the reader's clock, not per block)."""
        self.drain_telemetry()
        return self._histories

    def drain_telemetry(self) -> None:
        """Materialize queued device telemetry into the host histories.

        Runs under the engine lock: :meth:`set_dictionary` clears the queue
        and swaps the mask buffer's width, and a drain racing that swap
        could apply an old-width mask to the new buffer."""
        with self._engine_lock:
            while self._pending_telemetry:
                self._update_histories(self._pending_telemetry.popleft())

    def _update_histories(self, telemetry: dict) -> None:
        h = self._histories
        h["gcc_phat"].set(np.asarray(telemetry["gcc_phat"][0]))
        h["tdoa"].set(
            np.repeat(
                np.asarray(telemetry["target_tdoa_index"][0]),
                telemetry["gcc_phat"].shape[1],
            )
        )
        h["input_spectrogram"].set(np.asarray(telemetry["input_mag"][0]))
        h["output_spectrogram"].set(np.asarray(telemetry["output_mag"][0]))
        h["coefficient_mask"].set(np.asarray(telemetry["coefficient_mask"][0]))

    def _log_block_times(self) -> None:
        now = time.perf_counter()
        if now - self._last_log >= _TELEMETRY_LOG_INTERVAL_S:
            mn, mx, mean, n = self._block_times.stats()
            if n:
                logger.info(
                    "processing times (ms): min %.2f / avg %.2f / max %.2f"
                    " over last %d blocks",
                    mn * 1e3,
                    mean * 1e3,
                    mx * 1e3,
                    n,
                )
            self._last_log = now

    def block_time_stats(self) -> tuple[float, float, float, int]:
        """(min_s, max_s, mean_s, count) over the recent telemetry window."""
        return self._block_times.stats()

    def process_block(self, block: np.ndarray) -> np.ndarray | None:
        """Process one (C, block_size) block through the engine.

        With ``pipeline_depth == 0`` returns this block's output. With
        ``pipeline_depth == N`` returns the output of the block submitted N
        calls ago (``None`` while the pipeline fills); call :meth:`flush`
        after the last block to drain the tail.

        Thread-safe against :meth:`set_dictionary` (the GUI's structural
        slow path); the uncontended lock cost is nanoseconds next to the
        device step."""
        import jax.numpy as jnp

        with self._engine_lock:
            proc = self.processor
            t0 = time.perf_counter()
            self._state, out, telemetry = proc.step(
                self._state, jnp.asarray(block[None]), self.params
            )
            # queued under the lock: set_dictionary clears the queue when
            # the mask width changes, and a stale old-width item appended
            # after its clear would crash the next histories drain
            self._pending_telemetry.append(telemetry)
            if self.pipeline_depth:
                try:
                    out.copy_to_host_async()
                except Exception:  # backends without async copy: fetch later
                    pass
                self._inflight.append(out)
                ready = (
                    self._inflight.popleft()
                    if len(self._inflight) > self.pipeline_depth
                    else None
                )
            else:
                ready = out
        out_np = np.asarray(ready[0]) if ready is not None else None
        self._block_times.record(time.perf_counter() - t0)
        # hour-scale sessions: trim the loop's own allocator churn; the
        # transport's live staging retention (docs/tunnel_probe.json) is
        # surfaced via the health line's memory watchdog instead
        self._heap_trimmer.account(
            block.nbytes + (out_np.nbytes if out_np is not None else 0)
        )
        self._log_block_times()
        return out_np

    def flush(self) -> list[np.ndarray]:
        """Fetch the outputs still in the dispatch pipeline (oldest first)."""
        with self._engine_lock:
            pending, self._inflight = list(self._inflight), deque()
        return [np.asarray(out[0]) for out in pending]

    def run(
        self,
        output_path: str | None = None,
        num_blocks: int | None = None,
        loop: bool = False,
        realtime: bool = False,
        source=None,
        output_stream=None,
        live_output: bool = False,
        streamed_output: bool = False,
    ) -> dict:
        """Stream a block source through the enhancer.

        ``source`` is any two-method block source (``.blocks()`` iterator +
        ``.sample_rate``) — :class:`FilePlayerSource` over ``audio_path``
        by default, or a :class:`LiveRingSource` fed by a device callback
        for live capture. Enhanced blocks go to the WAV sink
        (``output_path``) and/or a live ``output_stream`` (anything with
        ``write(block)``; see :class:`CallbackOutputStream` — the reference
        plays every enhanced block through a callback-clocked stream,
        audioProcessor.py:106-132). ``live_output=True`` asks
        :func:`open_output_stream` for a device-backed stream and falls
        back to sink-only when no audio stack exists.

        Returns stats: blocks processed, per-block wall-time percentiles,
        deadline misses, output-stream underrun/overrun counts (the
        device-clock deadline accounting), and the output path.
        """
        from gccnmf_tpu.realtime.audio import open_output_stream

        cfg = self.config
        if source is None:
            source = FilePlayerSource(
                self.audio_path, cfg.block_size, loop=loop, realtime=realtime
            )
        if source.sample_rate != cfg.sample_rate:
            self.config = dc_replace(self.config, sample_rate=source.sample_rate)
            self._processor = None
        src_channels = getattr(source, "num_channels", None)
        if src_channels is not None and src_channels != cfg.num_channels:
            # fail up front with the actual problem — a mono file would
            # otherwise crash deep inside jit tracing with an opaque
            # concatenate shape error after pretraining already ran
            raise ValueError(
                f"input has {src_channels} channel(s); this engine is "
                f"configured for {cfg.num_channels} (GCC-PHAT needs a "
                f"stereo microphone pair)"
            )
        # StreamingSink keeps host RAM at O(block) for unbounded runs
        # (per-sample clipping instead of WavSink's whole-file rescale)
        sink_cls = StreamingSink if streamed_output else WavSink
        sink = (
            sink_cls(output_path, source.sample_rate, cfg.num_channels)
            if output_path
            else None
        )
        opened_stream = False
        if output_stream is None and live_output:
            output_stream = open_output_stream(
                source.sample_rate, cfg.num_channels, cfg.block_size
            )
            opened_stream = output_stream is not None

        deadline = cfg.block_size / source.sample_rate

        def stream_out(out) -> None:
            # backpressure when the stream supports it: a non-realtime
            # source outruns the callback-clocked ring by design, and
            # plain write() would drop everything past the first 8
            # blocks as overruns; the timeout keeps a stalled/absent
            # backend from hanging the loop
            wb = getattr(output_stream, "write_blocking", None)
            if wb is not None:
                wb(out, timeout=max(0.5, 16 * deadline))
            else:
                output_stream.write(out)

        times: list[float] = []
        count = 0
        for block in source.blocks():
            t0 = time.perf_counter()
            out = self.process_block(block)
            times.append(time.perf_counter() - t0)
            if out is not None:
                if sink is not None:
                    sink.write(out)
                if output_stream is not None:
                    stream_out(out)
            count += 1
            if num_blocks is not None and count >= num_blocks:
                break
        # drain the dispatch pipeline so the sink holds every block's output
        # (the file is then bit-identical to an unpipelined run)
        for out in self.flush():
            if sink is not None:
                sink.write(out)
            if output_stream is not None:
                stream_out(out)

        from gccnmf_tpu.utils.hostmem import HostMemWatchdog

        stats = dict(
            blocks=count,
            p50_ms=round(float(np.percentile(times, 50)) * 1e3, 3) if times else None,
            p99_ms=round(float(np.percentile(times, 99)) * 1e3, 3) if times else None,
            deadline_ms=round(deadline * 1e3, 3),
            deadline_misses=int(np.sum(np.asarray(times) > deadline)) if times else 0,
            # transport staging retention grows for the process lifetime
            # (docs/tunnel_probe.json); exceeded=True means recycle the
            # worker before the host OOMs
            host_mem=HostMemWatchdog(min_interval_s=0.0).check(),
            host_heap_trims=self._heap_trimmer.trims,
        )
        if output_stream is not None:
            # the callback clock's verdict on the same run (live path)
            stats["output_underruns"] = getattr(output_stream, "underruns", 0)
            stats["output_overruns"] = getattr(output_stream, "overruns", 0)
            if opened_stream:
                output_stream.close()
        if sink is not None:
            stats["output"] = sink.close()
        return stats
