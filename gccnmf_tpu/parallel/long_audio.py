"""Sequence-parallel offline separation for long audio.

The single-device offline pipeline holds the whole utterance's
spectrograms, NMF state and per-target reconstructions in one chip's HBM —
fine for 10 s clips, impossible for hour-scale recordings. This module
shards the **time axis** across the mesh (the workload's analogue of
context/sequence parallelism, SURVEY.md §2.3/§5): every stage is
frame-local except three global couplings, each handled with the cheapest
possible collective:

- KL-NMF dictionary statistics → per-iteration ``psum`` over time shards
  (gccnmf_tpu.parallel.nmf_sharded);
- localization → one ``psum`` of per-shard angular-spectrum sums;
- ISTFT overlap-add seams → one ``ppermute`` halo exchange of the
  ``window - hop`` samples that straddle each shard boundary.

Host I/O is chunked: each shard receives exactly the samples its frames
cover (frames never straddle shards — the halo lives in the *input* chunk
overlap and the *output* seam exchange, both of size ``window - hop``).

NMF parity note: the sharded V row order interleaves (left, right) frame
blocks per shard instead of the reference's global left‖right
concatenation (runGCCNMF.py:40). Because every H row follows its V row
through the multiplicative updates and W's statistics are row-order
invariant, feeding the seeded H0 through the same row permutation makes
the result exactly equivalent (up to psum reduction order); the
equivalence against the single-device pipeline is pinned in
tests/test_long_audio.py.
"""

from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gccnmf_tpu.models.offline import OfflineConfig, plane_dtype, stft_gain
from gccnmf_tpu.ops import gcc, localize, masks, nmf, stft as stft_ops
from gccnmf_tpu.ops import windows as win_ops
from gccnmf_tpu.parallel import mesh as mesh_lib
from gccnmf_tpu.parallel.nmf_sharded import kl_nmf_sharded
from gccnmf_tpu.utils import wav

__all__ = ["LongAudioSeparator"]


class LongAudioSeparator:
    """Time-sharded end-to-end GCC-NMF separation over a data mesh."""

    def __init__(
        self,
        config: OfflineConfig = OfflineConfig(),
        mesh=None,
        chunk_frames: int = 8192,
        nmf_init: str = "reference",
    ):
        self.config = config
        self.mesh = mesh if mesh is not None else mesh_lib.data_parallel_mesh()
        if self.mesh.shape.get("model", 1) != 1:
            raise ValueError("LongAudioSeparator uses a data-only mesh")
        self.num_shards = self.mesh.shape["data"]
        #: macro-chunk width (STFT frames) for the single-device streamed
        #: driver — bounds host RAM, HBM transients, and program size
        self.chunk_frames = int(chunk_frames)
        #: "reference": MT19937 seed(0) init, bit-matching the oracle —
        #: at hour scale that means uploading a ~0.5 GB/hour host-drawn
        #: H0 through the ingest link. "device": W0 stays host-seeded
        #: (tiny, preserves localization determinism) but H0 is drawn on
        #: device with JAX's PRNG — zero H0 upload; same algorithm,
        #: different (still deterministic) trajectory, so never the
        #: parity path.
        if nmf_init not in ("reference", "device"):
            raise ValueError(f"unknown nmf_init {nmf_init!r}")
        self.nmf_init = nmf_init
        self._stft_method = config.resolved_stft_method()
        self._window = win_ops.hann_symmetric(config.window_size)
        # per-instance jit (see models/realtime.py): a class-level
        # static-self jit would retain every separator in a global cache
        self._analyze_shards = jax.jit(self._analyze_shards_impl)
        self._reconstruct_shards = jax.jit(self._reconstruct_shards_impl)
        self._cos_sin = gcc.steering_cos_sin(
            float(config.sample_rate),
            config.num_freq,
            config.mic_separation_m,
            config.num_tdoas,
        )

    # ------------------------------------------------------------- stage A

    def _analyze_shards_impl(self, chunks: jax.Array):
        """(S, 2, chunk_len) sample chunks → sharded spec/coh/V/ang-sum."""
        cfg = self.config

        def local(chunk):
            spec = stft_ops.stft(
                chunk[0], self._window, cfg.hop_size, conjugate=True,
                method=self._stft_method,
            )  # (2, T_s, F)
            coh = gcc.coherence(spec, guard_zeros=True)  # (T_s, F)
            v = jnp.concatenate([jnp.abs(spec[0]), jnp.abs(spec[1])], axis=0)
            ang = gcc.angular_spectrogram(coh, *self._cos_sin)  # (T_s, D)
            ang_sum = jax.lax.psum(jnp.sum(ang, axis=0), "data")  # (D,)
            return spec[None], coh[None], v[None], ang_sum

        spec, coh, v, ang_sum = jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=P("data"),
            out_specs=(P("data"), P("data"), P("data"), P()),
            check_vma=False,
        )(chunks)
        return spec, coh, v, ang_sum

    # ------------------------------------------------------------- stage D

    def _reconstruct_shards_impl(self, spec, coh, h_sharded, w, targets):
        """Masked reconstruction + local ISTFT + ppermute seam exchange.

        Returns (owned, tails): ``owned`` (S, N, 2, T_s*hop) is each
        shard's settled output samples; ``tails`` (S, N, 2, window-hop)
        are the trailing seams — only the final shard's is appended.
        """
        cfg = self.config
        window = jnp.asarray(self._window, jnp.float32)
        win_len, hop = cfg.window_size, cfg.hop_size
        overlap = win_len - hop
        s = self.num_shards

        def local(spec_l, coh_l, h_l, w_l, targets_l):
            spec0, coh0, h0 = spec_l[0], coh_l[0], h_l[0]  # (2,T_s,F),(T_s,F),(2,T_s,K)
            # winner formulation (masks.attribution_winner): two flat
            # (T_s, F) x (F, N·K) GEMMs with the steering columns folded
            # into the dictionary — the (N, T_s, F) broadcast intermediate
            # that target_attribution materializes (~0.7 GB per shard at
            # hour scale) never exists, and only the argmax is kept
            winner = masks.attribution_winner(
                coh0[None], *self._cos_sin, targets_l[None], w_l[None]
            )[0]  # (T_s, K) int32
            n_targets = targets_l.shape[0]

            def per_target(n):  # target index → (2, L_out)
                coef_n = (winner == n).astype(jnp.float32)  # (T_s, K)
                spec_est = masks.masked_reconstruction(
                    coef_n[None], spec0, w_l, h0
                )[0]  # (2, T_s, F)
                # local inverse transform — istft's own spectrum→frames
                # step (the OLA differs: seams are settled by ppermute,
                # not locally)
                frames = stft_ops.inverse_frames(
                    jnp.conj(spec_est), win_len,
                    "matmul" if self._stft_method == "matmul" else "fft",
                )
                return stft_ops.overlap_add(frames * window, hop)

            # sequential over targets: the (N, 2, T_s, F) complex estimate
            # and its same-size inverse frames would otherwise both be
            # resident at once — at hour-scale T_s that alone is ~11 GB;
            # per-target it is ~1/N of that, and the per-target GEMMs stay
            # MXU-sized
            y = jax.lax.map(
                per_target, jnp.arange(n_targets, dtype=jnp.int32)
            )  # (N, 2, L_out)
            t_s = spec0.shape[-2]
            own_len = t_s * hop
            tail = y[..., own_len:]  # (N, 2, overlap)
            recv = jax.lax.ppermute(
                tail, "data", [(i, i + 1) for i in range(s - 1)]
            )
            own = y[..., :own_len].at[..., :overlap].add(recv)
            return own[None], tail[None]

        return jax.shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P("data"), P("data"), P("data"), P(), P()),
            out_specs=(P("data"), P("data")),
            check_vma=False,
        )(spec, coh, h_sharded, w, targets)

    # -------------------------------------------------------------- driver

    def _frame_geometry(self, n_samples: int) -> tuple[int, int, int]:
        """(frames_per_shard, frames_total_processed, chunk_len)."""
        cfg = self.config
        s = self.num_shards
        window, hop = cfg.window_size, cfg.hop_size
        t_total = stft_ops.num_frames(n_samples, window, hop)
        t_s = t_total // s
        # t_s < 1 must fail here too: with hop == window (overlap 0) the
        # seam inequality degenerates to 0 < 0 and a zero-frame pipeline
        # would otherwise run through to a confusing no-peaks error
        if t_s < 1 or t_s * hop < window - hop:
            raise ValueError(
                f"audio too short to shard {s} ways: {t_s} frames/shard"
            )
        # per-shard sample chunks overlap by window-hop at each seam
        return t_s, t_s * s, (t_s - 1) * hop + window

    def _separate_core(self, chunks_sh, t_s: int, num_sources):
        """Sharded chunks → (owned, tails, targets, w, mean_ang): the whole
        device pipeline shared by the in-memory and disk-streamed drivers."""
        cfg = self.config
        s = self.num_shards
        t = t_s * s

        spec, coh, v, ang_sum = self._analyze_shards(chunks_sh)
        v2 = v.reshape(2 * t, cfg.num_freq)  # (S·2T_s, F) still time-sharded

        if self.nmf_init == "device":
            # zero-upload H0 (see _h0_device_chunked): drawn sharded
            # directly in the interleaved row order — any deterministic
            # order is equivalent since this is never the parity path.
            # Private RandomState: same MT19937 stream as seed(0) without
            # reseeding the caller's global NumPy RNG as a side effect.
            w0 = (
                np.random.RandomState(0)
                .random_sample((cfg.num_freq, cfg.dictionary_size))
                .astype(np.float32)
                + cfg.epsilon
            )
            h0_sharding = NamedSharding(self.mesh, P("data", None))
            h0_sh = jax.jit(
                lambda: jax.random.uniform(
                    jax.random.PRNGKey(0),
                    (2 * t, cfg.dictionary_size),
                    jnp.float32,
                )
                + cfg.epsilon,
                out_shardings=h0_sharding,
            )()
        else:
            # seeded init in the reference's left‖right row order, permuted
            # into the shard-interleaved order so every H row rides with
            # its V row
            w0, h0_ref = nmf.nmf_init_numpy(
                cfg.num_freq, cfg.dictionary_size, 2 * t, cfg.epsilon
            )
            perm = np.empty(2 * t, np.int64)
            for i in range(s):
                rows = slice(i * 2 * t_s, (i + 1) * 2 * t_s)
                left = np.arange(i * t_s, (i + 1) * t_s)
                perm[rows] = np.concatenate([left, t + left])
            h0 = h0_ref[perm]
            h0_sh = jax.device_put(
                h0, NamedSharding(self.mesh, P("data", None))
            )

        w0_sh = jax.device_put(w0, NamedSharding(self.mesh, P(None, "model")))
        w, h = kl_nmf_sharded(
            v2, w0_sh, h0_sh, cfg.num_iterations, self.mesh,
            cfg.sparsity_alpha, cfg.epsilon,
            simultaneous=(cfg.nmf_matmul_dtype == "bfloat16_q_simul"),
            # hour-scale recordings routinely contain digitally silent
            # windows; the silence guards are bit-identical on positive
            # data, so the single-device parity pins still hold
            guard=True,
        )

        mean_ang = np.asarray(ang_sum) / t
        targets = localize.estimate_target_tdoa_indexes(mean_ang, num_sources)
        targets_dev = jnp.asarray(np.asarray(targets, np.int32))

        h_sharded = h.reshape(s, 2, t_s, cfg.dictionary_size)
        owned, tails = self._reconstruct_shards(
            spec, coh, h_sharded, w, targets_dev
        )
        return owned, tails, targets, w, mean_ang

    def separate(self, stereo: np.ndarray, num_sources: int | None = None):
        """Separate ``(2, n)`` audio of arbitrary length across the mesh.

        Output matches :meth:`GCCNMFSeparator.separate` on the processed
        region (the trailing partial frames that don't fill every shard
        equally — at most ``num_shards·hop`` samples — are dropped).
        """
        cfg = self.config
        s = self.num_shards
        # mirror GCCNMFSeparator.separate: None defers to the config, and a
        # config of None means auto source counting (2-means on peaks)
        num_sources = cfg.num_sources if num_sources is None else num_sources
        window, hop = cfg.window_size, cfg.hop_size

        t_s, t, chunk_len = self._frame_geometry(stereo.shape[-1])
        chunks = np.stack(
            [
                stereo[:, i * t_s * hop : i * t_s * hop + chunk_len]
                for i in range(s)
            ]
        ).astype(np.float32)  # (S, 2, chunk_len)
        chunks_sh = jax.device_put(
            chunks, NamedSharding(self.mesh, P("data"))
        )
        owned, tails, targets, w, mean_ang = self._separate_core(
            chunks_sh, t_s, num_sources
        )

        # cross-host-sharded outputs need a DCN allgather, not np.asarray
        owned_np = mesh_lib.gather_to_host(owned)  # (S, N, 2, T_s*hop)
        tails_np = mesh_lib.gather_to_host(tails)
        full = np.concatenate(
            [owned_np[i] for i in range(s)], axis=-1
        )  # (N, 2, T*hop)
        full = np.concatenate([full, tails_np[-1]], axis=-1)
        half = window // 2
        est = full[..., half:-half] * stft_gain(cfg)
        return dict(
            estimates=est.astype(np.float32),
            target_tdoa_indexes=targets,
            w=np.asarray(w),
            mean_angular_spectrum=mean_ang,
            frames_processed=t,
        )

    def separate_streamed(
        self,
        mixture_path: str,
        output_prefix: str | None = None,
        num_sources: int | None = None,
    ):
        """Disk-streamed separation: O(chunk) host RAM instead of O(file).

        Input chunks are memory-mapped and loaded per shard straight onto
        each shard's device (``jax.make_array_from_callback`` — no global
        host copy exists at any point); outputs are written incrementally,
        one shard at a time, through :class:`StreamingWavWriter`. The
        device pipeline (and therefore the waveform, up to int16
        quantization) is identical to :meth:`separate` — hour-scale runs
        are bounded by disk and HBM, never host RAM.

        Multi-process meshes fall back to a gather on the output side
        (every host needs the full waveform to write identical files).
        """
        cfg = self.config
        s = self.num_shards
        num_sources = cfg.num_sources if num_sources is None else num_sources
        window, hop = cfg.window_size, cfg.hop_size

        reader = wav.WavReader(mixture_path)
        if reader.sample_rate != cfg.sample_rate:
            sep = LongAudioSeparator(
                replace(cfg, sample_rate=reader.sample_rate),
                self.mesh,
                chunk_frames=self.chunk_frames,
                nmf_init=self.nmf_init,
            )
            return sep.separate_streamed(
                mixture_path, output_prefix, num_sources
            )
        if reader.num_channels != 2:
            raise ValueError(
                f"expected stereo input, got {reader.num_channels} channels"
            )
        if s == 1:
            # single-device: sequential macro-chunks against device-resident
            # plane buffers — bounded host RAM AND bounded program size
            # (the one-shard mesh program embeds hour-scale shapes in a
            # single compile, which overflows remote-compile transports
            # and HBM transient budgets)
            return self._separate_streamed_chunked(
                reader, mixture_path, output_prefix, num_sources
            )
        t_s, t, chunk_len = self._frame_geometry(reader.num_samples)

        def load_chunks(index) -> np.ndarray:
            """Materialize only the shard rows one device actually holds."""
            rows = range(*index[0].indices(s))
            return np.stack(
                [reader.read(i * t_s * hop, chunk_len) for i in rows]
            )

        chunks_sh = jax.make_array_from_callback(
            (s, 2, chunk_len),
            NamedSharding(self.mesh, P("data")),
            load_chunks,
        )
        owned, tails, targets, w, mean_ang = self._separate_core(
            chunks_sh, t_s, num_sources
        )

        prefix = output_prefix or wav.default_output_prefix(mixture_path)
        num_targets = int(owned.shape[1])
        gain = stft_gain(cfg)
        half = window // 2

        writers = [
            wav.StreamingWavWriter(
                f"{prefix}_sim_{i + 1}.wav", reader.sample_rate
            )
            for i in range(num_targets)
        ]
        # held-back FIFO per target: the final `half` samples are trimmed,
        # but which samples those are is only known at the end of the stream
        pending = [np.zeros((2, 0), np.float32) for _ in range(num_targets)]

        def emit(block: np.ndarray) -> None:  # block: (N, 2, L)
            for n in range(num_targets):
                buf = np.concatenate([pending[n], block[n] * gain], axis=-1)
                if buf.shape[-1] > half:
                    writers[n].write(buf[:, : buf.shape[-1] - half])
                    buf = buf[:, buf.shape[-1] - half :]
                pending[n] = buf

        # ONE shard resident on host at a time (the O(chunk)-RAM contract:
        # materializing every shard before the emit loop would hold the
        # whole multi-GB output for an hour-scale run)
        if jax.process_count() == 1:
            shard_blocks = sorted(
                owned.addressable_shards, key=lambda sh: sh.index[0].start or 0
            )
            ordered = (np.asarray(sh.data)[0] for sh in shard_blocks)
            tail_np = np.asarray(
                sorted(
                    tails.addressable_shards,
                    key=lambda sh: sh.index[0].start or 0,
                )[-1].data
            )[0]
        else:
            owned_np = mesh_lib.gather_to_host(owned)
            ordered = (owned_np[i] for i in range(s))
            tail_np = mesh_lib.gather_to_host(tails)[-1]

        for i, block in enumerate(ordered):
            emit(block[..., half:] if i == 0 else block)  # leading trim
        emit(tail_np)
        paths = [w_.close() for w_ in writers]
        return dict(
            paths=paths,
            target_tdoa_indexes=targets,
            w=np.asarray(w),
            mean_angular_spectrum=mean_ang,
            frames_processed=t,
            samples_written=writers[0].samples_written if writers else 0,
        )

    # ----------------------------------------- single-device chunked driver

    def _h0_device_chunked(self, t2: int, atom_block: int = 8):
        """Reference-seeded (W0, H0-on-device) with O(2T·atom_block) host RAM.

        ``nmf_init_numpy`` draws H as ``(K, 2T)`` float64 before the f32
        cast — at hour scale that single host draw is gigabytes. The
        MT19937 stream is K-major, so drawing atom *blocks* sequentially
        reproduces it exactly; each block is cast, offset by ε, uploaded
        into a device ``(K, 2T)`` buffer, and transposed once on device.
        """
        cfg = self.config
        k = cfg.dictionary_size
        # private MT19937 stream: same values as the reference's global
        # seed(0) draws, without reseeding the caller's np.random state
        rs = np.random.RandomState(0)
        w0 = (
            rs.random_sample((cfg.num_freq, k)).astype(np.float32)
            + cfg.epsilon
        )
        if self.nmf_init == "device":
            # zero-upload H0: uniform (0,1)+eps drawn on device. Jitted so
            # no host buffer is materialized (and none retained by the
            # tunnel client — benchmarks/tunnel_probe.py measured uploads
            # retained ~1:1 by this harness's transport).
            h0 = jax.jit(
                lambda: jax.random.uniform(
                    jax.random.PRNGKey(0), (t2, k), jnp.float32
                )
                + cfg.epsilon
            )()
            return w0, h0
        buf = jnp.zeros((k, t2), jnp.float32)
        upd = jax.jit(
            lambda b, blk, k0: jax.lax.dynamic_update_slice(b, blk, (k0, 0)),
            donate_argnums=(0,),
        )
        for k0 in range(0, k, atom_block):
            kb = min(atom_block, k - k0)
            blk = (
                rs.random_sample((kb, t2)).astype(np.float32) + cfg.epsilon
            )
            buf = upd(buf, blk, k0)
        return w0, buf.T  # (2T, K) — matches nmf_init_numpy's h0.T

    def _separate_streamed_chunked(
        self, reader, mixture_path, output_prefix, num_sources
    ):
        # The chunked passes dispatch through plain ``jit`` (no mesh
        # shardings), which lands on JAX's *default* device — pin
        # dispatch to the mesh's device so a 1-device mesh built over a
        # non-default device computes where the caller specified.
        with jax.default_device(list(self.mesh.devices.flat)[0]):
            return self._separate_streamed_chunked_body(
                reader, mixture_path, output_prefix, num_sources
            )

    def _separate_streamed_chunked_body(
        self, reader, mixture_path, output_prefix, num_sources
    ):
        """Sequential macro-chunk streaming on one device.

        Pass 1 streams bounded sample chunks through the STFT/GCC front
        end into preallocated device-resident plane buffers (spec planes
        in the pipeline's plane dtype, V in f32); KL-NMF then runs once
        over the device-resident V (XLA formulation — hour-scale V cannot
        be VMEM-resident); pass 2 reconstructs chunk by chunk with an
        overlap-add carry and streams output straight into incremental
        writers. Host RAM, HBM transients, and compiled-program size are
        all O(chunk); results match :meth:`separate` (identical math,
        identical seeded init, plane storage at the pipeline's dtype).
        """
        cfg = self.config
        window_np = self._window
        window = jnp.asarray(window_np, jnp.float32)
        win_len, hop = cfg.window_size, cfg.hop_size
        overlap = win_len - hop
        f, k = cfg.num_freq, cfg.dictionary_size
        cos_m, sin_m = (jnp.asarray(m) for m in self._cos_sin)
        plane = (
            jnp.float32 if plane_dtype(cfg) == "float32" else jnp.bfloat16
        )
        inv_method = "matmul" if self._stft_method == "matmul" else "fft"

        t_total = stft_ops.num_frames(reader.num_samples, win_len, hop)
        if t_total < 1:
            raise ValueError("audio shorter than one analysis window")
        tc_main = min(self.chunk_frames, t_total)
        chunk_grid = [
            (t0, min(tc_main, t_total - t0))
            for t0 in range(0, t_total, tc_main)
        ]

        # ---- pass 1: chunked analysis into device-resident planes.
        # int16 files ship raw PCM (half the tunnel bytes; the /32768
        # conversion — pcm_to_float's int16 case exactly — runs on
        # device); the angular-spectrum sum accumulates in a donated
        # device buffer so the loop never syncs — the host streams
        # uploads while the device chews the dispatch backlog.
        use_pcm_in = reader.raw_dtype == np.int16

        def analyze_store(spec_re, spec_im, v_buf, ang_acc, samples, t0):
            if use_pcm_in:
                samples = samples.astype(jnp.float32) / 32768.0
            spec = stft_ops.stft(
                samples, window, hop, conjugate=True,
                method=self._stft_method,
            )  # (2, tc, F)
            coh = gcc.coherence(spec, guard_zeros=True)
            ang = gcc.angular_spectrogram(coh, cos_m, sin_m)
            spec_re = jax.lax.dynamic_update_slice(
                spec_re, jnp.real(spec).astype(plane), (0, t0, 0)
            )
            spec_im = jax.lax.dynamic_update_slice(
                spec_im, jnp.imag(spec).astype(plane), (0, t0, 0)
            )
            v_buf = jax.lax.dynamic_update_slice(
                v_buf, jnp.abs(spec).astype(jnp.float32), (0, t0, 0)
            )
            return spec_re, spec_im, v_buf, ang_acc + jnp.sum(ang, axis=0)

        analyze = jax.jit(analyze_store, donate_argnums=(0, 1, 2, 3))

        spec_re = jnp.zeros((2, t_total, f), plane)
        spec_im = jnp.zeros((2, t_total, f), plane)
        v_buf = jnp.zeros((2, t_total, f), jnp.float32)
        ang_dev = jnp.zeros(cfg.num_tdoas, jnp.float32)
        # host-heap hygiene: periodic malloc_trim bounds the pipeline's
        # OWN allocator churn (chunk buffers, writer FIFOs). The tunnel
        # client's live 1-MiB-per-MiB-uploaded staging retention is NOT
        # releasable from user code (docs/tunnel_probe.json) — that is
        # watched, not trimmed (utils/hostmem.HostMemWatchdog)
        from gccnmf_tpu.utils.hostmem import PeriodicTrim

        import time as _time

        trimmer = PeriodicTrim()
        _t_start = _time.perf_counter()
        _upload_bytes = 0
        for t0, tc in chunk_grid:
            n_chunk = (tc - 1) * hop + win_len
            samples = (
                reader.read_raw(t0 * hop, n_chunk)
                if use_pcm_in
                else reader.read(t0 * hop, n_chunk)
            )
            spec_re, spec_im, v_buf, ang_dev = analyze(
                spec_re, spec_im, v_buf, ang_dev, samples, t0
            )
            trimmer.account(samples.nbytes)
            _upload_bytes += samples.nbytes
        _t_pass1_done = _time.perf_counter()
        ang_acc = np.asarray(ang_dev, np.float64)  # fences pass-1 uploads
        _t_pass1_fenced = _time.perf_counter()

        # ---- NMF over the device-resident V (reference row order
        # left‖right — the (2, T, F) → (2T, F) reshape is exactly that)
        v2 = v_buf.reshape(2 * t_total, f)
        w0, h0_dev = self._h0_device_chunked(2 * t_total)
        if cfg.nmf_matmul_dtype == "bfloat16_q_simul":
            w, h = nmf.kl_nmf_simul(
                v2, w0, h0_dev, cfg.num_iterations,
                cfg.sparsity_alpha, cfg.epsilon,
            )
        else:
            w, h = nmf.kl_nmf(
                v2, w0, h0_dev, cfg.num_iterations,
                cfg.sparsity_alpha, cfg.epsilon,
                guard=True,  # silence-tolerant (see kl_nmf docstring)
            )

        mean_ang = ang_acc / t_total
        targets = localize.estimate_target_tdoa_indexes(
            mean_ang, num_sources
        )
        targets_dev = jnp.asarray(np.asarray(targets, np.int32))
        n_targets = len(targets)

        # ---- pass 2: chunked reconstruction with an OLA seam carry
        recon_cache: dict[int, object] = {}

        def make_reconstruct(tc: int):
            def fn(spec_re, spec_im, h, w, targets_ix, t0, carry):
                sre = jax.lax.dynamic_slice(
                    spec_re, (0, t0, 0), (2, tc, f)
                ).astype(jnp.float32)
                sim = jax.lax.dynamic_slice(
                    spec_im, (0, t0, 0), (2, tc, f)
                ).astype(jnp.float32)
                spec = sre + 1j * sim  # (2, tc, F) complex64
                coh = gcc.coherence(spec, guard_zeros=True)
                h_l = jnp.stack(
                    [
                        jax.lax.dynamic_slice(h, (t0, 0), (tc, k)),
                        jax.lax.dynamic_slice(
                            h, (t_total + t0, 0), (tc, k)
                        ),
                    ]
                )  # (2, tc, K)
                scores = masks.target_attribution(
                    coh, cos_m, sin_m, targets_ix, w
                )
                coef = masks.hard_coefficient_masks(scores)  # (N, tc, K)

                def per_target(coef_n):
                    spec_est = masks.masked_reconstruction(
                        coef_n[None], spec, w, h_l
                    )[0]
                    frames = stft_ops.inverse_frames(
                        jnp.conj(spec_est), win_len, inv_method
                    )
                    return stft_ops.overlap_add(frames * window, hop)

                y = jax.lax.map(per_target, coef)  # (N, 2, tc·hop+overlap)
                y = y.at[..., :overlap].add(carry)
                # gain + int16 conversion on device (StreamingWavWriter's
                # exact clip→scale→truncate sequence — half the download
                # bytes, the output is int16 PCM regardless); the seam
                # carry stays pre-gain float
                scaled = y[..., : tc * hop] * gain
                # exact per-target clip tally, counted on-device BEFORE
                # quantization (the writer's own |float| >= 1.0 test) —
                # boundary-code counting would misreport legitimate
                # samples in [1-2^-15, 1) as clipped
                clips = (
                    (jnp.abs(scaled) >= 1.0).sum(axis=(1, 2)).astype(jnp.int32)
                )
                pcm = (
                    jnp.clip(scaled, -1.0, 1.0 - 2.0**-15) * 32768.0
                ).astype(jnp.int16)
                return pcm, clips, y[..., tc * hop :]

            return jax.jit(fn)

        prefix = output_prefix or wav.default_output_prefix(mixture_path)
        gain = stft_gain(cfg)
        half = win_len // 2
        writers = [
            wav.StreamingWavWriter(
                f"{prefix}_sim_{i + 1}.wav", reader.sample_rate
            )
            for i in range(n_targets)
        ]
        # held-back FIFO per target: the final `half` samples are trimmed,
        # but which samples those are is only known at the end
        pending = [np.zeros((2, 0), np.int16) for _ in range(n_targets)]

        # device-counted clip tallies not yet handed to a writer (emit may
        # hold samples back while it waits for the trim boundary, so
        # counts are owed until the next actual write; the tally can
        # include clips inside the trimmed leading/trailing half-window —
        # acceptable for a close() warning, and exact per sample
        # otherwise)
        clip_owed = np.zeros(max(n_targets, 1), np.int64)

        def emit(block: np.ndarray) -> None:
            for n in range(n_targets):  # block: (N, 2, L) int16 PCM
                buf = np.concatenate([pending[n], block[n]], axis=-1)
                cut = buf.shape[-1] - half
                if cut > 0:
                    writers[n].write_pcm(buf[:, :cut], int(clip_owed[n]))
                    clip_owed[n] = 0
                    buf = buf[:, cut:]
                pending[n] = buf

        # bounded dispatch lookahead: the carry chains chunks on-device,
        # so dispatching ahead lets the serial tunnel fetches overlap
        # device compute — but buffering EVERY chunk's output would make
        # HBM residency O(total audio); a small window keeps it O(chunk)
        carry = jnp.zeros((n_targets, 2, overlap), jnp.float32)
        inflight: list = []
        lead = half  # leading samples still to trim (may span chunks)

        _t_first_output = [None]
        _download_bytes = [0]

        def drain_one() -> None:
            nonlocal lead
            pcm_d, clips_d = inflight.pop(0)
            block = np.asarray(pcm_d)
            if _t_first_output[0] is None:
                _t_first_output[0] = _time.perf_counter()
            _download_bytes[0] += block.nbytes
            trimmer.account(block.nbytes)
            clip_owed[:n_targets] += np.asarray(clips_d, np.int64)
            drop = min(lead, block.shape[-1])
            if drop:
                block = block[..., drop:]
                lead -= drop
            if block.shape[-1]:
                emit(block)

        # 8 chunks in flight ≈ 100 MB of int16 PCM resident in HBM at the
        # default chunk width — still O(chunk), and deep enough that the
        # serial tunnel fetches (the pass-2 bottleneck at hour scale)
        # stay overlapped with reconstruction compute even when the
        # tunnel's bulk throughput dips (its measured swings are 2x+)
        lookahead = 8
        for t0, tc in chunk_grid:
            recon = recon_cache.setdefault(tc, make_reconstruct(tc))
            pcm, clips, carry = recon(
                spec_re, spec_im, h, w, targets_dev, t0, carry
            )
            inflight.append((pcm, clips))
            if len(inflight) > lookahead:
                drain_one()
        while inflight:
            drain_one()
        # final flush: the held-back PCM goes out via write_pcm (its clips
        # were already counted on device — routing it through the float
        # write() would re-count exact-full-scale samples), and only the
        # trailing seam (pre-gain float, never device-counted) takes the
        # writer's own host-side conversion. Any leading trim not yet
        # consumed (audio shorter than window/2) lands here.
        tail = np.asarray(carry, np.float32)[..., lead:] * gain
        for n in range(n_targets):
            cut = pending[n].shape[-1] + tail[n].shape[-1] - half
            if cut > 0:
                take_pcm = min(cut, pending[n].shape[-1])
                if take_pcm:
                    writers[n].write_pcm(
                        pending[n][:, :take_pcm], int(clip_owed[n])
                    )
                    clip_owed[n] = 0
                if cut > take_pcm:
                    writers[n].write(tail[n][:, : cut - take_pcm])
            if clip_owed[n]:  # tallies whose write was trimmed away
                writers[n].write_pcm(
                    np.zeros((2, 0), np.int16), int(clip_owed[n])
                )
                clip_owed[n] = 0
        paths = [w_.close() for w_ in writers]
        # leave the heap trimmed at exit so back-to-back runs in one
        # process (the 60-minute bench's repeats) start from a flat floor
        trimmer.account(trimmer.every_bytes)
        return dict(
            paths=paths,
            target_tdoa_indexes=targets,
            w=np.asarray(w),
            mean_angular_spectrum=mean_ang,
            frames_processed=t_total,
            samples_written=writers[0].samples_written if writers else 0,
            host_heap_trims=trimmer.trims,
            # phase attribution for the hour-scale throughput story
            # (benchmarks/streamed_bench.py folds this into its artifact):
            # dispatch = async pass-1 host loop; fence = waiting for the
            # tunnel to finish those uploads; first_output includes the
            # NMF (its dispatch chains straight into pass 2); drain = the
            # download-bound tail of pass 2
            stage_seconds=dict(
                pass1_dispatch=round(_t_pass1_done - _t_start, 2),
                pass1_upload_fence=round(_t_pass1_fenced - _t_pass1_done, 2),
                nmf_to_first_output=round(
                    (_t_first_output[0] or _t_pass1_fenced) - _t_pass1_fenced,
                    2,
                ),
                output_drain=round(
                    _time.perf_counter() - (_t_first_output[0] or _t_pass1_fenced),
                    2,
                ),
            ),
            transfer_mb=dict(
                uploads=round(_upload_bytes / 1e6, 1),
                downloads=round(_download_bytes[0] / 1e6, 1),
            ),
        )

    def separate_file(
        self,
        mixture_path: str,
        output_prefix: str | None = None,
        audio: tuple[np.ndarray, int] | None = None,
    ):
        stereo, sr = audio if audio is not None else wav.read_wav(mixture_path)
        sep = self
        if sr != self.config.sample_rate:
            sep = LongAudioSeparator(
                replace(self.config, sample_rate=sr),
                self.mesh,
                chunk_frames=self.chunk_frames,
                nmf_init=self.nmf_init,
            )
        result = sep.separate(stereo)
        prefix = output_prefix or wav.default_output_prefix(mixture_path)
        paths = []
        for i, est in enumerate(result["estimates"]):
            path = f"{prefix}_sim_{i + 1}.wav"
            wav.write_wav(est, path, sr)
            paths.append(path)
        result["paths"] = paths
        return result
