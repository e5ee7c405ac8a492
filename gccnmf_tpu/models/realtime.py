"""Streaming RT-GCC-NMF: fixed-latency block processing on TPU.

The reference implements real-time GCC-NMF as three OS processes exchanging
512-sample blocks through shared memory with an Event handshake
(reference: gccNMF/realtime/{runRealtimeGCCNMF,audioProcessor,gccNMFProcessor,utils}.py).
The TPU-native design replaces all of that with a single pure function:

    step : (StreamState, block) → (StreamState, output_block, telemetry)

carrying the overlap-add rings, GCC-PHAT localization history and target
index as explicit state. The same step serves three execution modes:

- **host loop**: one jitted call per block — true realtime, measured p50
  block latency (the analogue of the reference's 32 ms deadline loop,
  audioProcessor.py:106-132);
- **`lax.scan`**: whole-utterance streaming in one device program — the
  throughput mode, and the basis of streaming-vs-offline equivalence tests;
- **multi-stream**: every array carries a leading stream-batch axis, so B
  independent streams are enhanced in lockstep on one chip (BASELINE.json
  config 5).

Mask parameters are traced scalars — interactive changes (sliders in the
reference GUI) never trigger recompilation, the jax analogue of the
reference's Theano SharedVariables (gccNMFProcessor.py:195-199).

Latency: the engine emits a block as soon as it is overlap-add-complete —
(window_size - hop_size) + block_size samples of algorithmic delay; the
reference's fixed 2-block emission (utils.py:116) is reproduced by
``extra_delay_blocks=1`` for parity testing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gccnmf_tpu.ops import gcc, masks, stft as stft_ops
from gccnmf_tpu.ops import windows as win_ops

__all__ = [
    "StreamConfig", "StreamParams", "StreamState", "RTGCCNMFProcessor",
    "parse_target_mode",
]

TARGET_MODE_BOXCAR = 0
TARGET_MODE_WINDOW_FUNCTION = 2


def parse_target_mode(value) -> int:
    """Normalize a target-mode spec: "window"/"boxcar" names or the
    reference's integer constants (gccNMFProcessor.py:35-37).
    TARGET_MODE_MULTIPLE (1) is a documented non-port (PARITY.md)."""
    key = str(value).strip().lower()
    modes = {
        "boxcar": TARGET_MODE_BOXCAR,
        str(TARGET_MODE_BOXCAR): TARGET_MODE_BOXCAR,
        "window": TARGET_MODE_WINDOW_FUNCTION,
        "window_function": TARGET_MODE_WINDOW_FUNCTION,
        str(TARGET_MODE_WINDOW_FUNCTION): TARGET_MODE_WINDOW_FUNCTION,
    }
    if key in ("1", "multiple"):
        raise ValueError(
            "TARGET_MODE_MULTIPLE is not supported (documented non-port, "
            "see PARITY.md); use 'window' or 'boxcar'"
        )
    if key not in modes:
        raise ValueError(f"unknown target mode: {value!r}")
    return modes[key]


@dataclass(frozen=True)
class StreamConfig:
    """Streaming parameters (defaults match reference realtime/config.py:46-73)."""

    sample_rate: int = 16000
    window_size: int = 1024
    hop_size: int = 512
    block_size: int = 512
    num_tdoas: int = 64
    mic_separation_m: float = 0.1
    num_channels: int = 2
    history_length: int = 128
    target_mode: int = TARGET_MODE_WINDOW_FUNCTION
    extra_delay_blocks: int = 0
    analysis_window: str = "sqrt_hamming"  # or "asymmetric"
    synthesis_length: int = 256  # only for asymmetric windows
    # per-block H inference steps against the frozen dictionary; 0 = the
    # reference's W-only realtime rule. The reference plumbs numHUpdates
    # into its processor but never infers H (gccNMFProcessor.py:195 vs
    # :201-231) — here N>0 actually runs N multiplicative H updates and
    # applies the H-aware Wiener mask. Structural (changes the compiled
    # graph), like the reference's structural-param list intends (:131).
    num_h_updates: int = 0
    # numerical floor shared with the offline stack's SeparationConfig
    # (models/offline.py:80) so the two consumers of the H-aware Wiener
    # mask agree when a config overrides it
    epsilon: float = 1e-16

    @classmethod
    def from_app_config(cls, cfg, **overrides) -> "StreamConfig":
        """Map a :class:`gccnmf_tpu.config.GCCNMFConfig` (duck-typed) to the
        streaming engine's config — the single source of truth for the
        mapping shared by gccnmf-stream / gccnmf-serve / gccnmf-realtime."""
        fields = dict(
            sample_rate=cfg.sample_rate,
            window_size=cfg.window_size,
            hop_size=cfg.hop_size,
            block_size=cfg.block_size,
            num_tdoas=cfg.num_tdoas,
            mic_separation_m=cfg.microphone_separation_in_metres,
            num_channels=cfg.num_channels,
            history_length=cfg.num_tdoa_history,
            target_mode=parse_target_mode(getattr(cfg, "target_mode", "window")),
            num_h_updates=getattr(cfg, "num_h_updates", 0),
            epsilon=getattr(cfg, "epsilon", 1e-16),
        )
        fields.update(overrides)
        return cls(**fields)

    @property
    def windows_per_block(self) -> int:
        return self.block_size // self.hop_size

    @property
    def num_freq(self) -> int:
        return self.window_size // 2 + 1

    @property
    def ola_length(self) -> int:
        return self.window_size + (self.windows_per_block - 1) * self.hop_size

    @property
    def synthesis_support(self) -> int:
        """Length of the synthesis window's nonzero tail."""
        return (
            self.synthesis_length
            if self.analysis_window == "asymmetric"
            else self.window_size
        )

    @property
    def emit_lag(self) -> int:
        """Content delay in samples between input and emitted output.

        A sample is complete once the last synthesis-window support covering
        it has been overlap-added: ``synthesis_support - hop`` samples after
        it arrives. For symmetric windows this is ``window - hop``; for
        asymmetric low-latency windows only ``synthesis_length - hop`` —
        the mechanism behind the reference's <2 ms latency claim
        (README.md:78)."""
        return self.synthesis_support - self.hop_size

    @property
    def algorithmic_latency_s(self) -> float:
        """Worst-case input-to-output delay in seconds."""
        samples = self.emit_lag + self.block_size * (1 + self.extra_delay_blocks)
        return samples / self.sample_rate


class StreamParams(NamedTuple):
    """Traced control parameters — change freely without recompilation."""

    target_tdoa_index: jax.Array  # float32; used when localization disabled
    target_epsilon: jax.Array  # generalized-Gaussian width
    target_beta: jax.Array  # shape
    noise_floor: jax.Array
    separation_enabled: jax.Array  # bool
    localization_enabled: jax.Array  # bool
    localization_window: jax.Array  # int32 frames of history to average

    @staticmethod
    def default(
        target_tdoa_index=32.0,
        target_epsilon=5.0,
        target_beta=2.0,
        noise_floor=0.0,
        separation_enabled=True,
        localization_enabled=True,
        localization_window=6,
    ):
        return StreamParams(
            jnp.float32(target_tdoa_index),
            jnp.float32(target_epsilon),
            jnp.float32(target_beta),
            jnp.float32(noise_floor),
            jnp.asarray(separation_enabled, bool),
            jnp.asarray(localization_enabled, bool),
            jnp.int32(localization_window),
        )


class StreamState(NamedTuple):
    carry_in: jax.Array  # (B, C, window - hop) trailing input samples
    ola_acc: jax.Array  # (B, C, ola_length) output overlap-add accumulator
    gcc_history: jax.Array  # (B, hist_len, D) ring of freq-avg GCC-PHAT
    hist_count: jax.Array  # (B,) int32 frames written so far
    target_idx: jax.Array  # (B,) float32 current (localized) target TDOA
    delay_buf: jax.Array  # (B, C, extra_delay_blocks, block) FIFO


class RTGCCNMFProcessor:
    """The streaming enhancement engine around a pre-learned dictionary W."""

    def __init__(self, w: np.ndarray, config: StreamConfig = StreamConfig()):
        cfg = config
        if cfg.block_size % cfg.hop_size:
            raise ValueError("hop_size must divide block_size")
        self.config = cfg
        self.w = jnp.asarray(w, jnp.float32)  # (F, K)
        if self.w.shape[0] != cfg.num_freq:
            raise ValueError(
                f"dictionary has {self.w.shape[0]} rows, config expects {cfg.num_freq}"
            )
        if cfg.analysis_window == "sqrt_hamming":
            # Reference RT windows: sqrt(hamming) analysis & synthesis
            # (gccNMFProcessor.py:186-187).
            wa = win_ops.sqrt_hamming(cfg.window_size)
            ws = wa
        elif cfg.analysis_window == "asymmetric":
            wa, ws = win_ops.asymmetric_analysis_synthesis_pair(
                cfg.window_size, cfg.synthesis_length, cfg.hop_size
            )
        else:
            raise ValueError(f"unknown analysis_window: {cfg.analysis_window}")
        self._analysis_window = jnp.asarray(wa)
        self._synthesis_window = jnp.asarray(ws)
        self._cos_sin = gcc.steering_cos_sin(
            float(cfg.sample_rate), cfg.num_freq, cfg.mic_separation_m, cfg.num_tdoas
        )
        # Fold steering ⊗ dictionary for the flat attribution GEMM.
        self._cos_w, self._sin_w = masks.fold_steering_dictionary(
            *self._cos_sin, self.w
        )
        self._w_colsum = jnp.sum(self.w, axis=-1)  # (F,)
        # Per-INSTANCE jit wrappers (not static-self class decorators): a
        # class-level `jit(static_argnums=0)` keys one global cache on
        # instance identity, permanently retaining every processor a
        # structural rebuild (GUI dictionary toggle, serving re-tenancy)
        # ever created — compiled executables plus the folded steering
        # constants. A wrapper owned by the instance dies with it.
        self.step = jax.jit(self._step_impl)
        self.scan_blocks = jax.jit(self._scan_impl, static_argnums=3)

    # ------------------------------------------------------------------ state

    def init_state(self, batch_size: int = 1) -> StreamState:
        cfg = self.config
        b, c = batch_size, cfg.num_channels
        return StreamState(
            carry_in=jnp.zeros((b, c, cfg.window_size - cfg.hop_size), jnp.float32),
            ola_acc=jnp.zeros((b, c, cfg.ola_length), jnp.float32),
            gcc_history=jnp.zeros((b, cfg.history_length, cfg.num_tdoas), jnp.float32),
            hist_count=jnp.zeros((b,), jnp.int32),
            target_idx=jnp.full((b,), cfg.num_tdoas / 2.0, jnp.float32),
            delay_buf=jnp.zeros(
                (b, c, cfg.extra_delay_blocks, cfg.block_size), jnp.float32
            ),
        )

    # ------------------------------------------------------------------- step

    def _step_impl(self, state: StreamState, block: jax.Array, params: StreamParams):
        """Process one (B, C, block_size) input block."""
        cfg = self.config
        m = cfg.windows_per_block

        # --- input OLA framing: last window+(m-1)hop samples, m windows ----
        stacked = jnp.concatenate([state.carry_in, block], axis=-1)
        frames = stft_ops.frame_signal(stacked, cfg.window_size, cfg.hop_size)
        # frames: (B, C, m, window)
        spec = jnp.fft.rfft(
            frames * self._analysis_window, n=cfg.window_size, axis=-1
        ).astype(jnp.complex64)  # (B, C, m, F)

        # guard_zeros: an all-zero block (idle serving slot, digital
        # silence) must not write NaN into the localization history
        coh = gcc.coherence(spec, guard_zeros=True)  # (B, m, F)
        # attribution over all TDOAs via the shared flat GEMM + argmax
        argmax_d = masks.argmax_tdoa(
            jnp.real(coh), jnp.imag(coh), self._cos_w, self._sin_w,
            cfg.num_tdoas,
        )  # (B, m, K)

        target = state.target_idx[:, None, None]  # mask uses pre-update target
        if cfg.target_mode == TARGET_MODE_BOXCAR:
            h_mask = masks.boxcar_tdoa_coefficient_mask(
                argmax_d, target, params.target_epsilon
            )
        else:
            h_mask = masks.soft_tdoa_coefficient_mask(
                argmax_d,
                target,
                params.target_epsilon,
                params.target_beta,
                params.noise_floor,
            )
        if cfg.num_h_updates > 0:
            # realize the reference's intended-but-dead numHUpdates: infer
            # block-local coefficients against the frozen W and weight the
            # mask by them (shared formula with the online enhancer)
            from gccnmf_tpu.ops import nmf

            v = jnp.mean(jnp.abs(spec), axis=1)  # (B, m, F) channel-avg mags
            h0 = jnp.ones(v.shape[:-1] + (self.w.shape[1],), jnp.float32)
            h = nmf.h_infer(
                v, self.w, h0, cfg.num_h_updates, epsilon=cfg.epsilon
            )
            tf_mask = masks.wiener_tf_mask_h(
                self.w, h, h_mask, epsilon=cfg.epsilon
            )  # (B, m, F)
        else:
            tf_mask = masks.wiener_tf_mask(self.w, h_mask)  # (B, m, F)
        tf_mask = jnp.where(params.separation_enabled, tf_mask, 1.0)
        out_spec = tf_mask[:, None, :, :] * spec  # (B, C, m, F)

        out_frames = (
            jnp.fft.irfft(out_spec, n=cfg.window_size, axis=-1)
            * self._synthesis_window
        )
        ola = stft_ops.overlap_add(out_frames, cfg.hop_size)  # (B, C, ola_len)
        acc = state.ola_acc
        shifted = jnp.concatenate(
            [acc[..., cfg.block_size :], jnp.zeros_like(acc[..., : cfg.block_size])],
            axis=-1,
        )
        acc = shifted + ola
        # Emit the newest fully-summed block: samples older than the last
        # synthesis-support still to come (see StreamConfig.emit_lag).
        emit_start = cfg.ola_length - cfg.block_size - cfg.emit_lag
        complete = acc[..., emit_start : emit_start + cfg.block_size]

        # --- extra delay FIFO (reference 2-block emission parity) ----------
        if cfg.extra_delay_blocks:
            out_block = state.delay_buf[..., 0, :]
            delay_buf = jnp.concatenate(
                [state.delay_buf[..., 1:, :], complete[..., None, :]], axis=-2
            )
        else:
            out_block = complete
            delay_buf = state.delay_buf

        # --- GCC-PHAT history + localization (after masking, as in the
        # reference: gccNMFProcessor.py:216-227) --------------------------
        # freq-avg GCC-PHAT per frame: angular spectrogram / F
        ang = gcc.angular_spectrogram(coh, *self._cos_sin) / cfg.num_freq  # (B,m,D)
        history = jnp.concatenate([state.gcc_history[:, m:], ang], axis=1)
        hist_count = jnp.minimum(state.hist_count + m, cfg.history_length)

        # masked mean over the last `localization_window` valid frames
        lw = jnp.minimum(params.localization_window, hist_count)  # (B,)
        pos = jnp.arange(cfg.history_length)
        sel = (pos[None, :] >= cfg.history_length - lw[:, None]).astype(jnp.float32)
        mean_gcc = jnp.einsum("bhd,bh->bd", history, sel) / jnp.maximum(
            lw[:, None], 1
        ).astype(jnp.float32)
        localized = jnp.argmax(mean_gcc, axis=-1).astype(jnp.float32)
        target_idx = jnp.where(
            params.localization_enabled, localized, params.target_tdoa_index
        )

        new_state = StreamState(
            carry_in=stacked[..., cfg.block_size :],
            ola_acc=acc,
            gcc_history=history,
            hist_count=hist_count,
            target_idx=target_idx,
            delay_buf=delay_buf,
        )
        telemetry = dict(
            target_tdoa_index=target_idx,
            gcc_phat=ang,
            coefficient_mask=h_mask,
            input_mag=jnp.mean(jnp.abs(spec), axis=1),  # (B, m, F)
            output_mag=jnp.mean(jnp.abs(out_spec), axis=1),
        )
        return new_state, out_block, telemetry

    # ------------------------------------------------------------- scan mode

    def _scan_impl(
        self,
        state: StreamState,
        blocks: jax.Array,
        params: StreamParams,
        with_telemetry: bool = False,
    ):
        """Process (num_blocks, B, C, block_size) in one device program."""

        def body(st, blk):
            st, out, tel = self._step_impl(st, blk, params)
            return st, (out, tel) if with_telemetry else out

        state, ys = jax.lax.scan(body, state, blocks)
        return state, ys

    # ------------------------------------------------------------ host modes

    def blocks_from_signal(self, stereo: np.ndarray) -> np.ndarray:
        """Split (C, n) or (B, C, n) audio into (num_blocks, B, C, block)."""
        cfg = self.config
        if stereo.ndim == 2:
            stereo = stereo[None]
        b, c, n = stereo.shape
        nb = n // cfg.block_size
        trimmed = stereo[..., : nb * cfg.block_size]
        return np.moveaxis(
            trimmed.reshape(b, c, nb, cfg.block_size), 2, 0
        )  # (nb, B, C, block)

    def enhance_signal(
        self, stereo: np.ndarray, params: StreamParams | None = None
    ) -> np.ndarray:
        """Stream a whole signal through scan mode; returns (B, C, n_out)
        aligned like the realtime output (leading algorithmic delay kept)."""
        params = params or StreamParams.default()
        blocks = jnp.asarray(self.blocks_from_signal(stereo))
        state = self.init_state(blocks.shape[1])
        _, outs = self.scan_blocks(state, blocks, params)
        out = np.moveaxis(np.asarray(outs), 0, 2)  # (B, C, nb, block)
        b, c, nb, blk = out.shape
        return out.reshape(b, c, nb * blk)
