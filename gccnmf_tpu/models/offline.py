"""Offline GCC-NMF pipelines: blind separation and enhancement.

Separation (reference: gccNMF/runGCCNMF.py:30-54): load stereo mixture →
STFT → unsupervised KL-NMF on concatenated |X| → GCC-PHAT angular
spectrogram → TDOA peak picking → per-atom attribution → hard coefficient
masks → masked reconstruction with mixture phase → ISTFT → per-target WAVs.

Enhancement: pre-learned dictionary W, H inferred per-utterance, target
TDOA localized from the angular spectrum, soft generalized-Gaussian
coefficient mask + Wiener TF mask (the offline analogue of the RT path,
reference gccNMF/realtime/gccNMFProcessor.py:259-269).

The compute is organized as two jitted stages around the (tiny,
data-dependent) host-side peak picking; a fully-jitted batched variant
``separate_batch`` (fixed source count, `top_k` peak picking on device)
is the high-throughput path used for benchmarking and data-parallel
scaling.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, replace
from os.path import basename

import jax
import jax.numpy as jnp
import numpy as np

from gccnmf_tpu.ops import gcc, localize, masks, nmf, stft as stft_ops, xprec
from gccnmf_tpu.ops import windows as win_ops
from gccnmf_tpu.utils import wav

logger = logging.getLogger(__name__)

__all__ = ["OfflineConfig", "GCCNMFSeparator", "GCCNMFEnhancer", "stft_gain"]


@dataclass(frozen=True)
class OfflineConfig:
    """Offline pipeline parameters (defaults match runGCCNMF.py:56-77)."""

    window_size: int = 1024
    hop_size: int = 128
    num_tdoas: int = 128
    mic_separation_m: float = 1.0
    dictionary_size: int = 128
    num_iterations: int = 100
    sparsity_alpha: float = 0.0
    num_sources: int | None = 3
    sample_rate: int = 16000
    stft_method: str = "auto"  # "auto" | "fft" | "matmul" | "conv"
    nmf_backend: str = "auto"  # "auto" | "xla" | "pallas"
    # GEMM operand dtype inside the Pallas NMF loop: "bfloat16_q" (default)
    # additionally keeps V and the ratio q=V/WH resident in bf16 — 1.30x
    # faster than "bfloat16" at the reference shape with identical e2e
    # quality (31.44 vs 31.43 dB min SNR vs the NumPy oracle, same
    # localization); "bfloat16" quantizes only GEMM operands (fp32
    # accumulation everywhere); "float32" (Precision.HIGHEST) for
    # trajectory parity with the oracle; "bfloat16_q_simul" (opt-in turbo)
    # runs shared-Q simultaneous updates — 3 GEMMs + 1 divide/iteration
    # instead of 4 + 2, +14% end-to-end separation throughput, identical
    # localization and ground-truth BSS-Eval, PESQ 4.5 vs the oracle
    # waveform (a different algorithm, never the parity path)
    nmf_matmul_dtype: str = "bfloat16_q"
    # Reconstruction tail: "pallas" fuses mask → magnitudes → mixture phase
    # → windowed iDFT → overlap-add into one VMEM-resident kernel
    # (ops/synthesis_pallas.py); "xla" is the composable reference
    # formulation. The Pallas path follows nmf_matmul_dtype for its GEMM
    # numerics (bf16 throughput vs f32/HIGHEST parity).
    synthesis_backend: str = "auto"  # "auto" | "xla" | "pallas"
    # Analysis front-end: "pallas" fuses framing → windowed DFT → |X| →
    # PHAT coherence → angular spectrogram into one VMEM-resident kernel
    # emitting f32 planes (ops/frontend_pallas.py, ~2.2x the composed XLA
    # stage); "xla" is the composable formulation. "auto" picks Pallas on
    # TPU in the bf16 throughput modes and XLA in float32 parity mode
    # (the parity trajectory is defined by the XLA/HIGHEST numerics).
    frontend_backend: str = "auto"  # "auto" | "xla" | "pallas"
    epsilon: float = 1e-16

    @property
    def num_freq(self) -> int:
        return self.window_size // 2 + 1

    def resolved_stft_method(self) -> str:
        """'auto' → matmul on TPU (measured faster than the XLA FFT lowering
        for 1024-point transforms, and it fuses with neighbors), fft on CPU."""
        if self.stft_method != "auto":
            return self.stft_method
        import jax

        return "matmul" if jax.default_backend() == "tpu" else "fft"

    def resolved_nmf_backend(self) -> str:
        """'auto' → the fused-VMEM Pallas kernel on TPU (~3x the XLA path),
        XLA elsewhere (and wherever bit-parity with the oracle matters)."""
        if self.nmf_backend != "auto":
            return self.nmf_backend
        import jax

        return "pallas" if jax.default_backend() == "tpu" else "xla"

    def resolved_frontend_backend(self) -> str:
        """'auto' → the fused front-end kernel on TPU in bf16 throughput
        modes (requires hop | window); XLA elsewhere and in f32 parity
        mode."""
        if self.frontend_backend != "auto":
            return self.frontend_backend
        import jax

        return (
            "pallas"
            if (
                jax.default_backend() == "tpu"
                and self.window_size % self.hop_size == 0
                and self.nmf_matmul_dtype != "float32"
            )
            else "xla"
        )

    def resolved_synthesis_backend(self) -> str:
        """'auto' → the fused synthesis kernel on TPU, XLA elsewhere."""
        if self.synthesis_backend != "auto":
            return self.synthesis_backend
        import jax

        return "pallas" if jax.default_backend() == "tpu" else "xla"


def stft_gain(cfg: OfflineConfig) -> float:
    """The reference's constant reconstruction gain hop/window*2
    (gccNMFFunctions.py:155)."""
    return cfg.hop_size / float(cfg.window_size) * 2.0


def gemm_dtype(cfg: OfflineConfig) -> str:
    """GEMM operand dtype for the non-NMF Pallas kernels. The NMF-only
    "bfloat16_q" mode (bf16-resident V/q inside the NMF loop) maps to plain
    bf16 GEMMs everywhere else."""
    md = cfg.nmf_matmul_dtype
    return "bfloat16" if md in ("bfloat16_q", "bfloat16_q_simul") else md


def plane_dtype(cfg: OfflineConfig) -> str:
    """Storage dtype of the fused front-end's spec/V/coherence planes.
    bf16 in the throughput modes — the front-end is store-bandwidth-bound
    and every hot consumer quantizes to bf16 at its GEMMs anyway — f32 in
    float32 parity mode (exact planes for the oracle trajectory)."""
    return "bfloat16" if gemm_dtype(cfg) == "bfloat16" else "float32"


class GCCNMFSeparator:
    """Blind stereo source separation."""

    def __init__(self, config: OfflineConfig = OfflineConfig()):
        self.config = config
        self._stft_method = config.resolved_stft_method()
        self._nmf_backend = config.resolved_nmf_backend()
        self._synthesis_backend = config.resolved_synthesis_backend()
        self._frontend_backend = config.resolved_frontend_backend()
        self._window = win_ops.hann_symmetric(config.window_size)
        self._cos_sin = gcc.steering_cos_sin(
            float(config.sample_rate),
            config.num_freq,
            config.mic_separation_m,
            config.num_tdoas,
        )
        # Per-INSTANCE jit wrappers: class-level jit(static_argnums=0)
        # would key one global cache on instance identity and retain every
        # separator ever built (see models/realtime.py for the full
        # rationale); a wrapper owned by the instance dies with it.
        self._analyze = jax.jit(self._analyze_jit_impl)
        self._reconstruct = jax.jit(self._reconstruct_impl)
        self._reconstruct_batched = jax.jit(self._reconstruct_batched_impl)
        self._reconstruct_batched_winner = jax.jit(
            self._reconstruct_batched_winner_impl
        )
        self._separate_batch_jit = jax.jit(
            self._separate_batch_jit_impl, static_argnums=3
        )
        self._separate_batch_auto_jit = jax.jit(
            self._separate_batch_auto_jit_impl, static_argnums=3
        )
        self._separate_batch_i16_jit = jax.jit(
            self._separate_batch_i16_jit_impl, static_argnums=3
        )

    # ---- jitted stages ----------------------------------------------------

    def _run_nmf(self, v, w0, h0):
        cfg = self.config
        if self._nmf_backend == "pallas":
            from gccnmf_tpu.ops.nmf_pallas import kl_nmf_pallas

            return kl_nmf_pallas(
                v, w0, h0, cfg.num_iterations, cfg.sparsity_alpha, cfg.epsilon,
                matmul_dtype=cfg.nmf_matmul_dtype,
            )
        if cfg.nmf_matmul_dtype == "bfloat16_q_simul":
            # the turbo algorithm must behave the same off-TPU (where the
            # XLA path replaces the fused kernel); numerics are f32 here
            return nmf.kl_nmf_simul(
                v, w0, h0, cfg.num_iterations, cfg.sparsity_alpha, cfg.epsilon
            )
        return nmf.kl_nmf(
            v, w0, h0, cfg.num_iterations, cfg.sparsity_alpha, cfg.epsilon
        )

    def _analyze_planes(self, stereo, w0, h0):
        """Analysis stage on f32 planes: (spec_re, spec_im, W, H, coh_re,
        coh_im, ang). On the Pallas front-end the planes come straight
        from the fused kernel (no complex64 ever materialized)."""
        cfg = self.config
        if self._frontend_backend == "pallas":
            from gccnmf_tpu.ops.frontend_pallas import stft_gcc_frontend_pallas

            cos_m, sin_m = self._cos_sin
            sre, sim, vp, cre, cim, ang = stft_gcc_frontend_pallas(
                stereo, jnp.asarray(self._window), jnp.asarray(cos_m),
                jnp.asarray(sin_m), hop_size=cfg.hop_size, conjugate=True,
                matmul_dtype=gemm_dtype(cfg), plane_dtype=plane_dtype(cfg),
            )
            # (..., 2, T, FP) → (..., 2T, FP): left‖right concatenated
            # along time (runGCCNMF.py:40) is a free reshape in this
            # layout. The Pallas NMF consumes the lane-padded planes
            # as-is (zero columns are inert, and a bf16 V plane stays
            # bf16-resident in "bfloat16_q" mode); the XLA NMF contracts
            # against the (F, K) dictionary, so slice to valid bins.
            v = vp.reshape(*vp.shape[:-3], -1, vp.shape[-1])
            if self._nmf_backend != "pallas":
                v = v[..., : cfg.num_freq].astype(jnp.float32)
            w, h = self._run_nmf(v, w0, h0)
            return sre, sim, w, h, cre, cim, ang
        spec = stft_ops.stft(
            stereo, self._window, cfg.hop_size, conjugate=True,
            method=self._stft_method,
        )  # (..., 2, T, F)
        v = jnp.concatenate(
            [jnp.abs(spec[..., 0, :, :]), jnp.abs(spec[..., 1, :, :])], axis=-2
        )
        w, h = self._run_nmf(v, w0, h0)
        coh = gcc.coherence(spec)
        ang = gcc.angular_spectrogram(coh, *self._cos_sin)
        return (
            jnp.real(spec), jnp.imag(spec), w, h,
            jnp.real(coh), jnp.imag(coh), ang,
        )

    def _analyze_jit_impl(self, stereo: jax.Array, w0: jax.Array, h0: jax.Array):
        """STFT + NMF + angular spectrogram. Returns (spec, W, H, coh, ang).

        Complex-assembly wrapper over :meth:`_analyze_planes` for
        XLA-tail/user-facing consumers; the Pallas front-end's lane
        padding is sliced off here."""
        f = self.config.num_freq
        sre, sim, w, h, cre, cim, ang = self._analyze_planes(stereo, w0, h0)
        as_f32 = lambda p: p[..., :f].astype(jnp.float32)
        return (
            jax.lax.complex(as_f32(sre), as_f32(sim)),
            w,
            h,
            jax.lax.complex(as_f32(cre), as_f32(cim)),
            ang,
        )

    def _reconstruct_impl(
        self,
        spec: jax.Array,
        coh: jax.Array,
        w: jax.Array,
        h: jax.Array,
        target_indexes: jax.Array,
    ):
        """Attribution → hard masks → Wiener reconstruction → ISTFT."""
        cfg = self.config
        t = spec.shape[-2]
        h_stereo = jnp.stack([h[..., :t, :], h[..., t:, :]], axis=-3)  # (2, T, K)
        scores = masks.target_attribution(coh, *self._cos_sin, target_indexes, w)
        coef_masks = masks.hard_coefficient_masks(scores)
        spec_est = masks.masked_reconstruction(coef_masks, spec, w, h_stereo)
        est = stft_ops.istft(
            spec_est,
            self._window,
            cfg.hop_size,
            conjugate=True,
            center_trim=True,
            method=self._stft_method,
        )
        return est * stft_gain(cfg), coef_masks

    def _reconstruct_batched_impl(
        self,
        spec: jax.Array,
        coh: jax.Array,
        w: jax.Array,
        h: jax.Array,
        target_indexes: jax.Array,
    ) -> jax.Array:
        """Batched reconstruction tail → (B, N, 2, n_out) waveforms.

        ``spec``: (B, 2, T, F); ``coh``: (B, T, F); ``w``: (B, F, K);
        ``h``: (B, 2T, K); ``target_indexes``: (B, N). On the Pallas path
        the flat-GEMM attribution argmax feeds the fused synthesis kernel
        directly — neither one-hot masks nor the complex per-target
        spectrogram estimates are ever materialized.
        """
        return self._reconstruct_batched_winner(
            jnp.real(spec), jnp.imag(spec), jnp.real(coh), jnp.imag(coh),
            w, h, target_indexes,
        )[0]

    def _reconstruct_batched_winner_impl(
        self, sre, sim, cre, cim, w, h, target_indexes
    ):
        """Plane-input reconstruction tail (the fused front-end's native
        currency). Returns ``(estimates, winner)`` — ``winner`` is the
        (B, T, K) per-(frame, atom) winning-target index on the Pallas
        path (None on the XLA tail, which derives masks internally), so
        callers wanting coefficient masks don't recompute the attribution.
        """
        cfg = self.config
        t = sre.shape[-2]
        h_stereo = jnp.stack([h[..., :t, :], h[..., t:, :]], axis=-3)
        if self._synthesis_backend == "pallas":
            from gccnmf_tpu.ops.synthesis_pallas import masked_synthesis_pallas

            winner = masks.attribution_winner_planes(
                cre, cim, *self._cos_sin, target_indexes, w
            )
            est = masked_synthesis_pallas(
                (sre, sim),
                winner,
                w,
                h_stereo,
                self._window,
                num_targets=target_indexes.shape[-1],
                hop_size=cfg.hop_size,
                gain=stft_gain(cfg),
                matmul_dtype=gemm_dtype(cfg),
            )
            return est, winner
        f = self.config.num_freq  # drop any lane padding for the XLA tail
        as_f32 = lambda p: p[..., :f].astype(jnp.float32)
        spec = jax.lax.complex(as_f32(sre), as_f32(sim))
        coh = jax.lax.complex(as_f32(cre), as_f32(cim))
        est, _ = jax.vmap(self._reconstruct)(spec, coh, w, h, target_indexes)
        return est, None

    def _reconstruct_batched_planes(
        self, sre, sim, cre, cim, w, h, target_indexes
    ) -> jax.Array:
        return self._reconstruct_batched_winner(
            sre, sim, cre, cim, w, h, target_indexes
        )[0]

    # ---- public API -------------------------------------------------------

    def separate(self, stereo: np.ndarray, num_sources: int | None = None):
        """Separate a (2, n) float32 mixture → dict with ``estimates``
        (num_targets, 2, n_out), ``target_tdoa_indexes``, ``angular``,
        ``w``, ``h``."""
        cfg = self.config
        num_sources = cfg.num_sources if num_sources is None else num_sources
        t = stft_ops.num_frames(stereo.shape[-1], cfg.window_size, cfg.hop_size)
        w0, h0 = nmf.nmf_init_numpy(
            cfg.num_freq, cfg.dictionary_size, 2 * t, cfg.epsilon
        )
        spec, w, h, coh, ang = self._analyze(
            jnp.asarray(stereo), jnp.asarray(w0), jnp.asarray(h0)
        )
        mean_ang = np.asarray(gcc.mean_angular_spectrum(ang))
        targets = localize.estimate_target_tdoa_indexes(mean_ang, num_sources)
        targets_arr = jnp.asarray(np.asarray(targets, np.int32))
        if self._synthesis_backend == "pallas":
            estimates, winner = self._reconstruct_batched_winner(
                jnp.real(spec)[None], jnp.imag(spec)[None],
                jnp.real(coh)[None], jnp.imag(coh)[None],
                w[None], h[None], targets_arr[None],
            )
            estimates = estimates[0]
            # one-hot the winner the reconstruction already derived rather
            # than recomputing the full attribution GEMM
            coef_masks = jax.nn.one_hot(
                winner[0], targets_arr.shape[-1], axis=0, dtype=jnp.float32
            )
        else:
            estimates, coef_masks = self._reconstruct(
                spec, coh, w, h, targets_arr
            )
        return dict(
            estimates=np.asarray(estimates),
            target_tdoa_indexes=targets,
            angular=np.asarray(ang),
            w=np.asarray(w),
            h=np.asarray(h),
            coefficient_masks=np.asarray(coef_masks),
        )

    def separate_file(
        self,
        mixture_path: str,
        output_prefix: str | None = None,
        audio: tuple[np.ndarray, int] | None = None,
    ):
        """Separate ``<prefix>_mix.wav`` → ``<prefix>_sim_<n>.wav`` files
        (naming per reference gccNMFFunctions.py:43-45). Pass ``audio`` as
        ``(stereo, sample_rate)`` to skip re-reading an already-loaded
        file."""
        stereo, sr = audio if audio is not None else wav.read_wav(mixture_path)
        sep = self
        if sr != self.config.sample_rate:
            # jit caches are keyed on the (immutable) separator instance, so
            # build a fresh one rather than mutating in place.
            sep = GCCNMFSeparator(replace(self.config, sample_rate=sr))
        result = sep.separate(stereo)
        prefix = output_prefix or wav.default_output_prefix(mixture_path)
        paths = []
        for i, est in enumerate(result["estimates"]):
            path = f"{prefix}_sim_{i + 1}.wav"
            wav.write_wav(est, path, sr)
            paths.append(path)
        result["paths"] = paths
        return result

    # ---- fully-jitted batched path (throughput / DP scaling) -------------

    def _separate_one(self, stereo, w0, h0, num_sources):
        """Single-utterance end-to-end separation with on-device peak
        picking (fixed source count) — the vmap/pjit unit."""
        spec, w, h, coh, ang = self._analyze(stereo, w0, h0)
        targets = localize.top_k_peaks(gcc.mean_angular_spectrum(ang), num_sources)
        est, _ = self._reconstruct(spec, coh, w, h, targets)
        return est, targets

    def _separate_batch_core(self, stereo, w0, h0, num_sources):
        # every stage is batch-polymorphic (and the Pallas kernels grid
        # over the batch), so no vmap — the whole path runs on f32 planes
        # with no complex64 intermediates
        sre, sim, w, h, cre, cim, ang = self._analyze_planes(stereo, w0, h0)
        mean_ang = jax.vmap(gcc.mean_angular_spectrum)(ang)
        targets = jax.vmap(
            lambda a: localize.top_k_peaks(a, num_sources)
        )(mean_ang)
        peaks = localize.peak_count(mean_ang)  # (B,)
        est = self._reconstruct_batched_planes(
            sre, sim, cre, cim, w, h, targets
        )
        return est, targets, peaks

    def _separate_batch_jit_impl(self, stereo, w0, h0, num_sources):
        return self._separate_batch_core(stereo, w0, h0, num_sources)

    def _separate_batch_auto_jit_impl(self, stereo, w0, h0, max_sources):
        """Auto source counting on device: jitted 2-means on peak heights
        (ops/localize.auto_count_targets) replaces the fixed top-k picker;
        the reconstruction is identical. Returns (est, targets, counts)."""
        sre, sim, w, h, cre, cim, ang = self._analyze_planes(stereo, w0, h0)
        mean_ang = jax.vmap(gcc.mean_angular_spectrum)(ang)
        targets, counts = localize.auto_count_targets(mean_ang, max_sources)
        est = self._reconstruct_batched_planes(
            sre, sim, cre, cim, w, h, targets
        )
        return est, targets, counts

    def _separate_batch_i16_jit_impl(self, stereo_i16, w0, h0, num_sources):
        """int16-in/int16-out variant for bandwidth-starved host links:
        PCM↔float conversion happens on device, halving host↔device bytes
        (the inputs/outputs are 16-bit WAV audio anyway, so the only delta
        vs the f32 path is the writer's output quantization happening
        earlier). Conversion conventions mirror utils/wav.py:30-49."""
        stereo = stereo_i16.astype(jnp.float32) / 32768.0
        est, targets, peaks = self._separate_batch_core(
            stereo, w0, h0, num_sources
        )
        est_i16 = jnp.clip(est * 32768.0, -32768, 32767).astype(jnp.int16)
        return est_i16, targets, peaks

    def separate_batch(
        self,
        stereo_batch: np.ndarray,
        num_sources: int | None = None,
        max_sources: int = 4,
    ):
        """Fully on-device separation of a batch ``(B, 2, n)``.

        With a fixed ``num_sources`` (given here or via the config):
        device top-k peak picking; returns ``(estimates, targets)``.
        Utterances with fewer angular-spectrum peaks than ``num_sources``
        get duplicated targets (the host path raises instead) and are
        reported with a warning.

        With ``num_sources=None`` (and ``config.num_sources=None``): fully
        on-device auto source counting — a jitted fixed-iteration 2-means
        on peak heights (the working version of the reference's broken
        sklearn branch, gccNMFFunctions.py:105-108) — and returns
        ``(estimates, targets, counts)`` where ``estimates[b, counts[b]:]``
        are silent zero-mask pads (duplicates of the dominant peak) and
        rows ``[0, counts[b])`` are the detected sources, left-to-right.
        """
        cfg = self.config
        num_sources = cfg.num_sources if num_sources is None else num_sources
        b = stereo_batch.shape[0]
        t = stft_ops.num_frames(stereo_batch.shape[-1], cfg.window_size, cfg.hop_size)
        w0, h0 = nmf.nmf_init_numpy(cfg.num_freq, cfg.dictionary_size, 2 * t, cfg.epsilon)
        w0 = jnp.broadcast_to(jnp.asarray(w0), (b,) + w0.shape)
        h0 = jnp.broadcast_to(jnp.asarray(h0), (b,) + h0.shape)
        if not num_sources:
            est, targets, counts = self._separate_batch_auto_jit(
                jnp.asarray(stereo_batch), w0, h0, max_sources
            )
            return np.asarray(est), np.asarray(targets), np.asarray(counts)
        est, targets, peaks = self._separate_batch_jit(
            jnp.asarray(stereo_batch), w0, h0, num_sources
        )
        short = np.flatnonzero(np.asarray(peaks) < num_sources)
        if short.size:
            logger.warning(
                "separate_batch: %d utterance(s) (e.g. index %d) had fewer "
                "than %d angular-spectrum peaks; their missing targets "
                "duplicate the dominant peak",
                short.size, int(short[0]), num_sources,
            )
        return np.asarray(est), np.asarray(targets)

    def separate_batches(
        self,
        batches,
        num_sources: int | None = None,
        io_dtype: str = "float32",
    ):
        """Pipelined separation over an iterable of ``(B, 2, n)`` chunks.

        Yields ``(estimates, targets)`` per chunk like
        :meth:`separate_batch`, but overlaps host↔device I/O with compute:
        while chunk k computes, chunk k+1's upload is already in flight and
        chunk k−1's estimates are being copied back asynchronously — the
        standard double-buffering the serial upload→compute→download path
        of :meth:`separate_batch` lacks. Peak throughput needs uniform
        chunk shapes (a new shape recompiles the program).

        ``io_dtype="int16"`` moves PCM↔float conversion onto the device and
        ships 16-bit samples both ways — half the bytes on the host link;
        the estimates come back quantized exactly as
        :func:`gccnmf_tpu.utils.wav.write_wav` would quantize them
        (utils/wav.py:41-49) and are returned as float32 in [-1, 1).
        """
        import jax as _jax

        cfg = self.config
        num_sources = cfg.num_sources if num_sources is None else num_sources
        if not num_sources:
            raise ValueError("separate_batches needs a fixed num_sources")
        if io_dtype not in ("float32", "int16"):
            raise ValueError(f"io_dtype must be float32 or int16: {io_dtype}")
        run = (
            self._separate_batch_i16_jit
            if io_dtype == "int16"
            else self._separate_batch_jit
        )

        init_cache: dict = {}

        def inits(b: int, n: int):
            key = (b, n)
            if key not in init_cache:
                t = stft_ops.num_frames(n, cfg.window_size, cfg.hop_size)
                w0, h0 = nmf.nmf_init_numpy(
                    cfg.num_freq, cfg.dictionary_size, 2 * t, cfg.epsilon
                )
                init_cache[key] = (
                    jnp.broadcast_to(jnp.asarray(w0), (b,) + w0.shape),
                    jnp.broadcast_to(jnp.asarray(h0), (b,) + h0.shape),
                )
            return init_cache[key]

        # host-heap hygiene over long chunk streams: periodic malloc_trim
        # bounds the loop's own allocator churn (the tunnel client's live
        # staging retention is separate and process-lifetime —
        # docs/tunnel_probe.json, utils/hostmem docstring)
        from gccnmf_tpu.utils.hostmem import PeriodicTrim

        trimmer = PeriodicTrim()

        def materialize(pending):
            est_dev, targets_dev = pending
            est = np.asarray(est_dev)
            trimmer.account(est.nbytes)
            if io_dtype == "int16":
                est = est.astype(np.float32) / 32768.0
            return est, np.asarray(targets_dev)

        prev = None
        for chunk in batches:
            chunk = np.asarray(chunk)
            if io_dtype == "int16" and chunk.dtype != np.int16:
                chunk = np.clip(
                    chunk.astype(np.float32) * 32768.0, -32768, 32767
                ).astype(np.int16)
            w0b, h0b = inits(chunk.shape[0], chunk.shape[-1])
            dev_in = _jax.device_put(chunk)  # async upload
            trimmer.account(chunk.nbytes)
            est, targets, _ = run(dev_in, w0b, h0b, num_sources)
            try:
                est.copy_to_host_async()
                targets.copy_to_host_async()
            except Exception:  # backends without async copy: fetch later
                pass
            if prev is not None:
                yield materialize(prev)
            prev = (est, targets)
        if prev is not None:
            yield materialize(prev)


class GCCNMFEnhancer:
    """Offline speech enhancement with a pre-learned dictionary.

    Attribution uses the soft generalized-Gaussian coefficient mask around
    the localized target TDOA and a Wiener TF mask — the offline analogue
    of the RT streaming path (reference gccNMFProcessor.py:259-269), giving
    a single enhanced stereo output instead of per-source streams.
    """

    def __init__(
        self,
        w: np.ndarray,
        config: OfflineConfig = OfflineConfig(mic_separation_m=0.1, num_tdoas=64),
        target_epsilon: float = 5.0,
        target_beta: float = 2.0,
        noise_floor: float = 0.0,
        num_h_updates: int = 0,
    ):
        self.config = config
        self.w = jnp.asarray(w, jnp.float32)
        self.target_epsilon = target_epsilon
        self.target_beta = target_beta
        self.noise_floor = noise_floor
        self.num_h_updates = num_h_updates
        self._stft_method = config.resolved_stft_method()
        self._synthesis_backend = config.resolved_synthesis_backend()
        self._frontend_backend = config.resolved_frontend_backend()
        self._window = win_ops.hann_symmetric(config.window_size)
        self._cos_sin = gcc.steering_cos_sin(
            float(config.sample_rate),
            config.num_freq,
            config.mic_separation_m,
            config.num_tdoas,
        )
        self._enhance_jit = jax.jit(self._enhance_jit_impl)  # per-instance

    def _enhance_jit_impl(self, stereo, target_eps, target_beta, noise_floor):
        cfg = self.config
        if self._frontend_backend == "pallas":
            from gccnmf_tpu.ops.frontend_pallas import stft_gcc_frontend_pallas

            cos_m, sin_m = self._cos_sin
            sre, sim, _, cre, cim, ang = stft_gcc_frontend_pallas(
                stereo, jnp.asarray(self._window), jnp.asarray(cos_m),
                jnp.asarray(sin_m), hop_size=cfg.hop_size, conjugate=True,
                matmul_dtype=gemm_dtype(cfg), plane_dtype=plane_dtype(cfg),
            )
            spec = (sre, sim)  # planes tuple; consumers split anyway
            coh = (cre, cim)
        else:
            cspec = stft_ops.stft(
                stereo, self._window, cfg.hop_size, conjugate=True,
                method=self._stft_method,
            )  # (..., 2, T, F)
            ccoh = gcc.coherence(cspec)
            ang = gcc.angular_spectrogram(ccoh, *self._cos_sin)  # (..., T, D)
            spec, coh = cspec, ccoh
        target_idx = jnp.argmax(gcc.mean_angular_spectrum(ang), axis=-1)

        # With H inference requested the mask depends on H, which the fused
        # enhancement kernel does not model — use the XLA tail (the H path
        # mirrors the online enhancer, models/online.py:139-146; reference
        # plumbs this as numHUpdates, realtime/config.py:73).
        if self._synthesis_backend == "pallas" and self.num_h_updates <= 0:
            from gccnmf_tpu.ops.enhance_pallas import enhance_synthesis_pallas

            if isinstance(spec, tuple):
                batch = spec[0].shape[:-3]
                spec_in = tuple(
                    p.reshape(-1, *p.shape[-3:]) for p in spec
                )
                coh_in = tuple(p.reshape(-1, *p.shape[-2:]) for p in coh)
            else:
                batch = spec.shape[:-3]
                spec_in = spec.reshape(-1, *spec.shape[-3:])
                coh_in = coh.reshape(-1, *coh.shape[-2:])
            out = enhance_synthesis_pallas(
                spec_in,
                coh_in,
                self.w,
                *self._cos_sin,
                target_idx.reshape(-1),
                target_eps,
                target_beta,
                noise_floor,
                self._window,
                hop_size=cfg.hop_size,
                gain=stft_gain(cfg),
                matmul_dtype=gemm_dtype(cfg),
            )
            return out.reshape(*batch, *out.shape[-2:]), target_idx, ang
        if isinstance(spec, tuple):  # pallas front-end + XLA tail
            f = cfg.num_freq  # drop lane padding (and any bf16 storage)
            as_f32 = lambda p: p[..., :f].astype(jnp.float32)
            spec = jax.lax.complex(as_f32(spec[0]), as_f32(spec[1]))
            coh = jax.lax.complex(as_f32(coh[0]), as_f32(coh[1]))

        # Per-(frame, atom) argmax-TDOA via the shared fold + flat-GEMM
        # helpers (masks.py): the folded operands depend only on
        # compile-time constants and are hoisted by XLA.
        cos_w, sin_w = masks.fold_steering_dictionary(*self._cos_sin, self.w)
        argmax_d = masks.argmax_tdoa(
            jnp.real(coh), jnp.imag(coh), cos_w, sin_w,
            self.config.num_tdoas,
        )  # (..., T, K)
        h_mask = masks.soft_tdoa_coefficient_mask(
            argmax_d,
            target_idx.astype(jnp.float32)[..., None, None],
            target_eps,
            target_beta,
            noise_floor,
        )
        if self.num_h_updates > 0:
            v = jnp.mean(jnp.abs(spec), axis=-3)  # (..., T, F) channel-avg
            h0 = jnp.ones(v.shape[:-1] + (self.w.shape[1],), jnp.float32)
            h = nmf.h_infer(
                v, self.w, h0, self.num_h_updates, epsilon=cfg.epsilon
            )
            prec = xprec.get()
            num = jnp.einsum(
                "...tk,fk->...tf", h * h_mask, self.w, precision=prec
            )
            den = jnp.einsum("...tk,fk->...tf", h, self.w, precision=prec)
            tf_mask = num / (den + cfg.epsilon)
        else:
            tf_mask = masks.wiener_tf_mask(self.w, h_mask)  # (..., T, F)
        out_spec = tf_mask[..., None, :, :] * spec
        out = stft_ops.istft(
            out_spec,
            self._window,
            cfg.hop_size,
            conjugate=True,
            center_trim=True,
            method=self._stft_method,
        )
        return out * stft_gain(cfg), target_idx, ang

    def enhance(self, stereo: np.ndarray):
        """Enhance a (2, n) or (B, 2, n) mixture → same-rank output."""
        out, target_idx, ang = self._enhance_jit(
            jnp.asarray(stereo),
            jnp.float32(self.target_epsilon),
            jnp.float32(self.target_beta),
            jnp.float32(self.noise_floor),
        )
        return dict(
            enhanced=np.asarray(out),
            target_tdoa_index=np.asarray(target_idx),
            angular=np.asarray(ang),
        )
