"""Online (frame-wise causal) GCC-NMF speech enhancement.

The online variant localizes the target from *causally accumulated*
GCC-PHAT statistics and infers per-frame NMF coefficients against a frozen
pre-learned dictionary (the reference plumbs this as ``numHUpdates``,
realtime/config.py:73; its online-enhancement notebook is among the
missing blobs — semantics follow the TASLP 2017 paper the README cites).

TPU-first formulation: although the *semantics* are a causal per-frame
recurrence, everything is computed as batched GEMMs plus parallel prefix
sums — no sequential scan over frames:

- per-frame angular spectra: one (T,F)x(F,D) GEMM;
- causal smoothing (cumulative / sliding / exponential): cumsum or
  ``associative_scan`` along time;
- per-frame target index: causal argmax of the smoothed statistics;
- H inference: ``num_h_updates`` multiplicative updates batched over all
  frames at once (init is frame-independent, so batching is exact);
- masking/reconstruction: batched as in the offline path.

Output frame t depends only on input frames ≤ t — verified by the
causality test (tests/test_online.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from gccnmf_tpu.ops import gcc, masks, nmf, stft as stft_ops
from gccnmf_tpu.ops import windows as win_ops

__all__ = ["OnlineConfig", "OnlineGCCNMFEnhancer"]

from gccnmf_tpu.ops import xprec as _xprec


def _HIGHEST():  # trace-time MXU precision policy (ops/xprec.py)
    return _xprec.get()


@dataclass(frozen=True)
class OnlineConfig:
    sample_rate: int = 16000
    window_size: int = 1024
    hop_size: int = 512
    num_tdoas: int = 64
    mic_separation_m: float = 0.1
    num_h_updates: int = 0  # 0 → W-only Wiener mask (RT rule)
    smoothing: str = "sliding"  # "sliding" | "cumulative" | "exponential"
    smoothing_window: int = 6  # frames, for "sliding"
    smoothing_alpha: float = 0.9  # for "exponential"
    target_epsilon: float = 5.0
    target_beta: float = 2.0
    noise_floor: float = 0.0
    epsilon: float = 1e-16

    @property
    def num_freq(self) -> int:
        return self.window_size // 2 + 1


def _causal_smooth(ang: jax.Array, cfg: OnlineConfig) -> jax.Array:
    """Causally smooth per-frame angular spectra ``(..., T, D)``."""
    if cfg.smoothing == "cumulative":
        csum = jnp.cumsum(ang, axis=-2)
        counts = jnp.arange(1, ang.shape[-2] + 1, dtype=jnp.float32)[:, None]
        return csum / counts
    if cfg.smoothing == "sliding":
        l = cfg.smoothing_window
        csum = jnp.cumsum(ang, axis=-2)
        padded = jnp.concatenate(
            [jnp.zeros_like(csum[..., :l, :]), csum], axis=-2
        )
        window_sum = csum - padded[..., : ang.shape[-2], :]
        counts = jnp.minimum(
            jnp.arange(1, ang.shape[-2] + 1, dtype=jnp.float32), float(l)
        )[:, None]
        return window_sum / counts
    if cfg.smoothing == "exponential":
        a = cfg.smoothing_alpha

        def combine(x, y):
            # linear recurrence y_t = a*y_{t-1} + (1-a)*x_t as an
            # associative op on (coef, value) pairs
            (ca, va), (cb, vb) = x, y
            return ca * cb, vb + cb * va

        coefs = jnp.full(ang.shape[:-1], a)[..., None]
        _, smoothed = jax.lax.associative_scan(
            combine, (coefs, (1 - a) * ang), axis=-2
        )
        return smoothed
    raise ValueError(f"unknown smoothing mode: {cfg.smoothing}")


class OnlineGCCNMFEnhancer:
    """Causal frame-wise enhancement with a pre-learned dictionary."""

    def __init__(self, w: np.ndarray, config: OnlineConfig = OnlineConfig()):
        self.config = config
        self.w = jnp.asarray(w, jnp.float32)
        cfg = config
        self._window = jnp.asarray(win_ops.sqrt_hamming(cfg.window_size))
        self._cos_sin = gcc.steering_cos_sin(
            float(cfg.sample_rate), cfg.num_freq, cfg.mic_separation_m, cfg.num_tdoas
        )
        self._cos_w, self._sin_w = masks.fold_steering_dictionary(
            *self._cos_sin, self.w
        )
        self._enhance_jit = jax.jit(self._enhance_jit_impl)  # per-instance

    def _enhance_jit_impl(self, stereo: jax.Array):
        cfg = self.config
        spec = stft_ops.stft(stereo, self._window, cfg.hop_size)  # (...,2,T,F)
        # guard_zeros: digital silence must not NaN-poison the causal
        # localization smoother (bit-identical on nonzero bins)
        coh = gcc.coherence(spec, guard_zeros=True)  # (..., T, F)
        ang = gcc.angular_spectrogram(coh, *self._cos_sin) / cfg.num_freq
        smoothed = _causal_smooth(ang, cfg)  # (..., T, D)
        target_idx = jnp.argmax(smoothed, axis=-1).astype(jnp.float32)  # (..., T)

        argmax_d = masks.argmax_tdoa(
            jnp.real(coh), jnp.imag(coh), self._cos_w, self._sin_w,
            cfg.num_tdoas,
        )  # (..., T, K)
        h_mask = masks.soft_tdoa_coefficient_mask(
            argmax_d,
            target_idx[..., None],
            jnp.float32(cfg.target_epsilon),
            jnp.float32(cfg.target_beta),
            jnp.float32(cfg.noise_floor),
        )  # (..., T, K)

        if cfg.num_h_updates > 0:
            v = jnp.mean(jnp.abs(spec), axis=-3)  # (..., T, F) channel-avg mags
            h0 = jnp.ones(v.shape[:-1] + (self.w.shape[1],), jnp.float32)
            h = nmf.h_infer(v, self.w, h0, cfg.num_h_updates, epsilon=cfg.epsilon)
            tf_mask = masks.wiener_tf_mask_h(self.w, h, h_mask, cfg.epsilon)
        else:
            tf_mask = masks.wiener_tf_mask(self.w, h_mask)

        out_spec = tf_mask[..., None, :, :] * spec
        out = stft_ops.istft(out_spec, self._window, cfg.hop_size)
        return out, target_idx, h_mask

    def enhance(self, stereo: np.ndarray):
        """Enhance (2, n) or (B, 2, n) causally. Returns dict with
        ``enhanced`` (same leading shape), per-frame ``target_tdoa_index``
        and coefficient masks."""
        out, target_idx, h_mask = self._enhance_jit(jnp.asarray(stereo))
        return dict(
            enhanced=np.asarray(out),
            target_tdoa_index=np.asarray(target_idx),
            coefficient_masks=np.asarray(h_mask),
        )
