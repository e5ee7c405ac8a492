"""Atom-to-TDOA attribution, coefficient masks, Wiener reconstruction.

Offline path (hard masks): per-(atom, frame) attribution scores for each
target TDOA, argmax over targets → binary coefficient masks → masked
``W·H`` magnitudes with mixture phase (reference:
gccNMF/gccNMFFunctions.py:118-151).

Streaming path (soft masks): per-(frame, atom) argmax TDOA distance to the
target pushed through a generalized-Gaussian window (or boxcar), then a
Wiener-style TF mask ``W·HMask / Σ_k W`` (reference:
gccNMF/realtime/gccNMFProcessor.py:259-269).

Layouts are time-major: scores ``(N, T, K)``, masks ``(N, T, K)``,
spectrograms ``(..., T, F)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "target_attribution",
    "attribution_winner",
    "attribution_winner_planes",
    "fold_steering_dictionary",
    "argmax_tdoa",
    "hard_coefficient_masks",
    "masked_reconstruction",
    "soft_tdoa_coefficient_mask",
    "boxcar_tdoa_coefficient_mask",
    "wiener_tf_mask",
    "wiener_tf_mask_h",
]

from gccnmf_tpu.ops import xprec as _xprec


def _HIGHEST():  # trace-time MXU precision policy (ops/xprec.py)
    return _xprec.get()


def target_attribution(
    coh: jax.Array,
    cos_m: jax.Array | np.ndarray,
    sin_m: jax.Array | np.ndarray,
    target_indexes: jax.Array | np.ndarray,
    w: jax.Array,
) -> jax.Array:
    """Per-target atom attribution scores ``(N, T, K)``.

    ``scores[n,t,k] = Re( Σ_f W[f,k] · coh[t,f] · exp(-i 2π f τ_n) )``
    computed as real GEMMs: project coherence onto each target's steering
    column, then onto the dictionary (reference gccNMFFunctions.py:132-133).
    """
    cos_sel = jnp.asarray(cos_m)[:, jnp.asarray(target_indexes)]  # (F, N)
    sin_sel = jnp.asarray(sin_m)[:, jnp.asarray(target_indexes)]
    # real part of coh * e: (N, T, F)
    re = (
        jnp.real(coh)[..., None, :, :] * cos_sel.T[:, None, :]
        + jnp.imag(coh)[..., None, :, :] * sin_sel.T[:, None, :]
    )
    return jnp.matmul(re, w, precision=_HIGHEST())  # (N, T, K)


def attribution_winner(
    coh: jax.Array,
    cos_m: jax.Array | np.ndarray,
    sin_m: jax.Array | np.ndarray,
    target_indexes: jax.Array,
    w: jax.Array,
) -> jax.Array:
    """Batched per-(frame, atom) winning-target index ``(B, T, K)`` int32.

    Same scores as :func:`target_attribution` but computed as two flat
    GEMMs ``(T, F) x (F, N·K)`` with the steering columns folded into the
    dictionary — the (B, N, T, F) broadcast intermediate that formulation
    materializes (~1 GB at the bench shape) never exists. The argmax over
    targets is taken immediately, so downstream consumers (the Pallas
    synthesis kernel) never materialize one-hot masks either.

    ``coh``: (B, T, F) complex; ``target_indexes``: (B, N) int;
    ``w``: (B, F, K).
    """
    return attribution_winner_planes(
        jnp.real(coh), jnp.imag(coh), cos_m, sin_m, target_indexes, w
    )


def attribution_winner_planes(
    coh_re: jax.Array,
    coh_im: jax.Array,
    cos_m: jax.Array | np.ndarray,
    sin_m: jax.Array | np.ndarray,
    target_indexes: jax.Array,
    w: jax.Array,
) -> jax.Array:
    """:func:`attribution_winner` on pre-split coherence planes (what the
    fused Pallas front-end emits — skips the complex round trip). The
    planes may be lane-padded wider than the steering F (the front-end
    pads F to the 128-lane tile with zeros); the folded dictionary is
    zero-extended to match, so padded lanes contribute nothing."""
    cos_sel = jnp.swapaxes(
        jnp.asarray(cos_m).T[jnp.asarray(target_indexes)], -1, -2
    )  # (B, F, N)
    sin_sel = jnp.swapaxes(
        jnp.asarray(sin_m).T[jnp.asarray(target_indexes)], -1, -2
    )
    b, f, n = cos_sel.shape
    k = w.shape[-1]
    cw = (cos_sel[..., None] * w[..., None, :]).reshape(b, f, n * k)
    sw = (sin_sel[..., None] * w[..., None, :]).reshape(b, f, n * k)
    fp = coh_re.shape[-1]
    if fp != f:
        pad = ((0, 0), (0, fp - f), (0, 0))
        cw = jnp.pad(cw, pad)
        sw = jnp.pad(sw, pad)
    flat = jnp.matmul(
        coh_re, cw, precision=_HIGHEST()
    ) + jnp.matmul(coh_im, sw, precision=_HIGHEST())
    scores = flat.reshape(*coh_re.shape[:-1], n, k)  # (B, T, N, K)
    safe = jnp.where(jnp.isnan(scores), -jnp.inf, scores)
    return jnp.argmax(safe, axis=-2).astype(jnp.int32)  # (B, T, K)


def fold_steering_dictionary(cos_m, sin_m, w) -> tuple[jax.Array, jax.Array]:
    """Fold steering ⊗ dictionary into flat ``(F, D·K)`` GEMM operands.

    The per-(frame, atom, TDOA) attribution score
    ``s[t,d,k] = Σ_f (Re c·cos_d + Im c·sin_d)[t,f] · W[f,k]`` becomes two
    flat MXU GEMMs against these operands — the shared scoring step of the
    streaming, online, and offline-enhancement paths. Compile-time
    constants when cos/sin/W are; XLA hoists the fold.
    """
    cos_m = jnp.asarray(cos_m, jnp.float32)
    sin_m = jnp.asarray(sin_m, jnp.float32)
    w = jnp.asarray(w, jnp.float32)
    f, d = cos_m.shape
    k = w.shape[-1]
    cos_w = (cos_m[:, :, None] * w[:, None, :]).reshape(f, d * k)
    sin_w = (sin_m[:, :, None] * w[:, None, :]).reshape(f, d * k)
    return cos_w, sin_w


def argmax_tdoa(
    coh_re: jax.Array,
    coh_im: jax.Array,
    cos_w: jax.Array,
    sin_w: jax.Array,
    num_tdoas: int,
) -> jax.Array:
    """Per-(frame, atom) argmax-TDOA from folded operands.

    ``coh_re/coh_im``: (..., T, F) coherence planes (f32 or bf16);
    ``cos_w/sin_w``: (F, D·K) from :func:`fold_steering_dictionary`.
    Returns (..., T, K) int32. NaN scores are masked to -inf before the
    argmax (matching :func:`attribution_winner_planes` — an unguarded
    argmax over NaN silently returns TDOA 0).
    """
    flat = jnp.matmul(coh_re, cos_w, precision=_HIGHEST()) + jnp.matmul(
        coh_im, sin_w, precision=_HIGHEST()
    )
    scores = flat.reshape(*coh_re.shape[:-1], num_tdoas, -1)
    safe = jnp.where(jnp.isnan(scores), -jnp.inf, scores)
    return jnp.argmax(safe, axis=-2).astype(jnp.int32)


def hard_coefficient_masks(scores: jax.Array) -> jax.Array:
    """Binary one-hot masks over the leading target axis.

    NaN-tolerant argmax like the reference's ``nanargmax``
    (gccNMFFunctions.py:138): NaN scores never win unless a column is
    all-NaN, in which case target 0 wins (and the frame is silent anyway).
    """
    num_targets = scores.shape[0]
    safe = jnp.where(jnp.isnan(scores), -jnp.inf, scores)
    winner = jnp.argmax(safe, axis=0)
    return jax.nn.one_hot(winner, num_targets, axis=0, dtype=scores.dtype)


def masked_reconstruction(
    masks: jax.Array,
    spec: jax.Array,
    w: jax.Array,
    h_stereo: jax.Array,
) -> jax.Array:
    """Per-target complex spectrogram estimates ``(N, 2, T, F)``.

    ``masks``: (N, T, K) shared across channels; ``spec``: (2, T, F)
    mixture spectrogram; ``h_stereo``: (2, T, K). Magnitudes are
    ``(H ⊙ mask) Wᵀ`` with the mixture phase re-applied
    (reference gccNMFFunctions.py:145-151).
    """
    masked_h = h_stereo[None, :, :, :] * masks[:, None, :, :]  # (N, 2, T, K)
    mags = jnp.einsum("nctk,fk->nctf", masked_h, w, precision=_HIGHEST())
    phase = jnp.exp(1j * jnp.angle(spec))
    return mags.astype(jnp.complex64) * phase[None]


def soft_tdoa_coefficient_mask(
    argmax_tdoa: jax.Array,
    target_tdoa_index: jax.Array,
    epsilon: jax.Array,
    beta: jax.Array,
    noise_floor: jax.Array,
) -> jax.Array:
    """Generalized-Gaussian soft mask over argmax-TDOA distance.

    ``exp(-(|d - target|/ε)^β) / (1 + floor) + floor`` — the RT path's
    TARGET_MODE_WINDOW_FUNCTION (reference gccNMFProcessor.py:265).
    All parameters are traced scalars so interactive slider changes do not
    trigger recompilation (the jax analogue of Theano SharedVariables,
    reference gccNMFProcessor.py:195-199).
    """
    dist = jnp.abs(argmax_tdoa.astype(jnp.float32) - target_tdoa_index)
    return jnp.exp(-((dist / epsilon) ** beta)) / (1.0 + noise_floor) + noise_floor


def boxcar_tdoa_coefficient_mask(
    argmax_tdoa: jax.Array, target_tdoa_index: jax.Array, epsilon: jax.Array
) -> jax.Array:
    """Hard boxcar mask: 1 within ε of the target TDOA index, else 0
    (reference TARGET_MODE_BOXCAR, gccNMFProcessor.py:263)."""
    dist = jnp.abs(argmax_tdoa.astype(jnp.float32) - target_tdoa_index)
    return jnp.where(dist < epsilon, 1.0, 0.0).astype(jnp.float32)


def wiener_tf_mask(w: jax.Array, h_mask: jax.Array) -> jax.Array:
    """Wiener-style TF mask ``(..., T, F)`` from coefficient mask
    ``h_mask (..., T, K)``: ``(h_mask Wᵀ) / Σ_k W[f,k]``
    (reference gccNMFProcessor.py:267-269)."""
    rec = jnp.einsum("...tk,fk->...tf", h_mask, w, precision=_HIGHEST())
    return rec / jnp.sum(w, axis=-1)


def wiener_tf_mask_h(
    w: jax.Array, h: jax.Array, h_mask: jax.Array, epsilon: float = 1e-16
) -> jax.Array:
    """H-aware Wiener mask ``W·(H⊙mask) / (W·H + ε)`` — the coefficient
    energies the W-only rule approximates with a flat prior. This is what
    the reference's plumbed-but-unused ``numHUpdates`` was for
    (gccNMFProcessor.py:195 stores it, processFrames never infers H);
    shared by the online enhancer and the streaming engine."""
    num = jnp.einsum("...tk,fk->...tf", h * h_mask, w, precision=_HIGHEST())
    den = jnp.einsum("...tk,fk->...tf", h, w, precision=_HIGHEST())
    return num / (den + epsilon)
