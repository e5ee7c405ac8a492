"""Pallas TPU kernels: fused offline-enhancement coefficient masking.

The offline enhancer (reference semantics: gccNMF/realtime/
gccNMFProcessor.py:259-269 applied batch-wise) computes, per utterance:

    scores[t,d,k] = Σ_f (Re coh · cos + Im coh · sin)[t,f,d] · W[f,k]
    argmax_d[t,k] = argmax_d scores                    # per-atom TDOA
    h_mask        = genGauss(|argmax_d − target|; ε,β,floor)
    tf_mask       = (h_mask Wᵀ) / Σ_k W[f,k]           # Wiener-style
    y             = ISTFT(tf_mask ⊙ X) · gain

Composed in XLA the (B, T, D, K) scores tensor is materialized in HBM —
10.4 GB at the bench shape (batch 128, T 1250, D 128, K 128); the isolated
scores+argmax stage OOMs a v5e chip outright and the fused pipeline is
HBM-bound streaming it. :func:`soft_mask_pallas` never materializes scores
beyond one VMEM slab: the TDOA axis rides the innermost sequential grid
dimension in chunks of the steering-folded dictionary ``(cosᵀ⊗W, sinᵀ⊗W)``,
a VMEM scratch carries the running (max, argmax), and the final chunk
applies the generalized-Gaussian mask in place.

Batch elements are tiled ``bb`` at a time with their frame axes concatenated
into one GEMM row block, so each folded-dictionary slab is DMA'd once per
``bb`` utterances instead of once per utterance per time tile (a first
single-phase revision of this kernel re-streamed the 84 MB folded
dictionary per (batch, time-tile) — ~53 GB of DMA at the bench shape,
3× slower than this layout).

The Wiener reconstruction and masked ISTFT that follow read only
(B, T, K)-sized masks and the spectrogram — they are streamed efficiently
by XLA (see GCCNMFEnhancer) — so fusing them here buys nothing further.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gccnmf_tpu.ops import masks as mask_ops
from gccnmf_tpu.ops.stft import istft

try:  # pallas is TPU/interpret-only; import lazily for CPU-only installs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None

__all__ = ["soft_mask_pallas", "enhance_synthesis_pallas"]


def _mask_kernel(
    bb, chunk_d, num_tdoas, matmul_dtype,
    params_ref, cre_ref, cim_ref, cw_ref, sw_ref,
    out_ref, max_ref, arg_ref,
):
    tile_t = cre_ref.shape[1]

    if jnp.dtype(matmul_dtype) == jnp.float32:

        def mm(x, y):
            return jax.lax.dot_general(
                x, y, ((((1,), (0,))), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )

    else:
        md = jnp.dtype(matmul_dtype)

        def mm(x, y):
            return jax.lax.dot_general(
                x.astype(md), y.astype(md), ((((1,), (0,))), ((), ())),
                preferred_element_type=jnp.float32,
            )

    dc = pl.program_id(2)
    n_dc = pl.num_programs(2)

    @pl.when(dc == 0)
    def _():
        max_ref[:] = jnp.full_like(max_ref, -jnp.inf)
        arg_ref[:] = jnp.zeros_like(arg_ref)

    # (bb, tile_t, Fp) → one (bb·tile_t, Fp) GEMM row block: every folded
    # slab is contracted against all bb utterances at once.
    cre = cre_ref[:].reshape(bb * tile_t, -1)
    cim = cim_ref[:].reshape(bb * tile_t, -1)

    # Running (max, argmax) over this chunk's TDOA columns. Strict ">" keeps
    # the first-maximal index, matching jnp.argmax tie-breaking; the
    # global-index guard keeps zero-padded TDOA slabs from ever winning.
    run_max = max_ref[:]
    run_arg = arg_ref[:]
    for d in range(chunk_d):
        gd = dc * chunk_d + d
        s = mm(cre, cw_ref[d]) + mm(cim, sw_ref[d])  # (bb·tile_t, K)
        upd = (s > run_max) & (gd < num_tdoas)
        run_max = jnp.where(upd, s, run_max)
        run_arg = jnp.where(upd, jnp.float32(gd), run_arg)
    max_ref[:] = run_max
    arg_ref[:] = run_arg

    @pl.when(dc == n_dc - 1)
    def _():
        kp = out_ref.shape[-1]
        arg = arg_ref[:].reshape(bb, tile_t, kp)
        for bi in range(bb):
            target = params_ref[bi, 0, 0]
            eps = params_ref[bi, 0, 1]
            beta = params_ref[bi, 0, 2]
            floor = params_ref[bi, 0, 3]
            dist = jnp.abs(arg[bi] - target) / eps
            # dist^beta as exp(beta·log) with the dist == 0 branch pinned
            # to 0; matches masks.soft_tdoa_coefficient_mask's `**`.
            p = jnp.where(
                dist > 0.0,
                jnp.exp(beta * jnp.log(jnp.maximum(dist, 1e-30))),
                0.0,
            )
            out_ref[bi] = jnp.exp(-p) / (1.0 + floor) + floor


def soft_mask_pallas(
    coh: jax.Array,
    w: jax.Array | np.ndarray,
    cos_m: np.ndarray,
    sin_m: np.ndarray,
    target_index: jax.Array,
    target_epsilon: jax.Array,
    target_beta: jax.Array,
    noise_floor: jax.Array,
    *,
    matmul_dtype: str = "bfloat16",
    batch_tile: int = 4,
    tile_t: int = 2048,
    chunk_d: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Per-(frame, atom) soft target mask ``(B, T, K)`` float32.

    Semantics: ``soft_tdoa_coefficient_mask(argmax_d(scores), target, ...)``
    with ``scores`` the steering-projected atom attribution (see module
    docstring) — without materializing the (B, T, D, K) scores.

    Args:
      coh: (B, T, F) complex64 PHAT coherence, or a ``(re, im)`` tuple of
        f32 planes (as produced by the fused Pallas front-end).
      w: (F, K) pre-learned dictionary (shared across the batch).
      cos_m / sin_m: (F, D) steering components
        (:func:`gccnmf_tpu.ops.gcc.steering_cos_sin`).
      target_index: (B,) per-utterance target TDOA index (float or int).
      target_epsilon / target_beta / noise_floor: traced mask scalars.
    """
    if pl is None:  # pragma: no cover
        raise RuntimeError("pallas unavailable")
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # Mosaic is TPU-only; CPU runs use the interpreter
    if isinstance(coh, tuple):
        coh_re, coh_im = coh
    else:
        coh_re, coh_im = jnp.real(coh), jnp.imag(coh)
    b, t, f = coh_re.shape
    w = np.asarray(w, np.float32)
    cos_m = np.asarray(cos_m, np.float32)
    sin_m = np.asarray(sin_m, np.float32)
    d = cos_m.shape[1]
    k = w.shape[1]
    fp = -(-f // 128) * 128
    kp = -(-k // 128) * 128
    dp = -(-d // chunk_d) * chunk_d

    # Steering-folded dictionary slabs (D, F, K) → padded (Dp, Fp, Kp);
    # zero pads are inert (zero scores never win via the index guard).
    cw = np.zeros((dp, fp, kp), np.float32)
    sw = np.zeros((dp, fp, kp), np.float32)
    cw[:d, :f, :k] = np.transpose(cos_m)[:, :, None] * w[None, :, :]
    sw[:d, :f, :k] = np.transpose(sin_m)[:, :, None] * w[None, :, :]

    params = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(target_index, jnp.float32), (b,)),
            jnp.broadcast_to(jnp.asarray(target_epsilon, jnp.float32), (b,)),
            jnp.broadcast_to(jnp.asarray(target_beta, jnp.float32), (b,)),
            jnp.broadcast_to(jnp.asarray(noise_floor, jnp.float32), (b,)),
        ],
        axis=-1,
    )[:, None, :]  # (B, 1, 4)

    # One time tile when the utterance fits (the common case); otherwise
    # tile the frame axis (masks have no cross-frame coupling).
    t8 = -(-t // 8) * 8
    eff_tile = t8 if t8 <= tile_t else tile_t
    return _mask_jit(
        coh_re, coh_im, params, jnp.asarray(cw), jnp.asarray(sw),
        num_tdoas=d, num_atoms=k, chunk_d=chunk_d,
        matmul_dtype=matmul_dtype, batch_tile=batch_tile,
        tile_t=eff_tile, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_tdoas", "num_atoms", "chunk_d", "matmul_dtype", "batch_tile",
        "tile_t", "interpret",
    ),
)
def _mask_jit(
    coh_re, coh_im, params, cw, sw,
    *, num_tdoas, num_atoms, chunk_d, matmul_dtype, batch_tile, tile_t,
    interpret,
):
    b, t, f = coh_re.shape
    dp, fp, kp = cw.shape
    bp = -(-b // batch_tile) * batch_tile
    t_pad = -(-t // tile_t) * tile_t

    cre = jnp.zeros((bp, t_pad, fp), jnp.float32)
    cim = jnp.zeros((bp, t_pad, fp), jnp.float32)
    cre = cre.at[:b, :t, :f].set(coh_re)
    cim = cim.at[:b, :t, :f].set(coh_im)
    params = jnp.concatenate(
        [params, jnp.ones((bp - b, 1, 4), jnp.float32)], axis=0
    )

    grid = (bp // batch_tile, t_pad // tile_t, dp // chunk_d)
    kernel = functools.partial(
        _mask_kernel, batch_tile, chunk_d, num_tdoas, matmul_dtype
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (batch_tile, 1, 4), lambda bi, i, dc: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (batch_tile, tile_t, fp), lambda bi, i, dc: (bi, i, 0)
            ),
            pl.BlockSpec(
                (batch_tile, tile_t, fp), lambda bi, i, dc: (bi, i, 0)
            ),
            pl.BlockSpec((chunk_d, fp, kp), lambda bi, i, dc: (dc, 0, 0)),
            pl.BlockSpec((chunk_d, fp, kp), lambda bi, i, dc: (dc, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (batch_tile, tile_t, kp), lambda bi, i, dc: (bi, i, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bp, t_pad, kp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((batch_tile * tile_t, kp), jnp.float32),
            pltpu.VMEM((batch_tile * tile_t, kp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bp * t_pad * fp * dp * kp,
            bytes_accessed=4
            * (
                2 * bp * t_pad * fp
                + 2 * dp * fp * kp * (bp // batch_tile)
                + bp * t_pad * kp
            ),
            transcendentals=2 * bp * t_pad * kp,
        ),
        interpret=interpret,
    )(params, cre, cim, cw, sw)
    return out[:b, :t, :num_atoms]


def enhance_synthesis_pallas(
    spec: jax.Array,
    coh: jax.Array,
    w: jax.Array | np.ndarray,
    cos_m: np.ndarray,
    sin_m: np.ndarray,
    target_index: jax.Array,
    target_epsilon: jax.Array,
    target_beta: jax.Array,
    noise_floor: jax.Array,
    window: jax.Array | np.ndarray,
    *,
    hop_size: int,
    gain: float = 1.0,
    matmul_dtype: str = "bfloat16",
    batch_tile: int = 4,
    tile_t: int = 2048,
    chunk_d: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Full fused-mask enhancement tail → (B, C, (T-1)*hop) waveforms.

    ``soft_mask_pallas`` for the scores/argmax/mask stage, then the Wiener
    TF mask and masked ISTFT (conjugate + center-trim semantics, matching
    the reference's reconstruction) composed in XLA.
    """
    h_mask = soft_mask_pallas(
        coh, w, cos_m, sin_m, target_index, target_epsilon, target_beta,
        noise_floor, matmul_dtype=matmul_dtype, batch_tile=batch_tile,
        tile_t=tile_t, chunk_d=chunk_d, interpret=interpret,
    )
    tf = mask_ops.wiener_tf_mask(jnp.asarray(w, jnp.float32), h_mask)
    if isinstance(spec, tuple):  # (re, im) planes from the fused front-end
        tf4 = tf[:, None, :, :]
        spec = jax.lax.complex(tf4 * spec[0], tf4 * spec[1])
        out_spec = spec
    else:
        out_spec = tf[:, None, :, :] * spec
    method = "matmul" if jax.default_backend() == "tpu" else "fft"
    return (
        istft(
            out_spec, window, hop_size, conjugate=True, center_trim=True,
            method=method,
        )
        * gain
    )
