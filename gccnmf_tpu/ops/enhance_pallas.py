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

The Wiener reconstruction and masked ISTFT that follow are fused by
:func:`tf_synthesis_pallas`: the TF mask, the masked complex spectrogram,
and the (B, C, T, window) frame tensor never touch HBM (the composed XLA
tail measured ~69 ms at the bench shape once the front-end was fused —
comparable to the mask stage itself).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gccnmf_tpu.ops.pallas_common import make_mm

try:  # pallas is TPU/interpret-only; import lazily for CPU-only installs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None

__all__ = ["soft_mask_pallas", "enhance_synthesis_pallas", "tf_synthesis_pallas"]


def _mask_kernel(
    bb, chunk_d, num_tdoas, matmul_dtype,
    params_ref, cre_ref, cim_ref, cw_ref, sw_ref,
    out_ref, max_ref, arg_ref,
):
    tile_t = cre_ref.shape[1]

    mm = make_mm(matmul_dtype)

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
    b, t, f_in = coh_re.shape  # may be lane-padded wider than steering F
    w = np.asarray(w, np.float32)
    cos_m = np.asarray(cos_m, np.float32)
    sin_m = np.asarray(sin_m, np.float32)
    f = cos_m.shape[0]  # true bin count
    d = cos_m.shape[1]
    k = w.shape[1]
    fp = max(-(-f // 128) * 128, -(-f_in // 128) * 128)
    kp = -(-k // 128) * 128
    dp = -(-d // chunk_d) * chunk_d

    # Steering-folded dictionary slabs (D, F, K) → padded (Dp, Fp, Kp);
    # zero pads are inert (zero scores never win via the index guard, and
    # lane-padded coherence planes carry exact zeros there).
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
    # tile the frame axis (masks have no cross-frame coupling). ×16 keeps
    # the tile valid for both f32 and bf16 plane storage.
    t8 = -(-t // 16) * 16
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

    # keep the coherence planes' dtype through the pad copy (bf16 planes
    # halve the HBM traffic; the kernel's GEMMs quantize to bf16 anyway)
    cre = jnp.zeros((bp, t_pad, fp), coh_re.dtype)
    cim = jnp.zeros((bp, t_pad, fp), coh_re.dtype)
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

    ``soft_mask_pallas`` for the scores/argmax/mask stage, then
    :func:`tf_synthesis_pallas` for the Wiener TF mask and masked ISTFT
    (conjugate + center-trim semantics, matching the reference's
    reconstruction) — two kernels, no HBM intermediates beyond the
    (B, T, K) coefficient mask.
    """
    h_mask = soft_mask_pallas(
        coh, w, cos_m, sin_m, target_index, target_epsilon, target_beta,
        noise_floor, matmul_dtype=matmul_dtype, batch_tile=batch_tile,
        tile_t=tile_t, chunk_d=chunk_d, interpret=interpret,
    )
    return tf_synthesis_pallas(
        spec, h_mask, w, window, hop_size=hop_size, gain=gain,
        matmul_dtype=matmul_dtype, interpret=interpret,
    )


def _tf_synth_kernel(
    num_channels, ratio, hop, t_valid, f_valid, matmul_dtype,
    hm_ref, re_ref, im_ref, wtn_ref, a_ref, b_ref, sel_ref,
    out_ref, carry_ref,
):
    tile_t = hm_ref.shape[1]

    mm = make_mm(matmul_dtype)

    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    fp = a_ref.shape[0]
    # validity mask for the edge tiles: rows beyond T and lanes beyond F
    # come from clipped (garbage) block reads — zero them AFTER the tf
    # multiply so even NaN garbage cannot reach the GEMMs
    rows = i * tile_t + jax.lax.broadcasted_iota(jnp.int32, (tile_t, fp), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tile_t, fp), 1)
    valid = (rows < t_valid) & (lanes < f_valid)

    # Wiener TF mask on the tile: h_mask @ (W/colsum)ᵀ — never touches HBM
    tf = mm(hm_ref[0], wtn_ref[:])  # (tile_t, fp)
    for c in range(num_channels):
        # planes may be stored bf16 (fused front-end throughput mode)
        re_s = jnp.where(valid, tf * re_ref[0, c].astype(jnp.float32), 0.0)
        im_s = jnp.where(valid, tf * im_ref[0, c].astype(jnp.float32), 0.0)
        # forward used conjugate=True and the ISTFT re-conjugates: imag
        # enters the inverse transform with a minus sign
        frames = mm(re_s, a_ref[:]) - mm(im_s, b_ref[:])  # (tile_t, win)
        # overlap-add via shifted-identity selection GEMMs (see
        # synthesis_pallas._synthesis_kernel for the rationale)
        loc = mm(sel_ref[0], frames[:, :hop])
        for k in range(1, ratio):
            loc = loc + mm(sel_ref[k], frames[:, k * hop : (k + 1) * hop])
        head = jnp.concatenate(
            [
                carry_ref[c].reshape(ratio - 1, hop),
                jnp.zeros((tile_t - ratio + 1, hop), jnp.float32),
            ],
            axis=0,
        )
        out_ref[0, c] = (loc[:tile_t] + head).reshape(tile_t * hop)
        carry_ref[c] = loc[tile_t : tile_t + ratio - 1].reshape(
            (ratio - 1) * hop
        )


def tf_synthesis_pallas(
    spec,
    h_mask: jax.Array,
    w: jax.Array | np.ndarray,
    window: jax.Array | np.ndarray,
    *,
    hop_size: int,
    gain: float = 1.0,
    matmul_dtype: str = "bfloat16",
    tile_t: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused Wiener-masked ISTFT: ``istft(wiener_tf_mask(W, h_mask) ⊙ X,
    conjugate=True, center_trim=True) · gain`` in one VMEM pass.

    ``spec``: (B, C, T, F) complex64 or an ``(re, im)`` plane tuple;
    ``h_mask``: (B, T, K); ``w``: (F, K). The Wiener GEMM, the complex
    mask multiply, the windowed iDFT, and overlap-add all happen on time
    tiles in VMEM — neither the TF mask, the masked spectrogram, nor the
    (B, C, T, window) frame tensor is ever materialized in HBM. Returns
    (B, C, (T-1)·hop) float32 waveforms.
    """
    if pl is None:  # pragma: no cover
        raise RuntimeError("pallas unavailable")
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # Mosaic is TPU-only; CPU runs use the interpreter
    if isinstance(spec, tuple):
        sre, sim = spec
    else:
        sre, sim = jnp.real(spec), jnp.imag(spec)
    b, c_ch, t, f_in = sre.shape
    k = h_mask.shape[-1]
    window = np.asarray(window, np.float32)
    win_len = window.shape[0]
    if win_len % hop_size != 0:
        raise ValueError("window length must be a multiple of hop_size")
    # valid bins from the transform size; planes may be lane-padded wider
    # (the fused front-end emits exact-zero pads up to the 128-lane tile)
    f = win_len // 2 + 1
    if f_in < f:
        raise ValueError("window length inconsistent with spectrogram bins")
    ratio = win_len // hop_size

    from gccnmf_tpu.ops.stft import idft_matrices

    fp = -(-f // 128) * 128
    a_m, b_m = idft_matrices(win_len)
    a_np = np.zeros((fp, win_len), np.float32)
    b_np = np.zeros((fp, win_len), np.float32)
    a_np[:f] = a_m * window[None, :] * gain
    b_np[:f] = b_m * window[None, :] * gain
    # normalized dictionary (W/colsum)ᵀ: tf = h_mask @ wtn
    w_np = np.asarray(w, np.float32)
    wtn = np.zeros((k, fp), np.float32)
    wtn[:, :f] = (w_np / np.sum(w_np, axis=-1, keepdims=True)).T
    if ratio - 1 > tile_t:
        raise ValueError(
            f"window/hop overlap {ratio} exceeds the {tile_t}-frame tile"
        )
    # selection rows must reach tile_t + ratio - 2 (the OLA carry rows),
    # padded to the 8-row sublane tile
    look = -(-(ratio - 1) // 8) * 8
    sel = np.zeros((ratio, tile_t + look, tile_t), np.float32)
    idx = np.arange(tile_t)
    for kk in range(ratio):
        sel[kk, idx + kk, idx] = 1.0

    return _tf_synthesis_jit(
        sre, sim, h_mask, jnp.asarray(wtn), jnp.asarray(a_np),
        jnp.asarray(b_np), jnp.asarray(sel),
        hop_size=hop_size, win_len=win_len, matmul_dtype=matmul_dtype,
        tile_t=tile_t, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "hop_size", "win_len", "matmul_dtype", "tile_t", "interpret"
    ),
)
def _tf_synthesis_jit(
    sre, sim, h_mask, wtn, a_basis, b_basis, sel,
    *, hop_size, win_len, matmul_dtype, tile_t, interpret,
):
    b, c_ch, t, f = sre.shape
    k = h_mask.shape[-1]
    ratio = win_len // hop_size
    fp = a_basis.shape[0]
    # enough tiles to cover T plus the OLA tail
    nt = -(-(t + ratio - 1) // tile_t)

    kernel = functools.partial(
        _tf_synth_kernel, c_ch, ratio, hop_size, t, f, matmul_dtype
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, tile_t, k), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, c_ch, tile_t, fp), lambda bi, i: (bi, 0, i, 0)),
            pl.BlockSpec((1, c_ch, tile_t, fp), lambda bi, i: (bi, 0, i, 0)),
            pl.BlockSpec((k, fp), lambda bi, i: (0, 0)),
            pl.BlockSpec((fp, win_len), lambda bi, i: (0, 0)),
            pl.BlockSpec((fp, win_len), lambda bi, i: (0, 0)),
            pl.BlockSpec(sel.shape, lambda bi, i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, c_ch, tile_t * hop_size), lambda bi, i: (bi, 0, i)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, c_ch, nt * tile_t * hop_size), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((c_ch, (ratio - 1) * hop_size), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * nt * tile_t * (k * fp + 2 * fp * win_len),
            bytes_accessed=4 * b * t * (2 * c_ch * f + k)
            + 4 * b * c_ch * nt * tile_t * hop_size,
            transcendentals=0,
        ),
        interpret=interpret,
    )(h_mask, sre, sim, wtn, a_basis, b_basis, sel)
    # center_trim: drop window//2 from both ends of the untrimmed signal
    half = win_len // 2
    return jax.lax.slice_in_dim(out, half, half + (t - 1) * hop_size, axis=-1)
