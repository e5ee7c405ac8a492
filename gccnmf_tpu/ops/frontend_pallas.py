"""Pallas TPU kernel: fused analysis front-end (STFT + |X| + GCC-PHAT).

The composed XLA front-end (reference pipeline: stft → abs/concat →
coherence → angular spectrogram, gccNMF/gccNMFFunctions.py:61-92 and
runGCCNMF.py:40-46) materializes three (B, ·, T, F)-sized intermediates in
HBM — the strided frame tensor (8x the signal at hop 128 / window 1024),
the complex spectrogram it immediately re-reads for |X| and coherence, and
the complex coherence — making the stage bandwidth-bound (~99 ms of the
251 ms end-to-end separation program at batch 128).

This kernel produces, in ONE pass over the raw signal:

- the (conjugated) complex stereo spectrogram as (re, im) f32 planes,
- per-channel magnitudes |X| (the NMF V before time-concatenation),
- PHAT coherence X0·conj(X1)/(|X0||X1|) as (re, im) planes,
- the angular spectrogram Re(C)@cos + Im(C)@sin,

with frames built **in VMEM** from hop-sized signal rows: the grid tiles
(batch, time); each program reads its tile's hop-blocks plus the first
``window/hop - 1`` blocks of the next tile (the two views share one HBM
array — no overlapping BlockSpecs needed), assembles the overlapping
frames as static shifted row-slices, and feeds the windowed rDFT GEMMs.
Frames never touch HBM; spec/coherence are written exactly once.

Zero-padded tail frames (time padded to a tile multiple) would hit 0/0 in
the coherence divide; the guarded divide writes 0 there instead (the
caller slices those rows off — real rows are unaffected; the XLA path has
no such rows, so parity holds bit-for-bit where it's defined).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gccnmf_tpu.ops.nmf_pallas import pad_to_multiple
from gccnmf_tpu.ops.pallas_common import make_mm
from gccnmf_tpu.ops.stft import dft_matrices, num_frames

__all__ = ["stft_gcc_frontend_pallas"]


def _frontend_kernel(tile_t, ratio, matmul_dtype, plane_dtype,
                     a_ref, b_ref, wboth_ref, steer_ref,
                     sre_ref, sim_ref, v_ref, cre_ref, cim_ref, ang_ref):
    pd = jnp.dtype(plane_dtype)
    mm = make_mm(matmul_dtype)

    from jax.experimental.pallas import tpu as pltpu

    fp = sre_ref.shape[-1]

    # lookahead rows rounded up to a sublane multiple: Mosaic lowers the
    # rolls below to sublane rotates only on 8-row-aligned operands
    extra = -(-(ratio - 1) // 8) * 8

    res, ims, mags = [], [], []
    for ch in range(2):
        # hop-sized signal rows: this tile's tile_t rows + the first
        # ratio-1 (padded to `extra`) rows of the next tile
        blocks = jnp.concatenate(
            [a_ref[0, ch], b_ref[0, ch, :extra]], axis=0
        )  # (tile_t + extra, hop)
        # frame t = rows t..t+ratio-1 flattened: materialize the frame
        # matrix by lane-concatenating the ratio shifted row-slices. Each
        # slice is first normalized to sublane offset 0 with a cyclic roll
        # (Mosaic rejects offset slices feeding concat/dot; roll takes a
        # non-negative shift, and wrapped rows land beyond tile_t where
        # the slice drops them).
        shifted = [
            (pltpu.roll(blocks, tile_t + extra - k, 0)
             if k else blocks)[:tile_t]
            for k in range(ratio)
        ]
        frames = jnp.concatenate(shifted, axis=1)  # (tile_t, window)
        # one wide GEMM for cos AND sin planes (conjugation sign folded
        # into the sin half host-side)
        out = mm(frames, wboth_ref[:])  # (tile_t, 2·fp)
        re = out[:, :fp]
        im = out[:, fp:]
        res.append(re)
        ims.append(im)
        mags.append(jnp.sqrt(re * re + im * im))
        sre_ref[0, ch] = re.astype(pd)
        sim_ref[0, ch] = im.astype(pd)
        v_ref[0, ch] = mags[ch].astype(pd)

    # PHAT coherence X0 · conj(X1) / (|X0||X1|)
    denom = mags[0] * mags[1]
    ok = denom > 1e-30
    inv = jnp.where(ok, 1.0 / jnp.where(ok, denom, 1.0), 0.0)
    cre = (res[0] * res[1] + ims[0] * ims[1]) * inv
    cim = (ims[0] * res[1] - res[0] * ims[1]) * inv
    cre_ref[0] = cre.astype(pd)
    cim_ref[0] = cim.astype(pd)
    # angular spectrogram: Re(C)@cos + Im(C)@sin as ONE GEMM with the
    # steering planes stacked along the contraction axis
    ang_ref[0] = mm(jnp.concatenate([cre, cim], axis=1), steer_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=(
        "hop_size", "conjugate", "matmul_dtype", "plane_dtype", "tile_t",
        "interpret",
    ),
)
def stft_gcc_frontend_pallas(
    stereo: jax.Array,
    window: jax.Array | np.ndarray,
    cos_m: jax.Array | np.ndarray,
    sin_m: jax.Array | np.ndarray,
    *,
    hop_size: int,
    conjugate: bool = True,
    matmul_dtype: str = "bfloat16",
    plane_dtype: str = "float32",
    tile_t: int = 256,
    interpret: bool = False,
):
    """Fused front-end. ``stereo``: (..., 2, n) f32; ``window``: (win,);
    ``cos_m``/``sin_m``: (F, D) steering planes.

    Returns six f32 planes ``(spec_re, spec_im, v, coh_re, coh_im, ang)``:
    ``spec_re/spec_im`` (..., 2, T, FP) — re/im of the spectrogram
    (conjugated iff ``conjugate``; ``lax.complex`` of ``[..., :F]`` equals
    ``stft(..., conjugate=conjugate, method="matmul")``), ``v`` (..., 2,
    T, FP) magnitudes |X|, ``coh_re/coh_im`` (..., T, FP) — re/im of the
    PHAT coherence, ``ang`` (..., T, D) angular spectrogram. Planes
    instead of complex because every consumer (NMF, attribution, the
    synthesis kernels) wants the planes anyway — assembling complex64
    would add two full HBM passes. ``FP`` is F rounded up to the 128-lane
    tile; the padded lanes are exact zeros (inert through NMF,
    attribution, Wiener masking, and the iDFT bases, all of which
    zero-pad their frequency operands) and lane-aligned stores are ~10 ms
    faster at the bench shape than storing F-wide clipped blocks.
    Requires ``window % hop == 0``.

    ``matmul_dtype``: "bfloat16" single-pass MXU GEMMs (throughput default,
    same posture as the other fused kernels) or "float32"
    (Precision.HIGHEST) for parity with the XLA path.

    ``plane_dtype``: storage dtype of the five spec/V/coherence planes
    ("float32" default, "bfloat16" for throughput). The kernel is
    store-bandwidth-bound (measured: the DFT GEMM overlaps to near-zero
    marginal cost), so halving the plane bytes is a ~1.5x kernel speedup;
    every hot consumer quantizes these planes to bf16 at its own GEMMs
    anyway (NMF "bfloat16_q" V residency, attribution/synthesis operand
    casts), so bf16 storage only moves the quantization one step earlier.
    The angular spectrogram stays f32 (it feeds peak-picking reductions
    and is ~1/5th the bytes of one plane).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # Mosaic is TPU-only; CPU runs use the interpreter

    window = jnp.asarray(window, jnp.float32)
    win = window.shape[-1]
    if win % hop_size != 0:
        raise ValueError("fused front-end requires hop | window")
    ratio = win // hop_size

    *batch, c, n = stereo.shape
    if c != 2:
        raise ValueError("front-end expects stereo (..., 2, n)")
    t = num_frames(n, win, hop_size)
    f = win // 2 + 1
    d = cos_m.shape[-1]

    x = stereo.reshape((-1, 2, n)).astype(jnp.float32)
    b = x.shape[0]
    n_tiles = -(-t // tile_t)
    # pad the signal so every tile's hop-rows exist, PLUS one extra tile so
    # the lookahead view (next tile's first ratio-1 rows) is in-bounds for
    # the last tile
    padded_n = (n_tiles + 1) * tile_t * hop_size
    x = jnp.pad(x, ((0, 0), (0, 0), (0, padded_n - n)))
    rows = x.reshape(b, 2, (n_tiles + 1) * tile_t, hop_size)

    dcos, dsin = dft_matrices(win)  # (win, F)
    sign = 1.0 if conjugate else -1.0  # rfft imag = -frames@sin; conj flips
    wcos = window[:, None] * jnp.asarray(dcos)
    wsin = sign * window[:, None] * jnp.asarray(dsin)
    wcos, _ = pad_to_multiple(wcos, 1, 128, 0.0)
    wsin, _ = pad_to_multiple(wsin, 1, 128, 0.0)
    fp = wcos.shape[1]
    # ONE wide DFT operand: [cos | sin] along the output axis
    wboth = jnp.concatenate([wcos, wsin], axis=1)  # (win, 2·fp)
    # steering planes stacked along the contraction axis ([cos; sin],
    # matching [Re(C) | Im(C)]); zero rows for padded freq bins, zero cols
    # for padded TDOAs (contribute nothing; sliced off on return)
    scos = jnp.zeros((fp, d), jnp.float32).at[:f].set(jnp.asarray(cos_m, jnp.float32))
    ssin = jnp.zeros((fp, d), jnp.float32).at[:f].set(jnp.asarray(sin_m, jnp.float32))
    steer = jnp.concatenate([scos, ssin], axis=0)  # (2·fp, D)
    steer, _ = pad_to_multiple(steer, 1, 128, 0.0)
    dp = steer.shape[1]
    tp = n_tiles * tile_t

    kernel = functools.partial(
        _frontend_kernel, tile_t, ratio, matmul_dtype, plane_dtype
    )
    pd = jnp.dtype(plane_dtype)
    sig_spec = lambda shift: pl.BlockSpec(
        (1, 2, tile_t, hop_size), lambda i, j: (i, 0, j + shift, 0),
        memory_space=pltpu.VMEM,
    )
    const2 = lambda arr: pl.BlockSpec(
        arr.shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    out4 = lambda last: pl.BlockSpec(
        (1, 2, tile_t, last), lambda i, j: (i, 0, j, 0),
        memory_space=pltpu.VMEM,
    )
    out3 = lambda last: pl.BlockSpec(
        (1, tile_t, last), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
    )

    sre, sim, v, cre, cim, ang = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            sig_spec(0), sig_spec(1),
            const2(wboth), const2(steer),
        ],
        out_specs=(
            out4(fp), out4(fp), out4(fp), out3(fp), out3(fp), out3(dp)
        ),
        out_shape=(
            # T unpadded (only the LAST tile's store is clipped), F padded
            # to the lane tile (lane-aligned stores everywhere — storing
            # F=513-wide blocks masks every store and measured ~10 ms at
            # the bench shape; padded lanes are exact zeros, which every
            # consumer treats as inert)
            jax.ShapeDtypeStruct((b, 2, t, fp), pd),
            jax.ShapeDtypeStruct((b, 2, t, fp), pd),
            jax.ShapeDtypeStruct((b, 2, t, fp), pd),
            jax.ShapeDtypeStruct((b, t, fp), pd),
            jax.ShapeDtypeStruct((b, t, fp), pd),
            jax.ShapeDtypeStruct((b, t, d), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * tp * (4 * win * fp + 2 * fp * dp),
            bytes_accessed=b * tp * (
                4 * 2 * hop_size + pd.itemsize * 5 * fp + 4 * dp
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(rows, rows, wboth, steer)

    reshape = lambda arr: arr.reshape(*batch, *arr.shape[1:])
    return tuple(reshape(o) for o in (sre, sim, v, cre, cim, ang))
