"""Pallas TPU kernel: fused masked-spectrogram synthesis + ISTFT overlap-add.

The offline pipeline's reconstruction tail (reference:
gccNMF/gccNMFFunctions.py:137-163) is, per (target, channel):

    mag    = (H ⊙ mask_target) Wᵀ                 # (T, F)
    S_est  = mag · exp(i·angle(S_mix))            # mixture phase re-applied
    y      = ISTFT(S_est) · gain                  # windowed iDFT + overlap-add

Composed in XLA this streams ~17 GB of HBM per bench batch: the complex
(B, N, 2, T, F) estimate and the (B, N, 2, T, window) frame tensor are both
materialized and re-read around the overlap-add. This kernel fuses the whole
tail into one VMEM-resident pass over time tiles:

- the binary coefficient mask is never materialized — the kernel takes the
  per-(frame, atom) argmax ``winner`` (int32) and compares against the
  target index inline;
- magnitudes, phase application, and the inverse-DFT GEMMs (windowed iDFT
  basis, reconstruction gain folded in) happen on the tile in VMEM;
- overlap-add uses the sequential TPU grid: each tile emits its ``tile_t``
  output chunks and hands the (window/hop − 1)-chunk overlap tail to the
  next tile through a VMEM carry scratch (reset at tile 0).

HBM traffic drops to one read of the mixture spectrogram (per target), H,
and ``winner``, plus one write of the waveforms — ~5 GB at the bench shape,
measured ~2.8x faster than the fused XLA formulation for the reconstruct
stage.

Phase semantics match :func:`gccnmf_tpu.ops.masks.masked_reconstruction`:
``exp(i·angle(X))`` is 1 at X == 0 (NumPy's angle(0) = 0), so zero mixture
bins pass the magnitude through unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gccnmf_tpu.ops.pallas_common import make_mm
from gccnmf_tpu.ops.stft import idft_matrices

try:  # pallas is TPU/interpret-only; import lazily for CPU-only installs
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None

__all__ = ["masked_synthesis_pallas"]


def _synthesis_kernel(
    num_targets, num_channels, ratio, hop, matmul_dtype,
    re_ref, im_ref, win_ref, h_ref, wt_ref, a_ref, b_ref, sel_ref,
    out_ref, carry_ref,
):
    tile_t = re_ref.shape[2]

    mm = make_mm(matmul_dtype)

    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    # Mixture phase per channel (computed once, reused across targets).
    # exp(i·angle(X)): (re/|X|, im/|X|), and (1, 0) where X == 0 — matching
    # numpy.angle(0) == 0 (masks.masked_reconstruction parity).
    phases = []
    for c in range(num_channels):
        # planes may be stored bf16 (fused front-end throughput mode);
        # phase math stays f32 in VMEM either way
        re = re_ref[0, c].astype(jnp.float32)
        im = im_ref[0, c].astype(jnp.float32)
        mag2 = re * re + im * im
        ok = mag2 > 0.0
        inv = jnp.where(ok, jax.lax.rsqrt(jnp.where(ok, mag2, 1.0)), 0.0)
        phases.append((jnp.where(ok, re * inv, 1.0), im * inv))

    winner = win_ref[0]  # (tile_t, K) int32
    a = a_ref[:]  # (Fp, window) — windowed, gained iDFT cos basis
    b = b_ref[:]
    wt = wt_ref[0]  # (K, Fp)
    h = h_ref[0]  # (C, tile_t, K)

    # All (target, channel) rows stacked into ONE GEMM chain: M grows from
    # tile_t to S·C·tile_t (256 → 1536 at the bench shape), so the mag and
    # iDFT GEMMs run at full MXU pipeline occupancy instead of S·C short
    # GEMM sequences per tile (measured ~1.5x on the reconstruct stage).
    hm_rows, ph_re_rows, ph_im_rows = [], [], []
    for s in range(num_targets):
        mask = (winner == s).astype(jnp.float32)
        for c in range(num_channels):
            hm_rows.append(h[c] * mask)
            ph_re_rows.append(phases[c][0])
            ph_im_rows.append(phases[c][1])
    hm = jnp.concatenate(hm_rows, axis=0)  # (S·C·tile_t, K)
    ph_re = jnp.concatenate(ph_re_rows, axis=0)  # (S·C·tile_t, Fp)
    ph_im = jnp.concatenate(ph_im_rows, axis=0)
    mag = mm(hm, wt)  # (S·C·tile_t, Fp)
    # forward used conjugate=True and ISTFT re-conjugates: the imag part
    # enters the inverse transform with a minus sign.
    frames_all = mm(mag * ph_re, a) - mm(mag * ph_im, b)  # (S·C·tile_t, win)
    for s in range(num_targets):
        for c in range(num_channels):
            sc = s * num_channels + c
            frames = frames_all[sc * tile_t : (sc + 1) * tile_t]
            # Overlap-add as selection-matrix matmuls: chunk c of the local
            # buffer is Σ_k frames[c-k, k·hop:(k+1)·hop]. The (tile_t+8,
            # tile_t) shifted-identity operand rides the MXU against pure
            # LANE slices of ``frames`` — no sublane-misaligned shifts, no
            # minor-dim split reshape (both measured ~4x slower than the
            # GEMMs themselves in an earlier revision of this kernel).
            # Follows the mode: in bf16 mode the frame operand is rounded to
            # bf16 (≈48 dB OLA noise floor, far below the pipeline's bf16-NMF
            # noise); float32 mode is exact (HIGHEST, 0/1 selection values
            # are representable in every bf16 pass).
            loc = mm(sel_ref[0], frames[:, :hop])
            for k in range(1, ratio):
                loc = loc + mm(
                    sel_ref[k], frames[:, k * hop : (k + 1) * hop]
                )
            head = jnp.concatenate(
                [
                    carry_ref[sc].reshape(ratio - 1, hop),
                    jnp.zeros((tile_t - ratio + 1, hop), jnp.float32),
                ],
                axis=0,
            )
            out_ref[0, s, c] = (loc[:tile_t] + head).reshape(tile_t * hop)
            carry_ref[sc] = loc[tile_t : tile_t + ratio - 1].reshape(
                (ratio - 1) * hop
            )


def masked_synthesis_pallas(
    spec: jax.Array,
    winner: jax.Array,
    w: jax.Array,
    h_stereo: jax.Array,
    window: jax.Array | np.ndarray,
    *,
    num_targets: int,
    hop_size: int,
    gain: float = 1.0,
    matmul_dtype: str = "bfloat16",
    tile_t: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Fused masked reconstruction + ISTFT (conjugate + center-trim semantics).

    Args:
      spec: (B, C, T, F) complex64 mixture spectrogram (as produced by
        ``stft(..., conjugate=True)``), or a ``(re, im)`` tuple of f32 or
        bf16 planes (as produced by the fused Pallas front-end — avoids a
        complex64 round trip through HBM; bf16 planes halve it again and
        are upcast per-tile in VMEM).
      winner: (B, T, K) int32 — per-(frame, atom) winning target index
        (``argmax`` over the attribution scores' target axis).
      w: (B, F, K) NMF dictionary.
      h_stereo: (B, C, T, K) per-channel activations.
      window: synthesis window, length ``2*(F-1)``; must be a multiple of
        ``hop_size``.
      num_targets: static number of targets N.
      gain: scalar folded into the iDFT basis (the reference's
        ``hop/window*2``).
      tile_t: time-tile height. 128 measured fastest at the bench shape
        (23.2 ms vs 25.6 at 256 and 34.5 at 512, batch 128): smaller
        tiles keep the per-tile VMEM working set (stacked frames +
        phases) low enough that the output-store DMAs overlap the GEMM
        chain instead of serializing behind it.

    Returns:
      (B, N, C, (T-1)*hop_size) float32 waveforms — identical semantics to
      ``istft(masked_reconstruction(...), conjugate=True, center_trim=True)
      * gain``.
    """
    if pl is None:  # pragma: no cover
        raise RuntimeError("pallas unavailable")
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # Mosaic is TPU-only; CPU runs use the interpreter
    if isinstance(spec, tuple):
        spec_re, spec_im = spec
    else:
        spec_re, spec_im = jnp.real(spec), jnp.imag(spec)
    window = np.asarray(window, np.float32)
    win_len = window.shape[0]
    if win_len % hop_size != 0:
        raise ValueError("window length must be a multiple of hop_size")
    # valid bins from the transform size; the planes may be lane-padded
    # wider (the fused front-end emits F rounded to the 128-lane tile,
    # with exact-zero pads — inert against the zero-padded iDFT bases)
    f = win_len // 2 + 1
    if spec_re.shape[-1] < f:
        raise ValueError("window length inconsistent with spectrogram bins")

    # iDFT basis with synthesis window and gain folded in; F padded to the
    # lane tile so the contraction dim is aligned (zero rows are inert).
    fp = -(-f // 128) * 128
    a_m, b_m = idft_matrices(win_len)
    a_np = np.zeros((fp, win_len), np.float32)
    b_np = np.zeros((fp, win_len), np.float32)
    a_np[:f] = a_m * window[None, :] * gain
    b_np[:f] = b_m * window[None, :] * gain
    ratio = win_len // hop_size
    if ratio - 1 > tile_t:
        raise ValueError(
            f"window/hop overlap {ratio} exceeds the {tile_t}-frame tile"
        )
    # selection rows must reach tile_t + ratio - 2 (the OLA carry rows),
    # padded to the 8-row sublane tile
    look = -(-(ratio - 1) // 8) * 8
    sel = np.zeros((ratio, tile_t + look, tile_t), np.float32)
    idx = np.arange(tile_t)
    for k in range(ratio):
        sel[k, idx + k, idx] = 1.0
    return _synthesis_jit(
        spec_re, spec_im, winner, w, h_stereo, jnp.asarray(a_np),
        jnp.asarray(b_np), jnp.asarray(sel),
        num_targets=num_targets, hop_size=hop_size, win_len=win_len,
        matmul_dtype=matmul_dtype, tile_t=tile_t, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_targets", "hop_size", "win_len", "matmul_dtype", "tile_t",
        "interpret",
    ),
)
def _synthesis_jit(
    spec_re, spec_im, winner, w, h_stereo, a_basis, b_basis, sel,
    *, num_targets, hop_size, win_len, matmul_dtype, tile_t, interpret,
):
    b, c_ch, t, f_in = spec_re.shape  # f_in may be lane-padded (≥ F)
    f_w = w.shape[-2]  # dictionary rows = true F
    k = w.shape[-1]
    ratio = win_len // hop_size
    fp = a_basis.shape[0]

    # Pad time so every needed output chunk (incl. the OLA tail) falls in a
    # full tile; padded spectrogram rows are zero → phase (1,0), padded H
    # rows are zero → zero frames.
    t_pad = -(-(t + ratio - 1) // tile_t) * tile_t
    # keep the spec planes' dtype through the pad copy (bf16 planes from
    # the fused front-end halve the HBM traffic here and into the kernel,
    # which upcasts per-tile in VMEM)
    re = jnp.zeros((b, c_ch, t_pad, fp), spec_re.dtype)
    im = jnp.zeros((b, c_ch, t_pad, fp), spec_re.dtype)
    re = re.at[:, :, :t, :f_in].set(spec_re)
    im = im.at[:, :, :t, :f_in].set(spec_im)
    win_pad = jnp.full((b, t_pad, k), -1, jnp.int32)
    win_pad = win_pad.at[:, :t].set(winner.astype(jnp.int32))
    h_pad = jnp.zeros((b, c_ch, t_pad, k), jnp.float32)
    h_pad = h_pad.at[:, :, :t].set(h_stereo.astype(jnp.float32))
    wt = jnp.zeros((b, k, fp), jnp.float32)
    wt = wt.at[:, :, :f_w].set(jnp.swapaxes(w.astype(jnp.float32), -1, -2))

    nt = t_pad // tile_t
    kernel = functools.partial(
        _synthesis_kernel, num_targets, c_ch, ratio, hop_size, matmul_dtype
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, c_ch, tile_t, fp), lambda bi, i: (bi, 0, i, 0)),
            pl.BlockSpec((1, c_ch, tile_t, fp), lambda bi, i: (bi, 0, i, 0)),
            pl.BlockSpec((1, tile_t, k), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, c_ch, tile_t, k), lambda bi, i: (bi, 0, i, 0)),
            pl.BlockSpec((1, k, fp), lambda bi, i: (bi, 0, 0)),
            pl.BlockSpec((fp, win_len), lambda bi, i: (0, 0)),
            pl.BlockSpec((fp, win_len), lambda bi, i: (0, 0)),
            pl.BlockSpec(
                sel.shape, lambda bi, i: (0, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, num_targets, c_ch, tile_t * hop_size),
            lambda bi, i: (bi, 0, 0, i),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, num_targets, c_ch, t_pad * hop_size), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (num_targets * c_ch, (ratio - 1) * hop_size), jnp.float32
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2
            * b
            * num_targets
            * c_ch
            * t_pad
            * (k * fp + 2 * fp * win_len),
            bytes_accessed=4
            * b
            * (2 * c_ch * t_pad * fp + t_pad * k * (1 + c_ch))
            + 4 * b * num_targets * c_ch * t_pad * hop_size,
            transcendentals=0,
        ),
        interpret=interpret,
    )(re, im, win_pad, h_pad, wt, a_basis, b_basis, sel)
    # center_trim: drop window//2 samples from both ends of the untrimmed
    # (t + ratio - 1) chunks → keep chunks [ratio/2, t + ratio/2 - 1).
    half = win_len // 2
    return jax.lax.slice_in_dim(
        out, half, half + (t - 1) * hop_size, axis=-1
    )
