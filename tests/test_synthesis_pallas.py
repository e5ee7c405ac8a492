"""Pallas fused masked-synthesis kernel: parity with the composable XLA
path (attribution → hard masks → masked_reconstruction → ISTFT), interpret
mode on the CPU test platform; the compiled path is exercised on TPU by
bench."""

import numpy as np

import jax.numpy as jnp

from gccnmf_tpu.ops import gcc, masks
from gccnmf_tpu.ops import windows as win_ops
from gccnmf_tpu.ops.stft import istft
from gccnmf_tpu.ops.synthesis_pallas import masked_synthesis_pallas


def _problem(t=20, f=17, k=6, n=3, num_tdoas=12, seed=0):
    rng = np.random.default_rng(seed)
    spec = (
        rng.standard_normal((2, t, f)) + 1j * rng.standard_normal((2, t, f))
    ).astype(np.complex64)
    # a few exactly-zero mixture bins to exercise angle(0) == 0 semantics
    spec[0, 3, 5] = 0.0
    spec[1, 7, 0] = 0.0
    coh = (
        rng.standard_normal((t, f)) + 1j * rng.standard_normal((t, f))
    ).astype(np.complex64)
    w = (rng.random((f, k)) + 0.05).astype(np.float32)
    h_stereo = (rng.random((2, t, k)) + 0.01).astype(np.float32)
    cos_m, sin_m = gcc.steering_cos_sin(16000.0, f, 1.0, num_tdoas)
    targets = np.array([2, 5, 9][:n], np.int32)
    return spec, coh, w, h_stereo, cos_m, sin_m, targets


def _xla_reference(spec, coh, w, h_stereo, cos_m, sin_m, targets, window,
                   hop, gain):
    scores = masks.target_attribution(coh, cos_m, sin_m, targets, w)
    oh = masks.hard_coefficient_masks(scores)
    est = masks.masked_reconstruction(oh, spec, w, h_stereo)
    return np.asarray(
        istft(est, window, hop, conjugate=True, center_trim=True) * gain
    )


class TestSynthesisPallas:
    def test_matches_xla_path(self):
        spec, coh, w, h_stereo, cos_m, sin_m, targets = _problem()
        window = win_ops.hann_symmetric(32)
        hop, gain = 8, 0.5
        ref = _xla_reference(
            spec, coh, w, h_stereo, cos_m, sin_m, targets, window, hop, gain
        )
        winner = masks.attribution_winner(
            jnp.asarray(coh)[None], cos_m, sin_m,
            jnp.asarray(targets)[None], jnp.asarray(w)[None],
        )
        out = masked_synthesis_pallas(
            jnp.asarray(spec)[None], winner, jnp.asarray(w)[None],
            jnp.asarray(h_stereo)[None], window,
            num_targets=3, hop_size=hop, gain=gain,
            matmul_dtype="float32", tile_t=8, interpret=True,
        )
        assert out.shape == (1, 3, 2, ref.shape[-1])
        np.testing.assert_allclose(np.asarray(out)[0], ref, atol=2e-4)

    def test_attribution_winner_matches_unbatched_scores(self):
        spec, coh, w, h_stereo, cos_m, sin_m, targets = _problem(seed=3)
        scores = masks.target_attribution(coh, cos_m, sin_m, targets, w)
        expect = np.argmax(np.asarray(scores), axis=0)
        got = masks.attribution_winner(
            jnp.asarray(coh)[None], cos_m, sin_m,
            jnp.asarray(targets)[None], jnp.asarray(w)[None],
        )
        np.testing.assert_array_equal(np.asarray(got)[0], expect)

    def test_batched_and_cross_tile_carry(self):
        """Two batch elements, T spanning several tiles so the overlap-add
        carry crosses tile boundaries."""
        spec, coh, w, h_stereo, cos_m, sin_m, targets = _problem(t=37, seed=7)
        window = win_ops.hann_symmetric(32)
        hop, gain = 8, 0.25
        specs = np.stack([spec, 2.0 * spec])
        cohs = np.stack([coh, -coh])
        hs = np.stack([h_stereo, 0.5 * h_stereo])
        ws = np.stack([w, w])
        tg = np.stack([targets, targets])
        winner = masks.attribution_winner(
            jnp.asarray(cohs), cos_m, sin_m, jnp.asarray(tg), jnp.asarray(ws)
        )
        out = masked_synthesis_pallas(
            jnp.asarray(specs), winner, jnp.asarray(ws), jnp.asarray(hs),
            window, num_targets=3, hop_size=hop, gain=gain,
            matmul_dtype="float32", tile_t=4, interpret=True,
        )
        for bi in range(2):
            ref = _xla_reference(
                specs[bi], cohs[bi], ws[bi], hs[bi], cos_m, sin_m,
                targets, window, hop, gain,
            )
            np.testing.assert_allclose(np.asarray(out)[bi], ref, atol=3e-4)


def test_high_overlap_ratio():
    """window/hop ratio 16 (> the 9 the OLA selection lookahead was once
    hard-coded for): the kernel must size its carry rows from the ratio."""
    spec, coh, w, h_stereo, cos_m, sin_m, targets = _problem(t=40)
    window = win_ops.hann_symmetric(32)
    hop, gain = 2, 0.125  # ratio 16
    want = _xla_reference(
        spec, coh, w, h_stereo, cos_m, sin_m, targets, window, hop, gain
    )
    winner = masks.attribution_winner(
        jnp.asarray(coh)[None], cos_m, sin_m,
        jnp.asarray(targets)[None], jnp.asarray(w)[None],
    )
    got = np.asarray(masked_synthesis_pallas(
        jnp.asarray(spec)[None], winner, jnp.asarray(w)[None],
        jnp.asarray(h_stereo)[None], window,
        num_targets=3, hop_size=hop, gain=gain,
        matmul_dtype="float32", tile_t=16, interpret=True,
    ))[0]
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_overlap_beyond_tile_rejected():
    spec, coh, w, h_stereo, cos_m, sin_m, targets = _problem()
    window = win_ops.hann_symmetric(32)
    winner = masks.attribution_winner(
        jnp.asarray(coh)[None], cos_m, sin_m,
        jnp.asarray(targets)[None], jnp.asarray(w)[None],
    )
    import pytest

    with pytest.raises(ValueError, match="exceeds"):
        masked_synthesis_pallas(
            jnp.asarray(spec)[None], winner, jnp.asarray(w)[None],
            jnp.asarray(h_stereo)[None], window,
            num_targets=3, hop_size=1, gain=1.0,  # ratio 32 > tile 16
            matmul_dtype="float32", tile_t=16, interpret=True,
        )
