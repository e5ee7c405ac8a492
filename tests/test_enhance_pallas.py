"""Pallas fused enhancement kernel: parity with the composable XLA path
(scores → argmax-TDOA → soft mask → Wiener mask → masked ISTFT), interpret
mode on the CPU test platform; the compiled path is exercised on TPU by
bench."""

import numpy as np

import jax.numpy as jnp

from gccnmf_tpu.models.offline import GCCNMFEnhancer, OfflineConfig
from gccnmf_tpu.ops import gcc, masks
from gccnmf_tpu.ops import windows as win_ops
from gccnmf_tpu.ops.enhance_pallas import enhance_synthesis_pallas
from gccnmf_tpu.ops.stft import istft


def _problem(t=20, f=17, k=6, num_tdoas=12, seed=0):
    rng = np.random.default_rng(seed)
    spec = (
        rng.standard_normal((2, t, f)) + 1j * rng.standard_normal((2, t, f))
    ).astype(np.complex64)
    coh = (
        rng.standard_normal((t, f)) + 1j * rng.standard_normal((t, f))
    ).astype(np.complex64)
    w = (rng.random((f, k)) + 0.05).astype(np.float32)
    cos_m, sin_m = gcc.steering_cos_sin(16000.0, f, 1.0, num_tdoas)
    return spec, coh, w, cos_m, sin_m


def _xla_reference(spec, coh, w, cos_m, sin_m, target_idx, eps, beta,
                   floor, window, hop, gain):
    d, k = cos_m.shape[1], w.shape[1]
    cos_w = (cos_m[:, :, None] * w[:, None, :]).reshape(cos_m.shape[0], d * k)
    sin_w = (sin_m[:, :, None] * w[:, None, :]).reshape(sin_m.shape[0], d * k)
    flat = np.real(coh) @ cos_w + np.imag(coh) @ sin_w
    scores = flat.reshape(coh.shape[0], d, k)
    argmax_d = np.argmax(scores, axis=-2)
    h_mask = masks.soft_tdoa_coefficient_mask(
        jnp.asarray(argmax_d), jnp.float32(target_idx), jnp.float32(eps),
        jnp.float32(beta), jnp.float32(floor),
    )
    tf = masks.wiener_tf_mask(jnp.asarray(w), h_mask)
    out_spec = tf[None] * jnp.asarray(spec)
    return np.asarray(
        istft(out_spec, window, hop, conjugate=True, center_trim=True) * gain
    )


class TestEnhancePallas:
    def test_matches_xla_path(self):
        spec, coh, w, cos_m, sin_m = _problem()
        window = win_ops.hann_symmetric(32)
        hop, gain = 8, 0.5
        eps, beta, floor, target = 3.0, 2.0, 0.1, 7.0
        ref = _xla_reference(
            spec, coh, w, cos_m, sin_m, target, eps, beta, floor,
            window, hop, gain,
        )
        out = enhance_synthesis_pallas(
            jnp.asarray(spec)[None], jnp.asarray(coh)[None], w, cos_m, sin_m,
            jnp.asarray([target]), jnp.float32(eps), jnp.float32(beta),
            jnp.float32(floor), window,
            hop_size=hop, gain=gain, matmul_dtype="float32",
            tile_t=8, chunk_d=4, interpret=True,
        )
        assert out.shape == (1, 2, ref.shape[-1])
        np.testing.assert_allclose(np.asarray(out)[0], ref, atol=2e-4)

    def test_batched_distinct_targets_cross_tile(self):
        """Two utterances with different target TDOAs, T spanning tiles,
        chunked TDOA axis with a zero-padded tail chunk."""
        spec, coh, w, cos_m, sin_m = _problem(t=37, num_tdoas=10, seed=5)
        window = win_ops.hann_symmetric(32)
        hop, gain = 8, 0.25
        eps, beta, floor = 2.0, 1.5, 0.0
        specs = np.stack([spec, 0.5 * spec])
        cohs = np.stack([coh, -coh])
        targets = np.array([2.0, 8.0], np.float32)
        out = enhance_synthesis_pallas(
            jnp.asarray(specs), jnp.asarray(cohs), w, cos_m, sin_m,
            jnp.asarray(targets), jnp.float32(eps), jnp.float32(beta),
            jnp.float32(floor), window,
            hop_size=hop, gain=gain, matmul_dtype="float32",
            tile_t=8, chunk_d=4, batch_tile=2, interpret=True,
        )
        for bi in range(2):
            ref = _xla_reference(
                specs[bi], cohs[bi], w, cos_m, sin_m, targets[bi],
                eps, beta, floor, window, hop, gain,
            )
            np.testing.assert_allclose(np.asarray(out)[bi], ref, atol=3e-4)

    def test_enhancer_model_pallas_backend(self):
        """End-to-end GCCNMFEnhancer with the fused backend matches the XLA
        backend on real audio-shaped input."""
        rng = np.random.default_rng(11)
        stereo = rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
        cfg = OfflineConfig(
            window_size=256, hop_size=32, num_tdoas=16,
            dictionary_size=8, mic_separation_m=0.1,
            nmf_matmul_dtype="float32",
        )
        w = rng.random((cfg.num_freq, 8)).astype(np.float32) + 1e-3
        ref = GCCNMFEnhancer(
            w, OfflineConfig(**{**cfg.__dict__, "synthesis_backend": "xla"})
        ).enhance(stereo)
        got = GCCNMFEnhancer(
            w,
            OfflineConfig(**{**cfg.__dict__, "synthesis_backend": "pallas"}),
        ).enhance(stereo)
        np.testing.assert_array_equal(
            got["target_tdoa_index"], ref["target_tdoa_index"]
        )
        np.testing.assert_allclose(
            got["enhanced"], ref["enhanced"], atol=2e-4
        )


class TestTfSynthesis:
    """tf_synthesis_pallas vs the composed XLA Wiener + masked ISTFT."""

    def _setup(self, b=2, t=37, f=129, k=8, seed=0):
        rng = np.random.default_rng(seed)
        win = 2 * (f - 1)
        spec = (
            rng.standard_normal((b, 2, t, f))
            + 1j * rng.standard_normal((b, 2, t, f))
        ).astype(np.complex64)
        h_mask = rng.random((b, t, k)).astype(np.float32)
        w = rng.random((f, k)).astype(np.float32) + 1e-3
        window = win_ops.hann_symmetric(win)
        return spec, h_mask, w, window, win

    def _xla_ref(self, spec, h_mask, w, window, hop, gain):
        from gccnmf_tpu.ops import masks as mask_ops
        from gccnmf_tpu.ops.stft import istft

        tf = mask_ops.wiener_tf_mask(jnp.asarray(w, jnp.float32), jnp.asarray(h_mask))
        out_spec = tf[:, None, :, :] * jnp.asarray(spec)
        return np.asarray(
            istft(out_spec, window, hop, conjugate=True, center_trim=True,
                  method="fft") * gain
        )

    def test_matches_xla_tail(self):
        from gccnmf_tpu.ops.enhance_pallas import tf_synthesis_pallas

        spec, h_mask, w, window, win = self._setup()
        hop = win // 4
        gain = 0.5
        ref = self._xla_ref(spec, h_mask, w, window, hop, gain)
        out = np.asarray(tf_synthesis_pallas(
            jnp.asarray(spec), jnp.asarray(h_mask), w, window,
            hop_size=hop, gain=gain, matmul_dtype="float32", tile_t=16,
            interpret=True,
        ))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-4 * np.abs(ref).max())

    def test_planes_input_matches_complex(self):
        from gccnmf_tpu.ops.enhance_pallas import tf_synthesis_pallas

        spec, h_mask, w, window, win = self._setup(seed=1)
        hop = win // 8
        kw = dict(hop_size=hop, gain=1.0, matmul_dtype="float32",
                  tile_t=16, interpret=True)
        a = np.asarray(tf_synthesis_pallas(
            jnp.asarray(spec), jnp.asarray(h_mask), w, window, **kw))
        b = np.asarray(tf_synthesis_pallas(
            (jnp.asarray(spec.real), jnp.asarray(spec.imag)),
            jnp.asarray(h_mask), w, window, **kw))
        np.testing.assert_allclose(a, b, atol=1e-6)
