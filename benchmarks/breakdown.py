"""Stage-level timing breakdown of the offline separation pipeline.

Times each jitted stage of the flagship workload separately at the
benchmark configuration (batch x 10 s utterances), so optimization effort
goes where the time is:

- ``stft+gcc``: STFT, coherence, angular spectrogram (no NMF)
- ``nmf``: the fused Pallas KL-NMF loop alone
- ``analyze``: stage A as shipped (stft+gcc+nmf in one program)
- ``reconstruct``: attribution, masks, Wiener reconstruction, ISTFT
- ``end_to_end``: the full separate_batch program

Prints one JSON line per stage. Run on TPU; repeats are queued
asynchronously and fenced once, with the axon tunnel round trip
subtracted (see bench.py `_timed_loop`).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--seconds", type=float, default=10.0)
    args = ap.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench._setup_jax()

    import jax
    import jax.numpy as jnp

    from gccnmf_tpu.models.offline import GCCNMFSeparator, OfflineConfig
    from gccnmf_tpu.ops import gcc, nmf, stft as stft_ops
    from gccnmf_tpu.ops.nmf_pallas import kl_nmf_pallas

    sr = 16000
    n = int(args.seconds * sr)
    rng = np.random.default_rng(0)
    stereo = (rng.standard_normal((2, n)) * 0.1).astype(np.float32)
    cfg = OfflineConfig(sample_rate=sr)
    sep = GCCNMFSeparator(cfg)
    b = args.batch

    batch_in = jnp.asarray(np.broadcast_to(stereo, (b,) + stereo.shape))
    t = stft_ops.num_frames(n, cfg.window_size, cfg.hop_size)
    w0, h0 = nmf.nmf_init_numpy(cfg.num_freq, cfg.dictionary_size, 2 * t)
    w0b = jnp.broadcast_to(jnp.asarray(w0), (b,) + w0.shape)
    h0b = jnp.broadcast_to(jnp.asarray(h0), (b,) + h0.shape)

    def timed(fn, *fn_args):
        out = fn(*fn_args)  # warm/compile; also the returned value
        dt = bench._timed_loop(lambda: fn(*fn_args), args.repeats)
        return dt, out

    audio_s = b * args.seconds

    @jax.jit
    def stft_gcc(x):
        spec = stft_ops.stft(
            x, sep._window, cfg.hop_size, conjugate=True,
            method=sep._stft_method,
        )
        coh = gcc.coherence(spec)
        ang = gcc.angular_spectrogram(coh, *sep._cos_sin)
        return spec, coh, ang

    dt, (spec, coh, ang) = timed(stft_gcc, batch_in)
    print(json.dumps(dict(stage="stft+gcc", ms=round(dt * 1e3, 2),
                          audio_s_per_s=round(audio_s / dt, 1))))

    v = jnp.concatenate(
        [jnp.abs(spec[..., 0, :, :]), jnp.abs(spec[..., 1, :, :])], axis=-2
    )

    @jax.jit
    def nmf_only(v, w0, h0):
        return kl_nmf_pallas(
            v, w0, h0, cfg.num_iterations, cfg.sparsity_alpha, cfg.epsilon,
            matmul_dtype=cfg.nmf_matmul_dtype,
        )

    dt, (w, h) = timed(nmf_only, v, w0b, h0b)
    print(json.dumps(dict(stage="nmf", ms=round(dt * 1e3, 2),
                          audio_s_per_s=round(audio_s / dt, 1))))

    # the actual pipeline analyze stage (plane currency, no complex
    # assembly — `_analyze` is the user-facing wrapper and pays ~25 ms of
    # bf16→complex64 conversion the batched pipeline never does)
    analyze_planes = jax.jit(lambda s, w_, h_: sep._analyze_planes(s, w_, h_))
    dt, (sre, sim, w, h, cre, cim, ang) = timed(
        analyze_planes, batch_in, w0b, h0b
    )
    print(json.dumps(dict(stage="analyze", ms=round(dt * 1e3, 2),
                          audio_s_per_s=round(audio_s / dt, 1))))

    targets = jnp.broadcast_to(jnp.asarray([10, 60, 110], jnp.int32), (b, 3))

    dt, _ = timed(
        sep._reconstruct_batched_winner, sre, sim, cre, cim, w, h, targets
    )
    print(json.dumps(dict(stage="reconstruct", ms=round(dt * 1e3, 2),
                          audio_s_per_s=round(audio_s / dt, 1))))

    dt, _ = timed(sep._separate_batch_jit, batch_in, w0b, h0b, 3)
    print(json.dumps(dict(stage="end_to_end", ms=round(dt * 1e3, 2),
                          audio_s_per_s=round(audio_s / dt, 1))))


if __name__ == "__main__":
    main()
