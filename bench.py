#!/usr/bin/env python
"""Benchmark harness.

Measures the flagship workload — full offline GCC-NMF stereo separation at
the reference's own demo configuration (runGCCNMF.py:56-77: 1024 window,
128 hop, 128 TDOAs, 128-atom dictionary, 100 NMF iterations, 3 sources) —
as **audio-seconds processed per second per chip**, batched on one device.

``vs_baseline`` is the speedup over the reference-equivalent NumPy
implementation (gccnmf_tpu.baselines.numpy_ref) measured on this host at
the same configuration.

Also reports streaming RT-GCC-NMF latency three ways:
- ``streaming_device_ms_per_block``: per-block device compute, measured by
  scanning a whole utterance in one program (the honest kernel latency);
- ``streaming_p50_block_latency_ms``: p50 of a host-driven block loop with
  2-block dispatch pipelining (the ``--pipeline-depth`` production path:
  the host↔device round trip overlaps the next dispatches instead of
  sitting on the deadline path);
- ``streaming_unpipelined_p50_ms``: the same loop fetching every block
  before the next dispatch. NOTE: on this harness every fenced dispatch
  crosses the axon TPU tunnel (~25-30 ms round trip for ANY program, even
  ``jit(lambda x: x*2)``), so this number is tunnel-bound, not
  compute-bound. Throughput numbers queue all repeats asynchronously and
  fence once, subtracting the measured round trip (see _timed_loop).

Host-I/O offline throughput is likewise reported both ways:
``with_host_io_audio_s_per_s`` uses the pipelined chunked ingest
(``separate_batches``: double-buffered uploads/downloads, int16 PCM on
the wire); ``with_host_io_serial_audio_s_per_s`` is the naive
upload→compute→download call. Both cross the ~50-120 MB/s axon tunnel
here, so they lower-bound a directly-attached host.

Output contract (round-5 fix — BENCH_r04.json lost its headline to the
driver's ~4 KB stdout-tail window when the full result line outgrew it):
the FULL result dict is written to ``docs/bench_full.json`` and printed on
an earlier stdout line; the FINAL stdout line is a compact headline
summary (``headline_summary``) guaranteed < 2 KB, so the driver's
tail-window parse always captures ``value``/``vs_baseline``/MFU/quality/
latency keys plus the git SHA.  ``tests/test_bench_models.py`` gates the
size invariant.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")


def _setup_jax():
    import jax

    # Persistent compilation cache: repeat bench runs skip the ~1 min of
    # XLA compiles (the axon tunnel makes fresh compiles expensive).
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(_CACHE_DIR, "jaxcache")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    return jax


def _load_audio():
    from gccnmf_tpu import defs
    from gccnmf_tpu.utils import wav

    if os.path.exists(defs.DEFAULT_SEPARATION_FILE):
        stereo, sr = wav.read_wav(defs.DEFAULT_SEPARATION_FILE)
        return stereo, sr, "dev1_female3_liverec_130ms_1m_mix.wav"
    # synthetic fallback: 10 s stereo with two delayed sources
    sr = 16000
    n = 10 * sr
    rng = np.random.default_rng(0)
    s1, s2 = rng.standard_normal((2, n)).astype(np.float32) * 0.1
    stereo = np.stack([s1 + s2, np.roll(s1, 8) + np.roll(s2, -11)])
    return stereo.astype(np.float32), sr, "synthetic"


def _fence(out):
    """Force completion of a computation with a 1-element host fetch.

    ``block_until_ready`` alone has been observed returning early through
    the axon TPU tunnel (sub-ms "timings" for programs that provably move
    hundreds of MB); fetching one element cannot complete until the
    producing program has."""
    import jax

    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    # rank-1 single-element fetch (rank-0 and complex transfers are not
    # supported by the axon backend)
    elem = leaf[(0,) * (leaf.ndim - 1)][:1] if leaf.ndim else leaf.reshape(1)
    np.asarray(jnp.abs(elem) if jnp.iscomplexobj(elem) else elem)


_TUNNEL_RT = None


def _tunnel_rt():
    """The fence's fixed host↔device round trip (~30 ms through the axon
    tunnel — measured, cached). Dispatches are cheap and asynchronous
    (~0.2 ms each; 20 chained dispatches + one fence ≈ one fence), so
    timing loops launch all repeats and fence ONCE, then subtract this
    constant — fencing inside the loop would add the full round trip to
    every iteration and understate throughput by ~30 ms/iteration."""
    global _TUNNEL_RT
    if _TUNNEL_RT is None:
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: x * 1.0001)
        x = jnp.ones((8, 128), jnp.float32)
        _fence(f(x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _fence(f(x))
            ts.append(time.perf_counter() - t0)
        _TUNNEL_RT = min(ts)
    return _TUNNEL_RT


def _timed_loop(fn, repeats: int) -> float:
    """Mean seconds per execution of ``fn()`` over ``repeats`` runs:
    all dispatches queued asynchronously, one fence at the end, the
    tunnel round trip subtracted (clamped to half the total so jitter
    can never produce a negative or absurd time)."""
    out = fn()
    _fence(out)  # warm + compile
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn()
    _fence(out)
    elapsed = time.perf_counter() - t0
    return (elapsed - min(_tunnel_rt(), elapsed / 2)) / repeats


def _offline_cfg(sr, quick):
    from gccnmf_tpu.models.offline import OfflineConfig

    if quick:
        return OfflineConfig(
            sample_rate=sr, num_iterations=10, dictionary_size=32, num_tdoas=64
        )
    return OfflineConfig(sample_rate=sr)


# bf16 MXU peak per chip, for the MFU figure (per-device-kind; the axon
# device string is matched by prefix). v5e: 197 TFLOPS bf16.
_PEAK_BF16_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5e": 197.0}


def _peak_tflops(device_str: str):
    for prefix, peak in _PEAK_BF16_TFLOPS.items():
        if prefix in device_str:
            return peak
    return None


def _flop_model(cfg, t: int, num_sources: int = 3) -> dict:
    """Analytic GEMM FLOP count for one utterance of ``t`` STFT frames at
    config ``cfg`` (the model from docs/DESIGN.md:10-16, itemized).

    Only the MXU GEMMs are counted (elementwise work is bandwidth, not
    FLOPs); dot FLOPs are 2·M·N·K per GEMM.
    """
    f, k, d, w = cfg.num_freq, cfg.dictionary_size, cfg.num_tdoas, cfg.window_size
    tt = 2 * t  # V stacks both channels' frames
    nmf = 8 * tt * f * k * cfg.num_iterations  # 4 GEMMs x 2 flops / iter
    stft = 2 * 2 * 2 * t * w * f  # 2 ch x (cos,sin) DFT matmuls
    gcc = 2 * 2 * t * f * d  # Re/Im angular-spectrogram GEMMs
    attribution = 2 * tt * f * d  # flat steering (x) dictionary scoring
    synthesis = num_sources * 2 * 2 * 2 * t * f * w  # per-source iDFT GEMMs
    total = nmf + stft + gcc + attribution + synthesis
    return dict(
        total=total, nmf=nmf, stft=stft, gcc=gcc,
        attribution=attribution, synthesis=synthesis,
    )


def bench_stage_split(
    stereo, sr, batch: int, quick: bool, repeats: int = 3,
    end_to_end_s: float | None = None,
):
    """DISJOINT per-stage device times of the flagship pipeline, folded
    into the bench JSON so a regression is attributable to compute vs
    bandwidth without a separate run.

    The measured stages are: the fused analyze program (front-end + NMF),
    the Pallas NMF loop alone, and the reconstruction tail
    (attribution/masks/Wiener/ISTFT). The published keys are disjoint —
    ``front_end_ms`` is analyze minus NMF — so they sum to ≈
    ``end_to_end_ms`` (the shipped program) and the JSON self-documents:
    no consumer has to know that the analyze program *contains* the NMF
    loop."""
    import jax
    import jax.numpy as jnp

    from gccnmf_tpu.models.offline import GCCNMFSeparator
    from gccnmf_tpu.ops import nmf, stft as stft_ops
    from gccnmf_tpu.ops.nmf_pallas import kl_nmf_pallas

    cfg = _offline_cfg(sr, quick)
    sep = GCCNMFSeparator(cfg)
    b = batch
    batch_in = jnp.asarray(np.broadcast_to(stereo, (b,) + stereo.shape))
    t = stft_ops.num_frames(stereo.shape[-1], cfg.window_size, cfg.hop_size)
    w0, h0 = nmf.nmf_init_numpy(cfg.num_freq, cfg.dictionary_size, 2 * t)
    w0b = jnp.broadcast_to(jnp.asarray(w0), (b,) + w0.shape)
    h0b = jnp.broadcast_to(jnp.asarray(h0), (b,) + h0.shape)

    analyze_planes = jax.jit(lambda s, w_, h_: sep._analyze_planes(s, w_, h_))
    sre, sim, w, h, cre, cim, ang = analyze_planes(batch_in, w0b, h0b)
    analyze_s = _timed_loop(
        lambda: analyze_planes(batch_in, w0b, h0b), repeats
    )

    nmf_only = jax.jit(lambda vv, ww, hh: kl_nmf_pallas(
        vv, ww, hh, cfg.num_iterations, cfg.sparsity_alpha, cfg.epsilon,
        matmul_dtype=cfg.nmf_matmul_dtype,
    ))
    # time the NMF loop on the actual analyze-stage V magnitudes
    v_mag = jnp.concatenate(
        [jnp.sqrt(sre[..., 0, :, :] ** 2 + sim[..., 0, :, :] ** 2),
         jnp.sqrt(sre[..., 1, :, :] ** 2 + sim[..., 1, :, :] ** 2)],
        axis=-2,
    )
    nmf_only(v_mag, w0b, h0b)
    nmf_s = _timed_loop(lambda: nmf_only(v_mag, w0b, h0b), repeats)

    targets = jnp.broadcast_to(
        jnp.asarray([10, cfg.num_tdoas // 2, cfg.num_tdoas - 10], jnp.int32),
        (b, 3),
    )
    sep._reconstruct_batched_winner(sre, sim, cre, cim, w, h, targets)
    recon_s = _timed_loop(
        lambda: sep._reconstruct_batched_winner(
            sre, sim, cre, cim, w, h, targets
        ),
        repeats,
    )
    split = dict(
        front_end_ms=round(max(analyze_s - nmf_s, 0.0) * 1e3, 2),
        nmf_ms=round(nmf_s * 1e3, 2),
        reconstruct_ms=round(recon_s * 1e3, 2),
    )
    if end_to_end_s is not None:
        split["end_to_end_ms"] = round(end_to_end_s * 1e3, 2)
        split["stages_sum_ms"] = round(
            (max(analyze_s - nmf_s, 0.0) + nmf_s + recon_s) * 1e3, 2
        )
    return split, t


def bench_offline_tpu(stereo, sr, batch: int, repeats: int, quick: bool):
    """Returns (device_throughput, with_host_io_throughput) in audio-s/s.

    The device number times the jitted program with inputs resident on the
    chip and outputs fenced with block_until_ready — the per-chip compute
    throughput that scales with DP. The host-IO number includes transferring
    inputs up and all separated waveforms back every call; on this harness
    those bytes cross the axon tunnel, so it is a lower bound on what a
    directly-attached host would see.
    """
    import jax
    import jax.numpy as jnp

    from gccnmf_tpu.models.offline import GCCNMFSeparator
    from gccnmf_tpu.ops import nmf, stft as stft_ops

    cfg = _offline_cfg(sr, quick)
    sep = GCCNMFSeparator(cfg)
    batch_in = np.ascontiguousarray(
        np.broadcast_to(stereo, (batch,) + stereo.shape)
    )
    t = stft_ops.num_frames(stereo.shape[-1], cfg.window_size, cfg.hop_size)
    w0, h0 = nmf.nmf_init_numpy(cfg.num_freq, cfg.dictionary_size, 2 * t)
    dev_in = jnp.asarray(batch_in)
    w0b = jnp.broadcast_to(jnp.asarray(w0), (batch,) + w0.shape)
    h0b = jnp.broadcast_to(jnp.asarray(h0), (batch,) + h0.shape)

    per_run = _timed_loop(
        lambda: sep._separate_batch_jit(dev_in, w0b, h0b, 3), repeats
    )
    device_thr = batch * stereo.shape[-1] / sr / per_run

    # opt-in turbo mode (shared-Q simultaneous NMF updates): same
    # localization and ground-truth BSS-Eval, +14% device throughput
    import dataclasses

    sep_turbo = GCCNMFSeparator(
        dataclasses.replace(cfg, nmf_matmul_dtype="bfloat16_q_simul")
    )
    per_turbo = _timed_loop(
        lambda: sep_turbo._separate_batch_jit(dev_in, w0b, h0b, 3), repeats
    )
    turbo_thr = batch * stereo.shape[-1] / sr / per_turbo

    t0 = time.perf_counter()
    sep.separate_batch(batch_in, num_sources=3)  # includes up+down transfer
    host_thr = batch * stereo.shape[-1] / sr / (time.perf_counter() - t0)

    # pipelined host-I/O: separate_batches double-buffers chunks (upload of
    # k+1 and async download of k-1 overlap chunk k's compute) and ships
    # 16-bit PCM both ways — the production many-utterance ingest path.
    chunks = 4
    for _ in sep.separate_batches([batch_in], num_sources=3, io_dtype="int16"):
        pass  # warm/compile the int16 program outside the timed region
    # 4 repeats, MEDIAN headline (min/max published alongside): the
    # tunnel's throughput swings by integer factors between minutes
    # (measured 18 s vs 350 s for identical warm runs), and the I/O-bound
    # number is the one it distorts most. With n=2 and a best-of headline
    # (rounds 2-3), round-over-round drift was indistinguishable from a
    # real ingest regression; the median of 4 is robust to one outlier in
    # either direction and is NOT a flattering statistic.
    piped_repeats = []
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in sep.separate_batches(
            (batch_in for _ in range(chunks)), num_sources=3, io_dtype="int16"
        ):
            pass
        piped_repeats.append(time.perf_counter() - t0)
    audio_s = chunks * batch * stereo.shape[-1] / sr
    piped_thr = audio_s / float(np.median(piped_repeats))
    return dict(
        device_thr=device_thr,
        turbo_thr=turbo_thr,
        host_thr=host_thr,
        piped_thr=piped_thr,
        piped_thr_min=audio_s / max(piped_repeats),
        piped_thr_max=audio_s / min(piped_repeats),
        piped_repeats_s=[round(x, 2) for x in piped_repeats],
        device_s_per_call=per_run,
        turbo_s_per_call=per_turbo,
    )


def bench_enhance_tpu(stereo, sr, batch: int, repeats: int, quick: bool):
    """Offline enhancement (pre-learned W, soft masks) audio-s/s, batched."""
    import jax.numpy as jnp

    from gccnmf_tpu.models.offline import GCCNMFEnhancer, OfflineConfig

    rng = np.random.default_rng(0)
    k = 64 if quick else 128
    cfg = OfflineConfig(
        sample_rate=sr, mic_separation_m=0.1,
        num_tdoas=64 if quick else 128, dictionary_size=k,
    )
    w = rng.random((cfg.num_freq, k)).astype(np.float32) + 1e-3
    enh = GCCNMFEnhancer(w, cfg)
    batch_in = jnp.asarray(
        np.ascontiguousarray(np.broadcast_to(stereo, (batch,) + stereo.shape))
    )
    args = (jnp.float32(5.0), jnp.float32(2.0), jnp.float32(0.0))
    per_run = _timed_loop(lambda: enh._enhance_jit(batch_in, *args), repeats)
    return batch * stereo.shape[-1] / sr / per_run


def bench_online_tpu(stereo, sr, batch: int, repeats: int, quick: bool):
    """Online causal enhancement (sliding localization, streaming-mask
    semantics over whole utterances) audio-s/s, batched."""
    import jax.numpy as jnp

    from gccnmf_tpu.models.online import OnlineConfig, OnlineGCCNMFEnhancer

    rng = np.random.default_rng(0)
    k = 64 if quick else 128
    cfg = OnlineConfig(
        sample_rate=sr, mic_separation_m=0.1,
        num_tdoas=64 if quick else 64, num_h_updates=0,
    )
    w = rng.random((cfg.num_freq, k)).astype(np.float32) + 1e-3
    enh = OnlineGCCNMFEnhancer(w, cfg)
    batch_in = jnp.asarray(
        np.ascontiguousarray(np.broadcast_to(stereo, (batch,) + stereo.shape))
    )
    per_run = _timed_loop(lambda: enh._enhance_jit(batch_in), repeats)
    return batch * stereo.shape[-1] / sr / per_run


def bench_offline_numpy(stereo, sr, quick: bool):
    from gccnmf_tpu.baselines import numpy_ref

    kwargs = dict(num_sources=3)
    if quick:
        kwargs.update(dictionary_size=32, num_iterations=10, num_tdoas=64)
    t0 = time.perf_counter()
    ref = numpy_ref.separate_ref(stereo, sr, **kwargs)
    elapsed = time.perf_counter() - t0
    return (stereo.shape[-1] / sr) / elapsed, ref


def quality_vs_oracle(stereo, sr, ref, quick: bool, parity_mode: bool = False):
    """(min per-source waveform SNR, min per-source PESQ) of the TPU
    pipeline vs the NumPy oracle — the parity evidence recorded with every
    benchmark run. Parity PESQ near 4.5 means the TPU output is perceptually
    transparent relative to the reference's own waveform (the comparison
    axis BASELINE.md names).

    ``parity_mode=True`` runs the slow exact-numerics configuration
    (f32 NMF trajectory + Precision.HIGHEST GEMMs) instead of the
    throughput default."""
    import dataclasses

    from gccnmf_tpu.metrics import pesq, snr
    from gccnmf_tpu.models.offline import GCCNMFSeparator
    from gccnmf_tpu.ops import xprec

    cfg = _offline_cfg(sr, quick)
    old_level = xprec.current_level()
    if parity_mode:
        cfg = dataclasses.replace(cfg, nmf_matmul_dtype="float32")
        xprec.set_matmul_precision("highest")
    try:
        result = GCCNMFSeparator(cfg).separate(stereo, num_sources=3)
    finally:
        xprec.set_matmul_precision(old_level)
    tpu_est = result["estimates"]
    ref_est = np.asarray(ref["estimates"])
    if list(result["target_tdoa_indexes"]) != list(ref["targets"]):
        return None, None  # different localization: comparison meaningless
    n = min(tpu_est.shape[-1], ref_est.shape[-1])
    min_snr = min(
        snr(ref_est[i][..., :n], tpu_est[i][..., :n])
        for i in range(ref_est.shape[0])
    )
    pesqs = []
    for i in range(ref_est.shape[0]):
        try:
            pesqs.append(
                pesq(
                    ref_est[i][..., :n].mean(axis=0),
                    np.asarray(tpu_est[i][..., :n]).mean(axis=0),
                    sr,
                )
            )
        except Exception as e:
            # a null in the JSON must be distinguishable from "not measured":
            # a NaN estimate or unsupported rate is itself parity evidence
            print(f"# pesq failed for source {i}: {e}", file=sys.stderr)
    return min_snr, (min(pesqs) if pesqs else None)


def bench_streaming(sr, host_steps: int = 30, multi_streams: int = 64):
    """Returns (device_ms_per_block, host_p50_ms, rt_factor,
    multistream_aggregate_rt_factor)."""
    import jax.numpy as jnp

    from gccnmf_tpu.models.realtime import (
        RTGCCNMFProcessor,
        StreamConfig,
        StreamParams,
    )

    rng = np.random.default_rng(0)
    w = rng.random((513, 64)).astype(np.float32) + 1e-3
    cfg = StreamConfig(sample_rate=sr)
    proc = RTGCCNMFProcessor(w, cfg)
    params = StreamParams.default()

    # --- device per-block latency: whole 10 s utterance in one scan -------
    sig = np.asarray(rng.standard_normal((1, 2, 10 * sr)), np.float32) * 0.1
    blocks = jnp.asarray(proc.blocks_from_signal(sig))
    nb = blocks.shape[0]
    state = proc.init_state(1)
    scan_s = _timed_loop(lambda: proc.scan_blocks(state, blocks, params), 3)
    device_ms = scan_s / nb * 1e3
    rt_factor = (nb * cfg.block_size / sr) / scan_s

    # --- multi-stream aggregate: 64 streams in lockstep, one scan ---------
    sigs = np.asarray(
        rng.standard_normal((multi_streams, 2, 2 * sr)), np.float32
    ) * 0.1
    mblocks = jnp.asarray(proc.blocks_from_signal(sigs))
    mstate = proc.init_state(multi_streams)
    m_s = _timed_loop(lambda: proc.scan_blocks(mstate, mblocks, params), 3)
    mnb = mblocks.shape[0]
    multi_rt = multi_streams * mnb * cfg.block_size / sr / m_s

    # --- host-loop p50s: 4 repeats of each loop, median-of-p50s headline
    # with min/max alongside — the per-dispatch numbers ride the axon
    # tunnel, whose jitter made round-over-round p50 drift (0.84 → 1.18
    # ms across rounds 2-3) indistinguishable from a code regression
    # when only one loop was recorded -----------------------------------
    from collections import deque

    p50_repeats = 4

    # unpipelined: tunnel round trip on every block
    state = proc.init_state(1)
    block = blocks[0]
    st, out, _ = proc.step(state, block, params)
    _fence(out)
    unpiped_p50s = []
    for _ in range(p50_repeats):
        times = []
        for _ in range(host_steps):
            t0 = time.perf_counter()
            st, out, _ = proc.step(st, block, params)
            _fence(out)
            times.append(time.perf_counter() - t0)
        unpiped_p50s.append(float(np.percentile(times, 50) * 1e3))

    # pipelined depth 2 (the gccnmf-realtime --pipeline-depth path:
    # dispatch block n, async-copy, fetch block n-2's output — the round
    # trip leaves the deadline path for 2 blocks of extra latency)
    piped_p50s = []
    for _ in range(p50_repeats):
        st = proc.init_state(1)
        q = deque()
        times = []
        for _ in range(host_steps):
            t0 = time.perf_counter()
            st, out, _ = proc.step(st, block, params)
            try:
                out.copy_to_host_async()
            except Exception:
                pass
            q.append(out)
            if len(q) > 2:
                np.asarray(q.popleft())  # the consumer's full-block fetch
            times.append(time.perf_counter() - t0)
        piped_p50s.append(float(np.percentile(times, 50) * 1e3))
    return dict(
        device_ms=device_ms,
        piped_p50=float(np.median(piped_p50s)),
        piped_p50_minmax=[min(piped_p50s), max(piped_p50s)],
        unpiped_p50=float(np.median(unpiped_p50s)),
        unpiped_p50_minmax=[min(unpiped_p50s), max(unpiped_p50s)],
        rt_factor=rt_factor,
        multi_rt=multi_rt,
    )


def bench_low_latency(sr, host_steps: int = 40, synthesis_length: int = 24):
    """The low-latency workload (asymmetric windows) on the chip.

    The reference's headline latency claim is "<2 ms algorithmic latency
    with asymmetric windowing" vs the >64 ms symmetric floor
    (/root/reference/README.md:78). This measures the shipping
    `gccnmf-stream --low-latency --synthesis-length 24` configuration —
    long (1024) analysis window, 24-sample synthesis support, hop =
    block = 12 samples — end to end: algorithmic latency, device compute
    per block (a whole-utterance scan: the honest kernel number), and
    the host-loop p50s both pipelined and unpipelined. At a 12-sample
    block the deadline is 0.75 ms, so the unpipelined number is pure
    tunnel round trip; the device number is what a directly-attached
    host would ride."""
    import jax.numpy as jnp

    from gccnmf_tpu.models.realtime import (
        RTGCCNMFProcessor,
        StreamConfig,
        StreamParams,
    )

    rng = np.random.default_rng(0)
    w = rng.random((513, 64)).astype(np.float32) + 1e-3
    hop = synthesis_length // 2
    cfg = StreamConfig(
        sample_rate=sr,
        analysis_window="asymmetric",
        synthesis_length=synthesis_length,
        hop_size=hop,
        block_size=hop,
    )
    proc = RTGCCNMFProcessor(w, cfg)
    params = StreamParams.default()

    # device per-block latency over a 2 s utterance scan (each block is
    # one hop = 0.75 ms of audio, so 2 s is ~2667 blocks)
    sig = np.asarray(rng.standard_normal((1, 2, 2 * sr)), np.float32) * 0.1
    blocks = jnp.asarray(proc.blocks_from_signal(sig))
    nb = blocks.shape[0]
    state = proc.init_state(1)
    scan_s = _timed_loop(lambda: proc.scan_blocks(state, blocks, params), 3)
    device_ms = scan_s / nb * 1e3
    rt_factor = (nb * cfg.block_size / sr) / scan_s

    # host-loop p50s, 4 repeats, median headline (same discipline as the
    # symmetric streaming numbers)
    from collections import deque

    block = blocks[0]
    st, out, _ = proc.step(proc.init_state(1), block, params)
    _fence(out)
    unpiped_p50s, piped_p50s = [], []
    for _ in range(4):
        times = []
        st = proc.init_state(1)
        for _ in range(host_steps):
            t0 = time.perf_counter()
            st, out, _ = proc.step(st, block, params)
            _fence(out)
            times.append(time.perf_counter() - t0)
        unpiped_p50s.append(float(np.percentile(times, 50) * 1e3))
    for _ in range(4):
        st = proc.init_state(1)
        q = deque()
        times = []
        for _ in range(host_steps):
            t0 = time.perf_counter()
            st, out, _ = proc.step(st, block, params)
            try:
                out.copy_to_host_async()
            except Exception:
                pass
            q.append(out)
            if len(q) > 2:
                np.asarray(q.popleft())
            times.append(time.perf_counter() - t0)
        piped_p50s.append(float(np.percentile(times, 50) * 1e3))

    algo_ms = cfg.algorithmic_latency_s * 1e3
    return {
        "synthesis_length": synthesis_length,
        "hop": hop,
        "algorithmic_latency_ms": round(algo_ms, 3),
        "symmetric_floor_ms": 64.0,
        "reference_claim_ms": 2.0,
        "beats_symmetric_floor": bool(algo_ms < 64.0),
        "meets_reference_claim": bool(algo_ms < 2.0),
        "device_ms_per_block": round(device_ms, 4),
        "block_deadline_ms": round(hop / sr * 1e3, 3),
        "device_realtime_factor": round(rt_factor, 1),
        "p50_block_latency_ms": round(float(np.median(piped_p50s)), 3),
        "p50_minmax_ms": [round(min(piped_p50s), 3), round(max(piped_p50s), 3)],
        "unpipelined_p50_ms": round(float(np.median(unpiped_p50s)), 3),
        "unpipelined_p50_minmax_ms": [
            round(min(unpiped_p50s), 3), round(max(unpiped_p50s), 3)
        ],
    }


_HEADLINE_MAX_BYTES = 2048

# (headline key, path into the full result dict) — every entry the round-4
# verdict named as "must survive the driver's tail window", flattened.
_HEADLINE_KEYS = (
    ("metric", ("metric",)),
    ("value", ("value",)),
    ("unit", ("unit",)),
    ("vs_baseline", ("vs_baseline",)),
    ("turbo_audio_s_per_s", ("offline_turbo_audio_s_per_s",)),
    ("achieved_tflops", ("achieved_tflops",)),
    ("mfu_vs_bf16_peak", ("mfu_vs_bf16_peak",)),
    ("stage_split_ms", ("stage_split_ms",)),
    ("host_io_audio_s_per_s", ("with_host_io_audio_s_per_s",)),
    ("enhancement_audio_s_per_s", ("enhancement_audio_s_per_s",)),
    ("quality_min_snr_db", ("quality_min_snr_vs_numpy_oracle_db",)),
    ("parity_mode_snr_db", ("quality_parity_mode_snr_db",)),
    ("quality_min_pesq", ("quality_min_pesq_vs_numpy_oracle",)),
    ("streaming_device_ms", ("streaming_device_ms_per_block",)),
    ("streaming_p50_ms", ("streaming_p50_block_latency_ms",)),
    ("low_latency_algo_ms", ("low_latency", "algorithmic_latency_ms")),
    ("low_latency_device_ms", ("low_latency", "device_ms_per_block")),
    ("six_wav_min_snr_db", ("quality_six_wav", "min_snr_db")),
    ("six_wav_min_pesq", ("quality_six_wav", "min_pesq")),
    ("streamed_60min_audio_s_per_s", ("streamed_60min", "audio_s_per_s")),
    ("serving_streams_p99", (
        "serving_capacity", "max_streams_meeting_deadline_at_p99")),
    ("serving_streams_async", (
        "serving_capacity", "max_streams_async_within_latency_budget")),
    ("batch", ("batch",)),
    ("git_sha", ("stamp", "git_sha")),
)


def headline_summary(result: dict) -> dict:
    """The compact FINAL-stdout-line dict: the headline metrics flattened
    out of the full result, hard-capped at ``_HEADLINE_MAX_BYTES`` once
    JSON-encoded (the driver records only a ~4 KB stdout tail — round 4's
    single giant line lost its own head to that window).

    Pure function of the result dict so the size invariant is testable
    without running the bench.  If trimming is ever needed, keys are
    dropped from the END of ``_HEADLINE_KEYS`` (provenance trims last-ish,
    metric/value/vs_baseline never trim)."""
    out = {"full": "docs/bench_full.json"}
    for name, path in _HEADLINE_KEYS:
        node = result
        for k in path:
            if not isinstance(node, dict) or k not in node:
                node = None
                break
            node = node[k]
        if node is not None:
            out[name] = node
    while (
        len(json.dumps(out)) > _HEADLINE_MAX_BYTES
        and len(out) > 4
    ):
        for name, _ in reversed(_HEADLINE_KEYS):
            if name in out and name not in ("metric", "value", "unit",
                                            "vs_baseline"):
                del out[name]
                break
        else:
            break
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small config smoke run")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--skip-numpy", action="store_true")
    args = ap.parse_args()

    jax = _setup_jax()
    stereo, sr, source = _load_audio()

    # batch=128 is the measured single-chip throughput peak on v5e (192
    # exhausts HBM); halve on ResourceExhausted so the bench degrades
    # gracefully on smaller devices instead of dying.
    batch = args.batch
    while True:
        try:
            offline = bench_offline_tpu(stereo, sr, batch, args.repeats, args.quick)
            break
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e) or batch <= 1:
                raise
            batch //= 2
            print(f"# OOM at batch {batch * 2}, retrying with {batch}",
                  file=sys.stderr)
    tpu_throughput = offline["device_thr"]
    turbo_throughput = offline["turbo_thr"]
    host_io_throughput = offline["host_thr"]
    piped_io_throughput = offline["piped_thr"]

    # compute-efficiency self-documentation: analytic GEMM FLOP model
    # (docs/DESIGN.md:10-16) over the measured device time -> achieved
    # TFLOPS and MFU vs the chip's bf16 peak, plus the per-stage split so
    # a regression is attributable without a separate breakdown run
    from gccnmf_tpu.ops import stft as _stft_ops

    _cfg = _offline_cfg(sr, args.quick)
    _t = _stft_ops.num_frames(stereo.shape[-1], _cfg.window_size, _cfg.hop_size)
    flops = _flop_model(_cfg, _t)
    achieved = batch * flops["total"] / offline["device_s_per_call"] / 1e12
    peak = _peak_tflops(str(jax.devices()[0]))
    try:
        stage_split, _ = bench_stage_split(
            stereo, sr, batch, args.quick,
            end_to_end_s=offline["device_s_per_call"],
        )
    except Exception as e:
        print(f"# stage split failed: {e}", file=sys.stderr)
        stage_split = None
    enhance_throughput = bench_enhance_tpu(
        stereo, sr, min(batch, 64), args.repeats, args.quick
    )
    online_throughput = bench_online_tpu(
        stereo, sr, min(batch, 64), args.repeats, args.quick
    )
    streaming = bench_streaming(sr)
    try:
        low_latency = bench_low_latency(sr)
    except Exception as e:
        print(f"# low-latency bench failed: {e}", file=sys.stderr)
        low_latency = None
    if args.skip_numpy:
        numpy_throughput = None
        quality_db = parity_db = quality_pesq = parity_pesq = None
    else:
        numpy_throughput, ref = bench_offline_numpy(stereo, sr, args.quick)
        try:
            quality_db, quality_pesq = quality_vs_oracle(
                stereo, sr, ref, args.quick
            )
            parity_db, parity_pesq = quality_vs_oracle(
                stereo, sr, ref, args.quick, parity_mode=True
            )
        except Exception:
            quality_db = parity_db = quality_pesq = parity_pesq = None

    result = {
        "metric": "offline separation throughput",
        "value": round(tpu_throughput, 2),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": (
            round(tpu_throughput / numpy_throughput, 2) if numpy_throughput else None
        ),
        "baseline_numpy_audio_s_per_s": (
            round(numpy_throughput, 2) if numpy_throughput else None
        ),
        "realtime_factor": round(tpu_throughput, 2),
        "offline_turbo_audio_s_per_s": round(turbo_throughput, 2),
        "achieved_tflops": round(achieved, 1),
        "mfu_vs_bf16_peak": (
            round(achieved / peak, 3) if peak else None
        ),
        "flop_model_gflop_per_utterance": round(flops["total"] / 1e9, 1),
        "flop_model_split_gflop": {
            k: round(v / 1e9, 2) for k, v in flops.items() if k != "total"
        },
        "stage_split_ms": stage_split,
        "with_host_io_audio_s_per_s": round(piped_io_throughput, 2),
        "with_host_io_minmax_audio_s_per_s": [
            round(offline["piped_thr_min"], 2),
            round(offline["piped_thr_max"], 2),
        ],
        "with_host_io_serial_audio_s_per_s": round(host_io_throughput, 2),
        "with_host_io_repeats_s": offline["piped_repeats_s"],
        "enhancement_audio_s_per_s": round(enhance_throughput, 2),
        "online_enhancement_audio_s_per_s": round(online_throughput, 2),
        "quality_min_snr_vs_numpy_oracle_db": (
            round(quality_db, 1) if quality_db is not None else None
        ),
        "quality_parity_mode_snr_db": (
            round(parity_db, 1) if parity_db is not None else None
        ),
        "quality_min_pesq_vs_numpy_oracle": (
            round(quality_pesq, 2) if quality_pesq is not None else None
        ),
        # every PESQ figure in this JSON comes from the clean-room P.862
        # model (gccnmf_tpu/pesq_p862.py), anchored by committed
        # degradation curves (docs/pesq_curves.*) but never validated
        # against ITU reference code — treat as a relative metric
        "pesq_scope_note": "clean-room P.862, curve-anchored, not ITU-validated",
        "quality_parity_mode_pesq": (
            round(parity_pesq, 2) if parity_pesq is not None else None
        ),
        "streaming_device_ms_per_block": round(streaming["device_ms"], 3),
        "streaming_realtime_factor": round(streaming["rt_factor"], 1),
        "streaming_64streams_aggregate_rt_factor": round(
            streaming["multi_rt"], 1
        ),
        "streaming_p50_block_latency_ms": round(streaming["piped_p50"], 3),
        "streaming_p50_minmax_ms": [
            round(x, 3) for x in streaming["piped_p50_minmax"]
        ],
        "streaming_unpipelined_p50_ms": round(streaming["unpiped_p50"], 3),
        "streaming_unpipelined_p50_minmax_ms": [
            round(x, 3) for x in streaming["unpiped_p50_minmax"]
        ],
        "streaming_block_deadline_ms": 32.0,
        "low_latency": low_latency,
        "audio_source": source,
        "batch": batch,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    # hour-scale disk-streamed result: measured separately on the real
    # chip by benchmarks/streamed_bench.py (a 30-minute ingest inside
    # this run would be dominated by tunnel variance) and committed as an
    # artifact; folded in marked as such
    docs_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "docs")
    for key, fname in (
        ("streamed_30min", "streamed_30min.json"),
        ("streamed_60min", "streamed_60min.json"),
    ):
        path = os.path.join(docs_dir, fname)
        if os.path.exists(path):
            try:
                with open(path) as fh:
                    streamed = json.load(fh)
                streamed["measured_by"] = (
                    "benchmarks/streamed_bench.py (committed artifact)"
                )
                result[key] = streamed
            except Exception as e:
                print(f"# streamed artifact unreadable: {e}", file=sys.stderr)
    # six-WAV default-pipeline parity (BASELINE.md's "the bundled dev
    # WAVs" axis, plural): min across all six files x 3 sources of
    # SNR / BSS-Eval SDR / PESQ vs the NumPy oracle, in both shipping
    # modes — measured on the real chip by benchmarks/parity_six_wavs.py
    # and committed (running 6 oracle pipelines + 12 TPU runs inside
    # every bench invocation would double its wall time for a
    # deterministic result)
    # serving capacity (real-chip tenancy sweep, committed artifact):
    # the deployment answer — max concurrent streams meeting the 32 ms
    # deadline at p99 — measured separately because a 5-tenancy x 500-tick
    # sweep inside every bench run would triple its wall time
    cap_path = os.path.join(docs_dir, "scaling", "serving_capacity.json")
    if os.path.exists(cap_path):
        try:
            with open(cap_path) as fh:
                cap = json.load(fh)
            result["serving_capacity"] = {
                k: cap[k]
                for k in (
                    "max_streams_meeting_deadline_at_p99",
                    "sync_capacity_per_replica",
                    "max_streams_async_within_latency_budget",
                    "async_capacity_per_replica",
                    "max_streams_at_p99_by_depth",
                    "max_streams_by_device_compute",
                    "deadline_ms",
                    "pipeline_depth",
                )
                if k in cap
            }
            result["serving_capacity"]["measured_by"] = (
                "benchmarks/serving_capacity.py (committed artifact)"
            )
        except Exception as e:
            print(f"# serving capacity artifact unreadable: {e}", file=sys.stderr)
    six_path = os.path.join(docs_dir, "parity_six_wavs.json")
    if os.path.exists(six_path):
        try:
            with open(six_path) as fh:
                six = json.load(fh)
            s = six["summary"]
            result["quality_six_wav"] = {
                "num_wavs": six["num_wavs"],
                "localization_match_all": (
                    s["throughput"]["localization_match_all"]
                    and s["parity"]["localization_match_all"]
                ),
                "min_snr_db": s["throughput"]["min_snr_db"],
                "min_bss_sdr_db": s["throughput"]["min_bss_sdr_db"],
                "min_pesq": s["throughput"]["min_pesq"],
                "parity_mode_min_snr_db": s["parity"]["min_snr_db"],
                "parity_mode_min_pesq": s["parity"]["min_pesq"],
                "measured_by": (
                    "benchmarks/parity_six_wavs.py (committed artifact)"
                ),
            }
        except Exception as e:
            print(f"# six-wav parity artifact unreadable: {e}", file=sys.stderr)

    from gccnmf_tpu.utils.stamp import config_fingerprint, run_stamp

    result["stamp"] = run_stamp(config_fingerprint=config_fingerprint(_cfg))
    # full result: committed artifact + an EARLIER stdout line (the driver
    # keeps only a ~4 KB tail, so this line may be truncated there — the
    # file is the durable copy)
    # GCCNMF_BENCH_FULL_OUT redirects the full-result artifact (used by
    # benchmarks/run_all.py --quick so a smoke run cannot overwrite the
    # committed full-scale docs/bench_full.json)
    full_path = os.environ.get("GCCNMF_BENCH_FULL_OUT") or os.path.join(
        docs_dir, "bench_full.json"
    )
    try:
        with open(full_path, "w") as fh:
            json.dump(result, fh, indent=1)
            fh.write("\n")
    except Exception as e:
        print(f"# bench_full.json write failed: {e}", file=sys.stderr)
    print(json.dumps(result))
    sys.stdout.flush()
    # FINAL line: the compact driver-parseable headline (< 2 KB, gated by
    # tests/test_bench_models.py)
    print(json.dumps(headline_summary(result)))


if __name__ == "__main__":
    sys.exit(main())
