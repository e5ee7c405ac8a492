"""Command-line entry points.

Mirrors the reference's two executables:

- ``gccnmf-separate`` ≙ gccNMF/runGCCNMF.py (offline separation)
- ``gccnmf-stream``   ≙ gccNMF/realtime/runRealtimeGCCNMF.py --no-gui
  (headless streaming enhancement over a WAV file)

plus ``gccnmf-enhance`` (offline/online enhancement), ``gccnmf-realtime``
(headless app / GUI), and ``gccnmf-serve`` (multi-stream serving). The
benchmark harness is ``bench.py`` at the repository root.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import numpy as np


def separate_main(argv=None):
    ap = argparse.ArgumentParser(description="Offline GCC-NMF source separation")
    ap.add_argument("input", nargs="+",
                    help="stereo mixture WAV(s) (<prefix>_mix.wav); "
                         "same-length files reuse one compiled program")
    ap.add_argument("-o", "--output-prefix", default=None,
                    help="output prefix; with multiple inputs each file's "
                         "stem is appended")
    ap.add_argument("--num-sources", type=int, default=3)
    ap.add_argument("--auto-sources", action="store_true",
                    help="detect source count by clustering peak heights")
    ap.add_argument("--window-size", type=int, default=1024)
    ap.add_argument("--hop-size", type=int, default=128)
    ap.add_argument("--num-tdoas", type=int, default=128)
    ap.add_argument("--mic-separation", type=float, default=1.0)
    ap.add_argument("--dictionary-size", type=int, default=128)
    ap.add_argument("--num-iterations", type=int, default=100)
    ap.add_argument("--sparsity-alpha", type=float, default=0.0)
    ap.add_argument("--time-shards", type=int, default=0,
                    help="shard the time axis over N mesh devices "
                         "(sequence-parallel long-audio pipeline)")
    ap.add_argument("--streamed", action="store_true",
                    help="disk-streamed I/O for hour-scale files: mmap "
                         "input chunks, write outputs incrementally — "
                         "O(chunk) host RAM. Single device uses sequential "
                         "macro-chunks; with --time-shards N the chunks "
                         "are sharded over the mesh")
    ap.add_argument("--chunk-frames", type=int, default=8192,
                    help="macro-chunk width in STFT frames for "
                         "single-device --streamed (bounds host RAM, HBM "
                         "transients, and program size)")
    ap.add_argument("--turbo", action="store_true",
                    help="shared-Q simultaneous NMF updates (TPU): +14%% "
                         "throughput, identical localization and "
                         "ground-truth separation quality, but a different "
                         "update trajectory than the reference (not the "
                         "parity path)")
    ap.add_argument("--device-init", action="store_true",
                    help="with --streamed: draw the NMF H0 on device "
                         "(JAX PRNG) instead of uploading the reference's "
                         "host-seeded init (~0.5 GB/audio-hour through the "
                         "ingest link); deterministic but a different "
                         "trajectory than the reference (not the parity "
                         "path)")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)
    if args.verbose:
        logging.basicConfig(level=logging.INFO)
    if args.streamed and not args.time_shards:
        args.time_shards = 1  # single-device sequential macro-chunk driver
    if args.device_init and not args.time_shards:
        # the flag only exists on the long-audio path; silently running
        # the host-seeded init the user opted out of would be worse than
        # an error
        ap.error("--device-init requires --streamed or --time-shards")


    from gccnmf_tpu.models.offline import GCCNMFSeparator, OfflineConfig
    from gccnmf_tpu.utils import wav

    def make_separator(sr):
        cfg = OfflineConfig(
            window_size=args.window_size,
            hop_size=args.hop_size,
            num_tdoas=args.num_tdoas,
            mic_separation_m=args.mic_separation,
            dictionary_size=args.dictionary_size,
            num_iterations=args.num_iterations,
            sparsity_alpha=args.sparsity_alpha,
            **(
                {"nmf_matmul_dtype": "bfloat16_q_simul"} if args.turbo else {}
            ),
            num_sources=None if args.auto_sources else args.num_sources,
            sample_rate=sr,
        )
        if args.time_shards:
            import jax

            from gccnmf_tpu.parallel import mesh as mesh_lib
            from gccnmf_tpu.parallel.long_audio import LongAudioSeparator

            mesh = mesh_lib.make_mesh(
                data=args.time_shards, model=1,
                devices=jax.devices()[: args.time_shards],
            )
            return LongAudioSeparator(
                cfg, mesh, chunk_frames=args.chunk_frames,
                nmf_init="device" if args.device_init else "reference",
            )
        return GCCNMFSeparator(cfg)

    multi = len(args.input) > 1
    separator = None
    results = []
    for path in args.input:
        if args.output_prefix is None:
            prefix = None
        elif multi:  # keep per-file outputs distinct under one prefix
            stem = os.path.splitext(os.path.basename(path))[0]
            prefix = f"{args.output_prefix}_{stem}"
        else:
            prefix = args.output_prefix
        if args.streamed:
            reader = wav.WavReader(path)
            stereo, sr = None, reader.sample_rate
            if reader.num_channels != 2:  # same contract as _require_stereo
                raise SystemExit(
                    f"{path}: expected 2-channel audio, got "
                    f"{reader.num_channels} channel(s). GCC-PHAT "
                    "localization needs a stereo microphone pair."
                )
        else:
            stereo, sr = wav.read_wav(path)
            _require_stereo(stereo, path)
        if separator is None or separator.config.sample_rate != sr:
            separator = make_separator(sr)  # jit cache reused across files
        if args.streamed:
            result = separator.separate_streamed(path, prefix)
        else:
            result = separator.separate_file(path, prefix, audio=(stereo, sr))
        results.append(
            dict(
                input=path,
                outputs=result["paths"],
                target_tdoa_indexes=result["target_tdoa_indexes"],
            )
        )
    if multi:
        print(json.dumps(dict(files=results)))
    else:  # single file: keep the original flat JSON shape
        results[0].pop("input")
        print(json.dumps(results[0]))
    return 0



def _require_stereo(audio, path, num_channels=2):
    """Fail with the actual problem (channel count) at the CLI boundary —
    a mono file would otherwise crash deep inside jit tracing with an
    opaque shape error (GCC-PHAT needs a microphone pair)."""
    shape = np.shape(audio)
    if len(shape) != 2 or shape[0] != num_channels:
        raise SystemExit(
            f"{path}: expected {num_channels}-channel audio, got shape "
            f"{shape} (GCC-PHAT needs a stereo microphone pair)"
        )


def _resolve_dictionary(cfg, size=None):
    """Explicit artifact (cfg.dictionary_file) wins; otherwise the
    corpus-keyed pretraining cache."""
    from gccnmf_tpu import pretrain

    if cfg.dictionary_file:
        return pretrain.load_dictionary_file(cfg.dictionary_file, cfg.num_freq)
    size = size or cfg.dictionary_size
    banks = pretrain.get_dictionaries(cfg.window_size, sizes=(size,))
    return banks[cfg.dictionary_type][size]


def enhance_main(argv=None):
    ap = argparse.ArgumentParser(description="GCC-NMF speech enhancement")
    ap.add_argument("input", nargs="+",
                    help="stereo WAV(s); same-length files at the same "
                         "sample rate reuse one compiled program. The NMF "
                         "dictionary is resolved ONCE (explicit "
                         "--dictionary-file, else the corpus-pretrained "
                         "cache — like the reference, it is NEVER trained "
                         "on the input audio) and reused for every file")
    ap.add_argument("-o", "--output", default=None,
                    help="output path (single input only; multiple inputs "
                         "write <input>_enhanced.wav next to each file)")
    ap.add_argument("--mode", choices=["offline", "online"], default="online")
    ap.add_argument("-c", "--config", default=None, help="INI config file")
    ap.add_argument("--dictionary-size", type=int, default=None)
    ap.add_argument("--dictionary-file", default=None,
                    help=".npy (F, K) dictionary artifact (bypasses "
                         "pretraining; e.g. from gccnmf-pretrain --save-dir)")
    ap.add_argument("--num-h-updates", type=int, default=None)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)
    if args.verbose:
        logging.basicConfig(level=logging.INFO)

    from gccnmf_tpu import pretrain
    from gccnmf_tpu.config import load_config
    from gccnmf_tpu.utils import wav

    if args.output is not None and len(args.input) > 1:
        ap.error("-o/--output only applies to a single input")
    cfg = load_config(
        args.config,
        dictionary_size=args.dictionary_size,
        dictionary_file=args.dictionary_file,
        num_h_updates=args.num_h_updates,
        audio_path=args.input[0],
    )
    w = _resolve_dictionary(cfg)

    enhancers = {}  # keyed by sample rate; jit cache reused across files

    def enhance_one(stereo, sr):
        enh = enhancers.get((args.mode, sr))
        if enh is None:
            enh = _make_enhancer(args.mode, cfg, w, sr)
            enhancers[(args.mode, sr)] = enh
        return enh.enhance(stereo)["enhanced"]

    outputs = []
    for path in args.input:
        stereo, sr = wav.read_wav(path)
        _require_stereo(stereo, path)
        out = enhance_one(stereo, sr)
        out_path = (
            args.output
            if args.output and len(args.input) == 1
            else os.path.splitext(path)[0] + "_enhanced.wav"
        )
        wav.write_wav(np.asarray(out), out_path, sr)
        outputs.append(out_path)
    if len(outputs) == 1:  # original flat JSON shape
        print(json.dumps(dict(output=outputs[0])))
    else:
        print(json.dumps(dict(outputs=outputs)))
    return 0


def _make_enhancer(mode, cfg, w, sr):
    if mode == "online":
        from gccnmf_tpu.models.online import OnlineConfig, OnlineGCCNMFEnhancer

        ocfg = OnlineConfig(
            sample_rate=sr,
            window_size=cfg.window_size,
            hop_size=cfg.hop_size,
            num_tdoas=cfg.num_tdoas,
            mic_separation_m=cfg.microphone_separation_in_metres,
            num_h_updates=cfg.num_h_updates,
            smoothing_window=cfg.localization_window_size,
            target_epsilon=cfg.target_tdoa_epsilon,
            target_beta=cfg.target_tdoa_beta,
            noise_floor=cfg.target_tdoa_noise_floor,
        )
        return OnlineGCCNMFEnhancer(w, ocfg)
    from gccnmf_tpu.models.offline import GCCNMFEnhancer, OfflineConfig

    ecfg = OfflineConfig(
        window_size=cfg.window_size,
        hop_size=cfg.hop_size,
        num_tdoas=cfg.num_tdoas,
        mic_separation_m=cfg.microphone_separation_in_metres,
        sample_rate=sr,
    )
    return GCCNMFEnhancer(
        w,
        ecfg,
        target_epsilon=cfg.target_tdoa_epsilon,
        target_beta=cfg.target_tdoa_beta,
        noise_floor=cfg.target_tdoa_noise_floor,
        num_h_updates=cfg.num_h_updates,
    )


def stream_main(argv=None):
    """Headless streaming enhancement (the --no-gui realtime mode)."""
    ap = argparse.ArgumentParser(description="Streaming RT-GCC-NMF enhancement")
    ap.add_argument("-i", "--input", required=True, help="input WAV path")
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("-c", "--config", default=None, help="INI config file")
    ap.add_argument("--reference-delay", action="store_true",
                    help="reproduce the reference's 2-block output delay")
    ap.add_argument("--low-latency", action="store_true",
                    help="asymmetric analysis/synthesis windows, emitting "
                         "every hop (block_size = hop) — e.g. "
                         "--synthesis-length 24 gives 1.5 ms algorithmic "
                         "latency (reference README.md:78 claims <2 ms)")
    ap.add_argument("--synthesis-length", type=int, default=256,
                    help="synthesis-window support for --low-latency mode; "
                         "the hop is clamped to synthesis_length/2 so the "
                         "COLA condition holds")
    ap.add_argument("--block-size", type=int, default=None,
                    help="samples per emitted block (must be a multiple of "
                         "the hop); defaults to the config block size, or to "
                         "one hop in --low-latency mode")
    ap.add_argument("--realtime", action="store_true",
                    help="host-loop block-by-block with deadline telemetry")
    ap.add_argument("--dictionary-file", default=None,
                    help=".npy (F, K) dictionary artifact (bypasses "
                         "pretraining; e.g. from gccnmf-pretrain --save-dir)")
    ap.add_argument("--num-h-updates", type=int, default=None,
                    help="per-block H-inference steps against the frozen "
                         "dictionary (H-aware Wiener mask); 0 = the "
                         "reference's W-only realtime rule. Also settable "
                         "as numHUpdates in the INI config")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)
    if args.verbose:
        logging.basicConfig(level=logging.INFO)

    from gccnmf_tpu import pretrain
    from gccnmf_tpu.config import load_config
    from gccnmf_tpu.models.realtime import (
        RTGCCNMFProcessor,
        StreamConfig,
        StreamParams,
    )
    from gccnmf_tpu.utils import wav

    overrides = {}
    if args.num_h_updates is not None:
        if args.num_h_updates < 0:
            ap.error("--num-h-updates must be >= 0")
        overrides["num_h_updates"] = args.num_h_updates
    cfg = load_config(args.config, audio_path=args.input,
                      dictionary_file=args.dictionary_file, **overrides)

    # Flag validation needs only the config — do it before the expensive
    # startup work (WAV load, dictionary pretraining on a cold cache).
    # Low-latency mode needs hop <= synthesis_length/2 for COLA; the default
    # config's hop (window/2) is meant for the symmetric sqrt-hamming path.
    # It also emits every hop (block_size = hop) — latency is the point of
    # the mode, and a 512-sample block would dominate the delay budget.
    hop = cfg.hop_size
    if args.low_latency:
        if args.synthesis_length < 2:
            ap.error("--synthesis-length must be >= 2 (got %d)"
                     % args.synthesis_length)
        hop = min(hop, args.synthesis_length // 2)
    block = args.block_size
    if block is None:
        block = hop if args.low_latency else cfg.block_size
    elif block < 1 or block % hop != 0:
        ap.error("--block-size %d is not a positive multiple of the hop (%d)"
                 % (block, hop))

    stereo, sr = wav.read_wav(args.input)
    _require_stereo(stereo, args.input)
    if stereo.shape[-1] < block:
        ap.error("input is shorter than one %d-sample block" % block)
    w = _resolve_dictionary(cfg)
    scfg = StreamConfig.from_app_config(
        cfg,
        sample_rate=sr,
        hop_size=hop,
        block_size=block,
        synthesis_length=args.synthesis_length,
        extra_delay_blocks=1 if args.reference_delay else 0,
        analysis_window="asymmetric" if args.low_latency else "sqrt_hamming",
    )
    params = StreamParams.default(
        # broadside center for THIS grid — StreamParams.default's 32 is
        # only the middle of the default 64-TDOA grid, and with
        # localization disabled this value IS the mask center
        target_tdoa_index=scfg.num_tdoas / 2.0,
        target_epsilon=cfg.target_tdoa_epsilon,
        target_beta=cfg.target_tdoa_beta,
        noise_floor=cfg.target_tdoa_noise_floor,
        localization_enabled=cfg.localization_enabled,
        localization_window=cfg.localization_window_size,
    )
    proc = RTGCCNMFProcessor(w, scfg)

    if args.realtime:
        import time

        import jax.numpy as jnp

        blocks = proc.blocks_from_signal(stereo)
        state = proc.init_state(1)
        outs, times = [], []
        for i in range(blocks.shape[0]):
            t0 = time.perf_counter()
            state, out, _ = proc.step(state, jnp.asarray(blocks[i]), params)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
            outs.append(np.asarray(out))
        out = np.concatenate([o[0] for o in outs], axis=-1)
        deadline = scfg.block_size / sr
        stats = dict(
            p50_ms=round(float(np.percentile(times, 50)) * 1e3, 3),
            p99_ms=round(float(np.percentile(times, 99)) * 1e3, 3),
            deadline_ms=round(deadline * 1e3, 3),
            deadline_misses=int(np.sum(np.asarray(times) > deadline)),
            blocks=len(times),
        )
    else:
        out = proc.enhance_signal(stereo, params)[0]
        stats = dict(blocks=out.shape[-1] // scfg.block_size)

    out_path = args.output or os.path.splitext(args.input)[0] + "_rtenhanced.wav"
    wav.write_wav(out, out_path, sr)
    print(
        json.dumps(
            dict(
                output=out_path,
                algorithmic_latency_ms=round(scfg.algorithmic_latency_s * 1e3, 3),
                **stats,
            )
        )
    )
    return 0


def realtime_main(argv=None):
    """Headless realtime app (reference runRealtimeGCCNMF.py --no-gui:
    argparse surface at realtime/config.py:122-127)."""
    ap = argparse.ArgumentParser(description="Realtime GCC-NMF app (headless)")
    ap.add_argument("-i", "--input", default=None, help="input WAV path")
    ap.add_argument("-c", "--config", default=None, help="INI config file")
    ap.add_argument("-o", "--output", default=None, help="output WAV path")
    ap.add_argument("--no-gui", action="store_true",
                    help="accepted for reference-CLI compatibility; headless "
                         "is the default")
    ap.add_argument("--gui", action="store_true",
                    help="open the interactive tkinter/matplotlib window "
                         "(requires a display)")
    ap.add_argument("--blocks", type=int, default=None,
                    help="stop after N blocks (default: whole file)")
    ap.add_argument("--loop", action="store_true", help="loop the input file")
    ap.add_argument("--no-loop", action="store_true",
                    help="with --gui: stop at end of file instead of looping "
                         "(the GUI loops by default, like the reference's "
                         "realtime window, audioProcessor.py:109-110)")
    ap.add_argument("--realtime-pace", action="store_true",
                    help="pace blocks at the 32 ms deadline")
    ap.add_argument("--pipeline-depth", type=int, default=0,
                    help="blocks of dispatch pipelining: N>0 removes the "
                         "host<->device round trip from the per-block "
                         "deadline path at the cost of N blocks of extra "
                         "latency (output file is identical)")
    ap.add_argument("--dictionary-file", default=None,
                    help=".npy (F, K) dictionary artifact (bypasses "
                         "pretraining; e.g. from gccnmf-pretrain --save-dir)")
    ap.add_argument("--live", action="store_true",
                    help="capture input from the live audio device instead "
                         "of a WAV file (requires a host audio stack, e.g. "
                         "sounddevice; reference audioProcessor.py input "
                         "callback)")
    ap.add_argument("--live-output", action="store_true",
                    help="play enhanced audio through the live output "
                         "device when a host audio stack exists (reference "
                         "audioProcessor.py:106-132); falls back to "
                         "--output/-o (or discard) otherwise")
    ap.add_argument("--streamed-output", action="store_true",
                    help="write -o incrementally (O(block) host RAM for "
                         "hour-scale runs; per-sample clipping instead of "
                         "the whole-file clip rescale)")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)
    if args.verbose:
        logging.basicConfig(level=logging.INFO)
    from gccnmf_tpu.config import load_config

    cfg = load_config(args.config, audio_path=args.input,
                      dictionary_file=args.dictionary_file)
    if args.gui:
        from gccnmf_tpu.gui import run_gui

        # GUI loops playback by default like the reference realtime window
        # (audioProcessor.py:109-110 wraps sampleIndex to 0); --no-loop opts
        # out. The built config carries --dictionary-file through.
        run_gui(args.input, config=cfg, loop=not args.no_loop)
        return 0
    source = None
    if args.live:
        from gccnmf_tpu.realtime.audio import open_input_stream

        source = open_input_stream(
            cfg.sample_rate, cfg.num_channels, cfg.block_size
        )
        if source is None:
            ap.error(
                "--live requires a host audio stack (sounddevice); none is "
                "available — use -i <wav> for file input"
            )
        if args.blocks is None:
            ap.error("--live requires --blocks (otherwise the run never ends)")
    elif args.loop and args.blocks is None:
        ap.error("--loop requires --blocks (otherwise the run never ends)")

    from gccnmf_tpu.realtime.app import RealtimeGCCNMF

    app = RealtimeGCCNMF(
        args.input, config=cfg, pipeline_depth=args.pipeline_depth
    )
    try:
        stats = app.run(
            output_path=args.output,
            num_blocks=args.blocks,
            loop=args.loop,
            realtime=args.realtime_pace,
            source=source,
            live_output=args.live_output,
            streamed_output=args.streamed_output,
        )
    finally:
        if source is not None:
            source.close()
    print(json.dumps(stats))
    return 0


def serve_main(argv=None):
    """Multi-stream serving: one stream per input WAV, lockstep ticks.

    The serving-scale analogue of ``gccnmf-realtime`` (no reference
    equivalent — the reference serves one stream per process). Streams
    whose files end close early; ticks continue until all streams drain.
    """

    ap = argparse.ArgumentParser(description="Multi-stream GCC-NMF server")
    ap.add_argument("-i", "--inputs", nargs="+", required=True,
                    help="input WAV paths (one stream each)")
    ap.add_argument("-o", "--output-dir", default=".",
                    help="directory for <name>_enhanced.wav outputs")
    ap.add_argument("-c", "--config", default=None, help="INI config file")
    ap.add_argument("--dictionary-file", default=None,
                    help=".npy (F, K) dictionary artifact (bypasses "
                         "pretraining)")
    ap.add_argument("--max-streams", type=int, default=None,
                    help="slot count (default: number of inputs)")
    ap.add_argument("--dictionary-size", type=int, default=None)
    ap.add_argument("--blocks", type=int, default=None,
                    help="stop each stream after N blocks")
    ap.add_argument("--pipeline-depth", type=int, default=2,
                    help="ticks of dispatch pipelining: N>0 moves the "
                         "host<->device round trip off the tick deadline "
                         "path at the cost of N blocks of serving latency. "
                         "Default 2 — the measured operating point "
                         "(docs/scaling/serving_capacity.json): with the "
                         "async fetch thread it serves the deadline-safe "
                         "tenancy at 2 blocks (64 ms) of added latency; "
                         "0 restores strictly synchronous ticks")
    ap.add_argument("--sync-fetch", action="store_true",
                    help="block each tick on its due output instead of "
                         "fetching on the consumer thread (diagnostic; "
                         "the async default keeps transport latency "
                         "spikes off the tick deadline path)")
    ap.add_argument("--wire-dtype", choices=["float32", "int16"],
                    default="float32",
                    help="int16 ships tick blocks/outputs as 16-bit PCM "
                         "(half the link bytes — the per-tick driver at "
                         "high tenancy); outputs are quantized exactly "
                         "as the WAV writer would quantize them")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)
    if args.verbose:
        logging.basicConfig(level=logging.INFO)

    from gccnmf_tpu import pretrain
    from gccnmf_tpu.config import load_config
    from gccnmf_tpu.models.realtime import StreamConfig
    from gccnmf_tpu.serving import StreamServer
    from gccnmf_tpu.utils import wav as wavio

    cfg = load_config(args.config, dictionary_file=args.dictionary_file)
    dict_size = args.dictionary_size or cfg.dictionary_size
    scfg = StreamConfig.from_app_config(cfg)
    if args.max_streams is not None and args.max_streams < len(args.inputs):
        # every input claims a slot for its whole run; queueing excess
        # inputs is not implemented, so reject instead of crashing on the
        # (len(inputs)+1)-th open_stream with a raw RuntimeError
        ap.error(
            f"--max-streams {args.max_streams} < {len(args.inputs)} inputs "
            "(each input holds a slot for its whole run)"
        )
    w = _resolve_dictionary(cfg, size=dict_size)
    server = StreamServer(
        w, scfg, max_streams=args.max_streams or len(args.inputs),
        pipeline_depth=args.pipeline_depth,
        async_fetch=not args.sync_fetch,
        wire_dtype=args.wire_dtype,
    )

    from gccnmf_tpu.serving import StreamSettings

    streams = {}
    for path in args.inputs:
        audio, sr = wavio.read_wav(path)
        if sr != scfg.sample_rate:
            raise SystemExit(f"{path}: sample rate {sr} != {scfg.sample_rate}")
        if audio.ndim != 2 or audio.shape[0] != scfg.num_channels:
            raise SystemExit(
                f"{path}: expected {scfg.num_channels}-channel audio, got "
                f"shape {audio.shape} (GCC-PHAT needs a stereo pair)"
            )
        nb = audio.shape[-1] // scfg.block_size
        if args.blocks:
            nb = min(nb, args.blocks)
        # broadside mask center for THIS grid (StreamSettings' 32 is only
        # the middle of the default 64-TDOA grid)
        sid = server.open_stream(
            StreamSettings(target_tdoa_index=scfg.num_tdoas / 2.0)
        )
        streams[sid] = dict(path=path, audio=audio, nb=nb, sub=0, out=[])
        if nb == 0:  # shorter than one block: nothing to process
            server.close_stream(sid)

    def collect(tick_out):
        for sid, block in tick_out.items():
            s = streams[sid]
            s["out"].append(block)
            if len(s["out"]) >= s["nb"]:
                server.close_stream(sid)

    # submission position and received count diverge under pipelining
    # (outputs lag dispatch by pipeline_depth ticks); flush() drains the
    # tail after the last submit, like the single-stream app's run()
    live = {sid for sid, s in streams.items() if s["nb"] > 0}
    while live:
        subs = {}
        for sid in list(live):
            s = streams[sid]
            b = s["sub"]
            subs[sid] = s["audio"][:, b * scfg.block_size:(b + 1) * scfg.block_size]
            s["sub"] += 1
            if s["sub"] >= s["nb"]:
                live.discard(sid)
        collect(server.process(subs))
    for tick_out in server.flush():
        collect(tick_out)
    server.close()  # stop the async fetch worker (no-op in --sync-fetch)

    os.makedirs(args.output_dir, exist_ok=True)
    outputs = []
    used = set()
    for sid, s in streams.items():
        name = os.path.splitext(os.path.basename(s["path"]))[0]
        stem, k = name, 1
        while stem in used:  # same-named inputs: disambiguate
            k += 1
            stem = f"{name}_{k}"
        used.add(stem)
        path = os.path.join(args.output_dir, f"{stem}_enhanced.wav")
        audio_out = (np.concatenate(s["out"], axis=-1) if s["out"]
                     else np.zeros((scfg.num_channels, 0), np.float32))
        wavio.write_wav(audio_out, path, scfg.sample_rate)
        outputs.append(path)
    # the server's own serving-clock accounting (ticks, deadline_misses,
    # bounded-window tick times) — the multi-tenant analogue of
    # gccnmf-realtime's deadline_misses output
    print(json.dumps(dict(
        outputs=outputs,
        streams=len(streams),
        **server.tick_stats(),
    )))
    return 0


def pretrain_main(argv=None):
    """Pre-learn NMF dictionaries from a WAV corpus.

    The reference pretrains every size up front from a bundled corpus on
    first launch (gccNMFPretraining.py:43-58, chimeTrainSet.npy — a
    missing blob in the snapshot). This makes the step an explicit,
    deployable command. Two outputs:

    - the corpus-keyed artifact cache (reused automatically only by runs
      with the SAME corpus/iterations/seed — the key is deliberately
      strict to prevent stale reuse);
    - with ``--save-dir``, stable ``W_<size>.npy`` artifacts (the
      reference's own pretrainedW naming, gccNMFPretraining.py:36-37)
      that every entry point loads via ``--dictionary-file`` /
      ``dictionaryFile`` — the production handoff.
    """
    ap = argparse.ArgumentParser(
        description="Pre-learn GCC-NMF dictionaries from a WAV corpus"
    )
    ap.add_argument("wavs", nargs="+", help="training WAV paths")
    ap.add_argument("--sizes", type=int, nargs="+", default=[64, 128, 256],
                    help="dictionary sizes (atoms) to train")
    ap.add_argument("--window-size", type=int, default=1024)
    ap.add_argument("--hop-size", type=int, default=512,
                    help="corpus framing hop (reference pretrains at "
                         "window/2)")
    ap.add_argument("--num-iterations", type=int, default=None,
                    help="KL-NMF iterations (default: "
                         "GCCNMF_TPU_PRETRAIN_ITERS or 100)")
    ap.add_argument("--max-frames", type=int, default=None,
                    help="cap the corpus frame count (uniform subsample)")
    ap.add_argument("--cache-dir", default=None,
                    help="artifact cache directory (default: "
                         "GCCNMF_TPU_CACHE_DIR or the package cache)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save-dir", default=None,
                    help="also export stable W_<size>.npy artifacts here "
                         "(consumed via --dictionary-file / dictionaryFile)")
    ap.add_argument("--data-shards", type=int, default=0,
                    help="train over an N-device data-parallel mesh "
                         "(time-sharded V/H, psum-synced W)")
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args(argv)
    if args.verbose:
        logging.basicConfig(level=logging.INFO)

    from gccnmf_tpu import pretrain

    corpus = pretrain.training_corpus_from_wavs(
        args.wavs, args.window_size, args.hop_size, max_frames=args.max_frames
    )
    mesh = None
    if args.data_shards:
        import jax

        from gccnmf_tpu.parallel import mesh as mesh_lib

        mesh = mesh_lib.make_mesh(
            data=args.data_shards, model=1,
            devices=jax.devices()[: args.data_shards],
        )
    trained = {}
    saved = []
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)
    for size in args.sizes:
        w = pretrain.pretrain_dictionary(
            corpus, size, num_iterations=args.num_iterations,
            cache_dir=args.cache_dir, window_size=args.window_size,
            mesh=mesh, seed_value=args.seed,
        )
        trained[size] = list(w.shape)
        if args.save_dir:
            path = os.path.join(args.save_dir, f"W_{size}.npy")
            np.save(path, w)
            saved.append(path)
    print(json.dumps(dict(
        corpus_frames=int(corpus.shape[0]),
        num_freq=int(corpus.shape[1]),
        dictionaries={str(k): v for k, v in trained.items()},
        cache_dir=args.cache_dir or "(default)",
        saved=saved,
    )))
    return 0


if __name__ == "__main__":
    sys.exit(separate_main())
