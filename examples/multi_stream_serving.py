"""Multi-stream serving: enhance many independent streams in lockstep.

Opens several streams with different per-stream settings on one
StreamServer (one compiled device step for all tenants), feeds each a
different section of the input file, and writes per-stream outputs.

This has no reference analogue — the reference serves exactly one stream
per process (gccNMF/realtime/runRealtimeGCCNMF.py); the fixed-slot
lockstep batch is the TPU-native scale-out of its audio/DSP process pair.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

from gccnmf_tpu import defs, pretrain
from gccnmf_tpu.models.realtime import StreamConfig
from gccnmf_tpu.serving import StreamServer, StreamSettings
from gccnmf_tpu.utils import wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=defs.DEFAULT_AUDIO_FILE)
    ap.add_argument("-o", "--output-prefix", default=None)
    ap.add_argument("--streams", type=int, default=4)
    ap.add_argument("--dictionary-size", type=int, default=64)
    ap.add_argument("--blocks", type=int, default=None)
    args = ap.parse_args()

    stereo, sr = wav.read_wav(args.input)
    cfg = StreamConfig(sample_rate=sr)
    banks = pretrain.get_dictionaries(cfg.window_size, sizes=(args.dictionary_size,))
    w = banks["Pretrained"][args.dictionary_size]

    # production shape: 2 ticks of dispatch pipelining with the fetch on
    # a consumer thread (a link latency spike delays one delivery instead
    # of stalling every tenant); int16 wire halves the per-tick link
    # bytes — see gccnmf-serve --pipeline-depth/--wire-dtype
    server = StreamServer(
        w, cfg, max_streams=args.streams, pipeline_depth=2,
        async_fetch=True, wire_dtype="int16",
    )
    # each stream gets a different mask sharpness; the last one passes through
    ids = []
    for i in range(args.streams):
        if i == args.streams - 1:
            ids.append(server.open_stream(StreamSettings(separation_enabled=False)))
        else:
            ids.append(server.open_stream(StreamSettings(target_epsilon=2.0 + 2.0 * i)))

    total_blocks = stereo.shape[-1] // cfg.block_size
    if total_blocks == 0:
        raise SystemExit(
            f"input shorter than one block ({cfg.block_size} samples)"
        )
    num_blocks = total_blocks
    if args.blocks:
        num_blocks = min(num_blocks, args.blocks)
    # each stream reads its own section of the file (wrapping), so the
    # tenants genuinely process different audio in lockstep
    offsets = [
        (i * total_blocks) // args.streams for i in range(args.streams)
    ]
    outputs = {sid: [] for sid in ids}

    def collect(tick_out):
        for sid, block in tick_out.items():
            outputs[sid].append(block)

    for b in range(num_blocks):
        subs = {}
        for i, sid in enumerate(ids):
            pos = (offsets[i] + b) % total_blocks
            subs[sid] = stereo[:, pos * cfg.block_size : (pos + 1) * cfg.block_size]
        collect(server.process(subs))  # {} while the pipeline fills
    for tail in server.flush():  # drain the 2 inflight ticks
        collect(tail)
    server.close()

    prefix = args.output_prefix or args.input.rsplit(".", 1)[0]
    for i, sid in enumerate(ids):
        path = f"{prefix}_stream{i}.wav"
        wav.write_wav(np.concatenate(outputs[sid], axis=-1), path, sr)
        print("wrote", path, "telemetry:", server.telemetry[sid])


if __name__ == "__main__":
    main()
