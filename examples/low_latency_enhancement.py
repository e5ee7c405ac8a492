#!/usr/bin/env python
"""Low-latency speech enhancement with asymmetric STFT windows (reference
notebook: lowLatencySpeechEnhancement.ipynb; README.md:78's "<2 ms" claim).

The analysis window keeps a long (1024-sample) rise for frequency
resolution; the synthesis window is nonzero only over its final
``synthesis_length`` samples, so a sample is overlap-add-complete
``synthesis_length - hop`` samples after it arrives. With block_size=hop=32
and synthesis_length=64 the algorithmic latency is (64-32+32)/16000 = 4 ms;
shrink both to approach the paper's 2 ms operating point.

Run:  python examples/low_latency_enhancement.py [noisy.wav]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gccnmf_tpu import defs, pretrain
from gccnmf_tpu.models.realtime import RTGCCNMFProcessor, StreamConfig, StreamParams
from gccnmf_tpu.utils import wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=defs.DEFAULT_AUDIO_FILE)
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--hop", type=int, default=32)
    ap.add_argument("--synthesis-length", type=int, default=64)
    ap.add_argument("--dictionary-size", type=int, default=64)
    args = ap.parse_args()

    stereo, sr = wav.read_wav(args.input)
    banks = pretrain.get_dictionaries(1024, sizes=(args.dictionary_size,))
    w = banks["Pretrained"][args.dictionary_size]

    cfg = StreamConfig(
        sample_rate=sr,
        hop_size=args.hop,
        block_size=args.hop,  # emit every hop: minimal block latency
        synthesis_length=args.synthesis_length,
        analysis_window="asymmetric",
    )
    print(f"algorithmic latency: {cfg.algorithmic_latency_s * 1e3:.2f} ms")
    proc = RTGCCNMFProcessor(w, cfg)
    out = proc.enhance_signal(stereo, StreamParams.default())[0]
    path = args.output or args.input.rsplit(".", 1)[0] + "_lowlatency.wav"
    wav.write_wav(out, path, sr)
    print("wrote", path)


if __name__ == "__main__":
    main()
