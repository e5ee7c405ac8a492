#!/usr/bin/env python
"""Online (frame-causal) speech enhancement (reference notebook:
onlineSpeechEnhancement.ipynb).

Uses a pre-learned dictionary and causal GCC-PHAT smoothing: each frame is
masked using only past information, the streaming-friendly formulation.

Run:  python examples/online_enhancement.py [noisy.wav]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gccnmf_tpu import defs, pretrain
from gccnmf_tpu.models.online import OnlineConfig, OnlineGCCNMFEnhancer
from gccnmf_tpu.utils import wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=defs.DEFAULT_AUDIO_FILE)
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--dictionary-size", type=int, default=64)
    ap.add_argument("--num-h-updates", type=int, default=0)
    args = ap.parse_args()

    stereo, sr = wav.read_wav(args.input)
    banks = pretrain.get_dictionaries(1024, sizes=(args.dictionary_size,))
    w = banks["Pretrained"][args.dictionary_size]

    enhancer = OnlineGCCNMFEnhancer(
        w, OnlineConfig(sample_rate=sr, num_h_updates=args.num_h_updates)
    )
    result = enhancer.enhance(stereo)
    out = args.output or args.input.rsplit(".", 1)[0] + "_online_enhanced.wav"
    wav.write_wav(result["enhanced"], out, sr)
    print("wrote", out)


if __name__ == "__main__":
    main()
