#!/usr/bin/env python
"""Offline speech enhancement (reference notebook: speechEnhancement.ipynb).

Whole-utterance enhancement with a pre-learned dictionary: localize the
target from the time-averaged angular spectrum, attribute atoms per frame,
soft generalized-Gaussian coefficient mask, Wiener TF mask.

Run:  python examples/offline_enhancement.py [noisy.wav]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gccnmf_tpu import defs, pretrain
from gccnmf_tpu.models.offline import GCCNMFEnhancer, OfflineConfig
from gccnmf_tpu.utils import wav


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=defs.DEFAULT_AUDIO_FILE)
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--dictionary-size", type=int, default=64)
    args = ap.parse_args()

    stereo, sr = wav.read_wav(args.input)
    banks = pretrain.get_dictionaries(1024, sizes=(args.dictionary_size,))
    w = banks["Pretrained"][args.dictionary_size]

    enhancer = GCCNMFEnhancer(
        w, OfflineConfig(sample_rate=sr, mic_separation_m=0.1, num_tdoas=64)
    )
    result = enhancer.enhance(stereo)
    print("localized target TDOA index:", int(result["target_tdoa_index"]))
    out = args.output or args.input.rsplit(".", 1)[0] + "_enhanced.wav"
    wav.write_wav(result["enhanced"], out, sr)
    print("wrote", out)


if __name__ == "__main__":
    main()
