#!/usr/bin/env python
"""Offline blind speech separation (reference notebook: speechSeparation.ipynb,
and gccNMF/runGCCNMF.py with its demo parameters).

Separates the bundled 3-speaker stereo mixture into per-speaker WAVs and
plots the GCC-PHAT localization and NMF decomposition.

Run:  python examples/offline_separation.py [mixture.wav] [--plots out/]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gccnmf_tpu import defs, viz
from gccnmf_tpu.models.offline import GCCNMFSeparator, OfflineConfig
from gccnmf_tpu.ops import gcc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mixture", nargs="?", default=defs.DEFAULT_SEPARATION_FILE)
    ap.add_argument("--plots", default=None, help="directory for figures")
    ap.add_argument("--num-sources", type=int, default=3)
    args = ap.parse_args()

    cfg = OfflineConfig(num_sources=args.num_sources)
    separator = GCCNMFSeparator(cfg)
    result = separator.separate_file(args.mixture)

    print("localized target TDOA indexes:", result["target_tdoa_indexes"])
    for path in result["paths"]:
        print("wrote", path)
    viz.describe_nmf(result["w"], result["h"])

    if args.plots:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(args.plots, exist_ok=True)
        mean_ang = np.asarray(result["angular"]).mean(axis=-2)
        viz.plot_localization(mean_ang, result["target_tdoa_indexes"])
        plt.savefig(os.path.join(args.plots, "localization.png"))
        plt.close("all")
        fig = viz.plot_nmf_decomposition(result["w"], result["h"])
        fig.savefig(os.path.join(args.plots, "nmf.png"))
        plt.close("all")
        fig = viz.plot_coefficient_masks(result["coefficient_masks"])
        fig.savefig(os.path.join(args.plots, "masks.png"))
        plt.close("all")
        print("figures in", args.plots)


if __name__ == "__main__":
    main()
