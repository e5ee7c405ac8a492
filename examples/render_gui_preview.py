"""Render the realtime GUI's figure headlessly to a PNG.

The window's entire rendering layer (:class:`gccnmf_tpu.gui.GCCNMFFigureView`)
is backend-agnostic, so the full six-panel display — spectrogram waterfalls,
GCC-PHAT waterfall with the TDOA track, centroid-ordered dictionary,
per-size coefficient-mask waterfall, and the mask-function editor with the
generalized-Gaussian curve over the live mean GCC-PHAT — can be produced
on the Agg backend with no display attached (useful for docs, CI, and
remote hosts).
"""

import argparse

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg", force=True)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mixture", nargs="?", default=None)
    ap.add_argument("-o", "--output", default="gui_preview.png")
    ap.add_argument("--blocks", type=int, default=40,
                    help="audio blocks to stream before the snapshot")
    ap.add_argument("--dictionary-size", type=int, default=64)
    args = ap.parse_args()

    from matplotlib.backends.backend_agg import FigureCanvasAgg
    from matplotlib.figure import Figure

    from gccnmf_tpu import defs
    from gccnmf_tpu.config import load_config
    from gccnmf_tpu.gui import GCCNMFFigureView
    from gccnmf_tpu.realtime.app import RealtimeGCCNMF
    from gccnmf_tpu.realtime.audio import FilePlayerSource

    audio = args.mixture or defs.DEFAULT_AUDIO_FILE
    app = RealtimeGCCNMF(
        audio,
        config=load_config(
            None,
            audio_path=audio,
            dictionary_size=args.dictionary_size,
            dictionary_sizes=(args.dictionary_size,),
        ),
    )
    fig = Figure(figsize=(11, 7), dpi=90)
    FigureCanvasAgg(fig)
    view = GCCNMFFigureView(fig, app)

    source = FilePlayerSource(audio, app.config.block_size)
    for i, block in enumerate(source.blocks()):
        app.process_block(np.asarray(block))
        if i + 1 >= args.blocks:
            break
    view.refresh()
    fig.savefig(args.output)
    print("wrote", args.output)


if __name__ == "__main__":
    main()
