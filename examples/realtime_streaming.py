#!/usr/bin/env python
"""Real-time streaming RT-GCC-NMF (reference notebook:
realtimeSpeechEnhancement.ipynb and runRealtimeGCCNMF.py).

Drives the headless realtime app block-by-block at the 32 ms deadline,
logging per-block processing times — add ``--gui`` for the interactive
window (needs a display).

Run:  python examples/realtime_streaming.py [mix.wav] [--gui]
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gccnmf_tpu import defs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input", nargs="?", default=defs.DEFAULT_AUDIO_FILE)
    ap.add_argument("-o", "--output", default=None)
    ap.add_argument("--gui", action="store_true")
    ap.add_argument("--blocks", type=int, default=None)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    if args.gui:
        from gccnmf_tpu.gui import run_gui

        run_gui(args.input)
        return

    from gccnmf_tpu.realtime.app import RealtimeGCCNMF

    app = RealtimeGCCNMF(args.input)
    out = args.output or args.input.rsplit(".", 1)[0] + "_rt.wav"
    stats = app.run(output_path=out, num_blocks=args.blocks, realtime=True)
    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
