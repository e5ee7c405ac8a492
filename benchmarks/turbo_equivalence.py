"""Turbo-mode equivalence study across every bundled WAV.

For each of the six reference-bundled mixtures, separates with the
pipeline default (`bfloat16_q`, reference update rule) and with the
shared-Q simultaneous turbo mode (`bfloat16_q_simul`), then compares:

- localization: the per-source target TDOA indexes must match exactly
  (the masks are argmax decisions over these);
- waveform agreement: per-source SNR of turbo vs default output;
- PESQ of turbo output against the default output (perceptual
  transparency of the algorithm swap).

This is the evidence behind the documented decision on turbo's default
status (docs/DESIGN.md "Shared-Q turbo NMF"): results are committed to
``docs/turbo_equivalence.json``.

Run on the real chip: python benchmarks/turbo_equivalence.py
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_GLOB = "/root/reference/data/*.wav"


def main():
    from gccnmf_tpu.metrics import pesq, snr
    from gccnmf_tpu.models.offline import GCCNMFSeparator, OfflineConfig
    from gccnmf_tpu.utils import wav as wavio

    results = {}
    for path in sorted(glob.glob(DATA_GLOB)):
        name = os.path.basename(path)
        stereo, sr = wavio.read_wav(path)
        cfg = OfflineConfig(sample_rate=sr)
        default = GCCNMFSeparator(cfg).separate(stereo, num_sources=3)
        turbo = GCCNMFSeparator(
            dataclasses.replace(cfg, nmf_matmul_dtype="bfloat16_q_simul")
        ).separate(stereo, num_sources=3)

        d_targets = [int(x) for x in default["target_tdoa_indexes"]]
        t_targets = [int(x) for x in turbo["target_tdoa_indexes"]]
        entry = dict(
            targets_default=d_targets,
            targets_turbo=t_targets,
            localization_identical=d_targets == t_targets,
        )
        if d_targets == t_targets:
            d_est = np.asarray(default["estimates"])
            t_est = np.asarray(turbo["estimates"])
            n = min(d_est.shape[-1], t_est.shape[-1])
            snrs, pesqs = [], []
            for i in range(d_est.shape[0]):
                snrs.append(round(float(
                    snr(d_est[i][..., :n], t_est[i][..., :n])
                ), 2))
                try:
                    pesqs.append(round(float(pesq(
                        d_est[i][..., :n].mean(axis=0),
                        np.asarray(t_est[i][..., :n]).mean(axis=0),
                        sr,
                    )), 2))
                except Exception as e:
                    pesqs.append(f"error: {e}")
            entry["snr_turbo_vs_default_db"] = snrs
            entry["pesq_turbo_vs_default"] = pesqs
        results[name] = entry
        print(json.dumps({name: entry}), flush=True)

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "turbo_equivalence.json",
    )
    from gccnmf_tpu.utils.stamp import run_stamp

    results["stamp"] = run_stamp()
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(dict(saved=out_path)))


if __name__ == "__main__":
    main()
