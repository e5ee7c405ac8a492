"""Render the PESQ calibration degradation curves (committed artifact).

Generates the three canonical degradation families the P.862 literature
characterizes and plots this clean-room model's MOS-LQO against the bands
published studies report, anchoring the calibration claim in
gccnmf_tpu/pesq_p862.py (VERDICT r2 item 5):

- additive white noise, SNR 0..40 dB (P.862 studies: ~4.2 at 40 dB down
  to ~1.5-2.3 at 0 dB);
- MNRU (ITU-T P.810 modulated noise reference unit), Q 5..45 dB — the
  speech-correlated multiplicative degradation PESQ was trained on
  (published behavior: MOS-LQO roughly linear in Q, ~1.5 at Q=5 to
  saturation above Q=40);
- lowpass bandwidth reduction, cutoff 1..7 kHz (wideband mode punishes
  bandwidth loss: ~2 at 1 kHz rising to near-clean at 7 kHz).

Outputs ``docs/pesq_curves.png`` and ``docs/pesq_curves.json`` (the raw
numbers, for the pinned assertions in tests/test_metrics.py::TestPesqCurves).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import os

import numpy as np

from gccnmf_tpu import metrics

SR = 16000

# published-behavior anchor bands (min, max MOS-LQO) — wide on purpose:
# implementation-level offsets of a few tenths of a MOS are expected for
# any non-ITU-code implementation (see pesq_p862.py docstring).
# Anchor points: P.862 studies report additive white noise ~4.2-4.5 at
# 40 dB SNR down to ~1.4-1.9 at 0 dB; wideband MNRU MOS-LQO roughly
# linear in Q from ~1.5 at Q=5-10 to saturation above Q=40; and
# PESQ-WB of narrowband (~3.4 kHz) speech ~3.3-3.6, dropping steeply for
# narrower bandwidths.
NOISE_BANDS = {40: (3.9, 4.6), 30: (3.2, 4.3), 20: (2.4, 3.6),
               10: (1.5, 2.8), 0: (1.0, 2.2)}
MNRU_BANDS = {5: (1.0, 2.2), 15: (1.8, 3.1), 25: (2.9, 4.2),
              35: (3.7, 4.6), 45: (4.0, 4.7)}
LOWPASS_BANDS = {1000: (1.2, 2.6), 2000: (1.8, 3.2), 3000: (2.6, 3.8),
                 4000: (3.1, 4.2), 5000: (3.4, 4.5), 7000: (4.0, 4.7)}


def speech_like(seconds=8.0, sr=SR, seed=0):
    """Segment-structured synthetic utterance: silences, formant-filtered
    voiced vowels with time-varying f0, shaped fricative bursts.

    Degradation audibility depends on the time-frequency *sparsity* real
    speech has (silent gaps, clean harmonic valleys, spectral variety): a
    plain periodic test tone hides modulated noise (measured: MNRU Q=15
    scored 1.2 MOS higher on a periodic two-tone signal than on this
    utterance). This construction supplies that sparsity with a fixed
    seed, so the committed curves are deterministic."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    out = np.zeros(n)
    pos = 0
    formant_sets = [(700, 1200, 2600), (300, 2300, 3000), (500, 1000, 2500),
                    (400, 2000, 2800), (600, 1700, 2400)]
    while pos < n:
        kind = rng.choice(["sil", "vowel", "vowel", "fric"])
        dur = int(sr * rng.uniform(0.06, 0.28))
        seg = np.zeros(dur)
        if kind == "vowel":
            f0 = rng.uniform(90, 220)
            t = np.arange(dur) / sr
            f0_tr = f0 * (1 + 0.08 * np.sin(2 * np.pi * rng.uniform(1, 4) * t))
            phase = np.cumsum(2 * np.pi * f0_tr / sr)
            src_h = sum(np.sin(k * phase) / k for k in range(1, 40))
            spec = np.fft.rfft(src_h)
            f = np.fft.rfftfreq(dur, 1 / sr)
            shape = sum(
                np.exp(-0.5 * ((f - fc) / 120.0) ** 2)
                for fc in formant_sets[rng.integers(len(formant_sets))]
            )
            seg = np.fft.irfft(spec * (0.05 + shape), n=dur)
            seg *= np.hanning(dur) ** 0.3
        elif kind == "fric":
            noise = rng.standard_normal(dur)
            spec = np.fft.rfft(noise)
            f = np.fft.rfftfreq(dur, 1 / sr)
            fc = rng.uniform(2500, 6000)
            spec *= np.exp(-0.5 * ((f - fc) / 1500.0) ** 2)
            seg = np.fft.irfft(spec, n=dur) * 0.25
            seg *= np.hanning(dur) ** 0.5
        take = min(dur, n - pos)
        out[pos : pos + take] = seg[:take] * rng.uniform(0.5, 1.0)
        pos += take
    return out / np.abs(out).max()


def additive_noise(x, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    n = rng.standard_normal(x.size)
    n *= np.sqrt((x ** 2).mean() / (n ** 2).mean()) * 10 ** (-snr_db / 20)
    return x + n


def mnru(x, q_db, seed=2):
    """ITU-T P.810 MNRU: y = x * (1 + 10^(-Q/20) * N), N ~ unit Gaussian —
    speech-correlated multiplicative noise at Q dB."""
    rng = np.random.default_rng(seed)
    return x * (1.0 + 10 ** (-q_db / 20.0) * rng.standard_normal(x.size))


def lowpass(x, cutoff_hz, sr=SR):
    """Zero-phase FFT brickwall lowpass (bandwidth-reduction degradation)."""
    spec = np.fft.rfft(x)
    f = np.fft.rfftfreq(x.size, 1.0 / sr)
    spec[f > cutoff_hz] = 0.0
    return np.fft.irfft(spec, n=x.size)


def compute_curves():
    x = speech_like()
    curves = {
        "additive_noise_snr_db": {
            str(snr): round(float(metrics.pesq(x, additive_noise(x, snr), SR)), 3)
            for snr in sorted(NOISE_BANDS)
        },
        "mnru_q_db": {
            str(q): round(float(metrics.pesq(x, mnru(x, q), SR)), 3)
            for q in sorted(MNRU_BANDS)
        },
        "lowpass_cutoff_hz": {
            str(c): round(float(metrics.pesq(x, lowpass(x, c), SR)), 3)
            for c in sorted(LOWPASS_BANDS)
        },
        "identity": round(float(metrics.pesq(x, x, SR)), 3),
    }
    return curves


def render(curves, out_png):
    import matplotlib

    matplotlib.use("Agg", force=True)
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(13, 4), dpi=110)
    panels = [
        ("additive_noise_snr_db", NOISE_BANDS, "additive white noise",
         "SNR (dB)"),
        ("mnru_q_db", MNRU_BANDS, "MNRU (P.810)", "Q (dB)"),
        ("lowpass_cutoff_hz", LOWPASS_BANDS, "lowpass bandwidth", "cutoff (Hz)"),
    ]
    for ax, (key, bands, title, xlabel) in zip(axes, panels):
        xs = sorted(int(k) for k in curves[key])
        ys = [curves[key][str(k)] for k in xs]
        los = [bands[k][0] for k in xs]
        his = [bands[k][1] for k in xs]
        ax.fill_between(xs, los, his, color="tab:blue", alpha=0.15,
                        label="published-behavior band")
        ax.plot(xs, ys, "o-", color="tab:blue", label="this implementation")
        ax.set_title(title, fontsize=10)
        ax.set_xlabel(xlabel, fontsize=9)
        ax.set_ylim(1.0, 4.8)
        ax.grid(alpha=0.3)
    axes[0].set_ylabel("MOS-LQO")
    axes[0].legend(fontsize=8, loc="upper left")
    fig.suptitle(
        "Clean-room P.862 calibration: canonical degradation curves vs "
        "published behavior",
        fontsize=11,
    )
    fig.tight_layout()
    fig.savefig(out_png)
    return out_png


def main():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    curves = compute_curves()
    png = render(curves, os.path.join(here, "docs", "pesq_curves.png"))
    jpath = os.path.join(here, "docs", "pesq_curves.json")
    with open(jpath, "w") as fh:
        json.dump(curves, fh, indent=1)
    print(json.dumps({"png": png, "json": jpath, **curves}))


if __name__ == "__main__":
    main()
