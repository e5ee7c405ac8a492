"""Static per-iteration collective-volume accounting for the distributed
paths.

Everything here is computable from shapes — no devices needed — and is
the part of the scaling story that IS predictable from this single-chip
environment (ICI latency/bandwidth behavior is not; see SCALING.md).
Byte counts use the ring-algorithm cost model: an all-reduce of a
B-byte buffer over p devices moves ``2*B*(p-1)/p`` bytes per device; an
all-gather whose RESULT is B bytes moves ``B*(p-1)/p`` per device; a
ppermute moves exactly its payload.

Covered:
- ``kl_nmf_sharded`` (parallel/nmf_sharded.py): per-iteration psums of
  the reconstruction (model axis), the W statistics (data axis), and the
  H all_gather (model axis) — including the turbo mode's saved
  reconstruction psum + all_gather;
- ``LongAudioSeparator`` (parallel/long_audio.py): per-iteration W-stat
  psums, the one-off localization psum, and the per-boundary ISTFT seam
  ppermute.

Run: python benchmarks/collectives.py [--json]
"""

from __future__ import annotations

import argparse
import json

F32 = 4


def _allreduce_bytes(buf_bytes: float, p: int) -> float:
    return 2.0 * buf_bytes * (p - 1) / p if p > 1 else 0.0


def _allgather_bytes(result_bytes: float, p: int) -> float:
    return result_bytes * (p - 1) / p if p > 1 else 0.0


def nmf_sharded_per_iteration(
    t: int, f: int, k: int, dp: int, mp: int, simultaneous: bool = False
) -> dict:
    """Per-device bytes moved per NMF iteration in kl_nmf_sharded.

    Shapes follow parallel/nmf_sharded.py: V (T, F) time-sharded over
    ``dp``; W (F, K) atom-sharded over ``mp``; H (T, K) time-sharded,
    atom-replicated.
    """
    t_local = t / dp
    k_local = k / mp
    recon_psum = _allreduce_bytes(t_local * f * F32, mp)  # V/WH reconstruction
    h_gather = _allgather_bytes(t_local * k * F32, mp)  # updated H blocks
    w_num_psum = _allreduce_bytes(f * k_local * F32, dp)  # einsum(q, h) stats
    w_den_psum = _allreduce_bytes(k_local * F32, dp)
    per_iter = {
        # one reconstruction psum feeds the H update; the second (W-update)
        # reconstruction and its mid-body H regather are what turbo removes
        "recon_psum_model": recon_psum * (1 if simultaneous else 2),
        # nmf_sharded body(): the reference path all_gathers the updated H
        # block BEFORE the second reconstruction AND again at iteration
        # end; the simultaneous path only gathers once at the end
        "h_allgather_model": h_gather * (1 if simultaneous else 2),
        "w_stats_psum_data": w_num_psum + w_den_psum,
    }
    if simultaneous:
        # closed-form scale recalibration: one (K/mp,) psum over data + one
        # scalar psum over model
        per_iter["calibration_psums"] = (
            _allreduce_bytes(k_local * F32, dp) + _allreduce_bytes(F32, mp)
        )
    per_iter["total"] = sum(per_iter.values())
    return per_iter


def long_audio_collectives(
    total_frames: int,
    f: int,
    k: int,
    num_tdoas: int,
    window: int,
    hop: int,
    shards: int,
    num_iterations: int,
    num_sources: int = 3,
    channels: int = 2,
) -> dict:
    """Per-device bytes for one long-audio separation over ``shards`` time
    shards (parallel/long_audio.py): frame-local everything except the NMF
    W statistics (psum per iteration), one localization psum of the
    angular sums, and one ISTFT seam ppermute of (window - hop) samples
    per source per channel per boundary."""
    w_stats_per_iter = _allreduce_bytes(f * k * F32, shards) + _allreduce_bytes(
        k * F32, shards
    )
    localization = _allreduce_bytes(num_tdoas * F32, shards)
    seam_bytes = (window - hop) * channels * num_sources * F32  # per boundary
    # each interior boundary exchanges one seam via ppermute (payload only)
    seams_total = seam_bytes * max(shards - 1, 0) / max(shards, 1)
    return {
        "w_stats_psum_per_iteration": w_stats_per_iter,
        "w_stats_psum_total": w_stats_per_iter * num_iterations,
        "localization_psum": localization,
        "seam_ppermute_per_boundary": seam_bytes,
        "seam_ppermute_total_per_device": seams_total,
    }


def reference_config_tables() -> dict:
    """The accounting at the flagship configurations SCALING.md quotes."""
    # 10 s / 16 kHz utterance at the reference demo config
    t = 2 * 1250  # both channels stacked (2T, F) like the pipeline's V
    f, k, d = 513, 128, 128
    tables = {}
    for dp, mp in [(4, 2), (2, 4), (8, 1)]:
        for simul in (False, True):
            key = f"nmf dp={dp} mp={mp}" + (" turbo" if simul else "")
            per = nmf_sharded_per_iteration(t, f, k, dp, mp, simul)
            tables[key] = {kk: round(vv / 1024, 1) for kk, vv in per.items()}
    # one hour of stereo at window 1024 / hop 128 over 8 time shards
    frames_1h = (3600 * 16000 - 1024) // 128 + 1
    tables["long_audio 1h x8 shards"] = {
        kk: round(vv / 1024, 1)
        for kk, vv in long_audio_collectives(
            frames_1h, f, k, d, 1024, 128, 8, 100
        ).items()
    }
    return tables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    tables = reference_config_tables()
    if args.json:
        print(json.dumps(tables))
        return
    for name, rows in tables.items():
        print(f"## {name} (KiB per device)")
        for kk, vv in rows.items():
            print(f"  {kk:34s} {vv:>12,.1f}")


if __name__ == "__main__":
    main()
