"""Tests for the committed-artifact study harnesses (round-4 evidence
tooling): six-WAV parity comparison, serving capacity sweep, streamed-bench
memory accounting, iterations/quality scoring.

The harnesses run on the real chip to produce the committed docs/
artifacts; these tests pin their *logic* (comparison/scoring semantics,
memory-sampler accounting, a CPU-sized capacity tick) so a refactor can't
silently change what the artifacts mean."""

import os

import numpy as np
import pytest

from test_bench_models import _load, _ROOT


@pytest.fixture(scope="module")
def parity6():
    return _load(
        os.path.join(_ROOT, "benchmarks", "parity_six_wavs.py"), "parity6_mod"
    )


@pytest.fixture(scope="module")
def capacity():
    return _load(
        os.path.join(_ROOT, "benchmarks", "serving_capacity.py"), "capacity_mod"
    )


@pytest.fixture(scope="module")
def streamed():
    return _load(
        os.path.join(_ROOT, "benchmarks", "streamed_bench.py"), "streamed_mod"
    )


@pytest.fixture(scope="module")
def iters():
    return _load(
        os.path.join(_ROOT, "benchmarks", "iterations_quality.py"), "iters_mod"
    )


def _fake_results(n=8000, sr=16000, targets=(10, 20, 30)):
    rng = np.random.default_rng(0)
    est = rng.standard_normal((3, 2, n)).astype(np.float32) * 0.1
    ref = dict(targets=list(targets), estimates=est)
    got = dict(target_tdoa_indexes=list(targets), estimates=est.copy())
    return ref, got


class TestParityComparison:
    def test_identical_estimates_score_transparent(self, parity6):
        ref, got = _fake_results()
        out = parity6._compare(ref, got, 16000)
        assert out["localization_match"]
        assert min(out["snr_db"]) > 100  # identical → numerically infinite
        assert min(out["bss_sdr_db"]) > 100
        assert all(p is None or p > 4.5 for p in out["pesq"])

    def test_localization_mismatch_short_circuits(self, parity6):
        ref, got = _fake_results()
        got["target_tdoa_indexes"] = [10, 21, 30]  # one bin off
        out = parity6._compare(ref, got, 16000)
        assert not out["localization_match"]
        assert "snr_db" not in out  # comparison meaningless → not emitted

    def test_perturbation_lowers_snr_not_localization(self, parity6):
        ref, got = _fake_results()
        got["estimates"] = got["estimates"] + np.float32(0.001)
        out = parity6._compare(ref, got, 16000)
        assert out["localization_match"]
        assert 10 < min(out["snr_db"]) < 100


class TestIterationScoring:
    def test_score_matches_parity_semantics(self, iters):
        ref, got = _fake_results()
        out = iters._score(ref, got, 16000)
        assert out["localization_match"]
        assert out["min_bss_sdr_db"] > 100
        assert out.get("min_pesq", 5.0) > 4.5

    def test_mismatch_has_no_quality_keys(self, iters):
        ref, got = _fake_results()
        got["target_tdoa_indexes"] = [0, 1, 2]
        out = iters._score(ref, got, 16000)
        assert not out["localization_match"]
        assert "min_bss_sdr_db" not in out


class TestMemSampler:
    def test_status_fields_present(self, streamed):
        kib = streamed._read_status_kib()
        assert kib["VmRSS"] > 0 and kib["RssAnon"] > 0
        # anon + file(+shmem) partition RSS (kernel rounding slack)
        total = kib["RssAnon"] + kib.get("RssFile", 0) + kib.get("RssShmem", 0)
        assert abs(total - kib["VmRSS"]) < 1024

    def test_sampler_observes_allocation(self, streamed):
        with streamed.MemSampler(period_s=0.01) as s:
            ballast = np.ones(64 * 1024 * 1024 // 8)  # 64 MiB anon
            import time

            time.sleep(0.1)
            del ballast
        assert s.peaks["RssAnon"] > 0
        assert s.peaks["VmRSS"] >= s.peaks["RssAnon"]

    def test_synthesize_wav_is_bounded_and_exact(self, streamed, tmp_path):
        path = str(tmp_path / "m.wav")
        n = streamed.synthesize_wav(path, minutes=0.05)
        assert n == int(0.05 * 60 * 16000)
        from gccnmf_tpu.utils import wav

        stereo, sr = wav.read_wav(path)
        assert stereo.shape == (2, n) and sr == 16000
        assert np.isfinite(stereo).all() and np.abs(stereo).max() <= 1.0


class TestCapacitySweep:
    def test_cpu_sized_tick_sweep(self, capacity):
        """One tiny tenancy on the CPU backend: the sweep's accounting
        (percentiles, deadline misses, aggregate RT) is self-consistent."""
        row = capacity.sweep_one(2, ticks=6, warmup=2)
        assert row["streams"] == 2 and row["ticks"] == 6
        assert row["p50_ms"] <= row["p99_ms"] <= row["max_ms"]
        assert 0 <= row["deadline_misses"] <= 6
        assert row["meets_deadline_at_p99"] == (
            row["p99_ms"] < row["deadline_ms"]
        )
        assert row["aggregate_realtime_factor"] > 0

    def test_pipeline_depth_parameter_is_recorded(self, capacity):
        row = capacity.sweep_one(1, ticks=4, warmup=1, pipeline_depth=0)
        assert row["pipeline_depth"] == 0
        row = capacity.sweep_one(1, ticks=4, warmup=1, pipeline_depth=4)
        assert row["pipeline_depth"] == 4


class TestRunAll:
    """benchmarks/run_all.py — the one-command evidence regeneration
    (VERDICT r4 #8). These pin the step table against the repo: every
    producer path must exist, quick mode must never write into docs/."""

    @pytest.fixture(scope="class")
    def runall(self):
        return _load(
            os.path.join(_ROOT, "benchmarks", "run_all.py"), "runall_mod"
        )

    def test_every_step_script_exists(self, runall):
        for name, argv, _quick, _env in runall.STEPS:
            assert os.path.exists(argv[1]), (name, argv[1])

    def test_quick_outputs_never_land_in_docs(self, runall):
        """A --quick smoke must redirect every artifact write away from
        docs/ (committed full-scale artifacts stay intact)."""
        for name, argv, quick, env in runall.STEPS:
            if quick is None:
                continue
            full = argv + quick  # last --out/--save wins in argparse
            for flag in ("--out", "--save"):
                if flag in full:
                    dest = full[len(full) - 1 - full[::-1].index(flag) + 1]
                    assert "/docs/" not in dest, (name, dest)
            for v in (env or {}).values():
                assert "/docs/" not in v, (name, v)

    def test_step_names_cover_evidence_index(self, runall):
        names = {s[0] for s in runall.STEPS}
        # every producer EVIDENCE.md names must be runnable through run_all
        for expected in ("bench", "six_wavs", "serving", "streamed_60min",
                         "tunnel_probe", "iterations_quality",
                         "turbo_equivalence", "batch_sweep", "collectives",
                         "pesq_curves"):
            assert expected in names, expected

    def test_unknown_step_rejected(self, runall, monkeypatch, capsys):
        import sys as _sys

        monkeypatch.setattr(_sys, "argv", ["run_all.py", "--only", "nope"])
        with pytest.raises(SystemExit):
            runall.main()
