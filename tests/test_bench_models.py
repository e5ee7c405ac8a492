"""Tests for the analytic performance models: the bench FLOP model and
the static collective-volume accounting (SCALING.md §4)."""

import importlib.util
import os
import sys

import pytest

_ROOT = os.path.join(os.path.dirname(__file__), "..")


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    return _load(os.path.join(_ROOT, "bench.py"), "bench_mod")


@pytest.fixture(scope="module")
def coll():
    return _load(
        os.path.join(_ROOT, "benchmarks", "collectives.py"), "collectives_mod"
    )


class TestFlopModel:
    def test_matches_design_doc_nmf_figure(self, bench):
        """docs/DESIGN.md:10-16: ~131 GFLOP of NMF per 10 s utterance at
        the reference configuration (T=1250 frames/channel, F=513, K=128,
        100 iterations) and ~13 GFLOP for the DSP GEMMs."""
        from gccnmf_tpu.models.offline import OfflineConfig

        cfg = OfflineConfig()
        flops = bench._flop_model(cfg, t=1250)
        assert flops["nmf"] == pytest.approx(131.3e9, rel=0.01)
        dsp = flops["total"] - flops["nmf"]
        assert 8e9 < dsp < 25e9  # DESIGN.md quotes ~13 GFLOP (approximate)
        assert flops["total"] == sum(
            v for k, v in flops.items() if k != "total"
        )

    def test_scales_linearly_in_iterations(self, bench):
        from gccnmf_tpu.models.offline import OfflineConfig

        a = bench._flop_model(OfflineConfig(num_iterations=50), t=1000)
        b = bench._flop_model(OfflineConfig(num_iterations=100), t=1000)
        assert b["nmf"] == 2 * a["nmf"]
        assert b["stft"] == a["stft"]  # DSP independent of NMF iterations

    def test_peak_lookup(self, bench):
        assert bench._peak_tflops("TPU v5 lite0") == 197.0
        assert bench._peak_tflops("SomeFutureChip") is None


class TestCollectiveAccounting:
    def test_single_device_is_zero(self, coll):
        per = coll.nmf_sharded_per_iteration(2500, 513, 128, dp=1, mp=1)
        assert per["total"] == 0.0

    def test_pure_dp_has_only_w_stats(self, coll):
        per = coll.nmf_sharded_per_iteration(2500, 513, 128, dp=8, mp=1)
        assert per["recon_psum_model"] == 0.0
        assert per["h_allgather_model"] == 0.0
        assert per["w_stats_psum_data"] > 0

    def test_turbo_halves_model_axis_traffic(self, coll):
        base = coll.nmf_sharded_per_iteration(2500, 513, 128, dp=4, mp=2)
        turbo = coll.nmf_sharded_per_iteration(
            2500, 513, 128, dp=4, mp=2, simultaneous=True
        )
        assert turbo["recon_psum_model"] == base["recon_psum_model"] / 2
        # the calibration psums it adds are O(K) — negligible
        assert turbo["calibration_psums"] < base["recon_psum_model"] / 100
        assert turbo["total"] < base["total"]

    def test_ring_allreduce_formula(self, coll):
        # 2*B*(p-1)/p per device
        assert coll._allreduce_bytes(1000, 4) == pytest.approx(1500.0)
        assert coll._allreduce_bytes(1000, 1) == 0.0
        assert coll._allgather_bytes(1000, 4) == pytest.approx(750.0)

    def test_long_audio_seam_independent_of_length(self, coll):
        short = coll.long_audio_collectives(
            10_000, 513, 128, 128, 1024, 128, 8, 100
        )
        long = coll.long_audio_collectives(
            1_000_000, 513, 128, 128, 1024, 128, 8, 100
        )
        assert (
            short["seam_ppermute_per_boundary"]
            == long["seam_ppermute_per_boundary"]
        )
        assert short["w_stats_psum_per_iteration"] == (
            long["w_stats_psum_per_iteration"]
        )

    def test_reference_tables_render(self, coll):
        tables = coll.reference_config_tables()
        assert "nmf dp=4 mp=2" in tables and "nmf dp=4 mp=2 turbo" in tables
        assert tables["nmf dp=4 mp=2 turbo"]["total"] < (
            tables["nmf dp=4 mp=2"]["total"]
        )
