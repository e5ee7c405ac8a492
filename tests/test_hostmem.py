"""Host-heap trim policy (utils/hostmem): the round-5 mitigation for the
tunnel-upload anon-memory ratchet (docs/tunnel_probe.json, VERDICT r4 #2).

The actual reclaim effect is measured on the real harness by
benchmarks/tunnel_probe.py (committed artifact); these tests pin the
policy semantics that the streaming loops rely on."""

import numpy as np

from gccnmf_tpu.utils.hostmem import PeriodicTrim, trim_host_heap


class TestTrimHostHeap:
    def test_trim_callable_and_reports_support(self):
        # Linux/glibc test image: malloc_trim must resolve and return True;
        # on other libcs the contract is "False, never raises"
        ok = trim_host_heap()
        assert isinstance(ok, bool)
        # calling twice is safe
        assert trim_host_heap() == ok


class TestPeriodicTrim:
    def test_fires_at_threshold_and_resets(self):
        tr = PeriodicTrim(every_bytes=100)
        assert not tr.account(60)
        fired = tr.account(60)  # crosses 100
        assert fired == (tr.trims == 1)
        # counter reset: another 60 must not fire again
        assert not tr.account(60)

    def test_accounts_accumulate_across_small_chunks(self):
        tr = PeriodicTrim(every_bytes=1000)
        fired = [tr.account(100) for _ in range(9)]
        assert not any(fired)
        tr.account(100)
        assert tr.trims in (0, 1)  # 1 on glibc, 0 where unsupported

    def test_default_threshold_is_256mb(self):
        assert PeriodicTrim().every_bytes == 256 * 1024 * 1024

    def test_streaming_loop_wiring(self):
        """The chunked long-audio loop accounts uploads and downloads; a
        60-minute mono... stereo run at 691 MB uploaded must fire >= 2
        trims at the default threshold."""
        tr = PeriodicTrim()
        total = 0
        chunk = np.zeros((2, 8192 * 128 + 896), np.int16)  # pass-1 chunk
        while total < 691 * 1024 * 1024:
            tr.account(chunk.nbytes)
            total += chunk.nbytes
        assert tr._since < tr.every_bytes
        if trim_host_heap():  # glibc present: trims must have fired
            assert tr.trims >= 2


class TestHostMemWatchdog:
    def test_reports_against_budget(self):
        from gccnmf_tpu.utils.hostmem import HostMemWatchdog

        samples = iter([100.0, 100.0, 7000.0])
        wd = HostMemWatchdog(
            budget_mib=6144.0, min_interval_s=0.0,
            _sample=lambda: next(samples),
        )
        st = wd.check()
        assert st == {"anon_mib": 100.0, "budget_mib": 6144.0,
                      "exceeded": False}
        st = wd.check()
        assert st["exceeded"] is True and st["anon_mib"] == 7000.0

    def test_rate_limited_sampling(self):
        from gccnmf_tpu.utils.hostmem import HostMemWatchdog

        clock = [0.0]
        n_samples = [0]

        def sample():
            n_samples[0] += 1
            return 1.0

        wd = HostMemWatchdog(
            min_interval_s=10.0, _now=lambda: clock[0], _sample=sample
        )
        base = n_samples[0]
        wd.check(); wd.check(); wd.check()  # same instant: one sample
        assert n_samples[0] == base + 1
        clock[0] = 11.0
        wd.check()
        assert n_samples[0] == base + 2

    def test_real_sample_on_linux(self):
        from gccnmf_tpu.utils.hostmem import rss_anon_mib

        anon = rss_anon_mib()
        assert anon > 1.0  # a live CPython process has real anon RSS
