"""Host-memory hygiene and bounding for long-lived streaming processes.

Round 4 measured anonymous memory ratcheting ~1:1 with bytes uploaded to
the device during hour-scale streamed runs (~890 MiB per streamed hour).
Round 5's deepened probe (benchmarks/tunnel_probe.py, committed as
docs/tunnel_probe.json) attributes it precisely:

- the retained bytes live in the glibc ``[heap]`` segment (sbrk), not in
  anonymous mmaps;
- ``malloc_trim(0)`` reclaims ~2% — the allocations are LIVE, not
  freed-and-hoarded;
- explicit ``jax.device_put`` + ``.delete()`` per transfer retains the
  same ~1:1 volume — buffer lifecycle does not release it.

Conclusion: the axon tunnel client retains every upload's staging buffer
for the life of the process; this is a property of the harness transport
(a directly-attached PJRT client frees staging after the copy) and is NOT
workaroundable from user code. The framework therefore bounds it
operationally:

- :class:`HostMemWatchdog` — cheap RssAnon monitoring; the streaming app
  and serving server surface its state in their telemetry so a deployment
  knows when to recycle the worker process (the only real release).
- :func:`trim_host_heap` / :class:`PeriodicTrim` — ``malloc_trim`` for
  the pipeline's OWN allocator churn (NumPy chunk buffers, writer FIFOs).
  It cannot touch the transport retention, but it keeps ordinary
  fragmentation from compounding it; cost ~1 ms per call, fired every
  256 MB of traffic.
- Process-per-pass execution — each CLI invocation is one process, and
  ``benchmarks/streamed_bench.py --recycle-per-repeat`` demonstrates the
  recycle pattern for repeat-style workloads: anon memory is flat per
  repeat by construction, at the measured cost of one backend init +
  compile-cache warm per pass.

Reference analogue: the reference's streaming state is O(1) per block
(gccNMF/realtime/utils.py:87-97); everything this framework itself
allocates per chunk is freed per chunk — the residual growth is the
transport's, quantified and watched rather than silently accumulated.
"""

from __future__ import annotations

import ctypes
import ctypes.util

__all__ = [
    "trim_host_heap",
    "PeriodicTrim",
    "rss_anon_mib",
    "HostMemWatchdog",
]

_libc = None
_trim_available: bool | None = None


def _load() -> bool:
    global _libc, _trim_available
    if _trim_available is not None:
        return _trim_available
    try:
        path = ctypes.util.find_library("c")
        lib = ctypes.CDLL(path) if path else ctypes.CDLL(None)
        lib.malloc_trim.restype = ctypes.c_int
        lib.malloc_trim.argtypes = [ctypes.c_size_t]
        _libc = lib
        _trim_available = True
    except Exception:
        _trim_available = False
    return _trim_available


def trim_host_heap() -> bool:
    """Return freed glibc heap chunks to the kernel (``malloc_trim(0)``).

    Returns True when the call was made (glibc present), False on
    platforms without ``malloc_trim`` — never raises."""
    if not _load():
        return False
    try:
        _libc.malloc_trim(0)
        return True
    except Exception:  # pragma: no cover - defensive
        return False


class PeriodicTrim:
    """Trim the host heap every ``every_bytes`` of accounted traffic.

    Streaming loops call :meth:`account` with each chunk's host-side byte
    count; the trim fires at the threshold and the counter resets. This
    bounds the framework's own allocator churn — it does not (cannot)
    release the tunnel client's live staging retention, which is what
    :class:`HostMemWatchdog` reports on.
    """

    def __init__(self, every_bytes: int = 256 * 1024 * 1024):
        self.every_bytes = int(every_bytes)
        self._since = 0
        self.trims = 0  # observability: exposed in pipeline telemetry

    def account(self, nbytes: int) -> bool:
        """Add ``nbytes`` of traffic; trim if the threshold is crossed.
        Returns True when a trim fired."""
        self._since += int(nbytes)
        if self._since < self.every_bytes:
            return False
        self._since = 0
        if trim_host_heap():
            self.trims += 1
            return True
        return False


def rss_anon_mib() -> float:
    """This process's anonymous resident set in MiB (0.0 off-Linux)."""
    try:
        with open("/proc/self/status") as fh:
            for line in fh:
                if line.startswith("RssAnon:"):
                    return int(line.split()[1]) / 1024.0
    except Exception:
        pass
    return 0.0


class HostMemWatchdog:
    """Budgeted RssAnon monitor for hour-scale processes.

    The tunnel transport retains ~1 MiB of live heap per MiB uploaded
    (docs/tunnel_probe.json), so a long-lived streaming/serving process
    grows until recycled. The watchdog makes that visible instead of
    letting it OOM: :meth:`check` samples RssAnon (rate-limited by
    ``min_interval_s``; the /proc read is ~10 µs) and reports against the
    budget. Consumers surface ``exceeded`` in their health/telemetry
    lines with the documented remedy: recycle the worker process.

    Default budget 6 GiB ≈ 6 streamed hours of int16 ingest at the
    measured retention rate — comfortably inside this class of host while
    leaving headroom for the pipeline's own O(chunk) working set.
    """

    def __init__(
        self,
        budget_mib: float = 6144.0,
        min_interval_s: float = 10.0,
        _now=None,
        _sample=None,
    ):
        import time as _time

        self.budget_mib = float(budget_mib)
        self.min_interval_s = float(min_interval_s)
        self._now = _now or _time.monotonic
        self._sample = _sample or rss_anon_mib
        self._last_t = -float("inf")
        self._last: dict = {
            "anon_mib": 0.0,
            "budget_mib": self.budget_mib,
            "exceeded": False,
        }
        self.baseline_mib = self._sample()

    def check(self) -> dict:
        """Latest ``{anon_mib, budget_mib, exceeded}`` (rate-limited)."""
        now = self._now()
        if now - self._last_t >= self.min_interval_s:
            self._last_t = now
            anon = self._sample()
            self._last = {
                "anon_mib": round(anon, 1),
                "budget_mib": self.budget_mib,
                "exceeded": bool(anon > self.budget_mib),
            }
        return self._last
