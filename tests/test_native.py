"""Tests for the native C++ host runtime (gccnmf_tpu.native).

Covers: compile+load, PCM conversion vs NumPy oracles, interleaving
round-trips, lock-free SPSC ring (single- and dual-threaded), host
overlap-add vs a NumPy oracle of the reference's OverlapAddProcessor
(reference: gccNMF/realtime/utils.py:72-118), telemetry stats, and
equivalence of the NumPy fallback path with the native path.
"""

import threading

import numpy as np
import pytest

from gccnmf_tpu import native
from gccnmf_tpu.native import build as native_build
from gccnmf_tpu.native import runtime as rt


def test_native_builds_and_loads():
    assert native_build.find_compiler() is not None
    assert native.available()


def test_pcm16_roundtrip_matches_numpy():
    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32768, size=4097, dtype=np.int16)
    f = native.pcm16_to_float(pcm)
    assert f.dtype == np.float32
    np.testing.assert_allclose(f, pcm.astype(np.float32) / 32768.0, rtol=0, atol=0)
    back = native.float_to_pcm16(f)
    # /32768 then *32767 is not identity; check within 1 LSB
    assert np.abs(back.astype(np.int32) - pcm.astype(np.int32)).max() <= 1


def test_float_to_pcm16_matches_wav_convention():
    """The native path and utils.wav must share ONE float->pcm convention
    (the reference's wavfile.py float2pcm: x*2^15, clip, truncate)."""
    from gccnmf_tpu.utils import wav as wavio

    x = np.array([-2.0, -1.0, -0.5, 0.0, 0.25, 1.0, 2.0], np.float32)
    out = native.float_to_pcm16(x)
    np.testing.assert_array_equal(
        out, [-32768, -32768, -16384, 0, 8192, 32767, 32767]
    )
    np.testing.assert_array_equal(out, wavio.float_to_pcm(x, "int16"))
    rng = np.random.default_rng(3)
    y = rng.uniform(-1.2, 1.2, 4096).astype(np.float32)
    np.testing.assert_array_equal(
        native.float_to_pcm16(y), wavio.float_to_pcm(y, "int16")
    )


def test_interleave_roundtrip():
    rng = np.random.default_rng(1)
    planar = rng.uniform(-0.99, 0.99, size=(2, 512)).astype(np.float32)
    inter = native.interleave_pcm16(planar)
    assert inter.shape == (1024,)
    planar2 = native.deinterleave_pcm16(inter, channels=2)
    assert planar2.shape == (2, 512)
    np.testing.assert_allclose(planar2, planar, atol=1.5 / 32768)


def test_deinterleave_matches_layout():
    # frames [L0 R0 L1 R1 ...] -> planar [[L...], [R...]]
    inter = np.array([100, -100, 200, -200, 300, -300], np.int16)
    planar = native.deinterleave_pcm16(inter, channels=2)
    np.testing.assert_allclose(planar[0] * 32768.0, [100, 200, 300])
    np.testing.assert_allclose(planar[1] * 32768.0, [-100, -200, -300])


def test_spsc_ring_basic():
    ring = rt.SpscRing(1000)
    assert ring.readable() == 0
    assert ring.writable() >= 1000
    data = np.arange(300, dtype=np.float32)
    assert ring.write(data) == 300
    assert ring.readable() == 300
    out = ring.read(100)
    np.testing.assert_array_equal(out, data[:100])
    out = ring.read(500)  # only 200 left
    np.testing.assert_array_equal(out, data[100:])
    assert ring.readable() == 0


def test_spsc_ring_wraparound():
    ring = rt.SpscRing(64)
    for rep in range(20):
        chunk = np.full(40, rep, np.float32)
        assert ring.write(chunk) == 40
        out = ring.read(40)
        np.testing.assert_array_equal(out, chunk)


def test_spsc_ring_rejects_overflow():
    ring = rt.SpscRing(100)
    wrote = ring.write(np.zeros(500, np.float32))
    assert wrote == ring.capacity or wrote >= 100  # bounded by capacity
    assert ring.read(1000).size == wrote


def test_spsc_ring_threaded_stream_integrity():
    """Producer streams a counter; consumer must see it gap-free."""
    total = 200_000
    ring = rt.SpscRing(4096)
    src = np.arange(total, dtype=np.float32)
    received = []

    def producer():
        pos = 0
        while pos < total:
            pos += ring.write(src[pos : pos + 512])

    t = threading.Thread(target=producer)
    t.start()
    got = 0
    while got < total:
        out = ring.read(512)
        if out.size:
            received.append(out)
            got += out.size
    t.join()
    stream = np.concatenate(received)
    np.testing.assert_array_equal(stream, src)


class _OlaOracle:
    """NumPy oracle of the reference OverlapAddProcessor output path
    (utils.py:101-116): slide ring by one block, add frames ending flush at
    the end at hop spacing, emit buffer[-3B:-2B]."""

    def __init__(self, channels, block_size, num_blocks=8):
        self.b = block_size
        self.buf = np.zeros((channels, block_size * num_blocks), np.float32)

    def add_block(self, frames, hop):
        c, m, fs = frames.shape
        total = self.buf.shape[1]
        self.buf[:, : total - self.b] = self.buf[:, self.b :]
        self.buf[:, total - self.b :] = 0
        for f in range(m):
            start = total - fs - (m - 1 - f) * hop
            self.buf[:, start : start + fs] += frames[:, f]

    def emit_block(self):
        total = self.buf.shape[1]
        return self.buf[:, total - 3 * self.b : total - 2 * self.b].copy()


@pytest.mark.parametrize("hop,frame_size,wpb", [(128, 1024, 4), (256, 512, 2)])
def test_overlap_add_matches_oracle(hop, frame_size, wpb):
    rng = np.random.default_rng(2)
    block = 512
    ola = rt.OverlapAdd(2, block, num_blocks=8)
    oracle = _OlaOracle(2, block, 8)
    for _ in range(12):
        frames = rng.standard_normal((2, wpb, frame_size)).astype(np.float32)
        ola.add_block(frames, hop)
        oracle.add_block(frames, hop)
        np.testing.assert_allclose(ola.emit_block(), oracle.emit_block(), atol=1e-6)


def test_overlap_add_reconstructs_cola_stream():
    """Feeding hann²-windowed frames of a constant signal must reconstruct a
    constant (scaled by the COLA sum) once the delay line fills."""
    from gccnmf_tpu.ops import windows

    block, frame_size = 512, 1024
    hop = 256
    wpb = block // hop
    win = windows.sqrt_hamming(frame_size).astype(np.float32)
    ola = rt.OverlapAdd(1, block, num_blocks=8)
    # stream of ones, windowed twice (analysis+synthesis) like the RT engine
    cola = np.zeros(8 * block, np.float32)
    for f in range(0, cola.size - frame_size + 1, hop):
        cola[f : f + frame_size] += win * win
    expect = np.median(cola[frame_size : 4 * block])
    emitted = []
    for _ in range(16):
        frames = np.tile(win * win, (1, wpb, 1)).astype(np.float32)
        ola.add_block(frames, hop)
        emitted.append(ola.emit_block()[0])
    tail = np.concatenate(emitted[6:])
    # hamming^2 is only approximately COLA at hop=frame/4 — ~2e-4 ripple
    np.testing.assert_allclose(tail, expect, rtol=1e-3)


def test_block_times_stats():
    bt = rt.BlockTimes(capacity=8)
    assert bt.stats() == (0.0, 0.0, 0.0, 0)
    for v in [0.01, 0.02, 0.03]:
        bt.record(v)
    mn, mx, mean, n = bt.stats()
    assert n == 3
    np.testing.assert_allclose([mn, mx, mean], [0.01, 0.03, 0.02], rtol=1e-9)
    for v in [0.1] * 10:  # overflow the window
        bt.record(v)
    mn, mx, mean, n = bt.stats()
    assert n == 8 and mn == pytest.approx(0.1) and mx == pytest.approx(0.1)


def test_block_times_snapshot_and_percentiles():
    """snapshot() exposes the raw held window behind stats() so consumers
    (serving tick_stats) can compute the p50/p99 capacity metric."""
    bt = rt.BlockTimes(capacity=8)
    assert bt.snapshot().size == 0
    assert bt.percentiles((50.0, 99.0)) == (0.0, 0.0)
    vals = [0.01, 0.05, 0.02, 0.04, 0.03]
    for v in vals:
        bt.record(v)
    window = bt.snapshot()
    assert sorted(window.tolist()) == sorted(vals)
    p50, p99 = bt.percentiles((50.0, 99.0))
    assert p50 == pytest.approx(np.percentile(vals, 50))
    assert p99 == pytest.approx(np.percentile(vals, 99))
    for v in [0.1] * 10:  # overflow: only the bounded window survives
        bt.record(v)
    assert bt.snapshot().size == 8
    assert bt.percentiles((50.0,))[0] == pytest.approx(0.1)


def test_numpy_fallback_matches_native(monkeypatch):
    """Force the fallback path and check it agrees with the native one."""
    rng = np.random.default_rng(3)
    pcm = rng.integers(-32768, 32768, size=2048, dtype=np.int16)
    planar = (rng.standard_normal((2, 256)) * 0.7).astype(np.float32)
    native_results = (
        native.pcm16_to_float(pcm),
        native.float_to_pcm16(planar),
        native.deinterleave_pcm16(pcm, 2),
        native.interleave_pcm16(planar),
    )
    monkeypatch.setattr(rt, "_load", lambda: None)
    fallback_results = (
        native.pcm16_to_float(pcm),
        native.float_to_pcm16(planar),
        native.deinterleave_pcm16(pcm, 2),
        native.interleave_pcm16(planar),
    )
    for nat, fb in zip(native_results, fallback_results):
        np.testing.assert_allclose(nat, fb, atol=0)

    # ring + OLA fallback classes behave identically too
    ring = rt.SpscRing(64)
    assert ring._lib is None
    assert ring.write(np.arange(10, dtype=np.float32)) == 10
    np.testing.assert_array_equal(ring.read(10), np.arange(10, dtype=np.float32))

    ola_fb = rt.OverlapAdd(1, 128, 4)
    assert ola_fb._lib is None
    monkeypatch.undo()
    ola_nat = rt.OverlapAdd(1, 128, 4)
    frames = rng.standard_normal((1, 2, 256)).astype(np.float32)
    for _ in range(6):
        ola_fb.add_block(frames, 64)
        ola_nat.add_block(frames, 64)
        np.testing.assert_allclose(ola_fb.emit_block(), ola_nat.emit_block(), atol=1e-6)


def test_live_ring_source_threaded():
    """Producer thread pushes PCM16 callback frames; consumer yields planar
    float blocks in order, no tearing across the channel framing."""
    from gccnmf_tpu.realtime.audio import LiveRingSource

    src = LiveRingSource(num_channels=2, block_size=64, capacity_blocks=8)
    num_blocks = 50
    rng = np.random.default_rng(4)
    sent = rng.integers(-20000, 20000, size=(num_blocks, 64, 2), dtype=np.int16)

    def producer():
        for b in range(num_blocks):
            while not src.push_interleaved_pcm16(sent[b].ravel()):
                pass  # ring full: retry (test consumer is slower sometimes)
        src.close()

    t = threading.Thread(target=producer)
    t.start()
    got = list(src.blocks())
    t.join()
    assert len(got) == num_blocks
    for b, block in enumerate(got):
        expect = sent[b].astype(np.float32).T / 32768.0
        np.testing.assert_allclose(block, expect, atol=0)
    assert src.overruns >= 0


def test_live_ring_source_drains_tail_after_close():
    """Blocks already in the ring when close() lands must still be
    delivered. The consumer samples readable() BEFORE the closed flag
    (the foreign call releases the GIL), so the producer can push its
    final blocks and close in between — the old exit path dropped up to
    a ring-capacity of tail audio (caught flaking as 44/50 blocks in
    test_live_ring_source_threaded)."""
    from gccnmf_tpu.realtime.audio import LiveRingSource

    src = LiveRingSource(num_channels=2, block_size=64, capacity_blocks=8)
    rng = np.random.default_rng(7)
    blocks = rng.standard_normal((5, 2, 64)).astype(np.float32) * 0.1
    for b in blocks:
        assert src.push_planar(b)
    src.close()  # close BEFORE any consumption: pure drain
    got = list(src.blocks())
    assert len(got) == len(blocks)
    for want, have in zip(blocks, got):
        np.testing.assert_allclose(have, want, atol=0)


def test_app_block_time_stats():
    from gccnmf_tpu.realtime.app import RealtimeGCCNMF

    # touch only the telemetry surface (no DSP): record + read stats
    app = RealtimeGCCNMF.__new__(RealtimeGCCNMF)
    app._block_times = rt.BlockTimes(capacity=16)
    app._block_times.record(0.004)
    app._block_times.record(0.006)
    mn, mx, mean, n = app.block_time_stats()
    assert n == 2 and mn == pytest.approx(0.004) and mean == pytest.approx(0.005)


def test_overlap_add_rejects_oversized_span():
    ola = rt.OverlapAdd(1, 128, 4)  # ring holds 512 samples
    frames = np.zeros((1, 2, 512), np.float32)  # span 512+hop > 512
    with pytest.raises(ValueError):
        ola.add_block(frames, 64)


def test_deinterleave_ragged_tail_matches_native(monkeypatch):
    """Non-multiple-of-channels input: both tiers truncate the partial frame."""
    pcm = np.arange(1023, dtype=np.int16)
    nat = native.deinterleave_pcm16(pcm, 2)
    monkeypatch.setattr(rt, "_load", lambda: None)
    fb = native.deinterleave_pcm16(pcm, 2)
    assert nat.shape == fb.shape == (2, 511)
    np.testing.assert_allclose(nat, fb, atol=0)
