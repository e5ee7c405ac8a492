"""Live audio output path: callback-clocked output stream + the full
source→engine→output-callback pipeline, headless.

The reference demo's entire point is hearing the enhancement live: every
enhanced block is routed back into a callback-clocked PyAudio output
stream (reference gccNMF/realtime/audioProcessor.py:106-132,183-208).
This image has no audio hardware, so a mock backend stands in for the
device clock — the wiring, ordering, and underrun/overrun accounting are
exactly what a real deployment exercises.
"""

import threading
import time

import numpy as np
import pytest

from gccnmf_tpu.realtime.audio import (
    CallbackOutputStream,
    FilePlayerSource,
    LiveRingSource,
    open_input_stream,
    open_output_stream,
)


# --------------------------------------------------- CallbackOutputStream


class TestCallbackOutputStream:
    def test_fifo_ordering_and_interleaving(self):
        """Blocks come back out of the callback in write order, interleaved
        frame-by-frame, across pulls of arbitrary (device-chosen) sizes."""
        s = CallbackOutputStream(16000, num_channels=2, block_size=64,
                                 capacity_blocks=8)
        blocks = []
        for i in range(4):
            b = np.arange(2 * 64, dtype=np.float32).reshape(2, 64) + 1000 * i
            assert s.write(b)
            blocks.append(b)
        expected = np.concatenate(
            [b.T.ravel() for b in blocks]
        )  # interleaved frames, write order
        got = []
        for pull in (48, 16, 100, 92):  # 256 frames total, odd sizes
            frames = s.callback(pull)
            assert frames.shape == (pull, 2)
            got.append(frames.ravel())
        np.testing.assert_array_equal(np.concatenate(got), expected)
        assert s.underruns == 0 and s.overruns == 0
        assert s.frames_written == 256 and s.frames_played == 256

    def test_underrun_pads_silence_and_counts(self):
        s = CallbackOutputStream(16000, num_channels=2, block_size=32,
                                 capacity_blocks=4)
        # pre-first-write shortfall is WARM-UP, not an underrun: the
        # device callback starts before the DSP's jit compile finishes,
        # and charging that would make the health metric unusable
        out = s.callback(32)
        assert s.underruns == 0
        np.testing.assert_array_equal(out, np.zeros((32, 2), np.float32))
        half = np.ones((2, 16), np.float32)
        s.write(half)  # first write: the deadline clock is now armed
        out = s.callback(32)  # 16 frames available, 16 padded
        assert s.underruns == 1
        np.testing.assert_array_equal(out[:16], np.ones((16, 2), np.float32))
        np.testing.assert_array_equal(out[16:], np.zeros((16, 2), np.float32))
        assert s.frames_played == 16

    def test_overrun_drops_whole_block(self):
        # the ring rounds capacity up to a power of two, so fill until the
        # first rejected write rather than assuming an exact block count
        s = CallbackOutputStream(16000, num_channels=2, block_size=32,
                                 capacity_blocks=2)
        i = 0
        while s.write(np.full((2, 32), float(i), np.float32)):
            i += 1
            assert i < 100, "ring never filled"
        accepted = i
        assert s.overruns == 1
        assert s.pending_frames == accepted * 32
        # drain: exactly the accepted blocks, in order; the dropped block
        # left no partial frames behind
        frames = s.callback(accepted * 32)
        for j in range(accepted):
            np.testing.assert_array_equal(
                frames[j * 32 : (j + 1) * 32], np.full((32, 2), float(j))
            )
        assert s.pending_frames == 0

    def test_close_drains_tail_without_counting_underruns(self):
        s = CallbackOutputStream(16000, num_channels=2, block_size=32)
        s.write(np.ones((2, 32), np.float32))
        s.close()
        out = s.callback(64)  # tail + silence, no underrun after close
        assert s.underruns == 0
        np.testing.assert_array_equal(out[:32], np.ones((32, 2)))

    def test_wrong_shape_rejected(self):
        s = CallbackOutputStream(16000, num_channels=2, block_size=32)
        with pytest.raises(ValueError):
            s.write(np.zeros((3, 32), np.float32))

    def test_write_after_close_is_rejected(self):
        s = CallbackOutputStream(16000, num_channels=2, block_size=32)
        s.close()
        assert not s.write(np.zeros((2, 32), np.float32))
        assert s.frames_written == 0

    def test_write_blocking_paces_on_the_callback_clock(self):
        """A producer faster than realtime must not flood the ring: with a
        draining 'device', write_blocking delivers every block with zero
        overruns; the write order survives."""
        import threading

        s = CallbackOutputStream(16000, num_channels=2, block_size=32,
                                 capacity_blocks=2)
        n = 12
        done = threading.Event()

        def device():  # drains one block's worth at a time
            pulled = 0
            while pulled < n * 32:
                if s.pending_frames >= 32:
                    s.callback(32)
                    pulled += 32
                else:
                    time.sleep(1e-4)
            done.set()

        t = threading.Thread(target=device)
        t.start()
        for i in range(n):
            assert s.write_blocking(
                np.full((2, 32), float(i), np.float32), timeout=5.0
            )
        assert done.wait(5.0)
        t.join(5.0)
        assert s.overruns == 0 and s.frames_written == n * 32

    def test_write_blocking_times_out_with_one_overrun(self):
        """Stalled backend: write_blocking gives up after the timeout and
        counts exactly one overrun instead of spinning forever."""
        s = CallbackOutputStream(16000, num_channels=2, block_size=32,
                                 capacity_blocks=1)
        while s.write(np.zeros((2, 32), np.float32)):
            pass  # fill the ring (counts one overrun)
        before = s.overruns
        t0 = time.time()
        assert not s.write_blocking(
            np.zeros((2, 32), np.float32), timeout=0.05
        )
        assert time.time() - t0 < 2.0
        assert s.overruns == before + 1


# --------------------------------------------------------- open_*_stream


def test_open_output_stream_without_backend_returns_none():
    assert open_output_stream(16000, 2, 512) is None  # no sounddevice here


def test_open_output_stream_with_injected_backend():
    stopped = []

    class Backend:
        def stop(self):
            stopped.append(True)

    stream = open_output_stream(
        16000, 2, 256, backend_factory=lambda s: Backend()
    )
    assert isinstance(stream, CallbackOutputStream)
    assert stream.backend is not None
    stream.close()
    assert stopped == [True]
    assert stream.backend is None


def test_open_input_stream_without_backend_returns_none():
    assert open_input_stream(16000, 2, 512) is None


def test_open_input_stream_with_injected_backend():
    stopped = []

    class Backend:
        def stop(self):
            stopped.append(True)

    src = open_input_stream(16000, 2, 256, backend_factory=lambda s: Backend())
    assert isinstance(src, LiveRingSource)
    src.close()
    assert stopped == [True]


# ------------------------------------------- full pipeline, mock callback


@pytest.fixture()
def rt_app(tmp_path, stereo_signal):
    from gccnmf_tpu.config import load_config
    from gccnmf_tpu.realtime.app import RealtimeGCCNMF
    from gccnmf_tpu.utils import wav as wavio

    mix, sr = stereo_signal
    path = str(tmp_path / "mix.wav")
    wavio.write_wav(mix, path, sr)
    rng = np.random.default_rng(0)
    w = rng.random((513, 16)).astype(np.float32) + 1e-3
    return RealtimeGCCNMF(
        path,
        config=load_config(None, dictionary_size=16, dictionary_sizes=(16,)),
        dictionaries={"Pretrained": {16: w}},
    )


def test_run_rejects_mono_input_up_front(rt_app, tmp_path):
    """A mono file must fail with the actual problem (channel count) at
    run() entry — not crash deep inside jit tracing with an opaque
    concatenate shape error after pretraining already ran."""
    from gccnmf_tpu.utils import wav as wavio

    mono = str(tmp_path / "mono.wav")
    wavio.write_wav(np.zeros((1, 4096), np.float32) + 0.01, mono, 16000)
    rt_app.audio_path = mono
    with pytest.raises(ValueError, match="channel"):
        rt_app.run(num_blocks=2)


def test_run_streamed_output_matches_buffered_sink(rt_app, tmp_path):
    """streamed_output=True writes incrementally (StreamingSink) and, on
    non-clipping audio where WavSink's whole-file rescale is a no-op,
    produces the identical file."""
    from gccnmf_tpu.utils import wav as wavio

    from gccnmf_tpu.realtime.app import RealtimeGCCNMF

    buffered = str(tmp_path / "buf.wav")
    streamed = str(tmp_path / "str.wav")
    rt_app.run(output_path=buffered, num_blocks=6)
    # fresh app: engine state (OLA, GCC history, localization) carries
    # across run() calls on one instance by design
    fresh = RealtimeGCCNMF(
        rt_app.audio_path,
        config=rt_app.config,
        dictionaries=rt_app._dictionaries,
    )
    fresh.run(output_path=streamed, num_blocks=6, streamed_output=True)
    a, sr_a = wavio.read_wav(buffered)
    b, sr_b = wavio.read_wav(streamed)
    assert sr_a == sr_b and a.shape == b.shape
    np.testing.assert_array_equal(a, b)


def test_run_routes_enhanced_blocks_to_output_stream(rt_app, tmp_path):
    """run() plays every enhanced block through the output stream; the
    stream's content is sample-identical to the WAV sink's for the same
    run (drained post-run so no underrun silence is interleaved)."""
    cfg = rt_app.config
    n_blocks = 12
    stream = CallbackOutputStream(
        cfg.sample_rate, cfg.num_channels, cfg.block_size,
        capacity_blocks=n_blocks,
    )
    out_path = str(tmp_path / "enh.wav")
    stats = rt_app.run(
        output_path=out_path, num_blocks=n_blocks, output_stream=stream
    )
    assert stats["blocks"] == n_blocks
    assert stats["output_underruns"] == 0
    assert stats["output_overruns"] == 0
    from gccnmf_tpu.utils import wav as wavio

    sink_audio, _sr = wavio.read_wav(out_path)
    total = sink_audio.shape[1]
    assert stream.pending_frames == total
    played = stream.callback(total)  # one big device pull
    # interleaved device frames == planar sink content, frame for frame
    np.testing.assert_allclose(
        played.T, sink_audio, atol=2.0 / 32768.0
    )  # sink went through 16-bit PCM; the stream is float32-exact


def test_run_live_output_falls_back_without_backend(rt_app):
    """live_output=True with no host audio stack must fall back cleanly
    (no stream keys in stats, no crash) — the WavSink/discard fallback."""
    stats = rt_app.run(num_blocks=3, live_output=True)
    assert stats["blocks"] == 3
    assert "output_underruns" not in stats


def test_pipelined_run_keeps_stream_and_sink_identical(rt_app, tmp_path):
    """pipeline_depth>0 delays outputs; the flush path must feed BOTH the
    sink and the live stream so neither loses the tail."""
    from gccnmf_tpu.config import load_config
    from gccnmf_tpu.realtime.app import RealtimeGCCNMF

    cfg = rt_app.config
    n_blocks = 8
    app = RealtimeGCCNMF(
        rt_app.audio_path, config=cfg, dictionaries=rt_app._dictionaries,
        pipeline_depth=2,
    )
    stream = CallbackOutputStream(
        cfg.sample_rate, cfg.num_channels, cfg.block_size,
        capacity_blocks=n_blocks,
    )
    out_path = str(rt_app.audio_path).replace("mix.wav", "enh_piped.wav")
    stats = app.run(
        output_path=out_path, num_blocks=n_blocks, output_stream=stream
    )
    assert stats["blocks"] == n_blocks
    assert stream.pending_frames == n_blocks * cfg.block_size
    from gccnmf_tpu.utils import wav as wavio

    sink_audio, _ = wavio.read_wav(out_path)
    played = stream.callback(stream.pending_frames)
    np.testing.assert_allclose(played.T, sink_audio, atol=2.0 / 32768.0)


def test_live_ring_source_end_to_end_with_device_clock(rt_app, tmp_path):
    """The full live topology, headless: a producer thread (the input
    device callback) feeds a LiveRingSource; run() enhances; a consumer
    thread (the output device callback) pulls on its own clock. Ordering
    survives both rings and the underrun counter reflects the consumer
    clock racing ahead of the DSP."""
    cfg = rt_app.config
    n_blocks = 16
    src = LiveRingSource(
        cfg.sample_rate, cfg.num_channels, cfg.block_size,
        capacity_blocks=n_blocks,
    )
    file_src = FilePlayerSource(rt_app.audio_path, cfg.block_size)
    in_blocks = []
    for i, b in enumerate(file_src.blocks()):
        if i >= n_blocks:
            break
        in_blocks.append(b)

    def producer():
        for b in in_blocks:
            while not src.push_planar(b):  # capacity is exact; spin on race
                time.sleep(0.001)
        src.close()

    stream = CallbackOutputStream(
        cfg.sample_rate, cfg.num_channels, cfg.block_size, capacity_blocks=4
    )
    played = []
    stop = threading.Event()

    def consumer():  # the device callback clock: 256-frame pulls, fast
        while not stop.is_set() or stream.pending_frames > 0:
            got = min(stream.pending_frames, 256)
            if got:
                played.append(stream.callback(got))
            else:
                time.sleep(0.0005)

    threads = [threading.Thread(target=producer), threading.Thread(target=consumer)]
    for t in threads:
        t.start()
    try:
        stats = rt_app.run(source=src, output_stream=stream)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=30.0)
    assert stats["blocks"] == n_blocks
    assert src.overruns == 0
    # every enhanced frame reached the device, in order: replay the same
    # input through a fresh identical engine and compare
    from gccnmf_tpu.realtime.app import RealtimeGCCNMF

    ref_app = RealtimeGCCNMF(
        rt_app.audio_path, config=cfg, dictionaries=rt_app._dictionaries
    )
    expected = [ref_app.process_block(b) for b in in_blocks]
    got = np.concatenate([p for p in played], axis=0).T  # (C, total)
    want = np.concatenate(expected, axis=1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_underruns_count_against_the_callback_clock(rt_app):
    """Deadline accounting on the device clock: once the DSP has written,
    a callback that finds too few frames logs an underrun — the live-path
    equivalent of run()'s deadline_misses. Pre-first-write shortfalls are
    warm-up (jit compile) and are NOT charged."""
    cfg = rt_app.config
    stream = CallbackOutputStream(
        cfg.sample_rate, cfg.num_channels, cfg.block_size, capacity_blocks=4
    )
    # device asks before the DSP wrote anything: silence, zero charged
    stream.callback(cfg.block_size)
    stream.callback(cfg.block_size)
    assert stream.underruns == 0
    stats = rt_app.run(num_blocks=2, output_stream=stream)
    assert stats["output_underruns"] == 0  # a healthy run reports clean
    # the DSP has written: drain the ring dry, then one more pull must
    # count against the armed deadline clock
    while stream.pending_frames >= cfg.block_size:
        stream.callback(cfg.block_size)
    stream.callback(cfg.block_size)
    assert stream.underruns >= 1
    # surfaced through run() stats on the next run using the same stream
    stats = rt_app.run(num_blocks=1, output_stream=stream)
    assert stats["output_underruns"] == stream.underruns
