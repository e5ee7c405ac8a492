"""WAV I/O and PCM conversion tests."""

import numpy as np
import pytest

from gccnmf_tpu.utils import wav


def test_pcm_float_round_trip():
    pcm = np.array([-32768, -1, 0, 1, 32767], np.int16)
    f = wav.pcm_to_float(pcm)
    np.testing.assert_allclose(f, pcm / 32768.0)
    back = wav.float_to_pcm(f)
    np.testing.assert_array_equal(back, pcm)


def test_float_to_pcm_clips():
    out = wav.float_to_pcm(np.array([1.5, -1.5], np.float32))
    np.testing.assert_array_equal(out, [32767, -32768])


def test_write_read_round_trip(tmp_path, stereo_signal):
    mix, sr = stereo_signal
    path = str(tmp_path / "x.wav")
    wav.write_wav(mix, path, sr)
    got, got_sr = wav.read_wav(path)
    assert got_sr == sr
    assert got.shape == mix.shape
    np.testing.assert_allclose(got, mix, atol=1.0 / 32768)


def test_clip_protection_rescales(tmp_path):
    sr = 16000
    loud = np.stack([np.linspace(-2, 2, sr, dtype=np.float32)] * 2)
    path = str(tmp_path / "loud.wav")
    wav.write_wav(loud, path, sr)
    got, _ = wav.read_wav(path)
    assert np.max(np.abs(got)) <= 0.9901


def test_reads_reference_dev_wav_if_present():
    import os
    from gccnmf_tpu import defs

    if not os.path.exists(defs.DEFAULT_AUDIO_FILE):
        return
    samples, sr = wav.read_wav(defs.DEFAULT_AUDIO_FILE)
    assert sr == 16000
    assert samples.shape[0] == 2
    assert samples.dtype == np.float32


def test_read_24bit_pcm(tmp_path):
    """24-bit PCM WAVs read correctly (reference: wavfile.py:134-173
    pcm24to32); scipy widens to int32 and pcm_to_float rescales exactly."""
    import struct

    sr, n = 16000, 64
    rng = np.random.default_rng(0)
    vals = rng.integers(-(2**23), 2**23, size=(n, 2))
    data = b"".join(struct.pack("<i", v)[0:3] for v in vals.ravel())
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 6, 6, 24)
        + b"data" + struct.pack("<I", len(data))
    )
    path = tmp_path / "t24.wav"
    path.write_bytes(hdr + data)
    x, got_sr = wav.read_wav(str(path))
    assert got_sr == sr and x.shape == (2, n) and x.dtype == np.float32
    np.testing.assert_allclose(x, vals.T.astype(np.float64) / 2**23, atol=0)


def test_wav_reader_range_reads_match_full_read(tmp_path, stereo_signal):
    from gccnmf_tpu.utils import wav as wavio

    mix, sr = stereo_signal
    path = str(tmp_path / "reader.wav")
    wavio.write_wav(mix, path, sr)
    full, _ = wavio.read_wav(path)

    r = wavio.WavReader(path)
    assert r.sample_rate == sr
    assert r.num_channels == 2
    assert r.num_samples == full.shape[-1]
    np.testing.assert_array_equal(r.read(0, 1000), full[:, :1000])
    np.testing.assert_array_equal(r.read(777, 333), full[:, 777:1110])
    # past-EOF reads zero-pad to the requested length
    tail = r.read(r.num_samples - 10, 64)
    assert tail.shape == (2, 64)
    np.testing.assert_array_equal(tail[:, :10], full[:, -10:])
    assert not tail[:, 10:].any()


def test_streaming_wav_writer_round_trip(tmp_path, rng):
    from gccnmf_tpu.utils import wav as wavio

    path = str(tmp_path / "streamed.wav")
    blocks = [
        rng.uniform(-0.9, 0.9, (2, n)).astype(np.float32)
        for n in (100, 257, 64)
    ]
    with wavio.StreamingWavWriter(path, 16000) as w:
        for b in blocks:
            w.write(b)
    assert w.samples_written == 421
    got, sr = wavio.read_wav(path)
    want = np.concatenate(blocks, axis=-1)
    assert sr == 16000
    np.testing.assert_allclose(got, want, atol=1.0 / 32768.0)


def test_streaming_wav_writer_clips_and_counts(tmp_path):
    from gccnmf_tpu.utils import wav as wavio

    path = str(tmp_path / "clipped.wav")
    w = wavio.StreamingWavWriter(path, 16000)
    block = np.zeros((2, 8), np.float32)
    block[0, 0] = 1.5
    block[1, 3] = -2.0
    w.write(block)
    w.close()
    assert w.clipped_samples == 2
    got, _ = wavio.read_wav(path)
    assert np.abs(got).max() <= 1.0


def test_streaming_wav_writer_rejects_channel_mismatch(tmp_path):
    import pytest

    from gccnmf_tpu.utils import wav as wavio

    w = wavio.StreamingWavWriter(str(tmp_path / "bad.wav"), 16000, 2)
    with pytest.raises(ValueError):
        w.write(np.zeros((3, 8), np.float32))
    w.close()


def test_truncated_wav_raises_actionable_error(tmp_path):
    """A payload cut mid-frame used to surface as scipy's bare reshape
    error; both readers must name the actual problem and the file."""
    import wave

    from gccnmf_tpu.utils import wav as wavio

    path = str(tmp_path / "trunc.wav")
    with wave.open(path, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(np.zeros((1000, 2), np.int16).tobytes())
    raw = open(path, "rb").read()
    open(path, "wb").write(raw[: len(raw) // 2 + 1])  # cut mid-frame
    with pytest.raises(ValueError, match="truncated or corrupt WAV"):
        wavio.read_wav(path)
    with pytest.raises(ValueError, match="truncated or corrupt WAV"):
        wavio.WavReader(path)


def test_garbage_and_empty_wav_raise_cleanly(tmp_path):
    from gccnmf_tpu.utils import wav as wavio

    garbage = tmp_path / "garbage.wav"
    garbage.write_bytes(b"not a wav file at all")
    with pytest.raises(ValueError):
        wavio.read_wav(str(garbage))
    empty = tmp_path / "empty.wav"
    empty.write_bytes(b"")
    with pytest.raises(ValueError):
        wavio.read_wav(str(empty))


def test_wav_reader_24bit_fallback(tmp_path):
    """24-bit PCM cannot be memory-mapped by scipy; WavReader must fall
    back to an in-memory read with identical samples."""
    import struct

    sr, n = 16000, 64
    rng = np.random.default_rng(0)
    vals = rng.integers(-(2**23), 2**23, size=(n, 2))
    data = b"".join(struct.pack("<i", v)[0:3] for v in vals.ravel())
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 6, 6, 24)
        + b"data" + struct.pack("<I", len(data))
    )
    path = tmp_path / "r24.wav"
    path.write_bytes(hdr + data)
    r = wav.WavReader(str(path))
    assert r.sample_rate == sr and r.num_channels == 2
    full, _ = wav.read_wav(str(path))
    np.testing.assert_array_equal(r.read(0, n), full)
    np.testing.assert_array_equal(r.read(10, 20), full[:, 10:30])


def test_wav_reader_read_raw_matches_float_read(tmp_path, stereo_signal):
    """read_raw returns the native int16 payload; /32768 reproduces
    read() exactly (pcm_to_float's int16 case has zero offset)."""
    mix, sr = stereo_signal
    path = str(tmp_path / "raw.wav")
    wav.write_wav(mix, path, sr)
    r = wav.WavReader(path)
    assert r.raw_dtype == np.int16
    raw = r.read_raw(100, 400)
    assert raw.dtype == np.int16 and raw.shape == (2, 400)
    np.testing.assert_array_equal(
        raw.astype(np.float32) / 32768.0, r.read(100, 400)
    )
    # zero-padded past EOF like read()
    over = r.read_raw(r.num_samples - 10, 50)
    assert over.shape == (2, 50) and not over[:, 10:].any()


def test_streaming_wav_writer_write_pcm(tmp_path, rng):
    """write_pcm appends raw int16 (the device-converted path) and folds
    a device-counted clip tally into the close() accounting."""
    x = (rng.standard_normal((2, 500)) * 0.1).astype(np.float32)
    pcm = wav.float_to_pcm(x)
    p = str(tmp_path / "pcm.wav")
    w = wav.StreamingWavWriter(p, 16000)
    w.write_pcm(pcm[:, :300], clipped=2)
    w.write_pcm(pcm[:, 300:])
    assert w.clipped_samples == 2 and w.samples_written == 500
    with pytest.raises(TypeError):
        w.write_pcm(x)  # float input must be rejected
    w.close()
    got, sr = wav.read_wav(p)
    np.testing.assert_array_equal(wav.float_to_pcm(got), pcm)
