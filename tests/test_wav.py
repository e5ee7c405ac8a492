"""WAV I/O and PCM conversion tests."""

import numpy as np

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
