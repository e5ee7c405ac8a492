"""Smoke tests: every tutorial example runs end-to-end on CPU.

The examples mirror the reference's five notebooks (reference:
README.md:30-37). Each is executed through its ``main()`` with a short
synthetic two-source stereo WAV and fast-pretraining env vars, asserting it
writes finite, nonzero output audio.
"""

import importlib
import os
import sys

import numpy as np
import pytest

from gccnmf_tpu.utils import wav

SR = 16000


@pytest.fixture(scope="module")
def mix_wav(tmp_path_factory):
    """~2 s stereo mixture of two modulated-noise sources at distinct TDOAs."""
    rng = np.random.default_rng(0)
    n = 2 * SR
    t = np.arange(n) / SR

    def source(seed, rate_hz):
        g = np.random.default_rng(seed)
        return g.standard_normal(n) * (0.5 + 0.5 * np.sin(2 * np.pi * rate_hz * t))

    s1, s2 = source(1, 3.0), source(2, 5.0)
    d = 3  # samples of inter-channel delay
    left = s1 + np.roll(s2, d)
    right = np.roll(s1, d) + s2
    stereo = 0.2 * np.stack([left, right]).astype(np.float32)
    path = tmp_path_factory.mktemp("examples") / "mix.wav"
    wav.write_wav(stereo, str(path), SR)
    return str(path)


@pytest.fixture(autouse=True)
def fast_pretrain(tmp_path, monkeypatch):
    monkeypatch.setenv("GCCNMF_TPU_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_ITERS", "5")
    monkeypatch.setenv("GCCNMF_TPU_PRETRAIN_MAX_FRAMES", "200")


def _run_example(module_name, argv, monkeypatch):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    try:
        mod = importlib.import_module(module_name)
        monkeypatch.setattr(sys, "argv", [module_name] + argv)
        mod.main()
    finally:
        sys.path.pop(0)


def _check_audio(path):
    x, sr = wav.read_wav(path)
    assert sr == SR and x.shape[-1] > 0
    assert np.isfinite(x).all()
    assert np.sqrt((x**2).mean()) > 0


def test_offline_separation_example(mix_wav, tmp_path, monkeypatch, capsys):
    plots = tmp_path / "plots"
    _run_example(
        "offline_separation",
        [mix_wav, "--num-sources", "2", "--plots", str(plots)],
        monkeypatch,
    )
    out = capsys.readouterr().out
    assert "localized target TDOA indexes" in out
    written = [l.split()[-1] for l in out.splitlines() if l.startswith("wrote ")]
    assert len(written) == 2
    for p in written:
        _check_audio(p)
    assert (plots / "localization.png").exists()
    assert (plots / "nmf.png").exists()


def test_offline_enhancement_example(mix_wav, tmp_path, monkeypatch):
    out = str(tmp_path / "enh.wav")
    _run_example(
        "offline_enhancement",
        [mix_wav, "-o", out, "--dictionary-size", "64"],
        monkeypatch,
    )
    _check_audio(out)


def test_online_enhancement_example(mix_wav, tmp_path, monkeypatch):
    out = str(tmp_path / "online.wav")
    _run_example(
        "online_enhancement",
        [mix_wav, "-o", out, "--dictionary-size", "64", "--num-h-updates", "1"],
        monkeypatch,
    )
    _check_audio(out)


def test_low_latency_enhancement_example(mix_wav, tmp_path, monkeypatch):
    out = str(tmp_path / "lowlat.wav")
    _run_example(
        "low_latency_enhancement",
        [mix_wav, "-o", out, "--dictionary-size", "64"],
        monkeypatch,
    )
    _check_audio(out)


def test_realtime_streaming_example(mix_wav, tmp_path, monkeypatch, capsys):
    out = str(tmp_path / "rt.wav")
    _run_example(
        "realtime_streaming",
        [mix_wav, "-o", out, "--blocks", "20"],
        monkeypatch,
    )
    _check_audio(out)


def test_multi_stream_serving_example(mix_wav, tmp_path, monkeypatch, capsys):
    prefix = str(tmp_path / "served")
    _run_example(
        "multi_stream_serving",
        [mix_wav, "-o", prefix, "--streams", "3", "--blocks", "12",
         "--dictionary-size", "64"],
        monkeypatch,
    )
    out = capsys.readouterr().out
    written = [l.split()[1] for l in out.splitlines() if l.startswith("wrote ")]
    assert len(written) == 3
    for p in written:
        _check_audio(p)


def test_long_audio_separation_example(mix_wav, tmp_path, monkeypatch, capsys):
    prefix = str(tmp_path / "long")
    _run_example(
        "long_audio_separation",
        [mix_wav, "--num-sources", "2", "--shards", "4",
         "--num-iterations", "10", "--dictionary-size", "32",
         "-o", prefix],
        monkeypatch,
    )
    out = capsys.readouterr().out
    assert "4 time shards" in out
    written = [l.split()[1] for l in out.splitlines() if l.startswith("wrote ")]
    assert len(written) == 2
    for p in written:
        _check_audio(p)


def test_long_audio_separation_example_streamed(
    mix_wav, tmp_path, monkeypatch, capsys
):
    prefix = str(tmp_path / "long_streamed")
    _run_example(
        "long_audio_separation",
        [mix_wav, "--num-sources", "2", "--shards", "4",
         "--num-iterations", "10", "--dictionary-size", "32",
         "-o", prefix, "--streamed"],
        monkeypatch,
    )
    out = capsys.readouterr().out
    written = [l.split()[1] for l in out.splitlines() if l.startswith("wrote ")]
    assert len(written) == 2
    for p in written:
        _check_audio(p)


def test_evaluate_separation_example(tmp_path, monkeypatch, capsys):
    _run_example(
        "evaluate_separation",
        ["--seconds", "2", "--num-iterations", "20", "--dictionary-size", "32"],
        monkeypatch,
    )
    out = capsys.readouterr().out
    assert "SIR gain" in out and "separated" in out
    gain = float(out.strip().splitlines()[-1].split(":")[1].replace("dB", ""))
    assert gain > 2.0  # separation must beat the mixture baseline


def test_render_gui_preview_example(mix_wav, tmp_path, monkeypatch):
    out = str(tmp_path / "preview.png")
    _run_example(
        "render_gui_preview",
        [mix_wav, "-o", out, "--blocks", "8", "--dictionary-size", "16"],
        monkeypatch,
    )
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 10_000
    with open(out, "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"
