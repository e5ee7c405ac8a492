"""Config system tests: defaults, INI loading (working, unlike the
reference's dead path), overrides."""

import pytest

from gccnmf_tpu.config import GCCNMFConfig, load_config


def test_defaults_match_reference():
    cfg = load_config()
    assert cfg.num_tdoas == 64
    assert cfg.window_size == 1024
    assert cfg.hop_size == 512
    assert cfg.block_size == 512
    assert cfg.dictionary_size == 64
    assert cfg.dictionary_sizes == (64, 128, 256, 512, 1024)
    assert cfg.dictionary_type == "Pretrained"
    assert cfg.microphone_separation_in_metres == pytest.approx(0.1)
    assert cfg.localization_enabled is True
    assert cfg.num_freq == 513
    assert cfg.windows_per_block == 1


def test_ini_file_loading(tmp_path):
    p = tmp_path / "gccNMF.cfg"
    p.write_text(
        """
[TDOA]
numTDOAs = 128
microphoneSeparationInMetres = 0.2
localizationEnabled = False

[STFT]
windowSize = 2048
hopSize = 256

[NMF]
dictionarySize = 256
dictionarySizes = [128, 256]
dictionaryType = Random
"""
    )
    cfg = load_config(str(p))
    assert cfg.num_tdoas == 128
    assert cfg.microphone_separation_in_metres == pytest.approx(0.2)
    assert cfg.localization_enabled is False
    assert cfg.window_size == 2048
    assert cfg.hop_size == 256
    assert cfg.dictionary_size == 256
    assert cfg.dictionary_sizes == (128, 256)
    assert cfg.dictionary_type == "Random"
    # untouched options keep defaults
    assert cfg.block_size == 512


def test_overrides_win(tmp_path):
    p = tmp_path / "c.cfg"
    p.write_text("[NMF]\ndictionarySize = 256\n")
    cfg = load_config(str(p), dictionary_size=512, audio_path="/x.wav")
    assert cfg.dictionary_size == 512
    assert cfg.audio_path == "/x.wav"


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        load_config("/nonexistent/gccnmf.cfg")


def test_frozen():
    cfg = GCCNMFConfig()
    with pytest.raises(Exception):
        cfg.num_tdoas = 1


def test_target_mode_option(tmp_path):
    """targetMode: reference integer constants and names both parse; the
    unsupported MULTIPLE mode fails fast at engine construction."""
    from gccnmf_tpu.config import load_config
    from gccnmf_tpu.models.realtime import (
        StreamConfig, TARGET_MODE_BOXCAR, TARGET_MODE_WINDOW_FUNCTION,
        parse_target_mode,
    )

    ini = tmp_path / "c.ini"
    ini.write_text("[TDOA]\ntargetMode = 0\n")
    cfg = load_config(str(ini))
    assert StreamConfig.from_app_config(cfg).target_mode == TARGET_MODE_BOXCAR
    assert parse_target_mode("window") == TARGET_MODE_WINDOW_FUNCTION
    assert parse_target_mode(2) == TARGET_MODE_WINDOW_FUNCTION
    import pytest as _pytest

    with _pytest.raises(ValueError, match="MULTIPLE"):
        parse_target_mode(1)
