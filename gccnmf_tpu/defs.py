"""Global constants and data paths.

Reference: gccNMF/defs.py (speed of sound at defs.py:41, data-dir env override
at defs.py:30-37).
"""

import os
from os.path import abspath, dirname, isdir, join

# Same physical constant as the reference (gccNMF/defs.py:41) so TDOA grids
# line up exactly for waveform parity.
SPEED_OF_SOUND_M_S = 340.29

ROOT_DIR = abspath(join(dirname(__file__), ".."))


def _default_data_dir() -> str:
    env = os.environ.get("GCCNMF_TPU_DATA_DIR")
    if env:
        return env
    local = join(ROOT_DIR, "data")
    if isdir(local):
        return local
    # Fall back to the read-only reference checkout's bundled dev WAVs.
    ref = "/root/reference/data"
    if isdir(ref):
        return ref
    return local


DATA_DIR = _default_data_dir()

DEFAULT_AUDIO_FILE = join(DATA_DIR, "dev_Sq1_Co_A_mix.wav")
DEFAULT_SEPARATION_FILE = join(DATA_DIR, "dev1_female3_liverec_130ms_1m_mix.wav")

# Cache dir for pre-learned NMF dictionaries (reference:
# gccNMF/realtime/gccNMFPretraining.py:36-37 uses data/pretrainedW/W_<size>.npy).
PRETRAINED_W_DIR = os.environ.get(
    "GCCNMF_TPU_CACHE_DIR", join(ROOT_DIR, ".cache", "pretrainedW")
)
