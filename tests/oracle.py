"""Test-suite alias for the reference-equivalent NumPy golden model."""

from gccnmf_tpu.baselines.numpy_ref import *  # noqa: F401,F403
from gccnmf_tpu.baselines.numpy_ref import (  # noqa: F401
    angular_spectrogram_ref,
    coefficient_masks_ref,
    coherence_ref,
    istft_ref,
    kl_nmf_ref,
    mixture_spectrogram_ref,
    nmf_init_ref,
    peaks_ref,
    reconstruct_ref,
    rt_block_ref,
    rt_stream_ref,
    separate_ref,
    steering_ref,
    stft_ref,
    target_gccnmf_ref,
    tdoas_ref,
)
