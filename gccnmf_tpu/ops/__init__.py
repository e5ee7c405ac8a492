"""TPU compute kernels: windows, STFT/ISTFT, GCC-PHAT, KL-NMF, masking."""
