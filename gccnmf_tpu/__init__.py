"""gccnmf_tpu — a TPU-native GCC-NMF framework.

A from-scratch JAX/XLA/Pallas implementation of GCC-NMF blind stereo source
separation and speech enhancement with the full capability surface of the
seanwood/gcc-nmf reference (see /root/reference):

- offline stereo speech separation  (reference: gccNMF/runGCCNMF.py)
- offline / online / low-latency speech enhancement
- streaming RT-GCC-NMF with pre-learned dictionaries
  (reference: gccNMF/realtime/*)

Design is TPU-first: batched MXU-friendly matmul formulations of the STFT,
GCC-PHAT angular spectrogram and KL-NMF multiplicative updates; `lax.scan`
streaming with carried overlap-add state; `shard_map` + psum data/model
parallelism over `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from gccnmf_tpu.defs import SPEED_OF_SOUND_M_S

__all__ = ["SPEED_OF_SOUND_M_S", "__version__"]
