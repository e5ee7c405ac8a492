"""Native (C++) host-runtime tier for the realtime audio path.

See :mod:`gccnmf_tpu.native.runtime` for the public surface and
``src/gccnmf_rt.cpp`` for the implementation. The library is built lazily
on first use and every consumer degrades to NumPy when no toolchain exists.
"""

from gccnmf_tpu.native.runtime import (  # noqa: F401
    BlockTimes,
    OverlapAdd,
    SpscRing,
    available,
    deinterleave_pcm16,
    float_to_pcm16,
    interleave_pcm16,
    pcm16_to_float,
)
