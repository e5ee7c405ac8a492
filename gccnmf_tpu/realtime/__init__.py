"""Real-time runtime: audio drivers, history buffers, headless app shell.

The compute engine itself lives in :mod:`gccnmf_tpu.models.realtime`; this
package is the surrounding runtime — the TPU-native replacement for the
reference's three-OS-process architecture (reference:
gccNMF/realtime/{runRealtimeGCCNMF,audioProcessor,utils}.py).
"""

from gccnmf_tpu.realtime.buffers import CircularBuffer
from gccnmf_tpu.realtime.audio import FilePlayerSource, WavSink
from gccnmf_tpu.realtime.app import RealtimeGCCNMF

__all__ = ["CircularBuffer", "FilePlayerSource", "WavSink", "RealtimeGCCNMF"]
