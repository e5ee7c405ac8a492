"""Audio block sources and sinks for the realtime runtime.

The reference's audio layer is a dedicated OS process wrapping a PyAudio
output stream whose callback slices PCM from a preloaded WAV, hands blocks
to the DSP process over shared memory, and blocks on an Event until the DSP
is done (reference: gccNMF/realtime/audioProcessor.py:35-208). TPU-native,
the audio layer is a plain iterator/callback pair in the app's host loop —
JAX dispatch ordering replaces the Event handshake.

``FilePlayerSource`` reproduces the file-player behavior: loads a WAV once,
yields fixed-size float32 blocks, optionally looping and optionally paced to
the real-time block deadline. A PyAudio/sounddevice live-device source can
implement the same two-method protocol; neither library ships in this image,
so the live path is gated behind an optional import.
"""

from __future__ import annotations

import logging
import time
from typing import Iterator

import numpy as np

from gccnmf_tpu.utils import wav as wavio

logger = logging.getLogger(__name__)

__all__ = ["FilePlayerSource", "LiveRingSource", "WavSink", "open_output_stream"]


class FilePlayerSource:
    """Iterates (num_channels, block_size) float32 blocks from a WAV file.

    ``loop=True`` wraps around at EOF like the reference's file player
    (audioProcessor.py:106-115); ``realtime=True`` sleeps to pace blocks at
    the 32 ms deadline (block_size / sample_rate) instead of free-running.
    """

    def __init__(
        self,
        path: str,
        block_size: int = 512,
        loop: bool = False,
        realtime: bool = False,
    ):
        self.samples, self.sample_rate = wavio.read_wav(path)  # (C, n)
        if self.samples.shape[-1] < block_size:
            # looping such a file would yield undersized blocks forever
            raise ValueError(
                f"{path}: {self.samples.shape[-1]} samples is shorter than "
                f"one {block_size}-sample block"
            )
        self.block_size = block_size
        self.loop = loop
        self.realtime = realtime
        self.position = 0

    @property
    def num_blocks(self) -> int:
        return self.samples.shape[-1] // self.block_size

    def blocks(self) -> Iterator[np.ndarray]:
        deadline = self.block_size / self.sample_rate
        next_t = time.perf_counter()
        n = self.samples.shape[-1]
        while True:
            if self.position + self.block_size > n:
                if not self.loop:
                    return
                self.position = 0
            block = self.samples[:, self.position : self.position + self.block_size]
            self.position += self.block_size
            if self.realtime:
                next_t += deadline
                delay = next_t - time.perf_counter()
                if delay > 0:
                    time.sleep(delay)
            yield block

    def seek(self, sample: int) -> None:
        self.position = int(sample)


class LiveRingSource:
    """Block source fed by a live audio callback through the native ring.

    The producer side (an audio-device callback thread) calls
    ``push_interleaved_pcm16(frames)`` or ``push_planar(block)``; the
    consumer side (the DSP host loop) iterates ``blocks()``. The exchange
    is the lock-free SPSC ring from the native runtime
    (gccnmf_tpu/native/src/gccnmf_rt.cpp), replacing the reference's
    shared-memory frame arrays + Event handshake
    (runRealtimeGCCNMF.py:68-72, audioProcessor.py:118-122): the callback
    never blocks on the DSP — if the DSP falls behind, blocks are dropped at
    the ring (counted in ``overruns``) instead of stalling the device.
    """

    def __init__(
        self,
        sample_rate: int = 16000,
        num_channels: int = 2,
        block_size: int = 512,
        capacity_blocks: int = 16,
    ):
        from gccnmf_tpu import native

        self.sample_rate = sample_rate
        self.num_channels = num_channels
        self.block_size = block_size
        self._samples_per_block = num_channels * block_size
        self._ring = native.SpscRing(capacity_blocks * self._samples_per_block)
        self.overruns = 0
        self.closed = False

    # ------------------------------------------------- producer (callback)

    def push_interleaved_pcm16(self, frames: np.ndarray) -> bool:
        """Push interleaved int16 device frames; False if the ring was full."""
        from gccnmf_tpu import native

        planar = native.deinterleave_pcm16(frames, self.num_channels)
        return self.push_planar(planar)

    def push_planar(self, block: np.ndarray) -> bool:
        """Push a (num_channels, n) float32 block; False on overrun.

        All-or-nothing: a partial write would desync channel framing, so the
        whole block is dropped when the ring lacks space (the SPSC contract
        makes the writable() check safe — only this thread ever writes).
        """
        flat = np.ascontiguousarray(block, np.float32).ravel()
        if flat.size != self._samples_per_block:
            # a wrong-shaped write would permanently desync the consumer's
            # fixed-size reads (mixed halves of adjacent pushes, swapped
            # channel planes) — reject it before it reaches the ring
            raise ValueError(
                f"push_planar expects ({self.num_channels}, "
                f"{self.block_size}), got shape {np.shape(block)}"
            )
        if self._ring.writable() < flat.size:
            self.overruns += 1
            return False
        self._ring.write(flat)
        return True

    def close(self) -> None:
        self.closed = True

    # --------------------------------------------------- consumer (DSP loop)

    def blocks(self) -> Iterator[np.ndarray]:
        """Yield (num_channels, block_size) blocks; waits for the producer."""
        n = self._samples_per_block
        while True:
            if self._ring.readable() < n:
                if self.closed:
                    return
                time.sleep(0.001)
                continue
            flat = self._ring.read(n)
            yield flat.reshape(self.num_channels, self.block_size)


class WavSink:
    """Accumulates output blocks and writes one WAV on ``close()``."""

    def __init__(self, path: str, sample_rate: int):
        self.path = path
        self.sample_rate = sample_rate
        self._chunks: list[np.ndarray] = []

    def write(self, block: np.ndarray) -> None:
        self._chunks.append(np.asarray(block, np.float32))

    def close(self) -> str:
        out = (
            np.concatenate(self._chunks, axis=-1)
            if self._chunks
            else np.zeros((2, 0), np.float32)
        )
        wavio.write_wav(out, self.path, self.sample_rate)
        return self.path


def open_output_stream(sample_rate: int, num_channels: int, block_size: int):
    """Live audio output via sounddevice/pyaudio if available, else None.

    Neither library is bundled in this image; the realtime app falls back to
    a WavSink when this returns None.
    """
    try:  # pragma: no cover - depends on optional host audio stack
        import sounddevice  # type: ignore

        stream = sounddevice.OutputStream(
            samplerate=sample_rate, channels=num_channels, blocksize=block_size
        )
        stream.start()
        return stream
    except Exception:
        logger.info("no live audio backend available; use WavSink")
        return None
