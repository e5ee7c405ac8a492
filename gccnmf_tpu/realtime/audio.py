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

__all__ = ["FilePlayerSource", "WavSink", "open_output_stream"]


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
