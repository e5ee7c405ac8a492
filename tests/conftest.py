"""Test configuration: force an 8-device virtual CPU platform.

The surrounding environment pins JAX to the experimental 'axon' TPU tunnel
platform (JAX_PLATFORMS is shadowed, so the env var alone is not enough);
we override via jax.config before any backend is initialized so that
multi-chip sharding logic (mesh/psum/shard_map) is exercised on 8 virtual
CPU devices — the JAX analogue of a fake multi-node backend.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng():
    """Fresh deterministic generator per test.

    Function-scoped on purpose: a shared stateful generator makes every
    consumer's data depend on which tests ran before it (a session-scoped
    version made the realtime parity SNR swing ±4 dB with test selection).
    """
    return np.random.default_rng(1234)


def make_test_sources(n, sr=16000):
    """The fixture mixture's ground-truth sources (two delayed speech-like
    harmonics). ONE definition: tests that need BSS-Eval references against
    the `stereo_signal` fixture must rebuild EXACTLY these — duplicating
    the construction risks the quality gate silently measuring garbage."""
    t = np.arange(n) / sr

    def source(f0, seed):
        g = np.random.default_rng(seed)
        env = np.abs(np.convolve(g.standard_normal(n), np.ones(800) / 800, "same"))
        harm = sum(np.sin(2 * np.pi * f0 * k * t + g.uniform(0, 6)) / k for k in (1, 2, 3))
        return (env * harm).astype(np.float32)

    return source(180, 1), source(260, 2)


@pytest.fixture(scope="session")
def stereo_signal():
    """Synthetic 2-second stereo mixture at 16 kHz: two delayed speech-like
    sources plus noise, so GCC-PHAT has real structure."""
    sr = 16000
    n = 2 * sr
    s1, s2 = make_test_sources(n, sr)
    d1, d2 = 6, -9  # integer sample delays between mics
    g = np.random.default_rng(1234)  # own stream: order-independent data
    left = s1 + s2 + 0.01 * g.standard_normal(n).astype(np.float32)
    right = (
        np.roll(s1, d1) + np.roll(s2, d2)
        + 0.01 * g.standard_normal(n).astype(np.float32)
    )
    mix = np.stack([left, right]).astype(np.float32)
    mix /= np.max(np.abs(mix)) * 1.1
    return mix, sr
