"""Dictionary pre-learning with a disk cache.

Reference: gccNMF/realtime/gccNMFPretraining.py — pre-learns W for sizes
[64..1024] from a magnitude-spectrogram training corpus, caches to
``pretrainedW/W_<size>.npy``, with a Random-dictionary alternative and
spectral-centroid atom ordering for display.

Improvements over the reference:
- the cache key includes window size and a corpus fingerprint (the
  reference keys by size only, silently reusing stale dictionaries when
  the window size or dataset changes, gccNMFPretraining.py:36-37);
- training runs on device (ops.nmf.kl_nmf), optionally sharded across a
  mesh (parallel.nmf_sharded) for large corpora;
- the training corpus can be synthesized from bundled/local WAVs when the
  reference's CHiME .npy corpus (a missing blob) is unavailable.
"""

from __future__ import annotations

import hashlib
import logging
import os
from os.path import exists, join
from typing import Mapping

import numpy as np

from gccnmf_tpu import defs
from gccnmf_tpu.ops import nmf as nmf_ops
from gccnmf_tpu.ops import stft as stft_ops
from gccnmf_tpu.ops import windows as win_ops

logger = logging.getLogger(__name__)

__all__ = [
    "training_corpus_from_wavs",
    "pretrain_dictionary",
    "get_dictionaries",
    "load_dictionary_file",
]

DEFAULT_SIZES = (64, 128, 256, 512, 1024)
NUM_PRETRAIN_ITERATIONS = 100


def _corpus_fingerprint(v: np.ndarray) -> str:
    # hash the WHOLE corpus, not a strided sample: same-shape corpora that
    # differ only between stride points (one swapped WAV) must not reuse a
    # stale cached dictionary. Hashing even a 40 MB hour-scale corpus is
    # ~100 ms against seconds of training.
    h = hashlib.sha1()
    h.update(str(v.shape).encode())
    h.update(np.ascontiguousarray(v).tobytes())
    return h.hexdigest()[:12]


def training_corpus_from_wavs(
    wav_paths, window_size: int = 1024, hop_size: int = 512,
    max_frames: int | None = None,
) -> np.ndarray:
    """Build a (T, F) magnitude-frame corpus from WAV files (stand-in for
    the reference's missing chimeTrainSet.npy)."""
    import jax.numpy as jnp

    from gccnmf_tpu.utils import wav as wavio

    if max_frames is None:
        max_frames = int(os.environ.get("GCCNMF_TPU_PRETRAIN_MAX_FRAMES", 20000))
    window = win_ops.sqrt_hamming(window_size)
    frames = []
    for path in wav_paths:
        samples, _ = wavio.read_wav(path)
        spec = stft_ops.stft(jnp.asarray(samples), window, hop_size)
        mags = np.abs(np.asarray(spec)).reshape(-1, spec.shape[-1])
        frames.append(mags)
    corpus = np.concatenate(frames, axis=0)
    if len(corpus) > max_frames:
        idx = np.linspace(0, len(corpus) - 1, max_frames).astype(int)
        corpus = corpus[idx]
    return np.ascontiguousarray(corpus.astype(np.float32))


def pretrain_dictionary(
    train_v: np.ndarray,
    dictionary_size: int,
    num_iterations: int | None = None,
    cache_dir: str | None = None,
    window_size: int = 1024,
    mesh=None,
    seed_value: int = 0,
) -> np.ndarray:
    """Pre-learn (or load cached) W (F, K) from a (T, F) corpus.

    ``num_iterations`` defaults to GCCNMF_TPU_PRETRAIN_ITERS (env) or 100;
    ``cache_dir`` to GCCNMF_TPU_CACHE_DIR (env) or the package cache.
    """
    import jax.numpy as jnp

    if num_iterations is None:
        num_iterations = int(
            os.environ.get("GCCNMF_TPU_PRETRAIN_ITERS", NUM_PRETRAIN_ITERATIONS)
        )
    cache_dir = (
        cache_dir or os.environ.get("GCCNMF_TPU_CACHE_DIR") or defs.PRETRAINED_W_DIR
    )
    tag = _corpus_fingerprint(train_v)
    # every input that shapes the result is in the key — the reference's
    # size-only key silently served stale dictionaries
    # (gccNMFPretraining.py:68-87); omitting iterations/seed had the same
    # staleness class (a quick 3-iteration test run poisoning later
    # 100-iteration callers)
    cache_path = join(
        cache_dir,
        f"W_{dictionary_size}_win{window_size}_it{num_iterations}"
        f"_s{seed_value}_{tag}.npy",
    )
    if exists(cache_path):
        logger.info("pretrain: loading cached W from %s", cache_path)
        return np.load(cache_path)

    logger.info(
        "pretrain: training W (K=%d) on %s corpus", dictionary_size, train_v.shape
    )
    if mesh is not None:
        from gccnmf_tpu.parallel import nmf_sharded

        w = nmf_sharded.pretrain_dictionary_sharded(
            train_v, dictionary_size, num_iterations, mesh, seed_value=seed_value
        )
    else:
        t, f = train_v.shape
        w0, h0 = nmf_ops.nmf_init_numpy(f, dictionary_size, t, seed_value=seed_value)
        w, _ = nmf_ops.kl_nmf(
            jnp.asarray(train_v), jnp.asarray(w0), jnp.asarray(h0), num_iterations
        )
        w = np.asarray(w)

    os.makedirs(cache_dir, exist_ok=True)
    # atomic publish (tmp + rename): two processes cold-starting on the
    # same key must never read a torn .npy (native/build.py and
    # checkpoint.py use the same pattern)
    tmp_path = f"{cache_path}.{os.getpid()}.tmp.npy"  # .npy: np.save keeps it
    np.save(tmp_path, w)
    os.replace(tmp_path, cache_path)
    return w


def load_dictionary_file(path: str, num_freq: int | None = None) -> np.ndarray:
    """Load an explicit dictionary artifact (.npy, (F, K) nonnegative).

    The production handoff: ``gccnmf-pretrain --save-dir`` exports these
    and every entry point accepts one via ``dictionary_file`` /
    ``--dictionary-file``, bypassing the corpus-keyed pretraining cache
    (whose key deliberately changes with corpus/iterations/seed — an
    artifact file is the stable way to pin a specific trained W).
    """
    w = np.load(path)
    if w.ndim != 2:
        raise ValueError(f"{path}: expected a (F, K) array, got {w.shape}")
    if num_freq is not None and w.shape[0] != num_freq:
        raise ValueError(
            f"{path}: dictionary has {w.shape[0]} frequency rows but the "
            f"configured window expects {num_freq}"
        )
    if np.min(w) < 0:
        raise ValueError(f"{path}: dictionary must be nonnegative")
    return np.ascontiguousarray(w, np.float32)


def get_dictionaries(
    window_size: int = 1024,
    sizes=DEFAULT_SIZES,
    train_v: np.ndarray | None = None,
    ordered: bool = True,
    cache_dir: str | None = None,
    mesh=None,
    rng: np.random.Generator | None = None,
) -> Mapping[str, Mapping[int, np.ndarray]]:
    """Pretrained + Random dictionary banks keyed [type][size]
    (reference getDictionariesW, gccNMFPretraining.py:43-58)."""
    rng = rng or np.random.default_rng(0)
    num_freq = window_size // 2 + 1
    if train_v is None:
        candidates = []
        if os.path.isdir(defs.DATA_DIR):
            candidates = [
                join(defs.DATA_DIR, f)
                for f in sorted(os.listdir(defs.DATA_DIR))
                if f.endswith(".wav")
            ]
        if candidates:
            train_v = training_corpus_from_wavs(candidates, window_size)
        else:
            train_v = (rng.random((4096, num_freq)) + 1e-3).astype(np.float32)

    banks: dict[str, dict[int, np.ndarray]] = {"Pretrained": {}, "Random": {}}
    for size in sizes:
        w = pretrain_dictionary(
            train_v, size, cache_dir=cache_dir, window_size=window_size, mesh=mesh
        )
        banks["Pretrained"][size] = w
        banks["Random"][size] = rng.random((num_freq, size)).astype(np.float32)
    if ordered:
        banks = {
            t: {s: nmf_ops.order_atoms_by_centroid(w) for s, w in bank.items()}
            for t, bank in banks.items()
        }
    return banks
