"""Checkpoint / resume for NMF training runs.

The reference's only persistence is the pretrained-dictionary artifact
cache (reference: gccNMF/realtime/gccNMFPretraining.py:68-87) — its
100-iteration NMF runs finish in seconds so mid-run checkpointing never
existed. This framework targets much larger corpora and distributed
dictionary learning (parallel.nmf_sharded), where runs are long enough
that resumable state matters.

Format: one ``.npz`` per checkpoint (``W``, ``H``, iteration counter, and
a config fingerprint that refuses resume against mismatched problems),
plus a ``latest`` pointer file — the same artifact-cache pattern as
pretraining, extended with in-run state. Arrays are gathered to host
before saving; on resume they are fed back through ``jax.device_put`` by
the caller (sharded layouts are re-established by the sharded trainer).
"""

from __future__ import annotations

import json
import logging
import os
from os.path import exists, join

import numpy as np

logger = logging.getLogger(__name__)

__all__ = [
    "save_nmf_state",
    "load_nmf_state",
    "latest_checkpoint",
    "kl_nmf_checkpointed",
]


def _fingerprint(shapes_meta: dict) -> str:
    return json.dumps(shapes_meta, sort_keys=True)


def save_nmf_state(
    ckpt_dir: str, w, h, iteration: int, meta: dict | None = None
) -> str:
    """Write ``nmf_<iteration>.npz`` and update the ``latest`` pointer."""
    os.makedirs(ckpt_dir, exist_ok=True)
    w = np.asarray(w)
    h = np.asarray(h)
    meta = dict(meta or {})
    meta.update(w_shape=list(w.shape), h_shape=list(h.shape))
    path = join(ckpt_dir, f"nmf_{iteration:06d}.npz")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, w=w, h=h, iteration=iteration, meta=_fingerprint(meta))
    os.replace(tmp, path)  # atomic publish: no torn checkpoints on crash
    # the pointer gets the same treatment — a truncating write killed
    # mid-flight would leave an empty pointer and crash-loop every resume
    pointer_tmp = join(ckpt_dir, "latest.tmp")
    with open(pointer_tmp, "w") as f:
        f.write(os.path.basename(path))
    os.replace(pointer_tmp, join(ckpt_dir, "latest"))
    logger.info("saved NMF checkpoint %s", path)
    return path


def latest_checkpoint(ckpt_dir: str) -> str | None:
    pointer = join(ckpt_dir, "latest")
    if not exists(pointer):
        return None
    with open(pointer) as f:
        name = f.read().strip()
    if not name:  # tolerate a corrupt/empty pointer from an old crash
        return None
    path = join(ckpt_dir, name)
    return path if os.path.isfile(path) else None


def load_nmf_state(path: str, expect_meta: dict | None = None):
    """Load (w, h, iteration). Raises if ``expect_meta`` (same keys as
    passed to :func:`save_nmf_state`) doesn't match what was saved.

    Include ``w_shape``/``h_shape`` in ``expect_meta`` to pin the expected
    factor shapes; keys the caller omits default to the file's own values
    (i.e. they are not checked)."""
    data = np.load(path, allow_pickle=False)
    if expect_meta is not None:
        expect = dict(expect_meta)
        expect.setdefault("w_shape", list(data["w"].shape))
        expect.setdefault("h_shape", list(data["h"].shape))
        if str(data["meta"]) != _fingerprint(expect):
            raise ValueError(
                f"checkpoint {path} was written for a different problem: "
                f"{data['meta']} vs expected {_fingerprint(expect)}"
            )
    return data["w"], data["h"], int(data["iteration"])


def kl_nmf_checkpointed(
    v,
    w0,
    h0,
    num_iterations: int,
    ckpt_dir: str,
    checkpoint_every: int = 50,
    sparsity_alpha: float = 0.0,
    epsilon: float = 1e-16,
):
    """Run KL-NMF in resumable chunks.

    Each chunk of ``checkpoint_every`` iterations is one on-device
    ``kl_nmf`` call; state is saved after every chunk. If ``ckpt_dir``
    already holds a matching checkpoint, training resumes from it —
    re-running after an interruption continues instead of restarting.
    """
    from gccnmf_tpu.ops import nmf as nmf_ops

    # the fingerprint identifies the *problem*, not the run: the iteration
    # target may legitimately grow between runs (resume-and-train-further)
    meta = dict(
        sparsity_alpha=sparsity_alpha,
        v_shape=list(np.asarray(v).shape),
        w_shape=list(np.asarray(w0).shape),
        h_shape=list(np.asarray(h0).shape),
    )
    w, h, start = w0, h0, 0
    resume = latest_checkpoint(ckpt_dir)
    if resume:
        w, h, start = load_nmf_state(resume, expect_meta=meta)
        logger.info("resuming NMF from iteration %d (%s)", start, resume)
        if start > num_iterations:
            # the fingerprint deliberately excludes the iteration target
            # (resume-and-train-further is legitimate) — but silently
            # returning a 200-iteration state as "the requested 100" would
            # corrupt any comparison across iteration counts
            raise ValueError(
                f"checkpoint in {ckpt_dir} is at iteration {start}, past "
                f"the requested {num_iterations}; point at a fresh "
                f"ckpt_dir to train fewer iterations"
            )
    it = start
    while it < num_iterations:
        chunk = min(checkpoint_every, num_iterations - it)
        w, h = nmf_ops.kl_nmf(v, w, h, chunk, sparsity_alpha, epsilon)
        it += chunk
        save_nmf_state(ckpt_dir, w, h, it, meta=meta)
    return w, h
