"""Distributed dictionary-learning trainer: sharded KL-NMF + checkpoints.

Combines :func:`gccnmf_tpu.parallel.nmf_sharded.kl_nmf_sharded` (time-sharded
V/H with psum-synchronized, optionally atom-sharded W) with the resumable
checkpoint pattern of :mod:`gccnmf_tpu.checkpoint` — the production path for
pre-learning large dictionaries from corpora that exceed one chip's HBM or
one run's walltime budget. The reference's analogue is the in-memory,
single-process pretraining loop (reference: gccNMF/realtime/
gccNMFPretraining.py:68-87), which neither shards nor resumes.
"""

from __future__ import annotations

import logging

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gccnmf_tpu import checkpoint as ckpt
from gccnmf_tpu.parallel import mesh as mesh_lib
from gccnmf_tpu.parallel.nmf_sharded import kl_nmf_sharded, pad_time

logger = logging.getLogger(__name__)

__all__ = ["DistributedNMFTrainer"]


class DistributedNMFTrainer:
    """Resumable sharded KL-NMF dictionary training over a device mesh."""

    @classmethod
    def for_deployment(cls, model: int = 1, **kwargs) -> "DistributedNMFTrainer":
        """Build a trainer on the global mesh of the current deployment.

        Calls :func:`gccnmf_tpu.parallel.mesh.init_distributed` (a no-op
        single-process) then lays the (data, model) mesh over every device
        of every host — the one-liner entry point for pod-scale dictionary
        training.
        """
        mesh_lib.init_distributed()
        return cls(mesh_lib.multihost_mesh(model=model), **kwargs)

    def __init__(
        self,
        mesh: Mesh,
        dictionary_size: int,
        num_iterations: int = 100,
        checkpoint_every: int = 50,
        checkpoint_dir: str | None = None,
        sparsity_alpha: float = 0.0,
        epsilon: float = 1e-16,
        seed_value: int = 0,
    ):
        self.mesh = mesh
        self.dictionary_size = dictionary_size
        self.num_iterations = num_iterations
        self.checkpoint_every = checkpoint_every
        self.checkpoint_dir = checkpoint_dir
        self.sparsity_alpha = sparsity_alpha
        self.epsilon = epsilon
        self.seed_value = seed_value

    def _shard(self, v_p: np.ndarray, w: np.ndarray, h_p: np.ndarray):
        mesh = self.mesh
        return (
            jax.device_put(v_p, NamedSharding(mesh, P("data", None))),
            jax.device_put(w, NamedSharding(mesh, P(None, "model"))),
            jax.device_put(h_p, NamedSharding(mesh, P("data", None))),
        )

    _gather = staticmethod(mesh_lib.gather_to_host)

    def fit(self, train_v: np.ndarray) -> np.ndarray:
        """Train W (F, K) on a (T, F) magnitude corpus; resumes from the
        latest checkpoint in ``checkpoint_dir`` if one matches.

        Multi-host: every process must call ``fit`` with the same corpus;
        checkpoints are written by process 0 only, so ``checkpoint_dir``
        must be on a shared filesystem for resume to see them.
        """
        from gccnmf_tpu.ops import nmf as nmf_ops

        t, f = train_v.shape
        w_host, h_host = nmf_ops.nmf_init_numpy(
            f, self.dictionary_size, t, self.epsilon, self.seed_value
        )
        dp = self.mesh.shape["data"]
        v_p, h_p, _ = pad_time(train_v.astype(np.float32), h_host, dp, self.epsilon)

        # problem fingerprint only — the iteration target may grow on resume
        meta = dict(
            sparsity_alpha=self.sparsity_alpha,
            epsilon=self.epsilon,
            v_shape=list(train_v.shape),
            w_shape=list(w_host.shape),  # pins dictionary_size on resume
            h_shape=list(np.asarray(h_p).shape),
            mesh=[int(self.mesh.shape["data"]), int(self.mesh.shape["model"])],
            seed=self.seed_value,
        )
        start = 0
        if self.checkpoint_dir:
            resume = ckpt.latest_checkpoint(self.checkpoint_dir)
            if resume:
                w_host, h_p, start = ckpt.load_nmf_state(resume, expect_meta=meta)
                logger.info("resuming sharded NMF at iteration %d", start)

        v_sh, w_sh, h_sh = self._shard(v_p, np.asarray(w_host), np.asarray(h_p))
        it = start
        while it < self.num_iterations:
            chunk = min(self.checkpoint_every, self.num_iterations - it)
            w_sh, h_sh = kl_nmf_sharded(
                v_sh, w_sh, h_sh, chunk, self.mesh,
                self.sparsity_alpha, self.epsilon,
            )
            it += chunk
            if self.checkpoint_dir:
                # gather to host for the checkpoint; resharded on resume
                w_np, h_np = self._gather(w_sh), self._gather(h_sh)
                if jax.process_index() == 0:
                    ckpt.save_nmf_state(
                        self.checkpoint_dir, w_np, h_np, it, meta=meta
                    )
        return self._gather(w_sh)
