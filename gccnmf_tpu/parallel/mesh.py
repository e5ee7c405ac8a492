"""Device mesh construction.

The reference's only parallelism is three OS processes on one host
(SURVEY.md §2.3); here scaling is expressed as a ``jax.sharding.Mesh``
with two logical axes:

- ``data``: utterance batches / time shards / independent streams
  (rides DCN across hosts, ICI within a slice);
- ``model``: NMF dictionary atoms for oversized dictionaries (ICI only).

All collectives are XLA collectives (psum/all_gather) inserted either
explicitly in ``shard_map`` blocks or automatically by GSPMD from
NamedSharding annotations.
"""

from __future__ import annotations

import logging
import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

__all__ = [
    "init_distributed",
    "make_mesh",
    "multihost_mesh",
    "data_parallel_mesh",
    "P",
    "NamedSharding",
    "shard_batch",
    "gather_to_host",
]


def gather_to_host(x) -> "np.ndarray":
    """Materialize a (possibly cross-host-sharded) ``jax.Array`` on every
    host as NumPy.

    ``np.asarray`` raises on arrays with non-addressable shards (anything
    sharded over a mesh axis that spans processes); this assembles the
    global value with a DCN ``process_allgather`` instead. Single-process
    it is exactly ``np.asarray``.
    """
    import numpy as np

    if jax.process_count() == 1 or getattr(x, "is_fully_addressable", True):
        # fully-addressable arrays (single process, or a mesh confined to
        # this host's devices) materialize directly — process_allgather
        # would treat the local copy as a shard and CONCATENATE duplicates
        # across processes
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
    """Initialize the multi-host runtime; returns this process's index.

    The reference's "distributed backend" is single-machine multiprocessing
    (SURVEY.md §2.3); the TPU-native equivalent is one JAX process per host
    joined through ``jax.distributed.initialize`` so ``jax.devices()``
    spans the whole slice/pod and XLA routes ``data``-axis collectives over
    DCN between hosts and ICI within a slice. No-ops (returning 0) when
    launched single-process with no coordinator configured — the framework
    behaves identically on a laptop and on a pod.

    On Cloud TPU the three arguments are auto-detected from the metadata
    server/env; pass them explicitly elsewhere (coordinator as
    ``"host:port"``).
    """
    configured = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ) or os.environ.get("COORDINATOR_ADDRESS")
    already = getattr(jax.distributed, "is_initialized", lambda: False)()
    if not already and (configured or num_processes):
        jax.distributed.initialize(
            coordinator_address=configured,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif not already and os.environ.get("TPU_WORKER_HOSTNAMES"):
        # looks like a multi-host TPU environment: let JAX auto-detect.
        # Some single-host environments set TPU_WORKER_HOSTNAMES without a
        # resolvable coordinator — fall back to single-process there.
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError) as e:
            logger.info("single-process fallback (auto-detect failed: %s)", e)
    idx = jax.process_index()
    if jax.process_count() > 1:
        logger.info(
            "distributed runtime: process %d/%d, %d local / %d global devices",
            idx,
            jax.process_count(),
            jax.local_device_count(),
            jax.device_count(),
        )
    return idx


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. ``data=None`` uses all remaining devices.

    Device order follows jax.devices(), so the model axis is innermost —
    contiguous devices (ICI neighbors on a TPU slice) hold the dictionary
    shards that communicate every NMF iteration.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, ("data", "model"))


def multihost_mesh(model: int = 1) -> Mesh:
    """Global (data, model) mesh over every device of every process.

    The ``model`` axis is kept within a host's local devices (ICI) by
    requiring it to divide ``jax.local_device_count()``: dictionary-shard
    all-gathers every NMF iteration must never cross DCN, while the
    ``data`` axis (utterance batches; one psum per W update) spans hosts.
    Call :func:`init_distributed` first on multi-host deployments.
    """
    local = jax.local_device_count()
    if model > 1 and local % model:
        raise ValueError(
            f"model={model} must divide local device count {local} so "
            "dictionary collectives stay on ICI"
        )
    return make_mesh(model=model)


def data_parallel_mesh(devices=None) -> Mesh:
    return make_mesh(model=1, devices=devices)


def shard_batch(x, mesh: Mesh, axis: int = 0):
    """Place an array with its ``axis`` dim sharded over the data axis."""
    spec = [None] * np.ndim(x)
    spec[axis] = "data"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
