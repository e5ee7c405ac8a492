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

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_parallel_mesh", "P", "NamedSharding", "shard_batch"]


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


def data_parallel_mesh(devices=None) -> Mesh:
    return make_mesh(model=1, devices=devices)


def shard_batch(x, mesh: Mesh, axis: int = 0):
    """Place an array with its ``axis`` dim sharded over the data axis."""
    spec = [None] * np.ndim(x)
    spec[axis] = "data"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
