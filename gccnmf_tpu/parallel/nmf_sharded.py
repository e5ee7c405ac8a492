"""Distributed KL-NMF: time/data-sharded V,H with a psum-synchronized,
optionally atom-sharded dictionary.

This is the workload's analogue of data+tensor parallelism (SURVEY.md §2.3):

- **data axis**: V and H are sharded along time (or utterance batch —
  the trainer flattens batches into time). H updates are purely local;
  the W update's numerator/denominator are ``psum`` allreduced across the
  data axis each iteration — the "W-sync allreduce" of BASELINE.json.
- **model axis**: dictionary atoms are sharded for oversized dictionaries.
  The reconstruction ``H Wᵀ`` is assembled by psum of per-shard partial
  products; updated H atom-blocks are reassembled with tiled
  ``all_gather`` (ICI-neighbor collectives on a TPU slice).

With ``model=1`` the scheme reduces to pure DP; with 1 device it is
bit-identical to ``ops.nmf.kl_nmf`` up to psum reduction order.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["kl_nmf_sharded", "pad_time", "pretrain_dictionary_sharded"]

_HIGHEST = jax.lax.Precision.HIGHEST


def pad_time(v: np.ndarray, h0: np.ndarray, multiple: int, epsilon: float = 1e-16):
    """Pad V (T,F) and H0 (T,K) along time to a multiple of ``multiple``.

    Padding rows are filled with ``epsilon`` magnitudes — they carry
    vanishing weight in the W statistics (exact-zero padding would break
    the strict positivity the multiplicative updates rely on)."""
    t = v.shape[0]
    pad = (-t) % multiple
    if pad == 0:
        return v, h0, t
    v_pad = np.full((pad, v.shape[1]), epsilon, v.dtype)
    h_pad = np.full((pad, h0.shape[1]), epsilon, h0.dtype)
    return np.concatenate([v, v_pad]), np.concatenate([h0, h_pad]), t


@partial(
    jax.jit,
    static_argnames=(
        "num_iterations", "mesh", "sparsity_alpha", "epsilon", "simultaneous",
        "guard",
    ),
)
def kl_nmf_sharded(
    v: jax.Array,
    w0: jax.Array,
    h0: jax.Array,
    num_iterations: int,
    mesh: Mesh,
    sparsity_alpha: float = 0.0,
    epsilon: float = 1e-16,
    simultaneous: bool = False,
    guard: bool = False,
):
    """Sharded KL-NMF. ``v``: (T, F) with T divisible by mesh 'data' size;
    ``w0``: (F, K) with K divisible by mesh 'model' size; ``h0``: (T, K).
    Returns (W, H) as global arrays (W replicated-equivalent, H time-sharded).

    ``simultaneous=True`` is the distributed twin of the shared-Q turbo
    mode (ops.nmf.kl_nmf_simul / Pallas "bfloat16_q_simul"): one Q = V/WH
    per iteration feeds both updates — which here also removes one
    reconstruction **psum over the model axis per iteration** (a comms
    saving on a real slice, not just FLOPs). The scale recalibration
    Σ(WH) = Σ(V) becomes one extra O(K) psum pair.
    """
    mp = mesh.shape["model"]
    k = w0.shape[1]
    if k % mp:
        raise ValueError(f"dictionary size {k} not divisible by model={mp}")
    k_local = k // mp

    def local_fn(v_l, w_l, h_l):
        # v_l: (T/dp, F); w_l: (F, K/mp); h_l: (T/dp, K) replicated on model
        midx = jax.lax.axis_index("model")
        k_start = midx * k_local
        # loop-invariant global V mass for the simultaneous-mode calibration
        v_sum = jax.lax.psum(jnp.sum(v_l), "data") if simultaneous else None

        def h_slice(h):
            return jax.lax.dynamic_slice_in_dim(h, k_start, k_local, axis=1)

        def reconstruct(h, w_local):
            partial_wh = jnp.matmul(h_slice(h), w_local.T, precision=_HIGHEST)
            return jax.lax.psum(partial_wh, "model")  # (T/dp, F)

        # divide discipline matches the single-device twins: the parity
        # path mirrors kl_nmf (unguarded, reference semantics), the
        # simultaneous turbo path mirrors kl_nmf_simul's double-where
        # silence guards — positive data takes the identical bit path,
        # digital silence yields zeros instead of 0/0 → NaN (ADVICE r2).
        # ``guard=True`` opts the reference-order updates into the same
        # silence guards: the hour-scale drivers use it because real long
        # recordings routinely contain digitally silent windows.
        tiny = 1e-30

        def safe_div(a, b):
            ok = b > tiny
            return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)

        div = safe_div if (simultaneous or guard) else (lambda a, b: a / b)

        def body(_, carry):
            w_l, h = carry
            q = div(v_l, reconstruct(h, w_l))
            num_h = jnp.matmul(q, w_l, precision=_HIGHEST)  # (T/dp, K/mp)
            den_h = jnp.sum(w_l, axis=0) + sparsity_alpha + epsilon
            h_block = h_slice(h) * num_h / den_h

            if simultaneous:
                h_blk = h_slice(h)  # pre-update H rides the SAME q
            else:
                h = jax.lax.all_gather(h_block, "model", axis=1, tiled=True)
                q = div(v_l, reconstruct(h, w_l))
                h_blk = h_slice(h)
            num_w = jax.lax.psum(
                jnp.einsum("tf,tk->fk", q, h_blk, precision=_HIGHEST), "data"
            )
            den_w = jax.lax.psum(jnp.sum(h_blk, axis=0), "data")
            w_l = w_l * div(num_w, den_w)

            norms = jnp.sqrt(jnp.sum(w_l * w_l, axis=0))  # (K/mp,) local atoms
            w_l = div(w_l, norms)
            h_block = (h_block if simultaneous else h_blk) * norms
            if simultaneous:
                # calibrate the global scale: both updates applied the same
                # gain correction (see ops.nmf.kl_nmf_simul)
                sh = jax.lax.psum(jnp.sum(h_block, axis=0), "data")  # (K/mp,)
                mass = jax.lax.psum(jnp.sum(jnp.sum(w_l, axis=0) * sh), "model")
                gain = jnp.where(
                    mass > tiny, v_sum / jnp.where(mass > tiny, mass, 1.0), 1.0
                )
                h_block = h_block * gain
            h = jax.lax.all_gather(h_block, "model", axis=1, tiled=True)
            return w_l, h

        return jax.lax.fori_loop(0, num_iterations, body, (w_l, h_l))

    # check_vma=False: the tiled all_gather makes H replicated across the
    # model axis by construction, which the static VMA checker cannot infer.
    w, h = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P("data", None), P(None, "model"), P("data", None)),
        out_specs=(P(None, "model"), P("data", None)),
        check_vma=False,
    )(v, w0, h0)
    return w, h


def pretrain_dictionary_sharded(
    train_v: np.ndarray,
    dictionary_size: int,
    num_iterations: int,
    mesh: Mesh,
    sparsity_alpha: float = 0.0,
    epsilon: float = 1e-16,
    seed_value: int = 0,
):
    """Distributed dictionary pre-learning on a (T, F) magnitude corpus
    (the scaled-up analogue of reference gccNMFPretraining.py:68-87).

    Pads time to the data-axis size, initializes with the reference's
    seeded host draw, shards, trains, returns W (F, K) on host.
    """
    from gccnmf_tpu.ops import nmf as nmf_ops

    t, f = train_v.shape
    w0, h0 = nmf_ops.nmf_init_numpy(f, dictionary_size, t, epsilon, seed_value)
    dp = mesh.shape["data"]
    v_p, h0_p, _ = pad_time(train_v.astype(np.float32), h0, dp, epsilon)
    v_sh = jax.device_put(v_p, NamedSharding(mesh, P("data", None)))
    h_sh = jax.device_put(h0_p, NamedSharding(mesh, P("data", None)))
    w_sh = jax.device_put(w0, NamedSharding(mesh, P(None, "model")))
    w, _ = kl_nmf_sharded(
        v_sh, w_sh, h_sh, num_iterations, mesh, sparsity_alpha, epsilon
    )
    return np.asarray(w)
