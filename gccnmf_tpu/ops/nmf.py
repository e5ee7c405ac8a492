"""KL-divergence NMF with multiplicative updates, TPU-first.

Layout: ``V`` and ``H`` are time-major (``V: (T, F)``, ``H: (T, K)``);
the dictionary is ``W: (F, K)``. Each iteration is four MXU GEMMs
(reconstruct → H update → reconstruct → W update) plus an atom renorm,
run under ``lax.fori_loop`` so the 100-iteration loop compiles to a single
tight on-device program.

Update rules follow the reference exactly (gccNMF/gccNMFFunctions.py:69-83):

    H ← H ⊙ (Wᵀ(V/WH)) / (Σ_f W + α + ε)
    W ← W ⊙ ((V/WH) Hᵀ) / (Σ_t H)
    W ← W / ||W||₂(per atom);  H ← H ⊙ ||W||₂

For bit-compatible results the W/H init replicates the reference's host
NumPy MT19937 draw (seed(0), uniform, float32, +ε) via ``nmf_init_numpy``;
a jax-PRNG init is provided for production use.

Distributed variants (time-sharded V/H with psum'd W statistics) live in
``gccnmf_tpu.parallel.nmf_sharded``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "nmf_init_numpy",
    "nmf_init_jax",
    "kl_nmf",
    "kl_nmf_minibatch_w",
    "h_infer",
    "kl_divergence",
    "order_atoms_by_centroid",
]

_HIGHEST = jax.lax.Precision.HIGHEST


def nmf_init_numpy(
    num_freq: int,
    dictionary_size: int,
    num_time: int,
    epsilon: float = 1e-16,
    seed_value: int = 0,
):
    """Reference-identical seeded init (gccNMFFunctions.py:70-73).

    Same MT19937 stream as the reference's global ``seed(0)`` draws — W
    first, H second, both cast to float32 before adding epsilon — but
    drawn from a private RandomState so calling this never reseeds the
    caller's global ``np.random`` state as a side effect.
    """
    rs = np.random.RandomState(seed_value)
    w0 = rs.random_sample((num_freq, dictionary_size)).astype(np.float32) + epsilon
    h0 = rs.random_sample((dictionary_size, num_time)).astype(np.float32) + epsilon
    return w0, np.ascontiguousarray(h0.T)  # H returned time-major (T, K)


def nmf_init_jax(key: jax.Array, num_freq: int, dictionary_size: int, num_time: int,
                 epsilon: float = 1e-16):
    """On-device uniform init (production path, no host round-trip)."""
    kw, kh = jax.random.split(key)
    w0 = jax.random.uniform(kw, (num_freq, dictionary_size), jnp.float32) + epsilon
    h0 = jax.random.uniform(kh, (num_time, dictionary_size), jnp.float32) + epsilon
    return w0, h0


def _mm(a, b, precision):
    return jnp.matmul(a, b, precision=precision)


@partial(jax.jit, static_argnames=("num_iterations", "precision", "guard"))
def kl_nmf(
    v: jax.Array,
    w0: jax.Array,
    h0: jax.Array,
    num_iterations: int,
    sparsity_alpha: float = 0.0,
    epsilon: float = 1e-16,
    precision=_HIGHEST,
    guard: bool = False,
):
    """Run ``num_iterations`` multiplicative KL updates.

    ``v``: (..., T, F) nonneg magnitudes; ``w0``: (..., F, K);
    ``h0``: (..., T, K) — leading batch dims are mapped elementwise.
    Returns ``(W, H)`` with the same shapes/dtypes (float32).

    ``guard=False`` is the reference-exact divide discipline (0/0 → NaN
    on digital silence, like gccNMFFunctions.py:76-77 would). ``guard=True``
    opts into the double-where silence guards (see :func:`h_infer`): an
    all-zero V frame collapses its H row to 0 instead of NaN-poisoning W.
    Positive data takes the identical bit path, so guarded results equal
    unguarded ones whenever the latter are finite. The hour-scale drivers
    guard (real long recordings routinely contain silent windows); the
    10 s parity paths do not.
    """
    v = v.astype(jnp.float32)
    tiny = 1e-30

    def safe_div(a, b):
        ok = b > tiny
        return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)

    div = safe_div if guard else (lambda a, b: a / b)

    def body(_, wh):
        w, h = wh
        wt = jnp.swapaxes(w, -1, -2)
        q = div(v, _mm(h, wt, precision))
        h = h * _mm(q, w, precision) / (
            jnp.sum(w, axis=-2, keepdims=True) + sparsity_alpha + epsilon
        )
        q = div(v, _mm(h, wt, precision))
        w = w * div(
            jnp.einsum("...tf,...tk->...fk", q, h, precision=precision),
            jnp.sum(h, axis=-2, keepdims=True),
        )
        norms = jnp.sqrt(jnp.sum(w * w, axis=-2, keepdims=True))
        return div(w, norms), h * norms

    return jax.lax.fori_loop(0, num_iterations, body, (w0, h0))


@partial(jax.jit, static_argnames=("num_iterations", "precision"))
def kl_nmf_minibatch_w(
    v: jax.Array,
    w0: jax.Array,
    h0: jax.Array,
    num_iterations: int,
    sparsity_alpha: float = 0.0,
    epsilon: float = 1e-16,
    precision=_HIGHEST,
):
    """Batched KL-NMF with a shared dictionary: ``v``/``h0`` carry leading
    batch dims; W statistics are summed over batch *and* time (the in-graph
    analogue of the data-parallel psum in parallel.nmf_sharded)."""
    v = v.astype(jnp.float32)

    def body(_, wh):
        w, h = wh
        q = v / jnp.einsum("...tk,fk->...tf", h, w, precision=precision)
        h = h * jnp.einsum("...tf,fk->...tk", q, w, precision=precision) / (
            jnp.sum(w, axis=0) + sparsity_alpha + epsilon
        )
        q = v / jnp.einsum("...tk,fk->...tf", h, w, precision=precision)
        num = jnp.einsum("...tf,...tk->fk", q, h, precision=precision)
        den = jnp.sum(h, axis=tuple(range(h.ndim - 1)))
        w = w * num / den
        norms = jnp.sqrt(jnp.sum(w * w, axis=0))
        return w / norms, h * norms

    return jax.lax.fori_loop(0, num_iterations, body, (w0, h0))


@partial(jax.jit, static_argnames=("num_iterations", "precision"))
def kl_nmf_simul(
    v: jax.Array,
    w0: jax.Array,
    h0: jax.Array,
    num_iterations: int,
    sparsity_alpha: float = 0.0,
    epsilon: float = 1e-16,
    precision=_HIGHEST,
):
    """Shared-Q simultaneous ("turbo") multiplicative updates — the XLA
    twin of the Pallas ``bfloat16_q_simul`` mode so the turbo algorithm
    behaves identically on backends without the fused kernel. One
    Q = V/WH per iteration feeds both updates (the W update uses
    pre-update H statistics): 3 GEMMs + 1 divide instead of 4 + 2. Both
    updates apply the same gain correction, so the global scale is
    recalibrated in closed form each iteration
    (Σ(WH) = Σₖ(Σ_f W)(Σ_t H) = Σ(V)). A different algorithm from
    :func:`kl_nmf` — opt-in, never the parity path."""
    v = v.astype(jnp.float32)
    v_sum = jnp.sum(v, axis=(-2, -1))  # per batch element
    tiny = 1e-30

    def safe_div(a, b):
        ok = b > tiny
        return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)

    def body(_, wh):
        w, h = wh
        wt = jnp.swapaxes(w, -1, -2)
        q = safe_div(v, _mm(h, wt, precision))
        h_new = h * _mm(q, w, precision) / (
            jnp.sum(w, axis=-2, keepdims=True) + sparsity_alpha + epsilon
        )
        num = jnp.einsum("...tf,...tk->...fk", q, h, precision=precision)
        w_new = w * safe_div(num, jnp.sum(h, axis=-2, keepdims=True))
        norms = jnp.sqrt(jnp.sum(w_new * w_new, axis=-2, keepdims=True))
        w_new, h_new = safe_div(w_new, norms), h_new * norms
        mass = jnp.sum(
            jnp.sum(w_new, axis=-2) * jnp.sum(h_new, axis=-2), axis=-1
        )
        gain = jnp.where(
            mass > tiny, v_sum / jnp.where(mass > tiny, mass, 1.0), 1.0
        )
        return w_new, h_new * gain[..., None, None]

    return jax.lax.fori_loop(0, num_iterations, body, (w0, h0))


@partial(jax.jit, static_argnames=("num_updates", "precision"))
def h_infer(
    v: jax.Array,
    w: jax.Array,
    h0: jax.Array,
    num_updates: int,
    sparsity_alpha: float = 0.0,
    epsilon: float = 1e-16,
    precision=_HIGHEST,
):
    """H-only multiplicative updates with a frozen dictionary.

    The online/streaming variant: per-frame coefficient inference against a
    pre-learned W (reference plumbs this as ``numHUpdates``,
    gccNMF/realtime/config.py:73).

    The V/WH ratio is guarded: an all-zero frame (digital silence — an
    idle serving slot, a muted source) collapses H to exact zero after the
    first update, and an unguarded second update computes 0/0 → NaN that
    then poisons the whole mask. Degenerate denominators take an explicit
    0 branch (the double-where pattern — a plain ``maximum`` guard gets
    rewritten by XLA into rsqrt forms that still produce inf·0); nonzero
    frames never hit the branch, so positive-data results are bit-identical."""
    v = v.astype(jnp.float32)
    wsum = jnp.sum(w, axis=0) + sparsity_alpha + epsilon
    tiny = 1e-30

    def body(_, h):
        wh = jnp.einsum("...tk,fk->...tf", h, w, precision=precision)
        ok = wh > tiny
        q = jnp.where(ok, v / jnp.where(ok, wh, 1.0), 0.0)
        return h * jnp.einsum("...tf,fk->...tk", q, w, precision=precision) / wsum

    return jax.lax.fori_loop(0, num_updates, body, h0)


def kl_divergence(v: jax.Array, w: jax.Array, h: jax.Array,
                  epsilon: float = 1e-12) -> jax.Array:
    """Generalized KL divergence D(V ‖ HWᵀ) (scalar, for tests/telemetry)."""
    rec = jnp.einsum("...tk,fk->...tf", h, w, precision=_HIGHEST)
    v = v.astype(jnp.float32)
    return jnp.sum(
        v * (jnp.log(v + epsilon) - jnp.log(rec + epsilon)) - v + rec
    )


def order_atoms_by_centroid(w: np.ndarray) -> np.ndarray:
    """Sort dictionary atoms by spectral centroid (for display parity with
    reference gccNMF/realtime/gccNMFPretraining.py:60-66)."""
    num_freq = w.shape[0]
    centroids = (np.arange(num_freq)[:, None] * w).sum(0) / w.sum(0)
    return w[:, np.argsort(centroids)]
