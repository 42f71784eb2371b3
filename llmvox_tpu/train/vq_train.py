"""EMA vector-quantizer training ops (functional, mesh-aware).

Rebuild of the reference EuclideanCodebook training path
(encoder/quantization/core_vq.py:99-231) as pure state transitions:

- k-means init on the first batch (kmeans_iters from config; the reference
  broadcasts rank 0's result, encoder/distrib.py:55-90 — here the batch is
  all-gathered over the data axis so every rank computes the same init);
- nearest-neighbor assignment + straight-through estimator + commitment
  MSE (core_vq.py:294-315, weight 1.0);
- EMA cluster_size / embed_avg updates with Laplace smoothing
  (core_vq.py:221-229), with cross-replica ``psum`` of the batch
  statistics replacing the reference's NCCL all-reduce;
- dead-code expiry (threshold 2): expired codes are replaced by random
  batch vectors.  Deviation from the reference, documented: the reference
  writes replacements into ``embed`` *before* the EMA step overwrites
  every row from ``embed_avg`` (core_vq.py:220-229), which neutralizes the
  expiry; here the replacement also resets the expired rows'
  ``embed_avg``/``cluster_size`` so expiry actually takes effect.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


class VQState(NamedTuple):
    embed: jnp.ndarray        # (bins, dim)
    embed_avg: jnp.ndarray    # (bins, dim)
    cluster_size: jnp.ndarray  # (bins,)
    inited: jnp.ndarray       # scalar bool


def init_vq_state(key: jax.Array, bins: int, dim: int,
                  kmeans_init: bool = True) -> VQState:
    embed = jax.random.uniform(key, (bins, dim), jnp.float32, -1.0, 1.0)
    # embed_avg must be a distinct buffer: aliased leaves break jit
    # donation ("attempt to donate the same buffer twice")
    return VQState(embed=embed, embed_avg=embed.copy(),
                   cluster_size=jnp.zeros((bins,)),
                   inited=jnp.asarray(not kmeans_init))


def _pairwise_dist(x: jnp.ndarray, embed: jnp.ndarray) -> jnp.ndarray:
    """-(||x||^2 - 2 x.e + ||e||^2) (core_vq.py:175-183)."""
    x2 = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    e2 = jnp.sum(jnp.square(embed), axis=-1)
    xe = jnp.dot(x, embed.T, precision=lax.Precision.HIGHEST)
    return -(x2 - 2.0 * xe + e2)


def kmeans(key: jax.Array, data: jnp.ndarray, bins: int,
           iters: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(means (bins, dim), counts) — core_vq.py kmeans with empty-cluster
    carry-over of the previous mean."""
    n = data.shape[0]
    if n >= bins:
        idx = jax.random.permutation(key, n)[:bins]
    else:
        # fewer vectors than centroids (large codebooks, small first
        # batch): sample with replacement, like the reference's
        # sample_vectors (core_vq.py randint branch) — the old
        # [:bins] slice silently produced an (n, dim) codebook here
        idx = jax.random.randint(key, (bins,), 0, n)
    means = data[idx]

    def body(_, means):
        assign = jnp.argmax(_pairwise_dist(data, means), axis=-1)
        onehot = jax.nn.one_hot(assign, bins, dtype=data.dtype)
        counts = jnp.sum(onehot, axis=0)
        sums = jnp.dot(onehot.T, data, precision=lax.Precision.HIGHEST)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        return jnp.where(counts[:, None] > 0, new, means)

    means = lax.fori_loop(0, iters, body, means)
    assign = jnp.argmax(_pairwise_dist(data, means), axis=-1)
    counts = jnp.sum(jax.nn.one_hot(assign, bins, dtype=data.dtype), axis=0)
    return means, counts


def vq_train_step(state: VQState, x: jnp.ndarray, key: jax.Array, *,
                  decay: float = 0.99, epsilon: float = 1e-5,
                  threshold_dead: float = 2.0, kmeans_iters: int = 50,
                  axis_name: Optional[str] = None):
    """One training pass of the codebook.

    Args:
      x: (N, dim) encoder outputs (flattened batch*time).
    Returns:
      (quantized (N, dim) with STE, codes (N,), commit_loss, new_state)
    """
    bins = state.embed.shape[0]

    # ---- k-means init on first batch -----------------------------------
    def do_init(_):
        data = x
        if axis_name is not None:
            data = lax.all_gather(x, axis_name).reshape(-1, x.shape[-1])
        means, counts = kmeans(key, data, bins, kmeans_iters)
        return VQState(embed=means, embed_avg=means, cluster_size=counts,
                       inited=jnp.asarray(True))

    state = lax.cond(state.inited, lambda _: state._replace(
        inited=jnp.asarray(True)), do_init, operand=None)

    # ---- assign + STE + commitment -------------------------------------
    embed = state.embed
    codes = jnp.argmax(_pairwise_dist(x, embed), axis=-1)
    quant = embed[codes]
    commit = jnp.mean(jnp.square(lax.stop_gradient(quant) - x))
    quant_ste = x + lax.stop_gradient(quant - x)

    # ---- EMA statistics (psum over data replicas) ----------------------
    onehot = jax.nn.one_hot(codes, bins, dtype=x.dtype)
    batch_size = jnp.sum(onehot, axis=0)
    batch_sum = jnp.dot(onehot.T, lax.stop_gradient(x),
                        precision=lax.Precision.HIGHEST)
    if axis_name is not None:
        batch_size = lax.psum(batch_size, axis_name)
        batch_sum = lax.psum(batch_sum, axis_name)

    cluster_size = state.cluster_size * decay + batch_size * (1 - decay)
    embed_avg = state.embed_avg * decay + batch_sum * (1 - decay)

    # ---- dead-code expiry (corrected semantics; see module docstring) --
    expired = cluster_size < threshold_dead
    n = x.shape[0]
    sample_idx = jax.random.randint(jax.random.fold_in(key, 1), (bins,), 0, n)
    replacements = lax.stop_gradient(x)[sample_idx]
    embed_avg = jnp.where(expired[:, None],
                          replacements * threshold_dead, embed_avg)
    cluster_size = jnp.where(expired, threshold_dead, cluster_size)

    # ---- normalize embed from averages (Laplace smoothing) -------------
    total = jnp.sum(cluster_size)
    smoothed = ((cluster_size + epsilon) /
                (total + bins * epsilon) * total)
    new_embed = embed_avg / smoothed[:, None]

    new_state = VQState(embed=new_embed, embed_avg=embed_avg,
                        cluster_size=cluster_size,
                        inited=jnp.asarray(True))
    return quant_ste, codes, commit, new_state


def vq_infer(state: VQState, x: jnp.ndarray):
    """Inference assignment (n_q=1 path, vq.py:115-140)."""
    codes = jnp.argmax(_pairwise_dist(x, state.embed), axis=-1)
    return state.embed[codes], codes
