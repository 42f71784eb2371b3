"""Vector-quantizer codebooks: the per-token hot path of the codec.

``codes_to_features`` is the single op executed for every generated speech
token at serving time (reference WavTokenizer/decoder/pretrained.py:209-239):
embed each code in each quantizer's codebook and sum over quantizers.  The
deployed model has one quantizer with 4096 bins of dim 512
(configs yaml:45-47), so this is one embedding lookup.

Training-time EMA codebook updates live in llmvox_tpu/train/vq_train.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_codebooks(key: jax.Array, n_q: int, bins: int, dim: int) -> jnp.ndarray:
    """(n_q, bins, dim) codebooks; reference inits via k-means on first batch
    (encoder/quantization/core_vq.py:141-151) — random normal here, real
    weights come from checkpoint conversion."""
    return jax.random.normal(key, (n_q, bins, dim), dtype=jnp.float32)


def codes_to_features(codebooks: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """Map discrete codes to summed codebook embeddings.

    Args:
      codebooks: (n_q, bins, dim).
      codes: (B, L) int32 for the n_q=1 deployed path, or (n_q, B, L).

    Returns:
      (B, L, dim) float features — channel-last (the reference returns
      (B, dim, L); pretrained.py:237 transposes at the end).
    """
    if codes.ndim == 2:
        codes = codes[None]
    n_q = codebooks.shape[0]
    feats = codebooks[0][codes[0]]
    for q in range(1, n_q):
        feats = feats + codebooks[q][codes[q]]
    return feats


def nearest_code(codebooks: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor quantization for one codebook level.

    Args:
      codebooks: (bins, dim) single codebook.
      x: (..., dim) vectors.
    Returns:
      (...,) int32 code indices, by Euclidean distance (argmax of
      -||x||^2 + 2<x,e> - ||e||^2, matching core_vq.py EuclideanCodebook).
    """
    x2 = jnp.sum(jnp.square(x), axis=-1, keepdims=True)          # (..., 1)
    e2 = jnp.sum(jnp.square(codebooks), axis=-1)                  # (bins,)
    xe = jnp.einsum("...d,bd->...b", x, codebooks)                # (..., bins)
    dist = -(x2 - 2.0 * xe + e2)
    return jnp.argmax(dist, axis=-1).astype(jnp.int32)
