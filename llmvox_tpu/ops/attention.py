"""Attention ops for the speech decoder.

Two paths:

- ``causal_attention`` — training/prefill: full-sequence causal attention,
  left to XLA to fuse onto the MXU.
- ``decode_attention`` — single-token decode over a persistent,
  pre-allocated KV cache.  Instead of attending over the whole
  ``block_size`` cache every step (8192 positions, mostly masked), it
  streams over 512-position chunks with an online-softmax accumulator and
  a *dynamic* trip count ``ceil((pos+1)/chunk)`` so compute and HBM
  traffic scale with the filled prefix, not the capacity.  This replaces
  the reference's concat-KV + SDPA (src/model.py:74-93) and the flash-attn
  CUDA dependency.

A Pallas fused variant lives in ops/pallas_attn.py; this lax version is
the portable reference implementation (CPU tests run it too).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = float("-inf")


def causal_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, D) q/k/v -> (B, T, H, D), causal, softmax in fp32."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32,
                        precision=lax.Precision.HIGHEST) * scale
    t = q.shape[1]
    mask = jnp.tril(jnp.ones((t, t), dtype=bool))
    logits = jnp.where(mask, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", w, v,
                      precision=lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("n_head", "chunk"))
def decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray, v_cache: jnp.ndarray,
                     pos: jnp.ndarray, *, n_head: int,
                     chunk: int = 512) -> jnp.ndarray:
    """One-token attention over cache positions [0..pos] inclusive.

    Args:
      q: (C,) the current token's query, C = n_head * head_dim.
      k_cache, v_cache: (S, C) persistent caches (position ``pos`` already
        written with the current token's k/v).
      pos: scalar int32 — current position.
    Returns:
      (C,) attention output.
    """
    s, c = k_cache.shape
    chunk = min(chunk, s)
    assert s % chunk == 0, "cache capacity must be a multiple of chunk"
    h, d = n_head, c // n_head
    qh = q.reshape(h, d).astype(jnp.float32)
    scale = 1.0 / math.sqrt(d)

    nchunks = (pos + chunk) // chunk  # ceil((pos+1)/chunk), dynamic

    def body(ci, carry):
        m, l, acc = carry
        start = ci * chunk
        kc = lax.dynamic_slice(k_cache, (start, 0), (chunk, c))
        vc = lax.dynamic_slice(v_cache, (start, 0), (chunk, c))
        kc = kc.reshape(chunk, h, d).astype(jnp.float32)
        vc = vc.reshape(chunk, h, d).astype(jnp.float32)
        logits = jnp.einsum("hd,shd->hs", qh, kc,
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST) * scale
        idx = start + lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
        logits = jnp.where(idx <= pos, logits, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.einsum("hs,shd->hd", p, vc,
                                          preferred_element_type=jnp.float32,
                                          precision=lax.Precision.HIGHEST)
        return m_new, l_new, acc_new

    m0 = jnp.full((h, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((h, 1), jnp.float32)
    acc0 = jnp.zeros((h, d), jnp.float32)
    m, l, acc = lax.fori_loop(0, nchunks, body, (m0, l0, acc0))
    out = acc / l
    return out.reshape(c).astype(q.dtype)
