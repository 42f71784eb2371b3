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


def causal_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     segments: jnp.ndarray = None) -> jnp.ndarray:
    """(B, T, H, D) q/k/v -> (B, T, H, D), causal, softmax in fp32.

    ``segments`` (B, T) int32: block-diagonal-causal masking for PACKED
    batches (train/data.py::collate_packed) — a query attends a key iff
    it is causal AND both carry the same nonzero segment id, so packed
    sentences can never see each other.  Padding (segment 0) rows get a
    self-only fallback mask to keep the softmax finite; their outputs
    are discarded by the loss's ignore_index."""
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    from llmvox_tpu.ops.nn import mm_precision
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32,
                        precision=mm_precision(q.dtype)) * scale
    t = q.shape[1]
    mask = jnp.tril(jnp.ones((t, t), dtype=bool))
    if segments is not None:
        # self-attention is always kept (causal diag + own segment), so
        # every row's softmax stays finite — padding included
        same = segments[:, :, None] == segments[:, None, :]   # (B, T, S)
        logits = jnp.where((mask[None] & same)[:, None], logits, NEG_INF)
    else:
        logits = jnp.where(mask, logits, NEG_INF)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", w, v,
                      precision=mm_precision(q.dtype))


def flash_causal_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           *, block_q: int = 512,
                           block_k: int = 1024,
                           unroll_q: bool = False,
                           segments: jnp.ndarray = None) -> jnp.ndarray:
    """Blockwise (flash) causal attention: O(T * block) memory.

    The naive path materializes (B, H, T, T) probabilities — at the
    deployed training shape (block 8192, 4 layers scanned) that is 16 GB
    of residuals and OOMs a single chip.  This computes the same online-
    softmax attention in (block_q, block_k) tiles, visits only the lower-
    triangle tiles, and remats each query-block body so backward memory
    stays O(block_q * T) per layer.

    q/k/v: (B, T, H, D) with T divisible by block_q and block_k.
    ``segments`` (B, T): packed-batch block-diagonal-causal masking, see
    :func:`causal_attention` — applied per tile, so the triangular
    tile-skipping and O(block) memory are unchanged.
    """
    b, t, h, d = q.shape
    block_q = min(block_q, t)
    block_k = min(block_k, t)
    assert t % block_q == 0 and t % block_k == 0
    scale = 1.0 / math.sqrt(d)
    nq = t // block_q
    # bf16 operands: one-pass MXU matmul with f32 accumulation is exact
    # for bf16 inputs and ~8x faster than forcing the f32 (HIGHEST)
    # path; f32 operands keep HIGHEST so the default-precision bf16
    # truncation bug can't creep back in (see ops/nn.py).
    mm_prec = (lax.Precision.HIGHEST if q.dtype == jnp.float32
               else lax.Precision.DEFAULT)

    def q_body(carry, qi):
        qb = lax.dynamic_slice(q, (0, qi * block_q, 0, 0),
                               (b, block_q, h, d))
        iq = lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        ik = lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

        # last k-block with any unmasked key for this q-block
        last_kb = (qi * block_q + block_q - 1) // block_k

        def k_compute(ci, carry2):
            m, l, acc = carry2
            kb = lax.dynamic_slice(k, (0, ci * block_k, 0, 0),
                                   (b, block_k, h, d))
            vb = lax.dynamic_slice(v, (0, ci * block_k, 0, 0),
                                   (b, block_k, h, d))
            s = jnp.einsum("bqhd,bkhd->bhqk", qb, kb,
                           preferred_element_type=jnp.float32,
                           precision=mm_prec) * scale
            causal = (qi * block_q + iq) >= (ci * block_k + ik)
            if segments is not None:
                sq = lax.dynamic_slice(segments, (0, qi * block_q),
                                       (b, block_q))
                sk = lax.dynamic_slice(segments, (0, ci * block_k),
                                       (b, block_k))
                same = sq[:, :, None] == sk[:, None, :]       # (B, bq, bk)
                s = jnp.where((causal[None] & same)[:, None], s, NEG_INF)
            else:
                s = jnp.where(causal[None, None], s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            if segments is not None:
                # a segment's keys can be entirely outside this tile, so
                # the running max may still be -inf: exp(-inf - -inf)
                # would be NaN.  Subtracting 0 instead yields exact
                # zeros for p/corr and the row's own tile takes over.
                # (Unsegmented causal never hits this: k-block 0 always
                # holds key 0, unmasked for every query.)
                m_sub = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
            else:
                m_sub = m_new
            p = jnp.exp(s - m_sub)
            corr = jnp.exp(m - m_sub)
            l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * corr + jnp.einsum(
                "bhqk,bkhd->bhqd", p.astype(q.dtype), vb,
                preferred_element_type=jnp.float32,
                precision=mm_prec)
            return m_new, l_new, acc_new

        m0 = jnp.full((b, h, block_q, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((b, h, block_q, 1), jnp.float32)
        acc0 = jnp.zeros((b, h, block_q, d), jnp.float32)
        if isinstance(qi, int):
            # unrolled path: qi is static, so the triangular trip count is
            # too — upper-triangle key blocks are simply never emitted
            m, l, acc = lax.fori_loop(0, last_kb + 1, k_compute,
                                      (m0, l0, acc0))
        else:
            # scanned path: static trip count (reverse-mode AD cannot
            # differentiate dynamic fori bounds); fully-masked upper-
            # triangle blocks are skipped at runtime by a cond
            def k_body(ci, carry2):
                return lax.cond(ci <= last_kb, partial(k_compute, ci),
                                lambda c: c, carry2)
            m, l, acc = lax.fori_loop(0, t // block_k, k_body,
                                      (m0, l0, acc0))
        out = (acc / l).astype(q.dtype)               # (B, H, bq, D)
        return carry, jnp.transpose(out, (0, 2, 1, 3))  # (B, bq, H, D)

    if unroll_q:
        remat = jax.checkpoint(q_body, static_argnums=(1,))
        outs = jnp.stack([remat(None, qi)[1] for qi in range(nq)])
    else:
        _, outs = lax.scan(jax.checkpoint(q_body), None,
                           jnp.arange(nq, dtype=jnp.int32))
    # (nq, B, bq, H, D) -> (B, T, H, D)
    return jnp.transpose(outs, (1, 0, 2, 3, 4)).reshape(b, t, h, d)


def causal_attention_auto(q, k, v, *, flash_threshold: int = 1024,
                          segments: jnp.ndarray = None):
    """Naive attention for short sequences (tests, tiny configs), flash
    tiles for long ones (training at block 8192)."""
    t = q.shape[1]
    if t > flash_threshold and t % 256 == 0:
        # unroll_q: each q-block gets a static triangular trip count, so
        # upper-triangle tiles are never emitted (69 ms vs 113 ms fwd+bwd
        # at the deployed (2, 8192, 8, 96) shape on v5e-1)
        return flash_causal_attention(q, k, v, unroll_q=True,
                                      segments=segments)
    return causal_attention(q, k, v, segments=segments)


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
    while s % chunk:
        # chunk must divide S: dynamic_slice clamps an out-of-range start
        # but the causal mask (start + iota) would not follow, so a
        # partial final chunk would be mis-masked.
        chunk //= 2
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
