"""Ring attention: causal self-attention with the sequence axis sharded
over a mesh axis (sequence/context parallelism).

Why: decoder training at the deployed block size is attention-bound —
T=8192 with a 30M model trains at 11-13% MFU on one chip because the
O(T^2) attention term dominates (STATUS.md, benchmarks/flash_probe.py).
Data parallelism cannot shrink T; sequence parallelism can.  Each device
holds a T/n slice of Q/K/V, K/V chunks rotate around the ``sp`` ring via
``ppermute`` (ICI neighbor transfers — the cheapest collective on a TPU
torus), and every device accumulates its queries' attention with the
same online-softmax (flash) recurrence as ``ops/attention.py``.  The
result is bit-comparable to full causal attention while per-device
attention memory and FLOPs drop by the ring size.

The reference has no counterpart (its trainer is DDP replication only,
train.py:255-428); this is TPU-first scaling machinery in the spirit of
the scaling-book's context-parallel recipe.

Design notes:

- Plain ring order: device i owns chunk i; after s rotations it holds
  chunk (i - s) mod n.  Chunks wholly in the causal upper triangle
  (src > i) are skipped with a ``lax.cond`` — correctness never depends
  on the skip, it only saves FLOPs.  Wall clock is set by the last
  device (n tiles of size (T/n)^2 -> T^2/n), so the skip does not
  shorten the critical path.
- The balanced ZIGZAG layout (below) halves that critical path: split T
  into 2n chunks, device i owns chunks i and 2n-1-i — the light early
  chunk pairs with the heavy late chunk, so every device computes
  exactly 2n+1 sub-tiles of size (T/2n)^2 -> ~T^2/2n.  Sub-tile
  schedule per ring step s (src = (i-s) mod n):
  (q_hi, k_lo) always computed, (q_lo, k_lo) iff src <= i, (q_hi, k_hi)
  iff src >= i, (q_lo, k_hi) never (always above the diagonal) — i.e. 3
  sub-tiles at s=0, exactly 2 at every other step, on EVERY device.
  The cost is a global T-permutation (:func:`zigzag_permutation`) of
  every position-indexed tensor; the trainer applies it device-side
  inside the jitted loss (one static gather of emb/targets per step —
  GSPMD turns it into a single all-to-all, negligible next to the T^2
  attention term) and indexes the positional table through the
  permutation, so the host collator stays layout-agnostic
  (models/decoder.py::decoder_loss ``perm=``).  Forward+grad parity vs
  plain ring and vs full attention is proven on the virtual mesh
  (tests/test_ring_attention.py); the wall-clock halving itself needs a
  real slice.
- Each ring step is ``jax.checkpoint``-ed: backward recomputes the
  (tc, tc) probability tile instead of saving it (268 MB/step in f32 at
  tc=2048, B=2, H=8).
- ``ppermute`` differentiates (its transpose is the inverse rotation),
  so one ``jax.grad`` through the shard_map trains end to end.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

try:  # jax >= 0.5 exports it at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = float("-inf")


def ring_causal_attention_local(q: jnp.ndarray, k: jnp.ndarray,
                                v: jnp.ndarray, *, axis_name: str,
                                n_chunks: int) -> jnp.ndarray:
    """Per-shard body: (B, Tc, H, D) local q/k/v -> (B, Tc, H, D).

    Must run inside a ``shard_map`` whose ``axis_name`` axis shards the
    sequence; ``n_chunks`` is that axis' size (static — it sets the ring
    trip count and the compiled program).
    """
    b, tc, h, d = q.shape
    scale = 1.0 / math.sqrt(d)
    mm_prec = (lax.Precision.HIGHEST if q.dtype == jnp.float32
               else lax.Precision.DEFAULT)
    idx = lax.axis_index(axis_name)
    iq = lax.broadcasted_iota(jnp.int32, (tc, tc), 0)
    ik = lax.broadcasted_iota(jnp.int32, (tc, tc), 1)

    def one_step(s, m, l, acc, kc, vc):
        src = (idx - s) % n_chunks

        def compute(carry):
            m, l, acc = carry
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, kc,
                                preferred_element_type=jnp.float32,
                                precision=mm_prec) * scale
            causal = (idx * tc + iq) >= (src * tc + ik)
            logits = jnp.where(causal[None, None], logits, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
            p = jnp.exp(logits - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * corr + jnp.einsum(
                "bhqk,bkhd->bhqd", p.astype(q.dtype), vc,
                preferred_element_type=jnp.float32, precision=mm_prec)
            return m_new, l_new, acc_new

        # src > idx: the whole tile sits in the masked upper triangle
        return lax.cond(src <= idx, compute, lambda c: c, (m, l, acc))

    one_step = jax.checkpoint(one_step, static_argnums=(0,))
    m = jnp.full((b, h, tc, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((b, h, tc, 1), jnp.float32)
    acc = jnp.zeros((b, h, tc, d), jnp.float32)
    kc, vc = k, v
    perm = [(j, (j + 1) % n_chunks) for j in range(n_chunks)]
    for s in range(n_chunks):
        m, l, acc = one_step(s, m, l, acc, kc, vc)
        if s < n_chunks - 1:
            kc = lax.ppermute(kc, axis_name, perm)
            vc = lax.ppermute(vc, axis_name, perm)
    out = acc / l                                    # (B, H, Tc, D)
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def zigzag_permutation(t: int, n: int):
    """Global T-permutation for the balanced zigzag layout.

    Returns ``(perm, inv)`` int32 numpy arrays: ``x[:, perm]`` reorders a
    time-major tensor so that a contiguous (T/n)-row shard i holds the
    original chunks i and 2n-1-i (each T/2n rows); ``inv`` undoes it
    (``perm[inv[p]] == p``).  Static — safe to bake into a jitted program
    as a constant gather index."""
    import numpy as np
    assert t % (2 * n) == 0, f"T={t} not divisible by 2*sp={2 * n}"
    tz = t // (2 * n)
    parts = []
    for i in range(n):
        parts.append(np.arange(i * tz, (i + 1) * tz))
        parts.append(np.arange((2 * n - 1 - i) * tz, (2 * n - i) * tz))
    perm = np.concatenate(parts).astype(np.int32)
    inv = np.argsort(perm).astype(np.int32)
    return perm, inv


def zigzag_ring_attention_local(q: jnp.ndarray, k: jnp.ndarray,
                                v: jnp.ndarray, *, axis_name: str,
                                n_chunks: int) -> jnp.ndarray:
    """Per-shard zigzag body: local (B, Tc, H, D) q/k/v in ZIGZAG order
    (rows = [chunk idx | chunk 2n-1-idx], Tc = 2*tz) -> same layout out.

    Two independent online-softmax accumulators (one per owned chunk);
    each ring step updates them from the visiting K/V pair's sub-chunks
    per the schedule in the module docstring.  Sub-tile masks compare
    GLOBAL positions (chunk offset + intra-chunk iota), so correctness
    never depends on the cond skips."""
    b, tc, h, d = q.shape
    n = n_chunks
    tz = tc // 2
    scale = 1.0 / math.sqrt(d)
    mm_prec = (lax.Precision.HIGHEST if q.dtype == jnp.float32
               else lax.Precision.DEFAULT)
    idx = lax.axis_index(axis_name)
    iq = lax.broadcasted_iota(jnp.int32, (tz, tz), 0)
    ik = lax.broadcasted_iota(jnp.int32, (tz, tz), 1)
    qlo, qhi = q[:, :tz], q[:, tz:]

    def subtile(carry, qh, kc, vc, qoff, koff):
        m, l, acc = carry
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kc,
                            preferred_element_type=jnp.float32,
                            precision=mm_prec) * scale
        causal = (qoff + iq) >= (koff + ik)
        logits = jnp.where(causal[None, None], logits, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.einsum(
            "bhqk,bkhd->bhqd", p.astype(qh.dtype), vc,
            preferred_element_type=jnp.float32, precision=mm_prec)
        return m_new, l_new, acc_new

    def one_step(s, lo, hi, kc, vc):
        src = (idx - s) % n
        klo, khi = kc[:, :tz], kc[:, tz:]
        vlo, vhi = vc[:, :tz], vc[:, tz:]
        q_lo_off = idx * tz
        q_hi_off = (2 * n - 1 - idx) * tz
        k_lo_off = src * tz
        k_hi_off = (2 * n - 1 - src) * tz
        # (q_hi, k_lo): q_hi's chunk id (>= n) always exceeds k_lo's
        hi = subtile(hi, qhi, klo, vlo, q_hi_off, k_lo_off)
        # (q_lo, k_lo): needed iff src <= idx (diagonal masks intra-tile)
        lo = lax.cond(src <= idx,
                      lambda c: subtile(c, qlo, klo, vlo, q_lo_off,
                                        k_lo_off),
                      lambda c: c, lo)
        # (q_hi, k_hi): needed iff src >= idx
        hi = lax.cond(src >= idx,
                      lambda c: subtile(c, qhi, khi, vhi, q_hi_off,
                                        k_hi_off),
                      lambda c: c, hi)
        return lo, hi

    one_step = jax.checkpoint(one_step, static_argnums=(0,))
    init = lambda: (jnp.full((b, h, tz, 1), NEG_INF, jnp.float32),
                    jnp.zeros((b, h, tz, 1), jnp.float32),
                    jnp.zeros((b, h, tz, d), jnp.float32))
    lo, hi = init(), init()
    kc, vc = k, v
    perm = [(j, (j + 1) % n) for j in range(n)]
    for s in range(n):
        lo, hi = one_step(s, lo, hi, kc, vc)
        if s < n - 1:
            kc = lax.ppermute(kc, axis_name, perm)
            vc = lax.ppermute(vc, axis_name, perm)
    out = jnp.concatenate([lo[2] / lo[1], hi[2] / hi[1]], axis=2)
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def make_zigzag_ring_attention(mesh: Mesh, *, sp_axis: str = "sp",
                               dp_axis: str = "dp") -> Callable:
    """Like :func:`make_ring_attention` but with the balanced zigzag
    layout: inputs/outputs are global (B, T, H, D) arrays whose T axis is
    ALREADY zigzag-permuted (``x[:, perm]`` with
    ``perm = zigzag_permutation(T, n)[0]``)."""
    n = int(mesh.shape[sp_axis])
    body = partial(zigzag_ring_attention_local, axis_name=sp_axis,
                   n_chunks=n)

    def wrapped(q, k, v):
        return body(q, k, v)

    spec = P(dp_axis, sp_axis, None, None)
    kwargs = dict(mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    try:
        sm = _shard_map(wrapped, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - flag name depends on version
        sm = _shard_map(wrapped, check_rep=False, **kwargs)

    def attn_fn(q, k, v):
        t = q.shape[1]
        if t % (2 * n):
            raise ValueError(f"T={t} not divisible by 2*sp={2 * n}")
        return sm(q, k, v)

    return attn_fn


def make_ring_attention(mesh: Mesh, *, sp_axis: str = "sp",
                        dp_axis: str = "dp") -> Callable:
    """Build an ``attn_fn(q, k, v)`` drop-in for
    ``ops.attention.causal_attention`` with global (B, T, H, D) arrays:
    batch shards over ``dp_axis``, sequence over ``sp_axis``.  Call it
    inside a jit over ``mesh`` (the shard_map doubles as the sharding
    constraint that makes GSPMD keep the surrounding activations
    T-sharded)."""
    n = int(mesh.shape[sp_axis])
    body = partial(ring_causal_attention_local, axis_name=sp_axis,
                   n_chunks=n)

    def wrapped(q, k, v):
        return body(q, k, v)

    spec = P(dp_axis, sp_axis, None, None)
    kwargs = dict(mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    try:
        sm = _shard_map(wrapped, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - flag name depends on version
        sm = _shard_map(wrapped, check_rep=False, **kwargs)

    def attn_fn(q, k, v):
        t = q.shape[1]
        if t % n:
            raise ValueError(f"T={t} not divisible by sp={n}")
        return sm(q, k, v)

    return attn_fn
