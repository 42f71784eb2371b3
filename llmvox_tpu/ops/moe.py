"""Mixture-of-experts FFN with GShard-style static-capacity dispatch.

The reference has no MoE anywhere (its LLM is a dense Llama-family
checkpoint, inference/llm_streaming.py:30-45); this is a beyond-reference
capability that completes the parallelism matrix: dp / tp / sp / fsdp /
pp already exist, and the expert axis ("ep", parallel/mesh.py) is the one
scaling dimension none of them covers — per-chip parameter memory for the
FFN drops by the ep size while tokens flow to whichever chip holds their
expert.

TPU-first design choices:

* **Static shapes everywhere.** Top-k routing is data-dependent, which is
  exactly what XLA cannot tile — so, like GShard/Switch, each expert gets
  a fixed ``capacity`` of token rows per program.  Dispatch/combine are
  dense one-hot tensors contracted with einsums: the MXU sees three large
  batched matmuls (dispatch gather, expert SwiGLU, combine scatter) and
  zero gathers with data-dependent indices.
* **Expert parallelism is just a sharding.** The expert axis (leading dim
  of the expert weights and of the (E, capacity, C) dispatched
  activations) carries a ``PartitionSpec("ep")``; GSPMD partitions the
  dispatch/combine einsums into the all-to-alls a hand-written MPI
  implementation would do explicitly.  Composes with tp (expert hidden
  dim) and dp (token batch) in one mesh.
* **Capacity drops are the documented overflow behavior** (tokens routed
  past an expert's capacity contribute zero for that expert, keeping
  their other top-k routes), matching Switch-Transformer semantics; the
  load-balancing aux loss is what keeps drops rare in training.

Verified against a per-token/per-expert loop oracle in tests/test_moe.py
(exact when capacity is large enough that nothing drops).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from llmvox_tpu.ops import nn as ops


def moe_capacity(n_tokens: int, n_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Static per-expert token capacity: ceil(N * K / E * factor), clamped
    to [1, N] (an expert can never receive more than every token once —
    lax.top_k returns distinct experts per token)."""
    cap = math.ceil(n_tokens * top_k / n_experts * capacity_factor)
    return max(1, min(n_tokens, cap))


def moe_ffn(x: jnp.ndarray, router_w: jnp.ndarray, wgate: jnp.ndarray,
            wup: jnp.ndarray, wdown: jnp.ndarray, top_k: int,
            capacity_factor: float = 2.0
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k routed SwiGLU experts over ``x`` (..., C).

    ``router_w`` (C, E); ``wgate``/``wup`` (E, C, I); ``wdown`` (E, I, C).
    Routing follows the Mixtral convention: softmax over the top-k router
    logits only (weights renormalize over the chosen experts).  Returns
    ``(y, aux)`` with ``y`` shaped like ``x`` and ``aux`` the
    Switch/Mixtral load-balancing loss E * sum_e f_e * P_e (f_e the
    fraction of routed (token, slot) pairs landing on expert e, P_e the
    mean router probability of e) — 1.0 at perfect balance.
    """
    orig_shape = x.shape
    c = orig_shape[-1]
    e = router_w.shape[-1]
    xf = x.reshape(-1, c)
    n = xf.shape[0]
    cap = moe_capacity(n, e, top_k, capacity_factor)

    logits = ops.linear(xf, router_w).astype(jnp.float32)       # (N, E)
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(logits, top_k)                   # (N, K)
    w = jax.nn.softmax(topv, axis=-1)                           # renorm top-k

    # position-in-expert: token n's k-th route is the p-th row of its
    # expert, p = number of earlier (n-major, k-minor) routes to the same
    # expert.  Cumsum over the flattened route order keeps priority
    # deterministic (earlier tokens win capacity), like GShard.
    onehot_e = jax.nn.one_hot(topi, e, dtype=jnp.int32)         # (N, K, E)
    flat = onehot_e.reshape(n * top_k, e)
    pos_f = jnp.cumsum(flat, axis=0) - flat                     # routes before
    pos = jnp.sum(pos_f.reshape(n, top_k, e) * onehot_e, axis=-1)  # (N, K)
    keep = pos < cap

    dtype = x.dtype
    dispatch = jnp.zeros((n, e, cap), dtype)
    combine = jnp.zeros((n, e, cap), dtype)
    for k in range(top_k):                                      # K is tiny
        hot = (jax.nn.one_hot(topi[:, k], e, dtype=dtype)[:, :, None]
               * jax.nn.one_hot(pos[:, k], cap, dtype=dtype)[:, None, :]
               * keep[:, k, None, None].astype(dtype))
        dispatch = dispatch + hot
        combine = combine + hot * w[:, k, None, None].astype(dtype)

    prec = ops.mm_precision(dtype)
    xin = jnp.einsum("nec,nd->ecd", dispatch, xf, precision=prec)
    gate = jnp.einsum("ecd,edi->eci", xin, wgate, precision=prec)
    up = jnp.einsum("ecd,edi->eci", xin, wup, precision=prec)
    h = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
    xout = jnp.einsum("eci,eid->ecd", h, wdown, precision=prec)
    y = jnp.einsum("nec,ecd->nd", combine, xout, precision=prec)

    f = jnp.mean(jnp.sum(onehot_e, axis=1).astype(jnp.float32), axis=0)
    aux = e * jnp.sum((f / top_k) * jnp.mean(probs, axis=0))
    return y.reshape(orig_shape), aux
