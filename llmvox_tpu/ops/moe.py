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
* **Grouped dispatch bounds memory** (GShard's token groups): the dense
  dispatch/combine tensors are O(N * E * cap); with one global group at
  training lengths (N = B*T) that is O(N^2) and dominates the expert
  FLOPs.  ``group_size=G`` dispatches per group of G tokens (per-group
  capacity, per-group earlier-token-wins priority), making the tensors
  O(N * E * G / something) -- concretely (N/G, G, E, cap) -- while the
  expert matmuls see (E, N/G * cap, C), still three large MXU batched
  matmuls.
* **Capacity drops are the documented overflow behavior** for TRAINING
  (tokens routed past an expert's per-group capacity contribute zero for
  that expert, keeping their other top-k routes), matching
  Switch-Transformer semantics; the load-balancing aux loss is what keeps
  drops rare.  INFERENCE paths must instead pass ``drop_free=True``
  (capacity = group size, so no token can ever drop): a serving batch
  mixes co-scheduled requests and padding rows, and any possible drop
  would make one request's output depend on its neighbors (ADVICE r3
  high finding) and diverge from the capacity-free HF forward.
* **Padding/inactive tokens are masked out of routing** via
  ``token_mask``: their dispatch one-hots are zeroed BEFORE the
  position-in-expert cumsum, so they consume no expert capacity and
  contribute nothing to the load-balancing statistics.  (Without this, a
  padded prefill position could evict a real token under capped
  capacity.)

Verified against a per-token/per-expert loop oracle in tests/test_moe.py
(exact when nothing drops; drop-free grouping is output-invariant to the
choice of G, also tested).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

try:  # jax >= 0.7 moved shard_map out of experimental
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - version-dependent import path
    from jax.experimental.shard_map import shard_map as _shard_map

from llmvox_tpu.ops import nn as ops
from llmvox_tpu.ops import quant


def expert_matmul(x: jnp.ndarray, w, prec) -> jnp.ndarray:
    """Per-expert batched matmul ``(E, R, Cin) @ (E, Cin, Cout)`` that
    accepts quantized expert weights (ops/quant.py containers) — the MoE
    analogue of ``ops.nn.linear``'s dispatch, so ``--quantize`` reaches
    the expert weights (where an 8-expert model's parameter memory
    actually lives) and not just the dense matmuls.

    Per-container formulation (all keep the stored bytes as what HBM
    streams — the lesson from the dense int4 path applies here too:
    a dequantized producer that XLA materializes re-spends the bytes
    quantization saved):

    - ``QuantizedTensor`` (w8): per-(expert, out-channel) scales are
      constant along the contraction, so they pull OUT of the dot —
      ``x_e @ (q_e * s_e) == (x_e @ q_e) * s_e``; the int8->bf16 cast
      fuses into the dot operand read.
    - ``Int8Linear`` (w8a8): activations quantize per (expert, row) and
      the batched ``dot_general`` runs natively int8 with int32
      accumulation.
    - ``Int4Tensor`` (w4): group-batched nibble-split einsums (the
      even/odd logical rows live in the low/high nibble of one packed
      row, so the slice moves to the small activation side); scales are
      per (expert, group, out-channel) and apply to the per-group
      partial sums.  The Pallas VMEM-unpack kernel stays dense-2D-only
      (ops/pallas_quant.py); at expert counts the group-batched XLA path
      is the same formulation that measured 83 ms vs the naive 240 ms at
      1B dense shapes.
    """
    if isinstance(w, quant.QuantizedTensor):
        f = jnp.float32
        op = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
        y = jnp.einsum("erd,edc->erc", x.astype(op), w.q.astype(op),
                       preferred_element_type=f)
        return (y * w.s.astype(f)).astype(x.dtype)
    if isinstance(w, quant.Int8Linear):
        ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
        sx = jnp.maximum(ax, 1e-8) / 127.0
        qx = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                      -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            qx, w.q, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)           # (E, R, Cout)
        scale = sx * w.s.astype(jnp.float32)            # (E,R,1)*(E,1,C)
        return (y.astype(jnp.float32) * scale).astype(x.dtype)
    if isinstance(w, quant.Int4Tensor):
        q, s = w.q, w.s                   # (E, Cin/2, C), (E, G, 1, C)
        e, p, c = q.shape
        g = s.shape[-3]
        gp = p // g                       # packed rows per group
        f = jnp.float32
        op = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
        lo = jnp.right_shift(jnp.left_shift(q, 4), 4).reshape(e, g, gp, c)
        hi = jnp.right_shift(q, 4).reshape(e, g, gp, c)
        r = x.shape[-2]
        xe = x[..., 0::2].reshape(e, r, g, gp).astype(op)
        xo = x[..., 1::2].reshape(e, r, g, gp).astype(op)
        ye = jnp.einsum("ergk,egkc->ergc", xe, lo.astype(op),
                        preferred_element_type=f)
        yo = jnp.einsum("ergk,egkc->ergc", xo, hi.astype(op),
                        preferred_element_type=f)
        y = jnp.sum((ye + yo) * s[:, None, :, 0, :].astype(f), axis=-2)
        return y.astype(x.dtype)
    return jnp.einsum("erd,edc->erc", x, w, precision=prec)


def moe_capacity(n_tokens: int, n_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Static per-expert token capacity: ceil(N * K / E * factor), clamped
    to [1, N] (an expert can never receive more than every token once —
    lax.top_k returns distinct experts per token)."""
    cap = math.ceil(n_tokens * top_k / n_experts * capacity_factor)
    return max(1, min(n_tokens, cap))


def moe_ffn(x: jnp.ndarray, router_w: jnp.ndarray, wgate: jnp.ndarray,
            wup: jnp.ndarray, wdown: jnp.ndarray, top_k: int,
            capacity_factor: float = 2.0,
            token_mask: Optional[jnp.ndarray] = None,
            group_size: int = 0, drop_free: bool = False
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k routed SwiGLU experts over ``x`` (..., C).

    ``router_w`` (C, E); ``wgate``/``wup`` (E, C, I); ``wdown`` (E, I, C).
    Routing follows the Mixtral convention: softmax over the top-k router
    logits only (weights renormalize over the chosen experts).  Returns
    ``(y, aux)`` with ``y`` shaped like ``x`` and ``aux`` the
    Switch/Mixtral load-balancing loss E * sum_e f_e * P_e (f_e the
    fraction of routed (token, slot) pairs landing on expert e, P_e the
    mean router probability of e) — 1.0 at perfect balance.

    ``token_mask`` (bool, shaped like x minus the channel dim): False
    tokens are excluded from routing entirely — no capacity consumed, no
    aux-loss contribution, zero output row.  ``group_size``: dispatch in
    groups of G tokens (0 = one global group).  ``drop_free=True`` sets
    capacity to the group size so no token can ever overflow — REQUIRED
    on inference/serving paths (see module docstring); costs E*N expert
    rows instead of N*K*cf, which is irrelevant at decode batch sizes
    and a documented one-shot cost at prefill widths.
    """
    orig_shape = x.shape
    c = orig_shape[-1]
    e = router_w.shape[-1]
    xf = x.reshape(-1, c)
    n = xf.shape[0]
    mask = (jnp.ones((n,), bool) if token_mask is None
            else token_mask.reshape(-1).astype(bool))

    g = int(group_size) if group_size else n
    g = max(1, min(g, n))
    ng = -(-n // g)                                              # ceil
    npad = ng * g
    if npad != n:
        xf = jnp.pad(xf, ((0, npad - n), (0, 0)))
        mask = jnp.pad(mask, (0, npad - n))
    cap = g if drop_free else moe_capacity(g, e, top_k, capacity_factor)

    logits = ops.linear(xf, router_w).astype(jnp.float32)        # (Np, E)
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(logits, top_k)                    # (Np, K)
    w = jax.nn.softmax(topv, axis=-1)                            # renorm top-k

    # Position-in-expert within each group: token t's k-th route is the
    # p-th row of its expert, p = number of earlier (t-major, k-minor)
    # MASKED-IN routes in the same group to the same expert.  Masked
    # tokens are zeroed BEFORE the cumsum, so they never consume
    # capacity; the cumsum over the per-group flattened route order keeps
    # priority deterministic (earlier tokens win), like GShard.
    onehot_e = (jax.nn.one_hot(topi, e, dtype=jnp.int32)
                * mask[:, None, None].astype(jnp.int32))         # (Np, K, E)
    flat = onehot_e.reshape(ng, g * top_k, e)
    pos_f = jnp.cumsum(flat, axis=1) - flat                      # routes before
    pos = jnp.sum(pos_f.reshape(npad, top_k, e)
                  * onehot_e, axis=-1)                           # (Np, K)
    keep = (pos < cap) & mask[:, None]

    dtype = x.dtype
    dispatch = jnp.zeros((npad, e, cap), dtype)
    combine = jnp.zeros((npad, e, cap), dtype)
    for k in range(top_k):                                       # K is tiny
        hot = (jax.nn.one_hot(topi[:, k], e, dtype=dtype)[:, :, None]
               * jax.nn.one_hot(pos[:, k], cap, dtype=dtype)[:, None, :]
               * keep[:, k, None, None].astype(dtype))
        dispatch = dispatch + hot
        combine = combine + hot * w[:, k, None, None].astype(dtype)

    prec = ops.mm_precision(dtype)
    dg = dispatch.reshape(ng, g, e, cap)
    cg = combine.reshape(ng, g, e, cap)
    xg = xf.reshape(ng, g, c)
    # (G groups ride along the expert row axis: the expert matmuls
    # contract (E, ng*cap, C) against shared weights — same three MXU
    # batched matmuls, group-count-independent programs.)
    xin = jnp.einsum("gnec,gnd->egcd", dg, xg, precision=prec)
    xin = xin.reshape(e, ng * cap, c)
    gate = expert_matmul(xin, wgate, prec)
    up = expert_matmul(xin, wup, prec)
    h = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
    xout = expert_matmul(h, wdown, prec)
    xout = xout.reshape(e, ng, cap, c)
    y = jnp.einsum("gnec,egcd->gnd", cg, xout, precision=prec)
    y = y.reshape(npad, c)[:n]

    # load-balancing stats over masked-in tokens only (a padded prefill
    # position must not dilute f_e / P_e toward uniform)
    denom = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    f = jnp.sum(jnp.sum(onehot_e, axis=1).astype(jnp.float32),
                axis=0) / denom
    pmean = jnp.sum(probs * mask[:, None].astype(jnp.float32),
                    axis=0) / denom
    aux = e * jnp.sum((f / top_k) * pmean)
    return y.reshape(orig_shape), aux


def moe_ffn_a2a(x: jnp.ndarray, router_w: jnp.ndarray, wgate: jnp.ndarray,
                wup: jnp.ndarray, wdown: jnp.ndarray, top_k: int,
                axis_name: str, capacity_factor: float = 2.0,
                token_mask: Optional[jnp.ndarray] = None,
                drop_free: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hand-written expert-parallel MoE: explicit ``all_to_all`` dispatch
    inside a ``shard_map`` (the fallback STATUS.md r3 reserved for the day
    GSPMD's partitioning of :func:`moe_ffn`'s dispatch/combine einsums
    disappoints at production shapes).

    Call ONLY inside ``shard_map`` with ``axis_name`` sharding BOTH the
    token rows (``x``: this chip's ``(n_loc, C)`` shard) and the expert
    axis (``wgate``/``wup``/``wdown``: ``(E_loc, C, I)`` local experts);
    ``router_w`` (C, E_global) is replicated.  Each chip routes its own
    tokens against ALL experts, packs them into per-(chip, expert)
    capacity slots, and ONE tiled ``all_to_all`` moves every row to the
    chip owning its expert (the exact collective GSPMD would have to
    infer); the inverse ``all_to_all`` brings the expert outputs home for
    the local weighted combine.  Wire traffic is the theoretical minimum
    for GShard dispatch: 2 x (E_global * cap * C) per chip per layer,
    plus one scalar psum pair for the global load-balancing loss.

    Semantics match :func:`moe_ffn` with ``group_size = n_loc`` and
    groups aligned to chip shards: per-(chip, expert) capacity
    ``moe_capacity(n_loc, ...)`` (or ``n_loc`` when ``drop_free``),
    earlier-token-wins priority WITHIN a chip, masked tokens consume no
    capacity.  Differentiable end to end (``all_to_all`` transposes to
    the inverse exchange), so it trains; the aux loss psums the
    route/probability statistics so it equals the single-program global
    value.  Parity with :func:`moe_ffn` — forward and grads, capped and
    drop-free — is proven on the virtual mesh in tests/test_moe.py.
    """
    orig_shape = x.shape
    c = orig_shape[-1]
    e = router_w.shape[-1]
    e_loc = wgate.shape[0] if not isinstance(wgate, (quant.QuantizedTensor,
                                                     quant.Int8Linear,
                                                     quant.Int4Tensor)) \
        else wgate.q.shape[0]
    n_ep = e // e_loc
    xf = x.reshape(-1, c)
    n = xf.shape[0]
    mask = (jnp.ones((n,), bool) if token_mask is None
            else token_mask.reshape(-1).astype(bool))
    cap = n if drop_free else moe_capacity(n, e, top_k, capacity_factor)

    logits = ops.linear(xf, router_w).astype(jnp.float32)         # (n, E)
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(logits, top_k)
    w = jax.nn.softmax(topv, axis=-1)

    onehot_e = (jax.nn.one_hot(topi, e, dtype=jnp.int32)
                * mask[:, None, None].astype(jnp.int32))          # (n, K, E)
    flat = onehot_e.reshape(1, n * top_k, e)
    pos_f = jnp.cumsum(flat, axis=1) - flat
    pos = jnp.sum(pos_f.reshape(n, top_k, e) * onehot_e, axis=-1)
    keep = (pos < cap) & mask[:, None]

    dtype = x.dtype
    dispatch = jnp.zeros((n, e, cap), dtype)
    combine = jnp.zeros((n, e, cap), dtype)
    for k in range(top_k):
        hot = (jax.nn.one_hot(topi[:, k], e, dtype=dtype)[:, :, None]
               * jax.nn.one_hot(pos[:, k], cap, dtype=dtype)[:, None, :]
               * keep[:, k, None, None].astype(dtype))
        dispatch = dispatch + hot
        combine = combine + hot * w[:, k, None, None].astype(dtype)

    prec = ops.mm_precision(dtype)
    # local pack: (E_global, cap, C) rows destined for each expert
    xin = jnp.einsum("nec,nd->ecd", dispatch, xf, precision=prec)
    # ONE exchange: axis-0 blocks of E_loc experts go to their owner;
    # received axis 0 is ordered by SOURCE chip — (src, E_loc, cap, C)
    xin = jax.lax.all_to_all(xin, axis_name, split_axis=0, concat_axis=0,
                             tiled=True)
    xin = (xin.reshape(n_ep, e_loc, cap, c)
           .transpose(1, 0, 2, 3).reshape(e_loc, n_ep * cap, c))
    gate = expert_matmul(xin, wgate, prec)
    up = expert_matmul(xin, wup, prec)
    h = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
    xout = expert_matmul(h, wdown, prec)
    # inverse exchange: results go home, axis 0 back to global expert id
    xout = (xout.reshape(e_loc, n_ep, cap, c)
            .transpose(1, 0, 2, 3).reshape(e, cap, c))
    xout = jax.lax.all_to_all(xout, axis_name, split_axis=0, concat_axis=0,
                              tiled=True)
    y = jnp.einsum("nec,ecd->nd", combine, xout, precision=prec)

    # global load-balancing stats: psum the masked-in sums so the loss
    # equals moe_ffn's single-program value over the full token set
    denom = jax.lax.psum(jnp.sum(mask.astype(jnp.float32)), axis_name)
    denom = jnp.maximum(denom, 1.0)
    f = jax.lax.psum(
        jnp.sum(jnp.sum(onehot_e, axis=1).astype(jnp.float32), axis=0),
        axis_name) / denom
    pmean = jax.lax.psum(
        jnp.sum(probs * mask[:, None].astype(jnp.float32), axis=0),
        axis_name) / denom
    aux = e * jnp.sum((f / top_k) * pmean)
    return y.reshape(orig_shape), aux


def make_moe_a2a(mesh, *, top_k: int, ep_axis: str = "ep",
                 capacity_factor: float = 2.0, drop_free: bool = False):
    """Build ``moe(x, router_w, wgate, wup, wdown, token_mask=None) ->
    (y, aux)`` over GLOBAL arrays: token rows (axis 0 of ``x`` (N, C))
    shard over ``ep_axis``, experts (axis 0 of the weights) likewise,
    router replicated — the :func:`moe_ffn_a2a` shard_map wrapper, shaped
    like :func:`ops.ring_attention.make_ring_attention`.  N must divide
    by the ep size; per-chip capacity follows the chip's token shard
    (``group_size = N/ep`` semantics)."""
    n_ep = int(mesh.shape[ep_axis])
    P = jax.sharding.PartitionSpec
    body = partial(moe_ffn_a2a, top_k=top_k, axis_name=ep_axis,
                   capacity_factor=capacity_factor, drop_free=drop_free)

    def wrapped(x, rw, wg, wu, wd, token_mask):
        return body(x, rw, wg, wu, wd, token_mask=token_mask)

    row = P(ep_axis, None)
    exp = P(ep_axis, None, None)
    kwargs = dict(mesh=mesh,
                  in_specs=(row, P(), exp, exp, exp, P(ep_axis)),
                  out_specs=(row, P()))
    try:
        sm = _shard_map(wrapped, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - flag name depends on version
        sm = _shard_map(wrapped, check_rep=False, **kwargs)

    def moe(x, rw, wg, wu, wd, token_mask=None):
        if x.shape[0] % n_ep:
            raise ValueError(f"N={x.shape[0]} not divisible by ep={n_ep}")
        if token_mask is None:
            token_mask = jnp.ones((x.shape[0],), bool)
        return sm(x, rw, wg, wu, wd, token_mask)

    return moe
