"""Pipeline-parallel Llama inference: layers sharded over a ``pp`` mesh
axis, microbatches flowing stage-to-stage via ``ppermute``.

Why: tensor parallelism (parallel/sharding.py::llama_param_shardings)
splits every matmul across chips and pays two all-reduces per layer —
the right trade inside a high-bandwidth ICI domain.  Pipeline
parallelism moves WHOLE LAYERS to each chip and pays one neighbor
transfer of a microbatch activation per stage boundary — the right
trade when the model's layers don't fit one chip and the batch is large
enough to keep stages busy (decode pools).  The reference has neither
(one replica per GPU, streaming_server.py:163-169); this completes the
dp/tp/sp/fsdp/pp parallelism matrix.

Schedule (decode): with n_pp stages and M >= n_pp microbatches of a
B-row pool, job j = (microbatch j % M, token-step j // M) enters stage 0
at tick j; stage s runs job (tick - s).  Token t+1 of a microbatch needs
token t's sample, which commits at tick t*M + m + n_pp - 1 — strictly
before its entry tick (t+1)*M + m exactly when M >= n_pp, so the
pipeline never stalls and every stage is busy outside the n_pp - 1
fill/drain ticks.  Sampled tokens are psum-broadcast to all stages each
tick (a (B/M,) int32 vector — negligible), which also keeps every
stage's ``pos``/``tok`` registers identical, so the returned state is
replicated by construction.

Fill/drain ticks are skipped with ``lax.cond`` (no compute, no cache
writes); the predicate depends only on (tick, stage), never on data, so
every device still executes the same collective sequence.

State layout is :class:`llmvox_tpu.models.llama.LlamaPoolState` with the
layer axis of the KV caches sharded ``P("pp")`` — the pp-ness lives in
shardings and this program, not in a new state type.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

try:  # jax >= 0.5
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llmvox_tpu.models import llama
from llmvox_tpu.models.llama import (LlamaConfig, LlamaPoolState,
                                     _layer_step_rows, _head, _sample,
                                     rms_norm)
from llmvox_tpu.ops import nn as ops

PP_AXIS = "pp"


def llama_pp_param_shardings(mesh: Mesh, params: Dict,
                             pp_axis: str = PP_AXIS) -> Dict:
    """Layer-stacked params shard their leading (layer) axis over pp;
    embeddings / final norm / lm head / draft heads replicate (stage 0
    needs the embedding, the last stage the head — replicating both costs
    little and keeps the program uniform)."""
    def pick(path, leaf):
        top = path[0].key
        if top == "h":
            return NamedSharding(mesh, P(pp_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(pick, params)


def llama_pp_state_shardings(mesh: Mesh, pp_axis: str = PP_AXIS
                             ) -> LlamaPoolState:
    """KV caches shard the layer axis over pp; pos/tok replicate."""
    return LlamaPoolState(
        k=NamedSharding(mesh, P(pp_axis)),
        v=NamedSharding(mesh, P(pp_axis)),
        pos=NamedSharding(mesh, P()),
        tok=NamedSharding(mesh, P()))


def _stage_layers(params_h: Dict, x: jnp.ndarray, k_loc, v_loc,
                  pos_vec: jnp.ndarray, cfg: LlamaConfig):
    """Run this stage's local layer stack (a lax.scan over the pp shard
    of ``params['h']``) on one microbatch — the per-stage body both the
    prefill and the decode pipelines share."""
    def body(carry, scan_in):
        x = carry
        lp, kc, vc = scan_in
        x, kc, vc = _layer_step_rows(lp, x, kc, vc, pos_vec, cfg)
        return x, (kc, vc)

    return lax.scan(body, x, (params_h, k_loc, v_loc))


def _ring(n: int):
    return [(i, (i + 1) % n) for i in range(n)]


def make_pp_decode(mesh: Mesh, cfg: LlamaConfig, *, block: int = 16,
                   n_micro: int = 0, temperature: float = 0.0,
                   top_k: int = 0, top_p: float = 1.0,
                   pp_axis: str = PP_AXIS):
    """Build a jitted pipelined decode:
    ``fn(params, state, active, rng) -> ((B, block) tokens, state)`` —
    the pp rendition of :func:`llama.decode_block_pooled` (greedy output
    is token-identical; sampled mode draws from the same per-step
    filtered distribution with a tick-folded rng stream).

    ``n_micro`` (M) defaults to the pp size; M must divide B and satisfy
    M >= n_pp.  Params/state must be placed with
    :func:`llama_pp_param_shardings` / :func:`llama_pp_state_shardings`
    (the shard_map also acts as the constraint).
    """
    n_pp = int(mesh.shape[pp_axis])
    M = n_micro or n_pp
    assert M >= n_pp, f"need n_micro >= pp ({M} < {n_pp})"
    assert cfg.n_layer % n_pp == 0, "layers must split evenly over pp"

    def shard_fn(params, state, active, rng):
        b = state.tok.shape[0]
        bm = b // M
        s_idx = lax.axis_index(pp_axis)
        is_last = s_idx == n_pp - 1
        n_jobs = M * block
        emb = params["tok_emb"]

        def tick(carry, tau):
            send, tok_reg, pos_reg, k_loc, v_loc, out = carry
            recv = lax.ppermute(send, pp_axis, _ring(n_pp))
            j = tau - s_idx
            valid = (j >= 0) & (j < n_jobs)
            mu = jnp.where(valid, j % M, 0)
            rows = mu * bm
            toks_mu = lax.dynamic_slice(tok_reg, (rows,), (bm,))
            pos_mu = lax.dynamic_slice(pos_reg, (rows,), (bm,))
            act_mu = lax.dynamic_slice(active, (rows,), (bm,))
            x_in = jnp.where((s_idx == 0)[..., None, None],
                             emb[toks_mu][:, None, :], recv)

            def compute(operand):
                x, k_loc, v_loc = operand
                kc = lax.dynamic_slice_in_dim(k_loc, rows, bm, axis=1)
                vc = lax.dynamic_slice_in_dim(v_loc, rows, bm, axis=1)
                # inactive rows park their write on their current pos —
                # the row is re-prefilled before reuse, so the clobbered
                # cache row is never read (mask is j <= pos + i and the
                # frozen pos never advances)
                x, (kc, vc) = _stage_layers(params["h"], x, kc, vc,
                                            pos_mu, cfg)
                k_loc = lax.dynamic_update_slice_in_dim(k_loc, kc, rows,
                                                        axis=1)
                v_loc = lax.dynamic_update_slice_in_dim(v_loc, vc, rows,
                                                        axis=1)
                return x, k_loc, v_loc

            x_out, k_loc, v_loc = lax.cond(
                valid, compute, lambda o: o, (x_in, k_loc, v_loc))

            # last stage: sample this job's token (garbage off-stage /
            # off-schedule — gated below)
            h = rms_norm(x_out[:, -1], params["lnf_s"], cfg.rms_eps)
            logits = ops.linear(h, _head(params))
            nxt = _sample(logits, jax.random.fold_in(rng, tau),
                          temperature, top_k, top_p)
            nxt = jnp.where(act_mu, nxt, toks_mu)   # frozen inactive rows
            contrib = jnp.where(is_last, nxt, jnp.zeros_like(nxt))
            sampled = lax.psum(contrib, pp_axis)    # broadcast to stages

            j_last = tau - (n_pp - 1)
            valid_last = (j_last >= 0) & (j_last < n_jobs)
            mu_last = jnp.where(valid_last, j_last % M, 0)
            rows_last = mu_last * bm
            act_last = lax.dynamic_slice(active, (rows_last,), (bm,))
            tok_new = lax.dynamic_update_slice(tok_reg, sampled,
                                               (rows_last,))
            tok_reg = jnp.where(valid_last, tok_new, tok_reg)
            pos_slice = lax.dynamic_slice(pos_reg, (rows_last,), (bm,))
            pos_new = lax.dynamic_update_slice(
                pos_reg, pos_slice + act_last.astype(jnp.int32),
                (rows_last,))
            pos_reg = jnp.where(valid_last, pos_new, pos_reg)
            t_last = jnp.clip(j_last // M, 0, block - 1)
            out_new = lax.dynamic_update_slice(out, sampled[None, :],
                                               (t_last, rows_last))
            out = jnp.where(valid_last, out_new, out)
            return (x_out, tok_reg, pos_reg, k_loc, v_loc, out), None

        send0 = jnp.zeros((bm, 1, cfg.n_embd), params["tok_emb"].dtype)
        out0 = jnp.zeros((block, b), jnp.int32)
        ticks = jnp.arange(n_jobs + n_pp - 1)
        (_, tok_reg, pos_reg, k_loc, v_loc, out), _ = lax.scan(
            tick, (send0, state.tok, state.pos, state.k, state.v, out0),
            ticks)
        return out.T, LlamaPoolState(k_loc, v_loc, pos_reg, tok_reg)

    rep = P()
    st_specs = LlamaPoolState(k=P(pp_axis), v=P(pp_axis), pos=rep, tok=rep)

    def pspec(path, leaf):
        return P(pp_axis) if path[0].key == "h" else rep

    def build(params):
        pspecs = jax.tree_util.tree_map_with_path(pspec, params)
        kwargs = dict(mesh=mesh,
                      in_specs=(pspecs, st_specs, rep, rep),
                      out_specs=(rep, st_specs))
        try:
            sm = _shard_map(shard_fn, check_vma=False, **kwargs)
        except TypeError:  # pragma: no cover
            sm = _shard_map(shard_fn, check_rep=False, **kwargs)
        return jax.jit(sm, donate_argnums=(1,))

    cache = {}

    def fn(params, state, active, rng):
        key = id(jax.tree.leaves(params)[0])
        if key not in cache:
            cache.clear()
            cache[key] = build(params)
        return cache[key](params, state, active, rng)

    return fn


def make_pp_prefill(mesh: Mesh, cfg: LlamaConfig, *, n_micro: int = 0,
                    temperature: float = 0.0, top_k: int = 0,
                    top_p: float = 1.0, pp_axis: str = PP_AXIS):
    """Build a jitted pipelined prefill:
    ``fn(params, tokens (B, Tpad), valid_lens (B,), state, rng)
    -> ((B,) first tokens, state)`` — the pp rendition of
    :func:`llama.prefill_slots` for a FULL fresh pool (every row
    prefills; microbatches of rows flow through the stages).  Padding
    correctness is prefill_slots' argument: pad rows write stale cache
    entries above ``valid_lens`` that the per-row decode mask hides
    until overwritten.
    """
    n_pp = int(mesh.shape[pp_axis])
    M = n_micro or n_pp
    assert M >= n_pp
    assert cfg.n_layer % n_pp == 0

    def shard_fn(params, tokens, valid_lens, state, rng):
        b, tpad = tokens.shape
        bm = b // M
        s_idx = lax.axis_index(pp_axis)
        is_last = s_idx == n_pp - 1
        emb = params["tok_emb"]

        def tick(carry, tau):
            send, tok_reg, pos_reg, k_loc, v_loc = carry
            recv = lax.ppermute(send, pp_axis, _ring(n_pp))
            j = tau - s_idx
            valid = (j >= 0) & (j < M)
            mu = jnp.where(valid, j, 0)
            rows = mu * bm
            toks_mu = lax.dynamic_slice_in_dim(tokens, rows, bm, axis=0)
            x_in = jnp.where((s_idx == 0)[..., None, None],
                             emb[toks_mu], recv)
            zero_pos = jnp.zeros((bm,), jnp.int32)

            def compute(operand):
                x, k_loc, v_loc = operand
                kc = lax.dynamic_slice_in_dim(k_loc, rows, bm, axis=1)
                vc = lax.dynamic_slice_in_dim(v_loc, rows, bm, axis=1)
                x, (kc, vc) = _stage_layers(params["h"], x, kc, vc,
                                            zero_pos, cfg)
                k_loc = lax.dynamic_update_slice_in_dim(k_loc, kc, rows,
                                                        axis=1)
                v_loc = lax.dynamic_update_slice_in_dim(v_loc, vc, rows,
                                                        axis=1)
                return x, k_loc, v_loc

            x_out, k_loc, v_loc = lax.cond(
                valid, compute, lambda o: o, (x_in, k_loc, v_loc))

            vl_mu = lax.dynamic_slice(valid_lens, (rows,), (bm,))
            h = rms_norm(x_out, params["lnf_s"], cfg.rms_eps)
            logits_all = ops.linear(h, _head(params))
            idx = (vl_mu - 1).reshape(-1, 1, 1)
            logits = jnp.take_along_axis(logits_all, idx, axis=1)[:, 0]
            nxt = _sample(logits, jax.random.fold_in(rng, tau),
                          temperature, top_k, top_p)
            contrib = jnp.where(is_last, nxt, jnp.zeros_like(nxt))
            sampled = lax.psum(contrib, pp_axis)

            j_last = tau - (n_pp - 1)
            valid_last = (j_last >= 0) & (j_last < M)
            rows_last = jnp.where(valid_last, j_last, 0) * bm
            tok_new = lax.dynamic_update_slice(tok_reg, sampled,
                                               (rows_last,))
            tok_reg = jnp.where(valid_last, tok_new, tok_reg)
            vl_last = lax.dynamic_slice(valid_lens, (rows_last,), (bm,))
            pos_new = lax.dynamic_update_slice(pos_reg, vl_last,
                                               (rows_last,))
            pos_reg = jnp.where(valid_last, pos_new, pos_reg)
            return (x_out, tok_reg, pos_reg, k_loc, v_loc), None

        send0 = jnp.zeros((bm, tpad, cfg.n_embd), params["tok_emb"].dtype)
        ticks = jnp.arange(M + n_pp - 1)
        (_, tok_reg, pos_reg, k_loc, v_loc), _ = lax.scan(
            tick, (send0, state.tok, state.pos, state.k, state.v), ticks)
        return tok_reg, LlamaPoolState(k_loc, v_loc, pos_reg, tok_reg)

    rep = P()
    st_specs = LlamaPoolState(k=P(pp_axis), v=P(pp_axis), pos=rep, tok=rep)

    def pspec(path, leaf):
        return P(pp_axis) if path[0].key == "h" else rep

    def build(params):
        pspecs = jax.tree_util.tree_map_with_path(pspec, params)
        kwargs = dict(mesh=mesh,
                      in_specs=(pspecs, rep, rep, st_specs, rep),
                      out_specs=(rep, st_specs))
        try:
            sm = _shard_map(shard_fn, check_vma=False, **kwargs)
        except TypeError:  # pragma: no cover
            sm = _shard_map(shard_fn, check_rep=False, **kwargs)
        return jax.jit(sm, donate_argnums=(3,))

    cache = {}

    def fn(params, tokens, valid_lens, state, rng):
        key = id(jax.tree.leaves(params)[0])
        if key not in cache:
            cache.clear()
            cache[key] = build(params)
        return cache[key](params, tokens, valid_lens, state, rng)

    return fn
