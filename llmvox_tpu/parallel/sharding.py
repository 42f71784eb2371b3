"""Sharding rules for the speech decoder over a (dp, tp) mesh.

The reference shards nothing (DDP replication only; SURVEY §2.9).  Here,
data-parallel shards the batch axis and tensor-parallel (optional — the
model is only 30M, but the machinery is exercised by tests and scales to
larger decoder variants) shards attention heads and MLP hidden the
Megatron way: column-parallel in, row-parallel out, with GSPMD inserting
the all-reduces from these annotations.
"""
from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llmvox_tpu.parallel.mesh import DP_AXIS, TP_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over dp."""
    return NamedSharding(mesh, P(DP_AXIS))


def batch_seq_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (B, T, ...) inputs over (dp, sp) — the sequence-parallel
    trainer's input layout (ops/ring_attention.py)."""
    from llmvox_tpu.parallel.mesh import SP_AXIS
    return NamedSharding(mesh, P(DP_AXIS, SP_AXIS))


def decoder_param_shardings(mesh: Mesh, params: Dict) -> Dict:
    """PartitionSpecs per decoder parameter (stacked-layer layout).

    - wqkv (L, C, 3C): column-parallel — shard the fused QKV output dim;
      heads split cleanly because 3C = 3 * n_head * head_dim.
    - wo (L, C, C): row-parallel — shard the input (head) dim.
    - wfc (L, C, 4C): column-parallel; wproj (L, 4C, C): row-parallel.
    - everything else (norms, wpe, lm_head) replicated.
    """
    specs = {
        "wpe": P(),
        "lnf_s": P(),
        "lnf_b": P(),
        "head": P(),
        "h": {
            "ln1_s": P(), "ln1_b": P(),
            "wqkv": P(None, None, TP_AXIS), "bqkv": P(None, TP_AXIS),
            "wo": P(None, TP_AXIS, None), "bo": P(),
            "ln2_s": P(), "ln2_b": P(),
            "wfc": P(None, None, TP_AXIS), "bfc": P(None, TP_AXIS),
            "wproj": P(None, TP_AXIS, None), "bproj": P(),
        },
    }

    def pick(path, leaf):
        node = specs
        for p in path:
            node = node[p.key]
        return NamedSharding(mesh, node)

    return jax.tree_util.tree_map_with_path(pick, params)


def decoder_fsdp_shardings(mesh: Mesh, params: Dict) -> Dict:
    """FSDP/ZeRO-3-style parameter (and, via jit propagation, optimizer
    moment) sharding for the decoder: every large matrix shards one
    non-layer dimension over dp, so per-chip parameter + Adam-state
    memory drops by the dp size.  XLA all-gathers exactly the layer the
    ``lax.scan`` step touches before its matmuls and reduce-scatters the
    gradients — the GSPMD rendition of ZeRO-3's gather/scatter schedule,
    derived from annotations instead of hand-written bucketing.

    Composes with tensor parallelism: tp keeps its Megatron dim, fsdp
    takes the other one.  Small tensors (norms, biases) stay replicated
    — sharding them buys bytes but costs a collective each.

    The deployed decoder is 30M (fits anywhere); like the TP machinery
    this exists for the larger decoder variants the config admits, and
    is exercised by tests + the driver dryrun.
    """
    specs = {
        "wpe": P(None, DP_AXIS),
        "lnf_s": P(),
        "lnf_b": P(),
        "head": P(DP_AXIS, None),
        "h": {
            "ln1_s": P(), "ln1_b": P(),
            "wqkv": P(None, DP_AXIS, TP_AXIS), "bqkv": P(None, TP_AXIS),
            "wo": P(None, TP_AXIS, DP_AXIS), "bo": P(),
            "ln2_s": P(), "ln2_b": P(),
            "wfc": P(None, DP_AXIS, TP_AXIS), "bfc": P(None, TP_AXIS),
            "wproj": P(None, TP_AXIS, DP_AXIS), "bproj": P(),
        },
        "draft_heads": P(None, DP_AXIS, None),
    }

    def pick(path, leaf):
        node = specs
        for p in path:
            node = node[p.key]
        return NamedSharding(mesh, node)

    return jax.tree_util.tree_map_with_path(pick, params)


def opt_state_shardings(mesh: Mesh, tx, params, param_shardings):
    """Shardings for an optax state: every subtree with the params'
    treedef (Adam mu/nu, MultiSteps accumulators) reuses the param
    shardings; every other leaf (step counters, scalars) replicates.

    Needed explicitly because ``tx.init`` builds its moments with
    ``zeros_like`` — no data dependence on the sharded params — so GSPMD
    propagation has nothing to carry the annotations through and, left
    alone, jit commits the state to arbitrary (even single-device)
    placements that then clash with the mesh-sharded train step.
    """
    ptreedef = jax.tree_util.tree_structure(params)
    rep = NamedSharding(mesh, P())
    abstract = jax.eval_shape(tx.init, params)

    def is_param_tree(x):
        return jax.tree_util.tree_structure(x) == ptreedef

    def pick(sub):
        if is_param_tree(sub):
            return param_shardings
        return jax.tree_util.tree_map(lambda _: rep, sub)

    return jax.tree_util.tree_map(pick, abstract, is_leaf=is_param_tree)


def llama_fsdp_shardings(mesh: Mesh, params: Dict) -> Dict:
    """ZeRO-3 for the Llama LLM, expert-aware: dense matrices shard one
    non-tp dimension over dp (like :func:`decoder_fsdp_shardings`), and
    MoE expert weights — where an 8-expert model's parameter memory
    actually lives — keep their expert axis over ep AND shard a matrix
    dim over dp, so per-chip expert parameter + Adam-moment memory drops
    by ep*dp together.  The router stays replicated (tiny, and every
    chip routes).  Optimizer moments inherit these specs through
    :func:`opt_state_shardings`, giving MoE training ZeRO-sharded expert
    state — the ep-aware FSDP compose STATUS r3 queued."""
    from llmvox_tpu.parallel.mesh import EP_AXIS
    specs = {
        "tok_emb": P(DP_AXIS, None),
        "lnf_s": P(),
        "head": P(DP_AXIS, None),
        "draft_heads": P(None, DP_AXIS, None),
        "h": {
            "ln1_s": P(), "ln2_s": P(),
            "wq": P(None, DP_AXIS, TP_AXIS),
            "wk": P(None, DP_AXIS, TP_AXIS),
            "wv": P(None, DP_AXIS, TP_AXIS),
            "wo": P(None, TP_AXIS, DP_AXIS),
            "wgate": P(None, DP_AXIS, TP_AXIS),
            "wup": P(None, DP_AXIS, TP_AXIS),
            "wdown": P(None, TP_AXIS, DP_AXIS),
            "router": P(),
            "moe_wgate": P(None, EP_AXIS, DP_AXIS, TP_AXIS),
            "moe_wup": P(None, EP_AXIS, DP_AXIS, TP_AXIS),
            "moe_wdown": P(None, EP_AXIS, TP_AXIS, DP_AXIS),
        },
    }

    def pick(path, leaf):
        node = specs
        for p in path:
            node = node[p.key]
        return NamedSharding(mesh, node)

    return jax.tree_util.tree_map_with_path(pick, params)


def llama_param_shardings(mesh: Mesh, params: Dict) -> Dict:
    """Megatron TP specs for the Llama text LLM (models/llama.py): q/k/v,
    gate and up column-parallel (output dim over tp), o and down
    row-parallel (input dim over tp); embeddings / norms / head
    replicated.  GQA divides cleanly when n_kv_head % tp == 0."""
    from llmvox_tpu.parallel.mesh import EP_AXIS
    specs = {
        "tok_emb": P(),
        "lnf_s": P(),
        "head": P(),
        "draft_heads": P(),
        "h": {
            "ln1_s": P(), "ln2_s": P(),
            "wq": P(None, None, TP_AXIS),
            "wk": P(None, None, TP_AXIS),
            "wv": P(None, None, TP_AXIS),
            "wo": P(None, TP_AXIS, None),
            "wgate": P(None, None, TP_AXIS),
            "wup": P(None, None, TP_AXIS),
            "wdown": P(None, TP_AXIS, None),
            # MoE (ops/moe.py): expert axis over ep — per-chip FFN
            # parameter memory drops by the ep size and GSPMD turns the
            # dispatch/combine einsums into all-to-alls; tp keeps the
            # Megatron split of each expert's hidden dim.
            "router": P(),
            "moe_wgate": P(None, EP_AXIS, None, TP_AXIS),
            "moe_wup": P(None, EP_AXIS, None, TP_AXIS),
            "moe_wdown": P(None, EP_AXIS, TP_AXIS, None),
        },
    }

    def pick(path, leaf):
        node = specs
        for p in path:
            node = node[p.key]
        return NamedSharding(mesh, node)

    return jax.tree_util.tree_map_with_path(pick, params)
