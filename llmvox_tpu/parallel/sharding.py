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


def llama_param_shardings(mesh: Mesh, params: Dict) -> Dict:
    """Megatron TP specs for the Llama text LLM (models/llama.py): q/k/v,
    gate and up column-parallel (output dim over tp), o and down
    row-parallel (input dim over tp); embeddings / norms / head
    replicated.  GQA divides cleanly when n_kv_head % tp == 0."""
    specs = {
        "tok_emb": P(),
        "lnf_s": P(),
        "head": P(),
        "h": {
            "ln1_s": P(), "ln2_s": P(),
            "wq": P(None, None, TP_AXIS),
            "wk": P(None, None, TP_AXIS),
            "wv": P(None, None, TP_AXIS),
            "wo": P(None, TP_AXIS, None),
            "wgate": P(None, None, TP_AXIS),
            "wup": P(None, None, TP_AXIS),
            "wdown": P(None, TP_AXIS, None),
        },
    }

    def pick(path, leaf):
        node = specs
        for p in path:
            node = node[p.key]
        return NamedSharding(mesh, node)

    return jax.tree_util.tree_map_with_path(pick, params)
