"""Shared-prefix KV cache: measured prefill cost with and without it.

Voice-chat requests all repeat the same system preamble; LLMPool.set_prefix
(models/llama.py::prefix_kv) computes its KV once, so each request
prefills only its suffix.  This probe times the pooled prefill program at
bench-llama shapes for a P-token prefix + s-token user suffix, three ways:

  full    — plain prefill_slots over the whole P+s prompt (the bucket
            covering it)
  suffix  — prefill_slots over the s-token suffix with prefix_k/v seeded
            (what set_prefix buys)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prefix_probe.py \
      [--prefix 256] [--suffix 32] [--arrivals 1]
"""
from __future__ import annotations

import argparse
import json
import statistics
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefix", type=int, default=256)
    ap.add_argument("--suffix", type=int, default=32)
    ap.add_argument("--arrivals", type=int, default=1)
    ap.add_argument("--capacity", type=int, default=8)
    ap.add_argument("--large", action="store_true",
                    help="1B-class shapes (quant_bench's config): the "
                         "30M bench model's prefill is dispatch-bound, "
                         "so the prefix win only shows at real scales")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from llmvox_tpu.models import llama
    from llmvox_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    dev = jax.devices()[0]
    if args.large:
        cfg = llama.LlamaConfig(vocab_size=32768, n_layer=16, n_head=16,
                                n_kv_head=8, n_embd=2048,
                                intermediate_size=5632, max_seq_len=1024)
    else:
        cfg = llama.LlamaConfig(vocab_size=384, n_layer=8, n_head=8,
                                n_kv_head=4, n_embd=512,
                                intermediate_size=1408, max_seq_len=1024)
    params = jax.device_put(
        jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                     llama.init_llama_params(jax.random.PRNGKey(7), cfg)),
        dev)

    rng = np.random.default_rng(0)
    p_len, s_len, n = args.prefix, args.suffix, args.arrivals
    pids = rng.integers(1, cfg.vocab_size, (1, p_len)).astype(np.int32)
    full_bucket = 1
    while full_bucket < p_len + s_len:
        full_bucket *= 2
    sfx_bucket = 1
    while sfx_bucket < s_len:
        sfx_bucket *= 2

    pk, pv = llama.prefix_kv(params, jnp.asarray(pids), cfg)
    pk = pk.astype(jnp.bfloat16)
    pv = pv.astype(jnp.bfloat16)

    def run(bucket, use_prefix):
        state = llama.init_llama_pool_state(cfg, args.capacity, jnp.bfloat16)
        tokens = np.zeros((n, bucket), np.int32)
        valid = np.full((n,), s_len if use_prefix else p_len + s_len,
                        np.int32)
        for j in range(n):
            tokens[j, : valid[j]] = rng.integers(1, cfg.vocab_size, valid[j])
        slots = jnp.arange(n, dtype=jnp.int32)
        active = jnp.ones((n,), bool)

        def chain(n_calls=10):
            # chained dispatches, ONE fetch: a per-call sync pays the
            # full tunnel RTT (~30 ms) and masks the device-side cost
            nonlocal state
            first = None
            t0 = time.perf_counter()
            for _ in range(n_calls):
                first, state = llama.prefill_slots(
                    params, jnp.asarray(tokens), jnp.asarray(valid), state,
                    slots, active, jax.random.PRNGKey(1), cfg,
                    prefix_k=pk if use_prefix else None,
                    prefix_v=pv if use_prefix else None)
            np.asarray(first)
            return (time.perf_counter() - t0) / n_calls

        chain(); chain()                   # compile + steady state
        return 1000 * statistics.median([chain() for _ in range(7)])

    full_ms = run(full_bucket, False)
    sfx_ms = run(sfx_bucket, True)
    print(json.dumps({
        "prefix_len": p_len, "suffix_len": s_len, "arrivals": n,
        "full_prefill_ms": round(full_ms, 2),
        "suffix_prefill_ms": round(sfx_ms, 2),
        "speedup": round(full_ms / sfx_ms, 2),
    }))


if __name__ == "__main__":
    main()
