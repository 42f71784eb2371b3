"""Per-block latency trace for sequential LLM-pool generations.

Chases the combined-path observation (benchmarks/combined_probe.py
marks): the SECOND request after warmup stalls ~400 ms in its first
decode blocks, later requests run at steady state.  This isolates the
LLM pool from the TTS side: N sequential generate() calls, wall-clock
stamps per yielded block.

Usage: python benchmarks/llm_pool_probe.py [--n 5]
"""
from __future__ import annotations

import asyncio
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llmvox_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from llmvox_tpu.models import llama  # noqa: E402
from llmvox_tpu.serve.llm_pool import LLMPool  # noqa: E402


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5)
    cli = ap.parse_args()

    lcfg = llama.LlamaConfig(vocab_size=384, n_layer=8, n_head=8,
                             n_kv_head=4, n_embd=512,
                             intermediate_size=1408, max_seq_len=1024)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          llama.init_llama_params(jax.random.PRNGKey(7),
                                                  lcfg))
    params = jax.device_put(params, jax.devices()[0])
    pool = LLMPool(params, lcfg, capacity=8, block=32, temperature=0.8,
                   dtype=jnp.bfloat16, prefill_buckets=(256,))
    t0 = time.time()
    pool.warmup()
    print(f"warmup {time.time() - t0:.1f}s", flush=True)

    ids = [1 + (b % 250) for b in b"What is the capital of France? Tell me."]

    async def one(tag):
        t0 = time.perf_counter()
        stamps = []
        async for toks in pool.generate(ids, max_tokens=96):
            stamps.append(round((time.perf_counter() - t0) * 1e3, 1))
        return tag, stamps

    async def run():
        out = {}
        for i in range(cli.n):
            tag, stamps = await one(f"req{i}")
            out[tag] = stamps
        pool.stop()
        return out

    out = asyncio.run(run())
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
