"""A/B the LLM pool's burst-prefill merging (serve/llm_pool.py).

A simultaneous burst of N mixed-length prompts used to prefill as one
program per (bucket, prefix) group; with ``prefill_merge`` the pool cuts
length-sorted PREFILL_BATCH chunks ACROSS buckets — fewer programs per
burst on a dispatch-bound transport, usually fewer padded token-rows too.
This probe measures time-to-first-token for every request of the burst,
merge on vs off, at the 30M bench shapes.

Usage: python benchmarks/burst_prefill_probe.py [--burst 8] [--rounds 5]
"""
from __future__ import annotations

import asyncio
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from llmvox_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from llmvox_tpu.models import llama  # noqa: E402
from llmvox_tpu.serve.llm_pool import LLMPool  # noqa: E402

# mixed prompt lengths spanning the bucket ladder (tokens)
LENGTHS = [20, 30, 55, 60, 110, 120, 230, 400]


def make_pool(params, lcfg, merge: bool, burst: int) -> LLMPool:
    pool = LLMPool(params, lcfg, capacity=max(8, burst), block=32,
                   temperature=0.0, dtype=jnp.bfloat16,
                   prefill_buckets=(32, 64, 128, 256, 512),
                   prefill_merge=merge)
    t0 = time.time()
    pool.warmup()
    print(f"warmup(merge={merge}) {time.time() - t0:.1f}s", flush=True)
    return pool


def run_burst(pool: LLMPool, burst: int, rounds: int):
    prompts = [[1 + (i * 7 + j) % 250 for j in range(LENGTHS[i % len(LENGTHS)])]
               for i in range(burst)]

    async def one(ids, t0):
        gen = pool.generate(ids, max_tokens=33)
        try:
            async for _ in gen:
                # first yield = first token
                return (time.perf_counter() - t0) * 1e3
        finally:
            await gen.aclose()         # release the slot for the next round

    async def go():
        out = []
        for r in range(rounds + 1):                    # round 0 = transport warm
            calls0 = pool.prefill_calls
            t0 = time.perf_counter()
            firsts = await asyncio.gather(
                *[one(p, t0) for p in prompts])
            if r > 0:
                out.append((firsts, pool.prefill_calls - calls0))
            await asyncio.sleep(0.05)
        pool.stop()
        return out

    return asyncio.run(go())


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--burst", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=5)
    cli = ap.parse_args()

    lcfg = llama.LlamaConfig(vocab_size=384, n_layer=8, n_head=8,
                             n_kv_head=4, n_embd=512,
                             intermediate_size=1408, max_seq_len=1024)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          llama.init_llama_params(jax.random.PRNGKey(7),
                                                  lcfg))
    params = jax.device_put(params, jax.devices()[0])

    report = {}
    for merge in (False, True):
        pool = make_pool(params, lcfg, merge, cli.burst)
        rows = run_burst(pool, cli.burst, cli.rounds)
        p50s = [statistics.median(f) for f, _ in rows]
        maxs = [max(f) for f, _ in rows]
        report[f"merge={merge}"] = {
            "p50_first_tok_ms": round(statistics.median(p50s), 1),
            "max_first_tok_ms": round(statistics.median(maxs), 1),
            "prefill_programs_per_burst": rows[0][1],
        }
        print(json.dumps(report[f"merge={merge}"]), flush=True)
        del pool
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
