"""Transport probe for the pooled step loop's pipeline-depth design.

Questions this answers on the real (tunneled) chip:

1. decode-step device time at block 32 vs 64 (B=16) — the decode-bound
   throughput ceiling;
2. whether N chained steps' results can be fetched with OVERLAPPING
   round trips (concurrent ``jax.device_get`` threads vs serial fetches
   vs one batched fetch) — if they overlap, a depth-K in-flight pipeline
   makes the pool decode-bound at block 32 (first-chunk-friendly)
   instead of RTT-bound (what made block 64 win in r3).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/fetch_probe.py
"""
from __future__ import annotations

import json
import statistics
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from llmvox_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    from llmvox_tpu.models import decoder as dec
    from llmvox_tpu.utils.config import DecoderConfig

    import dataclasses
    dcfg = DecoderConfig()
    dcfg = dataclasses.replace(dcfg, eoa_token_id=10_000,
                               use_pallas_attention=True)
    dev = jax.devices()[0]
    key = jax.random.PRNGKey(0)
    params = dec.init_decoder_params(key, dcfg)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, params)
    params = jax.device_put(params, dev)
    text_table = jax.device_put(
        0.02 * jax.random.normal(jax.random.PRNGKey(1),
                                 (dcfg.text_vocab_size, dcfg.text_embed_dim)),
        dev)
    codebook = jax.device_put(
        0.02 * jax.random.normal(jax.random.PRNGKey(2),
                                 (dcfg.vocab_size, dcfg.speech_embed_dim)),
        dev)
    B = 16
    report = {}

    for block in (16, 32, 64):
        states = dec.init_decode_state_batch(dcfg, B, jnp.bfloat16)
        windows = jnp.zeros((B, block), jnp.int32)
        ones = np.ones((B,), np.int32)

        def step(st):
            return dec.decode_block_batch(
                params, text_table, codebook, st, windows, ones, ones,
                dcfg, block=block)

        # warm twice (steady-state executable)
        for _ in range(3):
            tokens, _, states = step(states)
            np.asarray(tokens)

        # (a) device-only time: chain K steps, fetch only the last
        K = 8
        t0 = time.perf_counter()
        outs = []
        for _ in range(K):
            tokens, _, states = step(states)
            outs.append(tokens)
        np.asarray(outs[-1])
        t_chain = (time.perf_counter() - t0) / K * 1000
        report[f"blk{block}_device_ms_per_step"] = round(t_chain, 2)

        # (b) serial dispatch->fetch loop (depth-0 pipeline)
        t0 = time.perf_counter()
        for _ in range(K):
            tokens, _, states = step(states)
            np.asarray(tokens)
        report[f"blk{block}_serial_loop_ms_per_step"] = round(
            (time.perf_counter() - t0) / K * 1000, 2)

        # (c) dispatch K, then fetch all SERIALLY
        def run_chain():
            nonlocal states
            outs = []
            for _ in range(K):
                tokens, _, states = step(states)
                outs.append(tokens)
            return outs

        outs = run_chain()
        t0 = time.perf_counter()
        for t in outs:
            np.asarray(t)
        report[f"blk{block}_serial_fetch_ms_per_step"] = round(
            (time.perf_counter() - t0) / K * 1000, 2)

        # (d) dispatch K, then fetch all with CONCURRENT threads
        outs = run_chain()
        with ThreadPoolExecutor(max_workers=K) as ex:
            t0 = time.perf_counter()
            list(ex.map(lambda t: np.asarray(t), outs))
            dt = (time.perf_counter() - t0) / K * 1000
        report[f"blk{block}_threaded_fetch_ms_per_step"] = round(dt, 2)

        # (e) pipelined depth-D loops: keep D fetch threads in flight
        for depth in (1, 2, 3, 4):
            states2 = dec.init_decode_state_batch(dcfg, B, jnp.bfloat16)
            for _ in range(2):
                tokens, _, states2 = step(states2)
                np.asarray(tokens)
            N = 24
            times = []
            for _ in range(3):
                with ThreadPoolExecutor(max_workers=depth + 1) as ex:
                    futs = []
                    t0 = time.perf_counter()
                    st = states2
                    for i in range(N):
                        tokens, _, st = step(st)
                        futs.append(ex.submit(np.asarray, tokens))
                        while len(futs) > depth:
                            futs.pop(0).result()
                        # fetch-bound backpressure only; dispatch is cheap
                    for f in futs:
                        f.result()
                    times.append((time.perf_counter() - t0) / N * 1000)
            report[f"blk{block}_pipe_depth{depth}_ms_per_step"] = round(
                statistics.median(times), 2)
        print(f"block {block} done", flush=True)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
