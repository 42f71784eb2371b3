"""Throughput accounting for the pooled serving path (VERDICT r2 #2).

Measures, on the real chip at bench.py's deployed shapes:

1. per-program device costs: the batched decode step (B=16, block=32),
   ragged batched synthesis at batch sizes 1/2/4/8 for several chunk
   buckets, and the fused first-chunk vocode;
2. a pooled 4-way + 8-way wave with call counters (pool.steps,
   synth_calls), so the per-program costs can be attributed to the
   measured wall time.

Usage: PYTHONPATH=/root/repo:/root/.axon_site timeout 2700 python
benchmarks/pool_profile.py
"""
from __future__ import annotations

import argparse
import asyncio
import json
import statistics
import time

import numpy as np


def timed(fn, reps=5):
    fn()  # warm/compile
    fn()
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) * 1000.0)
    return statistics.median(times)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=32)
    ap.add_argument("--depth", type=int, default=None,
                    help="override pool_pipeline_depth")
    ap.add_argument("--no_merge", action="store_true",
                    help="disable pool_merge_blocks")
    ap.add_argument("--skip_micro", action="store_true",
                    help="skip the per-program microbench sweep")
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from llmvox_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    from llmvox_tpu.codec.codec import WavCodec, init_codec_params
    from llmvox_tpu.models import decoder as dec
    from llmvox_tpu.serve.engine import TTSEngine
    from llmvox_tpu.serve.pool import DecodePool, PooledEngine
    from llmvox_tpu.serve.scheduler import StreamingScheduler
    from llmvox_tpu.streams.scripted import ScriptedStream
    from llmvox_tpu.utils.config import CodecConfig, DecoderConfig, ServeConfig

    import dataclasses

    dcfg = DecoderConfig()
    dcfg = dataclasses.replace(dcfg, eoa_token_id=10_000)
    ccfg = CodecConfig()
    scfg = ServeConfig(
        initial_dump_size_1=10, initial_dump_size_2=160,
        max_dump_size=1280, max_audio_length=600, decode_block=cli.block,
        pool_decode_block=cli.block,
        chunk_buckets=(16, 32, 96, 160, 288, 480, 512, 896, 1280),
    )
    if cli.depth is not None:
        scfg = dataclasses.replace(scfg, pool_pipeline_depth=cli.depth)
    if cli.no_merge:
        scfg = dataclasses.replace(scfg, pool_merge_blocks=False)
    dev = jax.devices()[0]
    key = jax.random.PRNGKey(0)
    params = dec.init_decoder_params(key, dcfg)
    text_table = np.asarray(
        0.02 * jax.random.normal(jax.random.PRNGKey(1),
                                 (dcfg.text_vocab_size, dcfg.text_embed_dim)))
    codec_params = init_codec_params(jax.random.PRNGKey(2), ccfg)
    codec = WavCodec(codec_params, ccfg, buckets=scfg.chunk_buckets,
                     device=dev)

    pool = DecodePool(params, text_table, codec, capacity=16,
                      dcfg=dcfg, scfg=scfg, device=dev)
    t0 = time.time()
    pool.warmup()
    print(f"warmup {time.time() - t0:.1f}s", flush=True)

    report = {}

    # --- per-program costs ------------------------------------------------
    pad = pool.dcfg.pad_token_id
    windows = np.full((pool.B, pool.block), pad, np.int32)
    ones = np.ones((pool.B,), np.int32)

    def step():
        tokens, _, pool.states = dec.decode_block_batch(
            pool.params, pool.text_table, pool.codebook, pool.states,
            jnp.asarray(windows), ones, ones, pool.dcfg, block=pool.block)
        np.asarray(tokens)

    report[f"decode_step_b16_blk{pool.block}_ms"] = round(timed(step), 2)

    if not cli.skip_micro:
        for bucket in (16, 160, 512, 1280):
            for b in (1, 2, 4, 8):
                codes = np.zeros((b, bucket), np.int32)
                lens = np.full((b,), bucket, np.int32)

                def synth():
                    codec.decode_codes_ragged(codes, lens)

                report[f"synth_b{b}_L{bucket}_ms"] = round(timed(synth), 2)
            print(f"bucket {bucket} done", flush=True)

    # fused first-chunk vocode (chained on decode output)
    from llmvox_tpu.serve.pool import _gather_rows
    tokens, _, pool.states = dec.decode_block_batch(
        pool.params, pool.text_table, pool.codebook, pool.states,
        jnp.asarray(windows), ones, ones, pool.dcfg, block=pool.block)

    def fused():
        rows = _gather_rows(tokens, jnp.zeros((8,), jnp.int32),
                            pool._fuse_bucket)
        np.asarray(codec.decode_codes_device(rows, np.ones((8,), np.int32)))

    report["fused_vocode_b8_ms"] = round(timed(fused), 2)

    # --- pooled waves with counters --------------------------------------
    deltas = ["This is the first benchmark sentence for measuring",
              "streaming latency.",
              "Here comes a second one to exercise the replica",
              "ping pong schedule.",
              "And a third sentence closes the benchmark run."]

    async def pooled_request():
        pengines = [PooledEngine(pool, scfg), PooledEngine(pool, scfg)]
        try:
            psched = StreamingScheduler(pengines, scfg)
            stream = ScriptedStream(deltas, eos_token=scfg.eos_token)
            n_bytes = 0
            t_start = time.perf_counter()
            first = None
            async for chunk in psched.run(stream.predict({})):
                if first is None:
                    first = (time.perf_counter() - t_start) * 1000.0
                n_bytes += len(chunk)
            return first, n_bytes / 4 / ccfg.sample_rate
        finally:
            for e in pengines:
                e.close()

    async def wave(n):
        s0, c0 = pool.steps, pool.synth_calls
        t0 = time.perf_counter()
        res = await asyncio.gather(*[pooled_request() for _ in range(n)])
        wall = time.perf_counter() - t0
        return {
            "n": n, "wall_s": round(wall, 3),
            "audio_s": round(sum(r[1] for r in res), 2),
            "agg_rtf": round(sum(r[1] for r in res) / wall, 2),
            "first_ms": [round(r[0], 1) for r in res],
            "pool_steps": pool.steps - s0,
            "synth_calls": pool.synth_calls - c0,
        }

    async def run_waves():
        out = []
        await wave(4)  # throwaway: transport pipelining + stragglers
        for n in (4, 4, 8, 8):
            out.append(await wave(n))
        pool.stop()
        return out

    report["waves"] = asyncio.run(run_waves())
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
