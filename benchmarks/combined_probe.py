"""Focused bench for the full-TPU voice-chat path (pooled LLM driving
pooled TTS on one chip) — the combined_* fields of bench.py, runnable
alone for fast iteration on scheduler/pool changes.

Usage: python benchmarks/combined_probe.py
"""
from __future__ import annotations

import asyncio
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool_block", type=int, default=None)
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--no_merge", action="store_true")
    ap.add_argument("--llm_first_block", type=int, default=32)
    cli = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from llmvox_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses

    from llmvox_tpu.codec.codec import WavCodec, init_codec_params
    from llmvox_tpu.models import decoder as dec
    from llmvox_tpu.models import llama
    from llmvox_tpu.serve.llm_pool import LLMPool
    from llmvox_tpu.serve.pool import DecodePool, PooledEngine
    from llmvox_tpu.serve.scheduler import StreamingScheduler
    from llmvox_tpu.streams.jax_llm import ByteTokenizer, PooledJAXStreamModel
    from llmvox_tpu.utils.config import CodecConfig, DecoderConfig, ServeConfig

    dcfg = dataclasses.replace(DecoderConfig(), eoa_token_id=10_000)
    ccfg = CodecConfig()
    scfg = ServeConfig(
        initial_dump_size_1=10, initial_dump_size_2=160,
        max_dump_size=1280, max_audio_length=600, decode_block=32,
        chunk_buckets=(16, 32, 96, 160, 288, 480, 512, 896, 1280),
    )
    if cli.pool_block is not None:
        scfg = dataclasses.replace(scfg, pool_decode_block=cli.pool_block)
    if cli.depth is not None:
        scfg = dataclasses.replace(scfg, pool_pipeline_depth=cli.depth)
    if cli.no_merge:
        scfg = dataclasses.replace(scfg, pool_merge_blocks=False)
    dev = jax.devices()[0]
    params = dec.init_decoder_params(jax.random.PRNGKey(0), dcfg)
    text_table = np.asarray(
        0.02 * jax.random.normal(jax.random.PRNGKey(1),
                                 (dcfg.text_vocab_size, dcfg.text_embed_dim)))
    codec = WavCodec(init_codec_params(jax.random.PRNGKey(2), ccfg), ccfg,
                     buckets=scfg.chunk_buckets, device=dev)
    pool = DecodePool(params, text_table, codec, capacity=16,
                      dcfg=dcfg, scfg=scfg, device=dev)
    t0 = time.time()
    pool.warmup()

    lcfg = llama.LlamaConfig(vocab_size=384, n_layer=8, n_head=8,
                             n_kv_head=4, n_embd=512,
                             intermediate_size=1408, max_seq_len=1024)
    lparams = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                           llama.init_llama_params(jax.random.PRNGKey(7),
                                                   lcfg))
    lparams = jax.device_put(lparams, dev)
    llm_pool = LLMPool(lparams, lcfg, capacity=8, block=32,
                       first_block=cli.llm_first_block,
                       temperature=0.8, top_k=0, top_p=1.0,
                       dtype=jnp.bfloat16, prefill_buckets=(256,))
    llm = PooledJAXStreamModel(llm_pool, ByteTokenizer(), max_tokens=96,
                               eos_text=scfg.eos_token)
    llm.warmup()
    print(f"warmup {time.time() - t0:.1f}s", flush=True)

    async def combined_request(i, marks=None):
        pengines = [PooledEngine(pool, scfg), PooledEngine(pool, scfg)]
        try:
            psched = StreamingScheduler(pengines, scfg)
            n_bytes = 0
            t_start = time.perf_counter()
            first = None

            async def tapped():
                k = 0
                async for delta in llm.predict(
                        {"system": "You are a concise voice assistant.",
                         "prompt": f"Benchmark question number {i}?"}):
                    if marks is not None and k < 4:
                        marks.append((f"delta{k}",
                                      (time.perf_counter() - t_start) * 1e3))
                    k += 1
                    yield delta

            async for chunk in psched.run(tapped()):
                if first is None:
                    first = (time.perf_counter() - t_start) * 1000.0
                    if marks is not None:
                        marks.append(("first_audio", first))
                n_bytes += len(chunk)
            wall = time.perf_counter() - t_start
            return first, n_bytes / 4 / ccfg.sample_rate, wall
        finally:
            for e in pengines:
                e.close()

    async def go():
        out = {}
        await combined_request(0)            # pipeline the transport
        f_list, r_list = [], []
        for i in range(3):
            marks = []
            f1, a1, w1 = await combined_request(100 + i, marks)
            f_list.append(round(f1, 1))
            r_list.append(round(a1 / w1, 2))
            out[f"marks_{i}"] = [(k, round(v, 1)) for k, v in marks]
        out["first_1way_ms"] = f_list
        out["rtf_1way"] = r_list
        for wave in range(3):
            t0 = time.perf_counter()
            res = await asyncio.gather(
                *[combined_request(10 * wave + k) for k in range(4)])
            wall = time.perf_counter() - t0
            firsts = sorted(r[0] for r in res)
            out[f"wave{wave}_p50_first_ms"] = round(firsts[2], 1)
            out[f"wave{wave}_agg_rtf_4way"] = round(
                sum(r[1] for r in res) / wall, 2)
        out["pool_steps"] = pool.steps
        out["merged_steps"] = pool.merged_steps
        llm_pool.stop()
        pool.stop()
        return out

    print(json.dumps(asyncio.run(go()), indent=1))


if __name__ == "__main__":
    main()
