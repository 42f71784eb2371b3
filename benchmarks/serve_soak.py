"""Production-soak server: the deployed-shape pooled stack on random
weights, for driving with the C++ load generator.

The bench.py harness measures in-process; THIS serves the real HTTP
stack (reference counterpart: ``python streaming_server.py`` +
external clients, streaming_server.py:674-690) so csrc/llmvox_loadgen
can hammer it from outside the process:

    python benchmarks/serve_soak.py --port 5003 &
    csrc/llmvox_loadgen 127.0.0.1 5003 <concurrency> <requests> "text..."

Weights are random (checkpoints aren't shipped); compute cost is
weight-independent, so latency/RTF are faithful.  EOA is pushed out of
vocab so every request synthesizes to the cap — deterministic load.
"""
from __future__ import annotations

import argparse
import dataclasses

import numpy as np


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp

    from llmvox_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    from llmvox_tpu.codec.codec import WavCodec, init_codec_params
    from llmvox_tpu.models import decoder as dec
    from llmvox_tpu.serve.engine import TTSEngine
    from llmvox_tpu.serve.pool import DecodePool
    from llmvox_tpu.serve.server import build_server
    from llmvox_tpu.utils.config import (CodecConfig, DecoderConfig,
                                         ServeConfig)

    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=5003)
    ap.add_argument("--pool_capacity", type=int, default=16)
    ap.add_argument("--pool_ladder", type=str, default="",
                    help="comma capacities, e.g. 16,32 — occupancy-"
                         "adaptive PoolLadder instead of one pool")
    ap.add_argument("--max_audio_length", type=int, default=600)
    args = ap.parse_args(argv)

    dcfg = dataclasses.replace(DecoderConfig(), eoa_token_id=10_000)
    ccfg = CodecConfig()
    scfg = ServeConfig(
        api_host="127.0.0.1", api_port=args.port,
        initial_dump_size_1=10, initial_dump_size_2=160,
        max_dump_size=1280, max_audio_length=args.max_audio_length,
        decode_block=32, pool_capacity=args.pool_capacity,
        chunk_buckets=(16, 32, 96, 160, 288, 480, 512, 896, 1280),
        # /tts drives the scheduler directly; a scripted reply keeps
        # build_server from loading an LLM this soak never uses
        scripted_reply="A scripted reply for the load soak.")

    dev = jax.devices()[0]
    params = dec.init_decoder_params(jax.random.PRNGKey(0), dcfg)
    table = np.asarray(0.02 * jax.random.normal(
        jax.random.PRNGKey(1),
        (dcfg.text_vocab_size, dcfg.text_embed_dim)))
    codec_params = init_codec_params(jax.random.PRNGKey(2), ccfg)

    engines = []
    for _ in range(2):
        codec = WavCodec(codec_params, ccfg, buckets=scfg.chunk_buckets,
                         device=dev)
        engines.append(TTSEngine(params, table, codec, dcfg, scfg,
                                 device=dev, cache_dtype=jnp.bfloat16))
    print("warming up engines...", flush=True)
    for e in engines:
        e.warmup()
    if args.pool_ladder:
        from llmvox_tpu.serve.pool import PoolLadder
        caps = sorted(int(c) for c in args.pool_ladder.split(","))
        pool = PoolLadder([
            DecodePool(params, table, engines[0].codec, capacity=c,
                       dcfg=dcfg, scfg=scfg, device=dev,
                       cache_dtype=jnp.bfloat16) for c in caps])
        print(f"pool ladder: {caps}; warming...", flush=True)
    else:
        pool = DecodePool(params, table, engines[0].codec,
                          capacity=scfg.pool_capacity, dcfg=dcfg, scfg=scfg,
                          device=dev, cache_dtype=jnp.bfloat16)
        print(f"pool: {scfg.pool_capacity} slots; warming...", flush=True)
    server = build_server(scfg, engines, pool=pool)
    print(f"READY on 127.0.0.1:{args.port}", flush=True)
    server.run()


if __name__ == "__main__":
    main()
