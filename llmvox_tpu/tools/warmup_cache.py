"""CLI: pre-compile every serving program into the persistent XLA cache.

Run once per machine (or bake into an image) so server startups and the
first requests never pay compilation:

  python -m llmvox_tpu.tools.warmup_cache                 # deployed shapes
  python -m llmvox_tpu.tools.warmup_cache --pool_capacity 8

Compiles with random weights — program identity depends on shapes/config
only, so the cache entries are reused by real checkpoints.  Covers:
- the dedicated engine: decode blocks (small + large + fused-first-chunk
  variants) and every codec chunk bucket,
- the offline batch path (block 128 at the batch size given),
- the continuous-batching pool (batched decode + batched synth buckets)
  when --pool_capacity > 0.

The reference has no counterpart (CUDA eager has no compile step); on
TPU this replaces "first request is slow" with an explicit build step.
"""
from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from llmvox_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    from llmvox_tpu.codec.codec import WavCodec, init_codec_params
    from llmvox_tpu.models import decoder as dec
    from llmvox_tpu.serve.engine import TTSEngine
    from llmvox_tpu.utils.config import (
        CodecConfig, DecoderConfig, ServeConfig, add_dataclass_args,
        apply_cli_overrides)

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    add_dataclass_args(parser, ServeConfig)
    add_dataclass_args(parser, DecoderConfig)
    add_dataclass_args(parser, CodecConfig)
    parser.add_argument("--batch_streams", type=int, default=8)
    args = parser.parse_args(argv)
    scfg = apply_cli_overrides(ServeConfig(), args)
    dcfg = apply_cli_overrides(DecoderConfig(), args)
    ccfg = apply_cli_overrides(CodecConfig(), args)

    dev = jax.devices()[0]
    params = dec.init_decoder_params(jax.random.PRNGKey(0), dcfg)
    table = np.zeros((dcfg.text_vocab_size, dcfg.text_embed_dim), np.float32)
    codec = WavCodec(init_codec_params(jax.random.PRNGKey(1), ccfg), ccfg,
                     buckets=scfg.chunk_buckets, device=dev)

    t0 = time.time()
    engine = TTSEngine(params, table, codec, dcfg, scfg, device=dev)
    engine.warmup()
    print(f"engine programs compiled ({time.time() - t0:.0f}s)", flush=True)

    from llmvox_tpu.serve.batch import BatchTTS
    t0 = time.time()
    btts = BatchTTS(params, table, codec, max_streams=args.batch_streams,
                    dcfg=dcfg, scfg=scfg, device=dev, block=128)
    btts.tts_batch(["warmup."] * args.batch_streams, max_tokens=128)
    print(f"batch programs compiled ({time.time() - t0:.0f}s)", flush=True)

    if scfg.pool_capacity > 0:
        import asyncio
        from llmvox_tpu.serve.pool import DecodePool
        t0 = time.time()

        async def _go():
            pool = DecodePool(params, table, codec,
                              capacity=scfg.pool_capacity, dcfg=dcfg,
                              scfg=scfg, device=dev)
            pool.warmup()

        asyncio.run(_go())
        print(f"pool programs compiled ({time.time() - t0:.0f}s)", flush=True)
    print("persistent cache is warm")


if __name__ == "__main__":
    main()
