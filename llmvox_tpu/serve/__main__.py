"""Serving CLI: ``python -m llmvox_tpu.serve --flags``.

The counterpart of ``python streaming_server.py --chat_type ...``
(reference streaming_server.py:29-87, 674-690).  Loads converted
checkpoints, builds the two TTS replicas, wires the chat_type-appropriate
text-stream source, and serves.
"""
from __future__ import annotations

import argparse

import numpy as np

from llmvox_tpu.utils.config import (
    CodecConfig, DecoderConfig, ServeConfig, add_dataclass_args,
    apply_cli_overrides)


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp

    from llmvox_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    from llmvox_tpu.codec.codec import WavCodec
    from llmvox_tpu.serve.engine import TTSEngine
    from llmvox_tpu.serve.server import build_server
    from llmvox_tpu.train.checkpoint import load_params_npz, load_meta

    parser = argparse.ArgumentParser(description="LLMVoX-TPU streaming server")
    add_dataclass_args(parser, ServeConfig)
    add_dataclass_args(parser, CodecConfig)
    parser.add_argument("--byt5_table", type=str, required=False)
    args = parser.parse_args(argv)
    cfg = apply_cli_overrides(ServeConfig(), args)
    ccfg = apply_cli_overrides(CodecConfig(), args)

    # decoder
    dec_params = load_params_npz(cfg.llmvox_checkpoint_path)
    if cfg.quantize:
        from llmvox_tpu.ops.quant import quantize_decoder_params
        dec_params = quantize_decoder_params(dec_params, cfg.quantize)
        print(f"quantization ({cfg.quantize}): speech decoder")
    meta = load_meta(cfg.llmvox_checkpoint_path)
    margs = meta.get("model_args", {})
    dcfg = DecoderConfig(**{k: v for k, v in margs.items()
                            if k in DecoderConfig.__dataclass_fields__})
    # text table
    table = np.load(args.byt5_table)["table"]
    # codec
    codec_params = load_params_npz(cfg.wav_model_path)

    devices = jax.devices()
    devs = [devices[min(cfg.tts_device_1, len(devices) - 1)],
            devices[min(cfg.tts_device_2, len(devices) - 1)]]
    dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
             else jnp.float32)
    engines = []
    for dev in devs:
        codec = WavCodec(codec_params, ccfg, buckets=cfg.chunk_buckets,
                         device=dev)
        engines.append(TTSEngine(dec_params, table, codec, dcfg, cfg,
                                 device=dev, cache_dtype=dtype))
    print("warming up (compiling decode + synthesis buckets)...")
    for e in engines:
        e.warmup()

    pool = None
    if cfg.pool_ladder:
        # occupancy-adaptive capacity ladder (PoolLadder docstring)
        from llmvox_tpu.serve.pool import DecodePool, PoolLadder
        pool = PoolLadder([
            DecodePool(dec_params, table, engines[0].codec, capacity=c,
                       dcfg=dcfg, scfg=cfg, device=devs[0],
                       cache_dtype=dtype)
            for c in sorted(cfg.pool_ladder)])
        print(f"continuous-batching pool ladder: {sorted(cfg.pool_ladder)}")
    elif cfg.pool_capacity > 0:
        from llmvox_tpu.serve.pool import DecodePool
        mesh = None
        if cfg.pool_mesh_dp > 1:
            # multi-chip pooled serving: slots shard over a dp mesh and
            # every step runs one shard_map'd program across the slice
            from llmvox_tpu.parallel.mesh import create_mesh
            mesh = create_mesh(dp_size=cfg.pool_mesh_dp, tp_size=1)
        pool = DecodePool(dec_params, table, engines[0].codec,
                          capacity=cfg.pool_capacity, dcfg=dcfg, scfg=cfg,
                          device=None if mesh is not None else devs[0],
                          cache_dtype=dtype, mesh=mesh)
        print(f"continuous-batching pool: {cfg.pool_capacity} slots"
              + (f" sharded over dp={cfg.pool_mesh_dp}" if mesh else ""))
        # build_server warms the pool (decode step + ragged synth buckets)

    server = build_server(cfg, engines, pool=pool)
    server.run()


if __name__ == "__main__":
    main()
