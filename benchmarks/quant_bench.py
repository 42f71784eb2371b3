"""Int8 quantized decode vs bf16 on the real chip (ops/quant.py).

Measures the two serving hot loops at deployed shapes:

- speech decoder: pooled ``decode_block_batch`` (B=16, block 64) —
  every step re-reads the 30M weight set for the whole batch
- Llama: ``decode_block`` B=1 and ``decode_block_pooled`` B=8 at the
  bench 30M-class config

in four precisions: bf16 (baseline), w8 (int8 weights dequantized into
the matmul operand — wins iff XLA keeps the dequant fused per tile
rather than hoisting a dense copy out of the scan), w8a8 (int8xint8
MXU compute with dynamic per-token activation scales — nothing
loop-invariant to hoist, double MAC peak on v5e), and w4 (group-wise
int4 weight-only — s4 packs two per byte in HBM, 4x fewer weight bytes
streamed than bf16).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/quant_bench.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def bench_decoder(dev, mode_params, reps=6):
    import jax.numpy as jnp

    from llmvox_tpu.models import decoder as dec

    out = {}
    for name, (params, cfg) in mode_params.items():
        b, block = 16, 64
        rng = np.random.default_rng(0)
        table = jnp.asarray(0.02 * rng.standard_normal(
            (cfg.text_vocab_size, cfg.text_embed_dim)).astype(np.float32))
        codebook = jnp.asarray(rng.standard_normal(
            (cfg.vocab_size, 512)).astype(np.float32))
        states = dec.init_decode_state_batch(cfg, b, jnp.bfloat16)
        windows = jnp.asarray(
            np.full((b, block), cfg.pad_token_id, np.int32))
        tl = jnp.zeros((b,), jnp.int32)
        lim = jnp.full((b,), block, jnp.int32)

        def chain(states, n=4):
            for _ in range(n):
                toks, _, states = dec.decode_block_batch(
                    params, table, codebook, states, windows, tl, lim,
                    cfg, block=block)
            np.asarray(toks)
            return states

        states = chain(states)           # compile
        states = chain(states)           # steady-state executable
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            states = chain(states)
            times.append((time.perf_counter() - t0) / 4)
        out[name] = round(1000 * float(np.median(times)), 2)
    return out


def bench_llama(dev, mode_params, reps=6):
    import jax
    import jax.numpy as jnp

    from llmvox_tpu.models import llama

    out = {}
    for name, (params, cfg) in mode_params.items():
        st = llama.init_llama_decode_state(cfg, 1, jnp.bfloat16)
        tok = jnp.zeros((1,), jnp.int32)

        def chain1(tok, st, n=8):
            for _ in range(n):
                toks, st = llama.decode_block(params, tok, st,
                                              jax.random.PRNGKey(0), cfg,
                                              block=16, attn_len=256)
                tok = toks[:, -1]
            np.asarray(tok)
            return tok, st

        tok, st = chain1(tok, st)
        tok, st = chain1(tok, st)
        st = llama.init_llama_decode_state(cfg, 1, jnp.bfloat16)
        times = []
        for _ in range(reps):
            st = llama.init_llama_decode_state(cfg, 1, jnp.bfloat16)
            tok = jnp.zeros((1,), jnp.int32)
            t0 = time.perf_counter()
            tok, st = chain1(tok, st)
            times.append((time.perf_counter() - t0) / 8)
        out[f"{name}_b1_ms_per_block16"] = round(
            1000 * float(np.median(times)), 2)

        # pooled B=8
        pst = llama.init_llama_pool_state(cfg, 8, jnp.bfloat16)
        active = jnp.ones((8,), bool)

        def chainp(pst, n=4):
            for _ in range(n):
                toks, pst = llama.decode_block_pooled(
                    params, pst, active, jax.random.PRNGKey(0), cfg,
                    block=32, attn_len=256)
            np.asarray(toks)
            return pst

        pst = chainp(pst)
        pst = chainp(pst)
        times = []
        for _ in range(reps):
            pst = llama.init_llama_pool_state(cfg, 8, jnp.bfloat16)
            t0 = time.perf_counter()
            pst = chainp(pst)
            times.append((time.perf_counter() - t0) / 4)
        out[f"{name}_pool8_ms_per_block32"] = round(
            1000 * float(np.median(times)), 2)
    return out


def main() -> None:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from llmvox_tpu.models import decoder as dec
    from llmvox_tpu.models import llama
    from llmvox_tpu.ops.quant import (quantize_decoder_params,
                                      quantize_llama_params)
    from llmvox_tpu.utils.config import DecoderConfig
    from llmvox_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"

    dcfg = DecoderConfig(use_pallas_attention=on_tpu)
    dcfg = dataclasses.replace(dcfg, eoa_token_id=10_000)
    dparams = jax.device_put(jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        dec.init_decoder_params(jax.random.PRNGKey(0), dcfg)), dev)

    lcfg = llama.LlamaConfig(vocab_size=384, n_layer=8, n_head=8,
                             n_kv_head=4, n_embd=512,
                             intermediate_size=1408, max_seq_len=1024)
    lparams = jax.device_put(jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        llama.init_llama_params(jax.random.PRNGKey(1), lcfg)), dev)

    res = {"device": str(dev)}
    res["decoder_pool16_block64_ms"] = bench_decoder(dev, {
        "bf16": (dparams, dcfg),
        "w8": (quantize_decoder_params(dparams, "w8"), dcfg),
        "w8a8": (quantize_decoder_params(dparams, "w8a8"), dcfg),
        "w4": (quantize_decoder_params(dparams, "w4"), dcfg),
    })
    res["llama30M"] = bench_llama(dev, {
        "bf16": (lparams, lcfg),
        "w8": (quantize_llama_params(lparams, "w8"), lcfg),
        "w8a8": (quantize_llama_params(lparams, "w8a8"), lcfg),
        "w4": (quantize_llama_params(lparams, "w4"), lcfg),
    })

    # MoE shapes (VERDICT r3 #5): expert weights are where an 8-expert
    # model's parameter memory explodes — quantizing them is the
    # capacity lever.  Same decode loops, Mixtral-style E=8/top_k=2 at
    # the 30M-class trunk; param_bytes shows the HBM footprint each mode
    # buys.  (Inference paths run drop-free, so routing is identical
    # across modes — only the expert matmul precision differs.)
    from llmvox_tpu.ops.quant import quantized_bytes
    mcfg = llama.LlamaConfig(vocab_size=384, n_layer=8, n_head=8,
                             n_kv_head=4, n_embd=512,
                             intermediate_size=1408, max_seq_len=1024,
                             n_experts=8, moe_top_k=2)
    res["llamaMoE_E8"] = {}
    for mode in ("bf16", "w8", "w4"):
        mparams = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            llama.init_llama_params(jax.random.PRNGKey(3), mcfg))
        if mode != "bf16":
            mparams = quantize_llama_params(mparams, mode)
        res["llamaMoE_E8"][f"{mode}_param_mb"] = round(
            quantized_bytes(mparams) / 1e6, 1)
        mparams = jax.device_put(mparams, dev)
        row = bench_llama(dev, {mode: (mparams, mcfg)})
        res["llamaMoE_E8"].update(row)
        del mparams

    # 1B-class: where B=1 decode is genuinely weight-bandwidth-bound
    # (~2.2 GB of bf16 streamed per token) — the regime the production
    # llm_checkpoint (Llama-3.1-8B) serves in.  Quantized variants are
    # built/measured one at a time to keep peak HBM down.
    del lparams
    bcfg = llama.LlamaConfig(vocab_size=32768, n_layer=16, n_head=16,
                             n_kv_head=8, n_embd=2048,
                             intermediate_size=5632, max_seq_len=1024)
    res["llama1B"] = {}
    for mode in ("bf16", "w8", "w8a8", "w4"):
        bparams = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            llama.init_llama_params(jax.random.PRNGKey(2), bcfg))
        if mode != "bf16":
            bparams = quantize_llama_params(bparams, mode)
        bparams = jax.device_put(bparams, dev)
        row = bench_llama(dev, {mode: (bparams, bcfg)})
        res["llama1B"].update(row)
        del bparams
    print(json.dumps(res))


if __name__ == "__main__":
    main()
