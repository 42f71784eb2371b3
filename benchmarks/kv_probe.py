"""Is the pooled speech decode KV-bandwidth-bound?  (probe for an int8
KV cache decision)

Measures ``decode_block_batch`` step time at B=16/block=64 as a function
of cache fill: the Pallas decode attention DMAs ceil((pos+1)/chunk) K/V
chunks per step per stream, so if the pool is KV-bound the per-block
time should grow ~linearly in pos and an int8 cache would halve the
slope.  Per-sentence resets keep typical pos low (a sentence is a few
hundred speech tokens); the deployed S=8192 is worst case.

MEASURED (v5e, B=16, block 64): 25.3 ms at pos=0 -> 43.7 @ 1k ->
60.9 @ 2k -> 95.9 @ 4k -> 158.0 @ 7.9k — ~16.7 us per position per
block, i.e. the pool IS KV-bandwidth-bound at deep caches and an int8
KV cache would roughly halve the slope (1.6-1.7x at 4-8k).  BUT the
deployed serving path resets state per sentence (serve/scheduler.py),
and a spoken sentence is ~200-400 speech tokens (75 Hz WavTokenizer
frames), where the KV term adds only ~10-25% — so int8 KV is a
long-context lever this workload doesn't need; recorded here so the
decision is re-checkable if the serving shape ever changes (e.g.
paragraph-length synthesis without resets).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kv_probe.py
"""
from __future__ import annotations

import dataclasses
import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from llmvox_tpu.models import decoder as dec
    from llmvox_tpu.utils.config import DecoderConfig
    from llmvox_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    cfg = DecoderConfig(use_pallas_attention=on_tpu)
    cfg = dataclasses.replace(cfg, eoa_token_id=10_000)  # never stop

    params = jax.device_put(jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        dec.init_decoder_params(jax.random.PRNGKey(0), cfg)), dev)
    rng = np.random.default_rng(0)
    table = jnp.asarray(0.02 * rng.standard_normal(
        (cfg.text_vocab_size, cfg.text_embed_dim)).astype(np.float32))
    codebook = jnp.asarray(rng.standard_normal(
        (cfg.vocab_size, 512)).astype(np.float32))

    b, block = 16, 64
    windows = jnp.asarray(np.full((b, block), cfg.pad_token_id, np.int32))
    tl = jnp.zeros((b,), jnp.int32)
    lim = jnp.full((b,), block, jnp.int32)

    res = {"device": str(dev), "b": b, "block": block,
           "ms_per_block_at_pos": {}}
    for fill in (0, 1024, 2048, 4096, 7936):
        states = dec.init_decode_state_batch(cfg, b, jnp.bfloat16)
        states = states._replace(
            pos=jnp.full_like(states.pos, fill))

        def chain(states, n=4):
            for _ in range(n):
                toks, _, states = dec.decode_block_batch(
                    params, table, codebook, states, windows, tl, lim,
                    cfg, block=block)
                # keep pos pinned near the fill level (blocks advance it)
                states = states._replace(
                    pos=jnp.full_like(states.pos, fill))
            np.asarray(toks)
            return states

        states = chain(states)   # compile
        states = chain(states)   # steady-state executable
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            states = chain(states)
            times.append((time.perf_counter() - t0) / 4)
        res["ms_per_block_at_pos"][str(fill)] = round(
            1000 * float(np.median(times)), 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
