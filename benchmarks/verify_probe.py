"""Where does the pooled-spec iteration's time go?

At B=8/k=12 the pooled spec iteration costs ~1.9 ms while the Pallas
greedy step is ~0.22 ms and the MXU verify kernel's chunk math is tiny.
This times the pieces on the real chip.

METHODOLOGY CAVEATS (learned the hard way):
- Per-call timings here include the chained-dispatch floor (~0.2-0.5 ms
  through the tunnel); on-device cost inside the while_loop is lower.
- Pass-the-same-buffer timing FORCES copies on scatter ops (operand
  stays live): the r3 first version measured "4.1 ms scatters" that
  way; chained + donated the same 8 scatters are 0.65 ms per call
  including the dispatch floor.  Findings: the per-layer cache scatters
  in _decode_many_batch cost ~0.1-0.4 ms/iteration on device — real but
  not dominant; writing the KV rows inside the verify kernel (DMA +
  input_output_aliasing) is the next lever if the spec iteration ever
  needs to shrink further.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/verify_probe.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from llmvox_tpu.models import decoder as dec
from llmvox_tpu.utils.config import DecoderConfig
from llmvox_tpu.utils.runtime import enable_compilation_cache


def timeit(fn, *args, n=50):
    fn(*args)                       # compile
    fn(*args)                       # steady state
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    return 1000 * (time.perf_counter() - t0) / n


def main() -> None:
    import dataclasses
    enable_compilation_cache()
    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    cfg = DecoderConfig(n_draft_heads=12, use_pallas_attention=on_tpu)
    cfg = dataclasses.replace(cfg, eoa_token_id=10_000)
    B, kd = 8, 12
    params = jax.device_put(jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        dec.init_decoder_params(jax.random.PRNGKey(0), cfg)), dev)
    rng = np.random.default_rng(0)
    tt = jax.device_put(jnp.asarray(
        0.02 * rng.standard_normal((cfg.text_vocab_size,
                                    cfg.text_embed_dim)).astype(np.float32)))
    cb = jax.device_put(jnp.asarray(
        rng.standard_normal((cfg.vocab_size, 512)).astype(np.float32)))

    st = dec.init_decode_state_batch(cfg, B, jnp.bfloat16)
    st = dec.DecodeState(st.k_cache, st.v_cache,
                         jnp.full((B,), 512, jnp.int32),
                         jnp.zeros((B,), jnp.int32),
                         jnp.zeros((B,), bool))
    xs = jnp.asarray(rng.standard_normal((B, kd, cfg.n_embd)), jnp.bfloat16)

    # 1. full verify forward (what one spec iteration pays besides the
    #    normal step)
    @jax.jit
    def verify(xs, st):
        return dec._decode_many_batch(params, cfg, xs, st, kd)
    print("verify forward         :",
          round(timeit(verify, xs, st), 3), "ms")

    # 2. scatters only: the 8 per-layer cache row writes
    posn = st.pos[:, None] + jnp.arange(kd, dtype=jnp.int32)[None]
    rows = jnp.asarray(rng.standard_normal((B, kd, cfg.n_embd)),
                       jnp.bfloat16)

    def scatters(k_cache, v_cache, rows):
        barange = jnp.arange(B)
        for l in range(cfg.n_layer):
            k_cache = k_cache.at[l, barange[:, None], posn].set(rows)
            v_cache = v_cache.at[l, barange[:, None], posn].set(rows)
        return k_cache, v_cache
    scatters = jax.jit(scatters, donate_argnums=(0, 1))
    # CHAIN + DONATE: same-buffer timing would force a 100 MB copy/call.
    # Fresh buffers — donating st's caches would invalidate st for the
    # measurements below.
    st_sc = dec.init_decode_state_batch(cfg, B, jnp.bfloat16)
    k, v = scatters(st_sc.k_cache, st_sc.v_cache, rows)
    k, v = scatters(k, v, rows)
    t0 = time.perf_counter()
    for _ in range(100):
        k, v = scatters(k, v, rows)
    k.block_until_ready()
    print("8 cache scatters       :",
          round(10 * (time.perf_counter() - t0), 3),
          "ms (chained+donated, incl. dispatch floor)")
    del k, v

    # 3. one batched greedy step (the other part of a spec iteration)
    win = jnp.full((B, 32), cfg.pad_token_id, jnp.int32)
    tl = jnp.zeros((B,), jnp.int32)
    lim = jnp.full((B,), 32, jnp.int32)

    def step1(st):
        return dec.decode_block_batch(params, tt, cb, st, win, tl, lim,
                                      cfg, block=1)
    print("1 batched greedy step  :", round(timeit(step1, st), 3), "ms")

    # 4. one full spec iteration via a 1-commit-max spec block
    def spec1(st):
        return dec.decode_block_spec_batch(
            params, tt, cb, st, win, tl,
            jnp.full((B,), 2, jnp.int32), cfg, block=32, k_draft=kd)
    print("1 spec iteration (~2tk):", round(timeit(spec1, st), 3), "ms")


if __name__ == "__main__":
    main()
