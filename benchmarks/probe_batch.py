"""Probe: where does batched decode time go."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from llmvox_tpu.models import decoder as dec
from llmvox_tpu.utils.config import DecoderConfig

dcfg = DecoderConfig()
key = jax.random.PRNGKey(0)
params = dec.init_decoder_params(key, dcfg)
params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
table = 0.02*jax.random.normal(key, (dcfg.text_vocab_size, dcfg.text_embed_dim), jnp.bfloat16)
codebook = 0.02*jax.random.normal(key, (dcfg.vocab_size, dcfg.speech_embed_dim), jnp.bfloat16)

for B in (1, 8):
    states = dec.init_decode_state_batch(dcfg, B, jnp.bfloat16)
    win = jnp.zeros((B, 32), jnp.int32)
    tl = jnp.full((B,), 1, jnp.int32)
    lim = jnp.full((B,), 32, jnp.int32)
    t0 = time.perf_counter()
    toks, n, states = dec.decode_block_batch(params, table, codebook, states, win, tl, lim, dcfg, block=32)
    jax.block_until_ready(toks)
    print(f"B={B} compile+first: {time.perf_counter()-t0:.1f}s; sample toks {np.asarray(toks)[0][:4]}")
    # per-call with block each time
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        toks, n, states = dec.decode_block_batch(params, table, codebook, states, win, tl, lim, dcfg, block=32)
        jax.block_until_ready((toks, states))
        times.append(time.perf_counter() - t0)
    dt = np.median(times)
    print(f"B={B}: {dt*1000:.2f}ms/call (blocked) -> {B*32/dt:.0f} tok/s aggregate; pos now {np.asarray(states.pos)[0]}")
