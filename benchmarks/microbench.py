"""Microbenchmarks: decode-block throughput, device RTT, synthesis buckets.
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Run on TPU: python benchmarks/microbench.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time, numpy as np, jax, jax.numpy as jnp
from llmvox_tpu.codec.codec import WavCodec, init_codec_params
from llmvox_tpu.models import decoder as dec
from llmvox_tpu.serve.engine import TTSEngine
from llmvox_tpu.utils.config import CodecConfig, DecoderConfig, ServeConfig

dcfg = DecoderConfig(); ccfg = CodecConfig()
scfg = ServeConfig(decode_block=32, chunk_buckets=(16, 96, 288, 896, 1280))
dev = jax.devices()[0]
params = dec.init_decoder_params(jax.random.PRNGKey(0), dcfg)
table = np.zeros((dcfg.text_vocab_size, dcfg.text_embed_dim), np.float32)
codec_params = init_codec_params(jax.random.PRNGKey(2), ccfg)
codec = WavCodec(codec_params, ccfg, buckets=scfg.chunk_buckets, device=dev)
eng = TTSEngine(params, table, codec, dcfg, scfg, device=dev, cache_dtype=jnp.bfloat16)

# time decode blocks
state = eng.new_state()
win = np.full(32, dcfg.pad_token_id, np.int32)
t0=time.perf_counter(); eng.decode_block(state, win, 1, 32); print("decode compile", time.perf_counter()-t0)
state = eng.new_state()
for trial in range(3):
    t0=time.perf_counter()
    for i in range(10):
        toks, state = eng.decode_block(state, win, 1, 32)
    dt=time.perf_counter()-t0
    print(f"decode_block x10 (320 tok): {dt*1000:.1f}ms -> {320/dt:.0f} tok/s, {320/75/dt:.1f}x RT")

# empty roundtrip latency
f = jax.jit(lambda x: x + 1)
x = jax.device_put(jnp.zeros((1,)), dev); f(x)
t0=time.perf_counter()
for _ in range(20): np.asarray(f(x))
print(f"device call RTT: {(time.perf_counter()-t0)/20*1000:.2f}ms")

# synth buckets
for n in (16, 96, 288, 896, 1280):
    codes = np.zeros((1, n), np.int32)
    codec.decode_codes(codes, pad_to_bucket=False)  # compile
    t0=time.perf_counter()
    for _ in range(3): codec.decode_codes(codes, pad_to_bucket=False)
    dt=(time.perf_counter()-t0)/3
    print(f"synth {n}: {dt*1000:.1f}ms for {n/75:.2f}s audio -> {n/75/dt:.0f}x RT")
