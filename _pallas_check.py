import time, numpy as np, jax, jax.numpy as jnp
from llmvox_tpu.ops.attention import decode_attention
from llmvox_tpu.ops.pallas_attn import pallas_decode_attention
rng = np.random.default_rng(0)
s, c, h = 8192, 768, 8
q = jnp.asarray(rng.standard_normal(c), jnp.float32)
k = jnp.asarray(rng.standard_normal((s, c)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((s, c)), jnp.bfloat16)
for pos in (0, 511, 512, 4000, 8191):
    ref = decode_attention(q, k, v, jnp.int32(pos), n_head=h)
    got = pallas_decode_attention(q, k, v, jnp.int32(pos), n_head=h)
    err = np.max(np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32)))
    print(f"pos {pos}: max err {err:.4f}")
# timing at pos=1000
pos = jnp.int32(1000)
for name, fn in (("lax", decode_attention), ("pallas", pallas_decode_attention)):
    fn(q, k, v, pos, n_head=h).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(50):
        out = fn(q, k, v, pos, n_head=h)
    out.block_until_ready()
    print(f"{name}: {(time.perf_counter()-t0)/50*1e6:.0f} us/call (incl dispatch)")
