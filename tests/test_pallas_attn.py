"""Pallas decode-attention kernel vs the lax reference (interpret mode)."""
import numpy as np
import jax.numpy as jnp
import pytest

from llmvox_tpu.ops.attention import decode_attention
from llmvox_tpu.ops.pallas_attn import pallas_decode_attention

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("pos", [0, 3, 127, 128, 300])
def test_pallas_matches_lax(pos):
    s, c, h = 512, 256, 4
    q = RNG.standard_normal(c).astype(np.float32)
    k = RNG.standard_normal((s, c)).astype(np.float32)
    v = RNG.standard_normal((s, c)).astype(np.float32)
    ref = decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.int32(pos), n_head=h, chunk=128)
    got = pallas_decode_attention(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), jnp.int32(pos), n_head=h,
                                  chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_pallas_bf16_cache():
    s, c, h = 256, 128, 2
    q = jnp.asarray(RNG.standard_normal(c), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((s, c)), jnp.bfloat16)
    v = jnp.asarray(RNG.standard_normal((s, c)), jnp.bfloat16)
    ref = decode_attention(q, k, v, jnp.int32(100), n_head=h, chunk=128)
    got = pallas_decode_attention(q, k, v, jnp.int32(100), n_head=h,
                                  chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_pallas_batched_matches_lax(  ):
    from llmvox_tpu.models.decoder import _batched_decode_attention
    from llmvox_tpu.ops.pallas_attn import pallas_batched_decode_attention
    import jax.numpy as jnp
    b, s, c, h = 3, 512, 256, 4
    q = jnp.asarray(RNG.standard_normal((b, c)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((b, s, c)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((b, s, c)), jnp.float32)
    pos = jnp.asarray([0, 130, 400], jnp.int32)
    ref = _batched_decode_attention(q, k, v, pos, n_head=h, chunk=128)
    got = pallas_batched_decode_attention(q, k, v, pos, n_head=h,
                                          chunk=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("mxu", [False, True])
@pytest.mark.parametrize("pos", [[0, 3, 100, 250], [5, 5, 5, 5]])
def test_pallas_verify_matches_lax(pos, mxu):
    """Verify kernel (n teacher-forced queries per row at per-row
    offsets) vs the decoder's XLA chunked reference."""
    from llmvox_tpu.models.decoder import _batched_verify_attention
    from llmvox_tpu.ops.pallas_attn import pallas_verify_attention

    b, n, s, c, h = 4, 5, 512, 256, 4
    q = jnp.asarray(RNG.standard_normal((b, n, c)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((b, s, c)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((b, s, c)), jnp.float32)
    p = jnp.asarray(pos, jnp.int32)
    ref = _batched_verify_attention(q, k, v, p, n_head=h, chunk=128)
    got = pallas_verify_attention(q, k, v, p, n_head=h, chunk=128,
                                  interpret=True, mxu=mxu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("mxu", [False, True])
def test_pallas_verify_full_cache_layer(mxu):
    """Full (L, B, S, C) caches + layer scalar select the right layer."""
    from llmvox_tpu.models.decoder import _batched_verify_attention
    from llmvox_tpu.ops.pallas_attn import pallas_verify_attention

    l_, b, n, s, c, h = 3, 2, 4, 256, 128, 2
    q = jnp.asarray(RNG.standard_normal((b, n, c)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((l_, b, s, c)), jnp.bfloat16)
    v = jnp.asarray(RNG.standard_normal((l_, b, s, c)), jnp.bfloat16)
    p = jnp.asarray([60, 200], jnp.int32)
    for layer in range(l_):
        ref = _batched_verify_attention(q, k[layer], v[layer], p,
                                        n_head=h, chunk=128)
        got = pallas_verify_attention(q, k, v, p, n_head=h, chunk=128,
                                      interpret=True, mxu=mxu,
                                      layer=jnp.int32(layer))
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32),
                                   atol=2e-2, rtol=2e-2)

