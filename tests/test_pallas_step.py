"""Fused decode-step kernel (interpret mode) vs the lax batched step."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmvox_tpu.models import decoder as dec
from llmvox_tpu.ops.pallas_step import pack_step_weights, fused_decode_step
from llmvox_tpu.utils.config import DecoderConfig

CFG = DecoderConfig(n_layer=2, n_head=2, n_embd=32, block_size=64,
                    vocab_size=16, bias=False, text_embed_dim=12,
                    speech_embed_dim=20, eoa_token_id=999)
RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def params():
    p = jax.device_get(dec.init_decoder_params(jax.random.PRNGKey(0), CFG))
    return jax.tree.map(
        lambda a: a + 0.05 * RNG.standard_normal(a.shape).astype(np.float32),
        p)


def test_fused_step_matches_lax(params):
    b = 3
    pos = jnp.asarray([0, 5, 63], jnp.int32)
    kc = jnp.asarray(RNG.standard_normal(
        (CFG.n_layer, b, CFG.block_size, CFG.n_embd)), jnp.float32)
    vc = jnp.asarray(RNG.standard_normal(kc.shape), jnp.float32)
    st = dec.DecodeState(kc, vc, pos, jnp.zeros((b,), jnp.int32),
                         jnp.zeros((b,), bool))
    x = jnp.asarray(RNG.standard_normal((b, CFG.n_embd)), jnp.float32)
    ref_tok, ref_k, ref_v = dec._decode_one_batch(params, CFG, x, st)

    tiles = pack_step_weights(params, CFG)
    hp = params["h"]
    tok, krows, vrows = fused_decode_step(
        tiles, hp["ln1_s"], hp["ln2_s"], params["lnf_s"],
        x + params["wpe"][pos], kc, vc, pos, n_layer=CFG.n_layer,
        n_head=CFG.n_head, vocab=CFG.vocab_size, eps=CFG.ln_eps,
        chunk=64, interpret=True)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))
    for l in range(CFG.n_layer):
        for bb in range(b):
            np.testing.assert_allclose(
                np.asarray(krows)[bb, l],
                np.asarray(ref_k)[l, bb, int(pos[bb])], atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(vrows)[bb, l],
                np.asarray(ref_v)[l, bb, int(pos[bb])], atol=1e-5)


def test_fused_block_matches_lax(params):
    """decode_block_batch(use_fused_step) == lax path: tokens, state, and
    caches across two chained blocks with EOA/limit gating."""
    table = jnp.asarray(RNG.standard_normal((CFG.text_vocab_size,
                                             CFG.text_embed_dim)), jnp.float32)
    cb = jnp.asarray(RNG.standard_normal((1000, CFG.speech_embed_dim)),
                     jnp.float32)
    b, block = 3, 8
    win = jnp.asarray(RNG.integers(0, 380, (b, block)), jnp.int32)
    tl = jnp.asarray([5, 2, 8], jnp.int32)
    lim = jnp.asarray([8, 8, 4], jnp.int32)

    def run(cfg):
        st = dec.init_decode_state_batch(CFG, b, jnp.float32)
        t1, _, s1 = dec.decode_block_batch(params, table, cb, st, win, tl,
                                           lim, cfg, block=block)
        t2, _, s2 = dec.decode_block_batch(params, table, cb, s1, win, tl,
                                           lim, cfg, block=block)
        return t1, t2, s2

    a1, a2, sa = run(CFG)
    f1, f2, sf = run(dataclasses.replace(CFG, use_fused_step=True))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(sa.pos), np.asarray(sf.pos))
    np.testing.assert_allclose(np.asarray(sa.k_cache),
                               np.asarray(sf.k_cache), atol=1e-4)
