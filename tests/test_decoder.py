"""Speech-decoder parity: JAX GPT vs torch oracle; KV-cache decode vs
full-context forward."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmvox_tpu.models import decoder as dec
from llmvox_tpu.ops import nn
from llmvox_tpu.utils.config import DecoderConfig

from tests import torch_ref

SMALL = DecoderConfig(n_layer=2, n_head=2, n_embd=32, block_size=64,
                      vocab_size=16, bias=False,
                      text_embed_dim=12, speech_embed_dim=20,
                      text_vocab_size=20, pad_token_id=17, text_eos_id=18,
                      eoa_token_id=7)
SMALL_BIAS = DecoderConfig(n_layer=2, n_head=2, n_embd=32, block_size=64,
                           vocab_size=16, bias=True,
                           text_embed_dim=12, speech_embed_dim=20)
RNG = np.random.default_rng(0)


def _randomized_params(cfg, seed=0):
    params = jax.device_get(
        dec.init_decoder_params(jax.random.PRNGKey(seed), cfg))
    rng = np.random.default_rng(seed + 100)
    return jax.tree.map(
        lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(np.float32),
        params)


@pytest.mark.parametrize("cfg", [SMALL, SMALL_BIAS], ids=["nobias", "bias"])
def test_forward_matches_torch(cfg):
    params = _randomized_params(cfg)
    emb = RNG.standard_normal((2, 10, cfg.n_embd)).astype(np.float32)
    ours = dec.apply_decoder(params, jnp.asarray(emb), cfg)
    ref = torch_ref.gpt_forward(params, emb, cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_loss_ignores_ignore_index():
    cfg = SMALL
    params = _randomized_params(cfg)
    emb = RNG.standard_normal((1, 6, cfg.n_embd)).astype(np.float32)
    targets = np.array([[1, 2, cfg.ignore_index, 3, cfg.ignore_index, 4]])
    loss = dec.decoder_loss(params, jnp.asarray(emb), jnp.asarray(targets),
                            cfg, train=False)
    # manual: mean NLL over the 4 valid positions
    logits = np.asarray(dec.apply_decoder(params, jnp.asarray(emb), cfg))[0]
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    valid = [(0, 1), (1, 2), (3, 3), (5, 4)]
    want = -np.mean([logp[t, y] for t, y in valid])
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def _greedy_reference(params, cfg, text_table, codebook, text_ids, n_steps):
    """Greedy decode via repeated full-context forward (no KV cache) —
    replicates the reference consumer's math (streaming_server.py:323-346)."""
    tokens, prev = [], None
    embs = []
    for pos in range(n_steps):
        tid = text_ids[pos] if pos < len(text_ids) else cfg.pad_token_id
        temb = text_table[tid]
        sfeat = (np.zeros(cfg.speech_embed_dim, np.float32) if pos == 0
                 else codebook[prev])
        e = np.concatenate([temb, sfeat])
        e = e / max(np.linalg.norm(e), 1e-8)
        embs.append(e)
        x = np.stack(embs)[None]
        logits = np.asarray(
            dec.apply_decoder(params, jnp.asarray(x), cfg))[0, -1]
        prev = int(np.argmax(logits))
        tokens.append(prev)
    return tokens


@pytest.mark.slow
def test_decode_block_matches_full_context_greedy():
    # EOA placed outside the vocab so the random model never terminates —
    # this test checks pure decode parity, not termination.
    cfg = dataclasses.replace(SMALL, eoa_token_id=999)
    params = _randomized_params(cfg, seed=3)
    rng = np.random.default_rng(5)
    text_table = rng.standard_normal(
        (cfg.text_vocab_size, cfg.text_embed_dim)).astype(np.float32)
    codebook = rng.standard_normal(
        (cfg.vocab_size, cfg.speech_embed_dim)).astype(np.float32)
    text_ids = [3, 1, 4, 1, 5, cfg.text_eos_id]

    n_steps = 20
    ref_tokens = _greedy_reference(params, cfg, text_table, codebook,
                                   text_ids, n_steps)

    state = dec.init_decode_state(cfg, dtype=jnp.float32)
    tids = np.full(40, cfg.pad_token_id, np.int32)
    tids[:len(text_ids)] = text_ids
    got = []
    for _ in range(n_steps // 5):
        pos = int(state.pos)
        window = tids[pos:pos + 5]
        tokens, n, state = dec.decode_block(
            params, jnp.asarray(text_table), jnp.asarray(codebook), state,
            jnp.asarray(window), jnp.int32(len(text_ids)), jnp.int32(5),
            cfg, block=5)
        got.extend(int(t) for t in np.asarray(tokens) if t >= 0)
        assert int(n) == 5
    assert got == ref_tokens


def test_decode_block_limit_and_eoa():
    """Pacing limit gates generation; EOA sets done and freezes output."""
    cfg = SMALL
    params = _randomized_params(cfg, seed=4)
    rng = np.random.default_rng(6)
    text_table = rng.standard_normal(
        (cfg.text_vocab_size, cfg.text_embed_dim)).astype(np.float32)
    codebook = rng.standard_normal(
        (cfg.vocab_size, cfg.speech_embed_dim)).astype(np.float32)
    window = np.full(8, cfg.pad_token_id, np.int32)

    state = dec.init_decode_state(cfg, dtype=jnp.float32)
    tokens, n, state = dec.decode_block(
        params, jnp.asarray(text_table), jnp.asarray(codebook), state,
        jnp.asarray(window), jnp.int32(8), jnp.int32(3), cfg, block=8)
    assert int(n) == 3
    toks = np.asarray(tokens)
    assert (toks[3:] == -1).all()
    assert int(state.pos) == 3

    # force-run until either EOA appears naturally or cap; verify done flag
    for _ in range(6):
        tokens, n, state = dec.decode_block(
            params, jnp.asarray(text_table), jnp.asarray(codebook), state,
            jnp.asarray(window), jnp.int32(8), jnp.int32(8), cfg, block=8)
        if bool(state.done):
            break
    if bool(state.done):
        # once done, nothing more is generated
        tokens, n, state = dec.decode_block(
            params, jnp.asarray(text_table), jnp.asarray(codebook), state,
            jnp.asarray(window), jnp.int32(8), jnp.int32(8), cfg, block=8)
        assert int(n) == 0


def test_param_count_deployed_is_30m():
    cfg = DecoderConfig()
    params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
    n = dec.num_params(params)
    # README claims ~30M (README.md:30); exact: 4-layer width-768 GPT + head
    assert 28e6 < n < 32e6


def test_crop_block_size():
    """Reference src/model.py:239-250: shrink the context window."""
    import dataclasses
    cfg = SMALL
    params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
    new_block = cfg.block_size // 2
    cropped, ccfg = dec.crop_block_size(params, cfg, new_block)
    assert ccfg.block_size == new_block
    assert cropped["wpe"].shape[0] == new_block
    emb = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, new_block, cfg.n_embd)), jnp.float32)
    full = dec.apply_decoder(params, emb, cfg)
    crop = dec.apply_decoder(cropped, emb, ccfg)
    np.testing.assert_allclose(np.asarray(full), np.asarray(crop),
                               atol=1e-5, rtol=1e-5)


def test_dropout_sites_active_in_training():
    """With dropout > 0 the forward is stochastic per rng and averages
    near the eval forward (embedding + two residual drops per block,
    src/model.py parity)."""
    cfg = dataclasses.replace(SMALL, dropout=0.5)
    params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
    emb = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 8, cfg.n_embd)), jnp.float32)
    a = dec.apply_decoder(params, emb, cfg,
                          dropout_rng=jax.random.PRNGKey(1), train=True)
    b = dec.apply_decoder(params, emb, cfg,
                          dropout_rng=jax.random.PRNGKey(2), train=True)
    c = dec.apply_decoder(params, emb, cfg, train=False)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))
    # eval (train=False) ignores dropout entirely and is deterministic
    d = dec.apply_decoder(params, emb, cfg, train=False)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))
