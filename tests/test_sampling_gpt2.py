"""Sampling decode + GPT-2 import tests."""
import numpy as np
import jax
import jax.numpy as jnp

from llmvox_tpu.models import decoder as dec
from llmvox_tpu.models.gpt2_import import convert_gpt2_state_dict
from llmvox_tpu.utils.config import DecoderConfig

from tests.test_decoder import SMALL, _randomized_params


def test_sample_block_greedy_limit_matches_decode_when_cold():
    """temperature -> 0 approximated by tiny temperature: sampling must
    reproduce greedy argmax tokens."""
    import dataclasses
    cfg = dataclasses.replace(SMALL, eoa_token_id=999)
    params = _randomized_params(cfg, seed=7)
    rng = np.random.default_rng(8)
    table = rng.standard_normal((cfg.text_vocab_size, cfg.text_embed_dim)
                                ).astype(np.float32)
    codebook = rng.standard_normal((cfg.vocab_size, cfg.speech_embed_dim)
                                   ).astype(np.float32)
    window = np.full(10, cfg.pad_token_id, np.int32)

    st = dec.init_decode_state(cfg, jnp.float32)
    greedy, _, _ = dec.decode_block(
        params, jnp.asarray(table), jnp.asarray(codebook), st,
        jnp.asarray(window), jnp.int32(2), jnp.int32(10), cfg, block=10)

    st = dec.init_decode_state(cfg, jnp.float32)
    sampled, n, _ = dec.sample_block(
        params, jnp.asarray(table), jnp.asarray(codebook), st,
        jnp.asarray(window), jnp.int32(2), jnp.int32(10),
        jax.random.PRNGKey(0), 1e-4, cfg, block=10)
    assert int(n) == 10
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(sampled))


def test_sample_block_topk_and_temperature_vary():
    import dataclasses
    cfg = dataclasses.replace(SMALL, eoa_token_id=999)
    params = _randomized_params(cfg, seed=9)
    rng = np.random.default_rng(10)
    table = rng.standard_normal((cfg.text_vocab_size, cfg.text_embed_dim)
                                ).astype(np.float32)
    codebook = rng.standard_normal((cfg.vocab_size, cfg.speech_embed_dim)
                                   ).astype(np.float32)
    window = np.full(16, cfg.pad_token_id, np.int32)
    outs = []
    for seed in (0, 1):
        st = dec.init_decode_state(cfg, jnp.float32)
        toks, _, _ = dec.sample_block(
            params, jnp.asarray(table), jnp.asarray(codebook), st,
            jnp.asarray(window), jnp.int32(1), jnp.int32(16),
            jax.random.PRNGKey(seed), 2.0, cfg, block=16, top_k=8)
        outs.append(np.asarray(toks))
    assert not np.array_equal(outs[0], outs[1])  # hot sampling is stochastic
    assert (outs[0] >= 0).all() and (outs[0] < cfg.vocab_size).all()


def test_gpt2_conversion_layout():
    cfg = DecoderConfig(n_layer=2, n_head=2, n_embd=8, block_size=16,
                        vocab_size=6, bias=True)
    rng = np.random.default_rng(0)
    sd = {"wpe.weight": rng.standard_normal((16, 8)).astype(np.float32),
          "ln_f.weight": np.ones(8, np.float32),
          "ln_f.bias": np.zeros(8, np.float32)}
    for i in range(2):
        sd[f"h.{i}.ln_1.weight"] = np.ones(8, np.float32)
        sd[f"h.{i}.ln_1.bias"] = np.zeros(8, np.float32)
        sd[f"h.{i}.attn.c_attn.weight"] = rng.standard_normal(
            (8, 24)).astype(np.float32)  # HF Conv1D (Cin, Cout)
        sd[f"h.{i}.attn.c_attn.bias"] = np.zeros(24, np.float32)
        sd[f"h.{i}.attn.c_proj.weight"] = rng.standard_normal(
            (8, 8)).astype(np.float32)
        sd[f"h.{i}.attn.c_proj.bias"] = np.zeros(8, np.float32)
        sd[f"h.{i}.ln_2.weight"] = np.ones(8, np.float32)
        sd[f"h.{i}.ln_2.bias"] = np.zeros(8, np.float32)
        sd[f"h.{i}.mlp.c_fc.weight"] = rng.standard_normal(
            (8, 32)).astype(np.float32)
        sd[f"h.{i}.mlp.c_fc.bias"] = np.zeros(32, np.float32)
        sd[f"h.{i}.mlp.c_proj.weight"] = rng.standard_normal(
            (32, 8)).astype(np.float32)
        sd[f"h.{i}.mlp.c_proj.bias"] = np.zeros(8, np.float32)

    params = convert_gpt2_state_dict(sd, n_layer=2, speech_vocab=6)
    # HF Conv1D already matches our (Cin, Cout): no transpose
    np.testing.assert_allclose(params["h"]["wqkv"][0],
                               sd["h.0.attn.c_attn.weight"])
    assert params["head"].shape == (8, 6)
    # converted params drive the decoder forward
    emb = rng.standard_normal((1, 4, 8)).astype(np.float32)
    logits = dec.apply_decoder(params, jnp.asarray(emb), cfg)
    assert np.isfinite(np.asarray(logits)).all()
