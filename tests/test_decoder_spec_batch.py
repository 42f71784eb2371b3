"""Batched speculative decode (models/decoder.py::decode_block_spec_batch).

The pooled-serving counterpart of decode_block_spec: B streams advance
together, each committing its own accepted prefix per iteration.  The
invariant under test: output is BIT-IDENTICAL to ``decode_block_batch``
for ANY draft quality — per-row drafts only change each row's iteration
count, and rows freeze independently on their own limits/EOA.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmvox_tpu.models import decoder as dec
from llmvox_tpu.utils.config import DecoderConfig

CFG = DecoderConfig(n_layer=2, n_head=4, n_embd=64, block_size=128,
                    vocab_size=64, text_embed_dim=24, speech_embed_dim=40,
                    text_vocab_size=386, eoa_token_id=10_000)
B = 4


@pytest.fixture(scope="module")
def stack():
    params = dec.init_decoder_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(0)
    table = jnp.asarray(
        0.05 * rng.standard_normal((CFG.text_vocab_size,
                                    CFG.text_embed_dim)), jnp.float32)
    codebook = jnp.asarray(
        0.05 * rng.standard_normal((CFG.vocab_size, CFG.speech_embed_dim)),
        jnp.float32)
    windows = jnp.asarray(rng.integers(0, 256, (B, 32)), jnp.int32)
    tlens = jnp.asarray([20, 5, 32, 0], jnp.int32)
    return params, table, codebook, windows, tlens


def _greedy(params, table, codebook, windows, tlens, limits, cfg=CFG,
            block=32, states=None):
    if states is None:
        states = dec.init_decode_state_batch(cfg, B, jnp.float32)
    toks, n, states = dec.decode_block_batch(
        params, table, codebook, states, windows, tlens,
        jnp.asarray(limits, jnp.int32), cfg, block=block)
    return np.asarray(toks), np.asarray(n), states


def _spec(params, table, codebook, windows, tlens, limits, drafts,
          cfg=CFG, block=32, k_draft=4, states=None):
    if states is None:
        states = dec.init_decode_state_batch(cfg, B, jnp.float32)
    toks, n, states, iters = dec.decode_block_spec_batch(
        params, table, codebook, states, windows, tlens,
        jnp.asarray(limits, jnp.int32), cfg, block=block, k_draft=k_draft,
        draft_tokens=drafts)
    return np.asarray(toks), np.asarray(n), states, np.asarray(iters)


def test_oracle_drafts_exact_and_fewer_iters(stack):
    params, table, codebook, windows, tlens = stack
    limits = [32] * B
    want, n_want, st_want = _greedy(params, table, codebook, windows,
                                    tlens, limits)
    drafts = jnp.asarray(np.maximum(want, 0), jnp.int32)
    got, n, st, iters = _spec(params, table, codebook, windows, tlens,
                              limits, drafts)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(n, n_want)
    np.testing.assert_array_equal(np.asarray(st.pos),
                                  np.asarray(st_want.pos))
    np.testing.assert_array_equal(np.asarray(st.prev_token),
                                  np.asarray(st_want.prev_token))
    # perfect drafts: every iteration commits 1 + k_draft tokens per row
    assert iters.max() <= int(np.ceil(32 / 5)) + 1


def test_garbage_drafts_still_exact(stack):
    params, table, codebook, windows, tlens = stack
    limits = [32] * B
    want, n_want, _ = _greedy(params, table, codebook, windows, tlens,
                              limits)
    drafts = jnp.zeros((B, 32), jnp.int32)
    if np.any(want[:, 1] == 0):         # freak collision: shift drafts
        drafts = jnp.ones((B, 32), jnp.int32)
    got, n, _, iters = _spec(params, table, codebook, windows, tlens,
                             limits, drafts)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(n, n_want)
    # rejected drafts: the fused forward's exact slot 0 still commits
    # 1 token per iteration (worst case = the greedy step count)
    assert iters.max() <= 32


def test_random_draft_heads_exact(stack):
    """Untrained heads drafting per row: correctness must not depend on
    draft quality."""
    params, table, codebook, windows, tlens = stack
    cfg = dataclasses.replace(CFG, n_draft_heads=3)
    params_h = dec.init_decoder_params(jax.random.PRNGKey(1), cfg)
    limits = [32] * B
    want, n_want, _ = _greedy(params_h, table, codebook, windows, tlens,
                              limits, cfg=cfg)
    states = dec.init_decode_state_batch(cfg, B, jnp.float32)
    got, n, _, _ = dec.decode_block_spec_batch(
        params_h, table, codebook, states, windows, tlens,
        jnp.asarray(limits, jnp.int32), cfg, block=32, k_draft=3)
    np.testing.assert_array_equal(np.asarray(got), want)
    np.testing.assert_array_equal(np.asarray(n), n_want)


def test_per_row_limits_and_eoa(stack):
    """Heterogeneous limits; one row hits EOA mid-block.  Every row
    freezes independently and matches the greedy batch."""
    params, table, codebook, windows, tlens = stack
    base, _, _ = _greedy(params, table, codebook, windows, tlens,
                         [32] * B)
    eoa = int(base[0, 7])               # row 0 stops at step 8
    cfg = dataclasses.replace(CFG, eoa_token_id=eoa)
    limits = [32, 1, 7, 19]
    want, n_want, st_want = _greedy(params, table, codebook, windows,
                                    tlens, limits, cfg=cfg)
    drafts = jnp.asarray(np.maximum(base, 0), jnp.int32)
    got, n, st, _ = _spec(params, table, codebook, windows, tlens,
                          limits, drafts, cfg=cfg)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(n, n_want)
    np.testing.assert_array_equal(np.asarray(st.done),
                                  np.asarray(st_want.done))
    np.testing.assert_array_equal(np.asarray(st.pos),
                                  np.asarray(st_want.pos))


def test_chained_batched_spec_matches_chained_greedy(stack):
    """State carried across calls continues every row exactly like
    chained decode_block_batch calls (the pool's streaming pattern)."""
    params, table, codebook, _, tlens = stack
    st_g = dec.init_decode_state_batch(CFG, B, jnp.float32)
    st_s = dec.init_decode_state_batch(CFG, B, jnp.float32)
    rng = np.random.default_rng(1)
    all_g, all_s = [], []
    for call in range(3):
        w = jnp.asarray(rng.integers(0, 256, (B, 16)), jnp.int32)
        limits = jnp.asarray(rng.integers(1, 17, (B,)), jnp.int32)
        tg, _, st_g = dec.decode_block_batch(
            params, table, codebook, st_g, w, tlens, limits, CFG,
            block=16)
        ts, _, st_s, _ = dec.decode_block_spec_batch(
            params, table, codebook, st_s, w, tlens, limits, CFG,
            block=16, k_draft=4, draft_tokens=jnp.maximum(tg, 0))
        all_g.append(np.asarray(tg))
        all_s.append(np.asarray(ts))
    np.testing.assert_array_equal(np.concatenate(all_s, axis=1),
                                  np.concatenate(all_g, axis=1))
    np.testing.assert_array_equal(np.asarray(st_s.pos),
                                  np.asarray(st_g.pos))
    np.testing.assert_array_equal(np.asarray(st_s.prev_token),
                                  np.asarray(st_g.prev_token))


def test_batched_spec_matches_single_stream_spec(stack):
    """Each batched row reproduces the single-stream speculative decode
    (which itself is proven equal to single-stream greedy)."""
    params, table, codebook, windows, tlens = stack
    limits = [32, 9, 32, 15]
    base, _, _ = _greedy(params, table, codebook, windows, tlens,
                         [32] * B)
    drafts = jnp.asarray(np.maximum(base, 0), jnp.int32)
    got, _, _, _ = _spec(params, table, codebook, windows, tlens, limits,
                         drafts)
    for b in range(B):
        st = dec.init_decode_state(CFG, jnp.float32)
        toks, _, _, _ = dec.decode_block_spec(
            params, table, codebook, st, windows[b], tlens[b],
            jnp.int32(limits[b]), CFG, block=32, k_draft=4,
            draft_tokens=drafts[b])
        np.testing.assert_array_equal(got[b], np.asarray(toks),
                                      err_msg=f"row {b}")
