"""Pooled speculative decode for the TPU-hosted LLM
(models/llama.py::decode_block_spec_pooled + serve/llm_pool.py spec_k).

The contract under test: speculation NEVER changes the tokens — for any
draft quality (trained heads, random heads, oracle drafts, adversarial
drafts) the output equals greedy ``decode_block_pooled`` token for
token; drafts only change how many sequential forwards a block costs
(the ``iters`` return).  This mirrors tests/test_decoder_spec_batch.py
for the speech decoder.  No reference counterpart: the reference's LLM
serving decodes strictly per token per request
(inference/llm_streaming.py:44-106).
"""
import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmvox_tpu.models import llama

CFG = llama.LlamaConfig(vocab_size=128, n_layer=2, n_head=4, n_kv_head=2,
                        n_embd=32, intermediate_size=64, max_seq_len=96,
                        n_draft_heads=3)

PROMPTS = [[5, 9, 2], [7, 11, 13, 17, 19, 23, 29], [3] * 12, [42]]


@pytest.fixture(scope="module")
def params():
    p = llama.init_llama_params(jax.random.PRNGKey(0), CFG)
    assert "draft_heads" in p
    return p


def _prefill_prompts(params, prompts, batch):
    """Prefill ``prompts`` into slots 0..n-1 of a fresh pool state."""
    n = len(prompts)
    tpad = 16
    tokens = np.zeros((n, tpad), np.int32)
    valid = np.zeros((n,), np.int32)
    for i, p in enumerate(prompts):
        tokens[i, : len(p)] = p
        valid[i] = len(p)
    state = llama.init_llama_pool_state(CFG, batch=batch)
    first, state = llama.prefill_slots(
        params, jnp.asarray(tokens), jnp.asarray(valid), state,
        jnp.arange(n, dtype=jnp.int32), jnp.ones((n,), bool),
        jax.random.PRNGKey(1), CFG)
    return np.asarray(first), state


def _greedy_blocks(params, state, active, block, nblocks, attn_len=None):
    outs = []
    for i in range(nblocks):
        toks, state = llama.decode_block_pooled(
            params, state, jnp.asarray(active), jax.random.PRNGKey(7 + i),
            CFG, block=block, attn_len=attn_len)
        outs.append(np.asarray(toks))
    return np.concatenate(outs, axis=1), state


def test_spec_matches_greedy_random_heads(params):
    """Untrained (random) draft heads: drafts almost never accept, output
    must STILL equal greedy exactly."""
    block = 8
    active = [True] * len(PROMPTS)
    _, st_g = _prefill_prompts(params, PROMPTS, batch=4)
    want, st_g = _greedy_blocks(params, st_g, active, block, 2)

    _, st = _prefill_prompts(params, PROMPTS, batch=4)
    outs, its = [], []
    for _ in range(2):
        toks, st, iters = llama.decode_block_spec_pooled(
            params, st, jnp.asarray(active), CFG, block=block, k_draft=3)
        outs.append(np.asarray(toks))
        its.append(np.asarray(iters))
    got = np.concatenate(outs, axis=1)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st_g.pos))
    np.testing.assert_array_equal(np.asarray(st.tok), np.asarray(st_g.tok))
    # every iteration commits >= 2 tokens (step + first correction), so a
    # row never needs more than ceil(block/2) iterations
    assert np.all(sum(its) <= 2 * ((block + 1) // 2))


def test_spec_oracle_drafts_cut_iterations(params):
    """Drafts equal to the greedy continuation: every draft accepts, a
    block of 8 with k_draft=3 completes in ceil(8/4)=2 iterations."""
    block, kd = 8, 3
    active = [True] * len(PROMPTS)
    _, st_g = _prefill_prompts(params, PROMPTS, batch=4)
    want, _ = _greedy_blocks(params, st_g, active, block, 1)

    _, st = _prefill_prompts(params, PROMPTS, batch=4)
    toks, st, iters = llama.decode_block_spec_pooled(
        params, st, jnp.asarray(active), CFG, block=block, k_draft=kd,
        draft_tokens=jnp.asarray(want))
    np.testing.assert_array_equal(np.asarray(toks), want)
    assert np.asarray(iters).tolist() == [2] * 4


def test_spec_adversarial_drafts_exact_and_bounded(params):
    """Drafts engineered to ALWAYS mismatch: output equals greedy and each
    iteration still commits step + correction (ceil(block/2) iters)."""
    block, kd = 8, 3
    active = [True] * len(PROMPTS)
    _, st_g = _prefill_prompts(params, PROMPTS, batch=4)
    want, _ = _greedy_blocks(params, st_g, active, block, 1)

    bad = (want + 1) % CFG.vocab_size
    _, st = _prefill_prompts(params, PROMPTS, batch=4)
    toks, st, iters = llama.decode_block_spec_pooled(
        params, st, jnp.asarray(active), CFG, block=block, k_draft=kd,
        draft_tokens=jnp.asarray(bad))
    np.testing.assert_array_equal(np.asarray(toks), want)
    assert np.asarray(iters).tolist() == [(block + 1) // 2] * 4


def test_spec_inactive_rows_frozen(params):
    """Inactive rows must not move pos/tok and must emit -1; reactivating
    them later continues their greedy sequence exactly."""
    block = 4
    _, st0 = _prefill_prompts(params, PROMPTS[:2], batch=2)
    pos0 = np.asarray(st0.pos).copy()
    tok0 = np.asarray(st0.tok).copy()

    toks, st, _ = llama.decode_block_spec_pooled(
        params, st0, jnp.asarray([True, False]), CFG, block=block,
        k_draft=3)
    toks = np.asarray(toks)
    assert np.all(toks[1] == -1)
    assert np.asarray(st.pos)[1] == pos0[1]
    assert np.asarray(st.tok)[1] == tok0[1]

    # both rows now — each must match its own greedy continuation
    _, st_g = _prefill_prompts(params, PROMPTS[:2], batch=2)
    want_a, st_g = _greedy_blocks(params, st_g, [True, False], block, 1)
    want_b, _ = _greedy_blocks(params, st_g, [True, True], block, 1)
    np.testing.assert_array_equal(toks[0], want_a[0])
    toks2, st, _ = llama.decode_block_spec_pooled(
        params, st, jnp.asarray([True, True]), CFG, block=block, k_draft=3)
    np.testing.assert_array_equal(np.asarray(toks2), want_b)


def test_spec_attn_len_bucket_exact(params):
    """The attention-window bucket (pos + block + k_draft + 1 <= attn_len)
    must not change the output."""
    block, kd = 8, 3
    active = [True] * len(PROMPTS)
    _, st_g = _prefill_prompts(params, PROMPTS, batch=4)
    want, _ = _greedy_blocks(params, st_g, active, block, 1)
    _, st = _prefill_prompts(params, PROMPTS, batch=4)
    attn = 32
    assert int(np.asarray(st.pos).max()) + block + kd + 1 <= attn
    toks, _, _ = llama.decode_block_spec_pooled(
        params, st, jnp.asarray(active), CFG, block=block, k_draft=kd,
        attn_len=attn)
    np.testing.assert_array_equal(np.asarray(toks), want)


def _run(coro):
    return asyncio.run(asyncio.wait_for(coro, timeout=600))


def test_llm_pool_spec_e2e_matches_plain_pool(params):
    """LLMPool(spec_k=3) streams the same tokens as the plain pool for
    concurrent requests — speculation is invisible to consumers."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    async def collect(pool):
        async def one(ids):
            toks = []
            async for chunk in pool.generate(ids, max_tokens=9):
                toks.extend(chunk)
            return toks

        try:
            return await asyncio.gather(*(one(p) for p in PROMPTS))
        finally:
            pool.stop()

    plain = LLMPool(params, CFG, capacity=4, block=4,
                    prefill_buckets=(16,))
    assert not plain.use_spec
    want = _run(collect(plain))

    spec = LLMPool(params, CFG, capacity=4, block=4,
                   prefill_buckets=(16,), spec_k=3)
    assert spec.use_spec
    got = _run(collect(spec))
    assert got == want


def test_llm_pool_spec_requires_greedy_and_heads(params):
    """spec_k with sampling or without draft heads silently falls back."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    sampled = LLMPool(params, CFG, capacity=2, block=4, temperature=0.8,
                      spec_k=3)
    assert not sampled.use_spec
    no_heads = {k: v for k, v in params.items() if k != "draft_heads"}
    plain = LLMPool(no_heads, CFG, capacity=2, block=4, spec_k=3)
    assert not plain.use_spec


def test_llama_mtp_loss_trains_draft_heads(params):
    """llama_loss's aux losses reach the draft heads (nonzero grads) and
    leave the base loss convention intact (predict tokens[t+1])."""
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, CFG.vocab_size, (2, 24)),
        jnp.int32)
    loss, grads = jax.value_and_grad(llama.llama_loss)(params, tokens, CFG)
    assert np.isfinite(float(loss))
    g = np.asarray(jnp.abs(grads["draft_heads"]).max())
    assert g > 0

    # without heads the loss is the plain next-token CE
    no_heads = {k: v for k, v in params.items() if k != "draft_heads"}
    base = llama.llama_loss(no_heads, tokens, CFG)
    logits = llama.apply_llama(no_heads, tokens[:, :-1], CFG)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)[..., 0]
    np.testing.assert_allclose(float(base), float(jnp.mean(nll)), rtol=1e-6)
