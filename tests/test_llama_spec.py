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


def test_llm_pool_adaptive_ladder_token_identity_across_switches(params):
    """VERDICT r3 #4: the adaptive ladder (serve/spec_control.py, ported
    from the TTS pool) must be invisible to consumers — with the
    controller forced through LIVE rung switches (greedy <-> two spec
    depths, mid-generation), concurrent streams equal the plain pool
    token for token."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    async def collect(pool):
        async def one(ids):
            toks = []
            async for chunk in pool.generate(ids, max_tokens=17):
                toks.extend(chunk)
            return toks

        try:
            return await asyncio.gather(*(one(p) for p in PROMPTS))
        finally:
            pool.stop()

    plain = LLMPool(params, CFG, capacity=4, block=4,
                    prefill_buckets=(16,))
    want = _run(collect(plain))

    adaptive = LLMPool(params, CFG, capacity=4, block=4,
                       prefill_buckets=(16,), spec_ladder=(0, 2, 3))
    assert adaptive._adaptive and adaptive.use_spec
    assert adaptive._spec_rungs == (0, 2, 3)
    # force a switch at EVERY step: rung cycle 0 -> 3 -> 2 -> 0 -> ...
    cycle = [0, 3, 2]
    calls = []
    adaptive._spec_ctl.next_k = lambda: (
        calls.append(None) or cycle[(len(calls) - 1) % 3])
    got = _run(collect(adaptive))
    assert got == want
    assert len(calls) >= 3          # actually cycled through the rungs


def test_llm_pool_adaptive_parks_on_greedy_when_heads_never_accept(params):
    """Random (untrained) draft heads: the controller must measure the
    near-zero accept rate and move the pool to rung 0 — a bad checkpoint
    degrades to greedy speed, never below.  Costs are injected (spec
    iterations priced at 2.5x a greedy token) so the decision is
    deterministic on any host."""
    from llmvox_tpu.serve.llm_pool import LLMPool
    from llmvox_tpu.serve.spec_control import SpecController

    pool = LLMPool(params, CFG, capacity=2, block=4,
                   prefill_buckets=(16,), spec_ladder=(0, 3))
    pool._spec_ctl = SpecController(
        (0, 3), k0=3, cost_ms={0: 1.0, 3: 2.5}, dwell=2, probe_every=50)

    async def go():
        toks = []
        async for chunk in pool.generate(PROMPTS[1], max_tokens=40):
            toks.extend(chunk)
        pool.stop()
        return toks

    got = _run(go())
    assert got[:40] == _b1_like(params, PROMPTS[1], 40)
    ctl = pool._spec_ctl
    assert ctl.k == 0, f"controller stayed on rung {ctl.k}"
    assert ctl.switches >= 1
    assert ctl.p is not None and ctl.p < 0.6
    # observability: the ladder state is in the pool's /stats payload
    st = pool.stats()["spec"]
    assert st["k"] == 0 and st["ladder"] == [0, 3]


def _b1_like(params, ids, n_tokens):
    """B=1 greedy reference (mirrors test_llm_pool._b1_greedy)."""
    bucket = 16
    padded = list(ids) + [0] * (bucket - len(ids))
    st = llama.init_llama_decode_state(CFG, batch=1)
    lg, st = llama.prefill_padded(params, jnp.asarray([padded], jnp.int32),
                                  jnp.asarray(len(ids), jnp.int32), st, CFG)
    out = [int(jnp.argmax(lg, axis=-1)[0])]
    tok = jnp.asarray([out[-1]], jnp.int32)
    while len(out) < n_tokens:
        toks, st = llama.decode_block(params, tok, st, jax.random.PRNGKey(0),
                                      CFG, block=4)
        out.extend(int(t) for t in np.asarray(toks)[0])
        tok = jnp.asarray([out[-1]], jnp.int32)
    return out[:n_tokens]


def test_llm_pool_adaptive_calibration_fills_costs(params):
    """warmup() calibrates a per-rung cost table (ms/token for rung 0,
    ms/iteration for spec rungs) so the controller's tokens/ms model has
    real inputs from step one."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    pool = LLMPool(params, CFG, capacity=2, block=4,
                   prefill_buckets=(16,), spec_ladder=(0, 3))
    pool.warmup()
    costs = pool._spec_ctl.cost_ms
    assert set(costs) == {0, 3}
    assert all(v > 0 for v in costs.values())


def test_llm_pool_spec_requires_heads(params):
    """spec_k without draft heads silently falls back; WITH heads both
    greedy and sampled modes speculate (sampled = rejection sampling)."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    sampled = LLMPool(params, CFG, capacity=2, block=4, temperature=0.8,
                      spec_k=3)
    assert sampled.use_spec
    no_heads = {k: v for k, v in params.items() if k != "draft_heads"}
    plain = LLMPool(no_heads, CFG, capacity=2, block=4, spec_k=3)
    assert not plain.use_spec


# ---------------------------------------------------------------------------
# sampled speculation (rejection sampling) — distribution-exactness
# ---------------------------------------------------------------------------

SCFG = llama.LlamaConfig(vocab_size=32, n_layer=2, n_head=4, n_kv_head=2,
                         n_embd=32, intermediate_size=64, max_seq_len=64,
                         n_draft_heads=2)
SPROMPT = [5, 9, 2, 17, 3, 11]


@pytest.fixture(scope="module")
def sparams():
    return llama.init_llama_params(jax.random.PRNGKey(2), SCFG)


def _sprefill(sparams, batch):
    """All ``batch`` rows prefilled with the SAME prompt, first token
    taken greedily so every row starts from one deterministic state."""
    tokens = np.tile(np.asarray(SPROMPT, np.int32), (batch, 1))
    state = llama.init_llama_pool_state(SCFG, batch=batch)
    first, state = llama.prefill_slots(
        sparams, jnp.asarray(tokens),
        jnp.full((batch,), len(SPROMPT), jnp.int32), state,
        jnp.arange(batch, dtype=jnp.int32), jnp.ones((batch,), bool),
        jax.random.PRNGKey(0), SCFG, temperature=0.0)
    return int(np.asarray(first)[0]), state


def _exact_marginals(sparams, t0, temperature, top_k=0, top_p=1.0):
    """Enumerated model conditionals: p1 = P(e1 | prompt, t0) and the
    marginal p2 = sum_v p1(v) P(e2 | prompt, t0, v) — the law the sampled
    spec path must reproduce (same filtering as _sample)."""
    v_sz = SCFG.vocab_size
    seq = jnp.asarray([SPROMPT + [t0]], jnp.int32)
    logits = llama.apply_llama(sparams, seq, SCFG)[0, -1]
    p1 = jax.nn.softmax(
        llama._filtered_logits(logits, temperature, top_k, top_p))
    seqs = jnp.asarray([SPROMPT + [t0, v] for v in range(v_sz)], jnp.int32)
    logits2 = llama.apply_llama(sparams, seqs, SCFG)[:, -1]
    p2c = jax.nn.softmax(
        llama._filtered_logits(logits2, temperature, top_k, top_p), axis=-1)
    return np.asarray(p1), np.asarray(p1 @ p2c)


def _tv(samples, exact):
    emp = np.bincount(samples, minlength=len(exact)) / len(samples)
    return 0.5 * float(np.abs(emp - exact).sum())


def _spec_samples(sparams, trials, temperature, top_k=0, top_p=1.0,
                  batch=32, block=3, kd=2, draft_tokens=None):
    active = jnp.ones((batch,), bool)
    outs, its = [], []
    for t in range(trials):
        _, state = _sprefill(sparams, batch)
        toks, _, iters = llama.decode_block_spec_pooled(
            sparams, state, active, SCFG, block=block, k_draft=kd,
            draft_tokens=draft_tokens, rng=jax.random.PRNGKey(1000 + t),
            temperature=temperature, top_k=top_k, top_p=top_p)
        outs.append(np.asarray(toks))
        its.append(np.asarray(iters))
    return np.concatenate(outs, axis=0), np.concatenate(its)


def test_spec_sampled_distribution_exact(sparams):
    """Rejection-sampling speculation must reproduce the model's exact
    conditional law: empirical marginals of the first two emitted tokens
    (2560 samples) match the enumerated model marginals."""
    t0, _ = _sprefill(sparams, 1)
    p1, p2 = _exact_marginals(sparams, t0, temperature=1.0)
    toks, iters = _spec_samples(sparams, trials=80, temperature=1.0)
    assert toks.shape == (2560, 3) and np.all(toks >= 0)
    assert _tv(toks[:, 0], p1) < 0.08
    assert _tv(toks[:, 1], p2) < 0.08
    # both the accept and the reject/correction paths must be exercised:
    # mean iterations strictly between the all-accept and no-accept bounds
    mean_it = iters.mean()
    assert 1.0 < mean_it < 3.0, mean_it


def test_spec_sampled_adversarial_proposal_exact(sparams):
    """Deterministic one-hot proposal (explicit draft_tokens, all the
    same token): an always-accept bug would emit that token with
    probability ~1; exact rejection sampling must still reproduce the
    model marginal."""
    t0, _ = _sprefill(sparams, 1)
    p1, p2 = _exact_marginals(sparams, t0, temperature=1.0)
    y = int(np.argmin(p2))          # least likely token as the draft
    drafts = jnp.full((32, 3), y, jnp.int32)
    toks, _ = _spec_samples(sparams, trials=80, temperature=1.0,
                            draft_tokens=drafts)
    assert _tv(toks[:, 1], p2) < 0.08
    # the test has power: the broken (always-accept) law is far away
    assert abs(1.0 - p2[y]) > 0.5


def test_spec_sampled_filtering_invariant(sparams):
    """With top-k/top-p active, every emitted token must lie in the
    filtered support of the exact conditional at its position (teacher-
    forced recheck), and the e1 marginal matches the filtered law."""
    t0, _ = _sprefill(sparams, 1)
    temperature, top_k, top_p = 0.8, 6, 0.9
    p1, _ = _exact_marginals(sparams, t0, temperature, top_k, top_p)
    toks, _ = _spec_samples(sparams, trials=40, temperature=temperature,
                            top_k=top_k, top_p=top_p, block=4)
    assert _tv(toks[:, 0], p1) < 0.08
    # teacher-forced support check over full emitted sequences
    seqs = np.concatenate(
        [np.tile(SPROMPT + [t0], (len(toks), 1)), toks[:, :-1]], axis=1)
    logits = llama.apply_llama(sparams, jnp.asarray(seqs), SCFG)
    start = len(SPROMPT)            # logits[start + j] predicts toks[:, j]
    for j in range(toks.shape[1]):
        f = llama._filtered_logits(logits[:, start + j], temperature,
                                   top_k, top_p)
        ok = np.take_along_axis(np.asarray(f), toks[:, j: j + 1],
                                axis=1)[:, 0]
        assert np.all(np.isfinite(ok)), f"token outside filtered support @ {j}"


def test_spec_sampled_cache_consistency(sparams):
    """After a sampled spec block the pool state must equal the teacher-
    forced rebuild of the emitted sequence: same pos, same last token,
    same KV rows below pos (mis-speculated probe rows live above pos)."""
    batch, block, kd = 4, 6, 2
    t0, state = _sprefill(sparams, batch)
    toks, state, _ = llama.decode_block_spec_pooled(
        sparams, state, jnp.ones((batch,), bool), SCFG, block=block,
        k_draft=kd, rng=jax.random.PRNGKey(5), temperature=1.0)
    toks = np.asarray(toks)
    want_pos = len(SPROMPT) + 1 + (block - 1)
    assert np.all(np.asarray(state.pos) == want_pos)
    np.testing.assert_array_equal(np.asarray(state.tok), toks[:, -1])

    seqs = np.concatenate(
        [np.tile(SPROMPT + [t0], (batch, 1)), toks[:, :-1]], axis=1)
    ref = llama.init_llama_pool_state(SCFG, batch=batch)
    _, ref = llama.prefill_slots(
        sparams, jnp.asarray(seqs),
        jnp.full((batch,), seqs.shape[1], jnp.int32), ref,
        jnp.arange(batch, dtype=jnp.int32), jnp.ones((batch,), bool),
        jax.random.PRNGKey(0), SCFG, temperature=0.0)
    np.testing.assert_allclose(
        np.asarray(state.k[:, :, :want_pos]),
        np.asarray(ref.k[:, :, :want_pos]), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(state.v[:, :, :want_pos]),
        np.asarray(ref.v[:, :, :want_pos]), atol=2e-4, rtol=2e-4)


def test_llm_pool_sampled_spec_e2e(params):
    """LLMPool with temperature>0 and spec_k streams complete, in-vocab
    token sequences through the rejection-sampling block."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    pool = LLMPool(params, CFG, capacity=4, block=4, temperature=0.9,
                   top_p=0.95, prefill_buckets=(16,), spec_k=3)
    assert pool.use_spec

    async def collect():
        async def one(ids):
            toks = []
            async for chunk in pool.generate(ids, max_tokens=9):
                toks.extend(chunk)
            return toks

        try:
            return await asyncio.gather(*(one(p) for p in PROMPTS))
        finally:
            pool.stop()

    outs = _run(collect())
    for seq in outs:
        assert len(seq) == 9
        assert all(0 <= t < CFG.vocab_size for t in seq)


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


# ---------------------------------------------------------------------------
# MoE x speculation (VERDICT r4 #8): the verify forward runs every row's
# k_draft positions through the SAME drop-free grouped dispatch as plain
# decode (_layer_step_rows -> _mlp(drop_free=True, token_mask)), so
# routing capacity can never change speculative output — proven here at a
# drop-prone shape (E=8, capacity_factor far below balance).
# ---------------------------------------------------------------------------

MOE_CFG = llama.LlamaConfig(
    vocab_size=128, n_layer=2, n_head=4, n_kv_head=2, n_embd=32,
    intermediate_size=64, max_seq_len=96, n_draft_heads=3,
    n_experts=8, moe_top_k=2, moe_capacity_factor=0.25)


@pytest.fixture(scope="module")
def moe_params():
    p = llama.init_llama_params(jax.random.PRNGKey(3), MOE_CFG)
    assert "draft_heads" in p and "moe_wgate" in p["h"]
    return p


def _prefill_cfg(params, cfg, prompts, batch):
    n = len(prompts)
    tokens = np.zeros((n, 16), np.int32)
    valid = np.zeros((n,), np.int32)
    for i, pr in enumerate(prompts):
        tokens[i, : len(pr)] = pr
        valid[i] = len(pr)
    state = llama.init_llama_pool_state(cfg, batch=batch)
    _, state = llama.prefill_slots(
        params, jnp.asarray(tokens), jnp.asarray(valid), state,
        jnp.arange(n, dtype=jnp.int32), jnp.ones((n,), bool),
        jax.random.PRNGKey(1), cfg)
    return state


def test_spec_matches_greedy_on_moe_llama(moe_params):
    """E=8 MoE with an intentionally tiny capacity factor: speculative
    pooled decode (random heads AND oracle drafts) equals greedy pooled
    decode token for token — drop-free inference capacity holds for the
    T=k_draft verify pass too."""
    block, kd = 8, 3
    active = [True] * len(PROMPTS)

    st = _prefill_cfg(moe_params, MOE_CFG, PROMPTS, batch=4)
    want = []
    for i in range(2):
        toks, st = llama.decode_block_pooled(
            moe_params, st, jnp.asarray(active), jax.random.PRNGKey(7),
            MOE_CFG, block=block)
        want.append(np.asarray(toks))
    want = np.concatenate(want, axis=1)

    st = _prefill_cfg(moe_params, MOE_CFG, PROMPTS, batch=4)
    got = []
    for i in range(2):
        toks, st, iters = llama.decode_block_spec_pooled(
            moe_params, st, jnp.asarray(active), MOE_CFG, block=block,
            k_draft=kd)
        got.append(np.asarray(toks))
    np.testing.assert_array_equal(np.concatenate(got, axis=1), want)

    # oracle drafts: full accepts, and STILL byte-identical output
    st = _prefill_cfg(moe_params, MOE_CFG, PROMPTS, batch=4)
    toks, st, iters = llama.decode_block_spec_pooled(
        moe_params, st, jnp.asarray(active), MOE_CFG, block=block,
        k_draft=kd, draft_tokens=jnp.asarray(want[:, :block]))
    np.testing.assert_array_equal(np.asarray(toks), want[:, :block])
    assert np.asarray(iters).tolist() == [2] * 4


def test_spec_moe_row_independent_of_cohort(moe_params):
    """A request's speculative MoE output cannot depend on co-scheduled
    rows (drop-free routing: no shared capacity to compete for): row 0
    decoded alone == row 0 decoded beside three busy rows."""
    block, kd = 8, 3

    st = _prefill_cfg(moe_params, MOE_CFG, PROMPTS, batch=4)
    toks4, _, _ = llama.decode_block_spec_pooled(
        moe_params, st, jnp.asarray([True] * 4), MOE_CFG, block=block,
        k_draft=kd)

    st1 = _prefill_cfg(moe_params, MOE_CFG, PROMPTS[:1], batch=4)
    toks1, _, _ = llama.decode_block_spec_pooled(
        moe_params, st1, jnp.asarray([True, False, False, False]),
        MOE_CFG, block=block, k_draft=kd)
    np.testing.assert_array_equal(np.asarray(toks1[0]),
                                  np.asarray(toks4[0]))


def test_llm_pool_spec_e2e_moe(moe_params):
    """LLMPool over the MoE checkpoint with the spec ladder on: streamed
    tokens equal the plain MoE pool's for concurrent requests."""
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

    plain = LLMPool(moe_params, MOE_CFG, capacity=4, block=4,
                    prefill_buckets=(16,))
    want = _run(collect(plain))

    spec = LLMPool(moe_params, MOE_CFG, capacity=4, block=4,
                   prefill_buckets=(16,), spec_k=3)
    assert spec.use_spec
    got = _run(collect(spec))
    assert got == want
