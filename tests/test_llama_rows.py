"""Per-row sampling params (models/llama.py::_sample_rows and the
``rows=`` plumbing): one compiled pooled program must serve any mix of
per-request (temperature, top_k, top_p) configs, with uniform-row
results identical to the static-scalar path and greedy rows exact.

Beyond-reference: the reference runs one generate() thread per request
with a process-wide GenerationConfig (inference/llm_streaming.py:44-106)
— per-request knobs would need one process per config.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmvox_tpu.models import llama
from llmvox_tpu.models.llama import (_filtered_logits,
                                     _filtered_logits_rows, _sample,
                                     _sample_rows)

CFG = llama.LlamaConfig(vocab_size=128, n_layer=2, n_head=4, n_kv_head=2,
                        n_embd=32, intermediate_size=64, max_seq_len=96)

CONFIGS = [(0.0, 0, 1.0), (0.8, 0, 1.0), (0.7, 5, 1.0), (1.1, 0, 0.9),
           (0.9, 8, 0.85)]


def _logits(b=6, v=64, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(
        (b, v)).astype(np.float32) * 3.0)


def test_filtered_rows_matches_static_per_config():
    lg = _logits()
    b = lg.shape[0]
    for (t, k, p) in CONFIGS:
        if t == 0.0:
            continue
        ref = np.asarray(_filtered_logits(lg, t, k, p))
        got = np.asarray(_filtered_logits_rows(
            lg, jnp.full((b,), t), jnp.full((b,), k, jnp.int32),
            jnp.full((b,), p)))
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_sample_rows_matches_static_with_same_rng():
    lg = _logits(seed=1)
    b = lg.shape[0]
    for (t, k, p) in CONFIGS:
        rng = jax.random.PRNGKey(7)
        ref = np.asarray(_sample(lg, rng, t, k, p))
        got = np.asarray(_sample_rows(
            lg, rng, jnp.full((b,), t), jnp.full((b,), k, jnp.int32),
            jnp.full((b,), p)))
        np.testing.assert_array_equal(got, ref)


def test_mixed_rows_filter_each_row_independently():
    """Row i filtered under config i == static filter of that row."""
    lg = _logits(seed=2, b=len(CONFIGS))
    t = jnp.asarray([c[0] for c in CONFIGS])
    k = jnp.asarray([c[1] for c in CONFIGS], jnp.int32)
    p = jnp.asarray([c[2] for c in CONFIGS])
    got = np.asarray(_filtered_logits_rows(lg, jnp.maximum(t, 1e-6), k, p))
    for i, (tc, kc, pc) in enumerate(CONFIGS):
        if tc == 0.0:
            # greedy rows: the clamped-t distribution is one-hot at argmax
            row = got[i]
            assert np.argmax(row) == int(np.argmax(np.asarray(lg[i])))
            continue
        ref = np.asarray(_filtered_logits(lg[i:i + 1], tc, kc, pc))[0]
        np.testing.assert_allclose(got[i], ref, rtol=1e-5, atol=1e-5)


def _pool_after_prefill(params, b):
    prompts = [[5, 9, 2], [7, 11, 13, 17], [3] * 6, [42, 43], [8] * 5,
               [21, 22]][:b]
    tpad = 8
    tokens = np.zeros((b, tpad), np.int32)
    valid = np.zeros((b,), np.int32)
    for i, pr in enumerate(prompts):
        tokens[i, : len(pr)] = pr
        valid[i] = len(pr)
    st = llama.init_llama_pool_state(CFG, batch=b)
    first, st = llama.prefill_slots(
        params, jnp.asarray(tokens), jnp.asarray(valid), st,
        jnp.arange(b, dtype=jnp.int32), jnp.ones((b,), bool),
        jax.random.PRNGKey(1), CFG)
    return first, st


def test_pooled_decode_rows_greedy_matches_static():
    """Uniform greedy rows == the static greedy pooled program."""
    params = llama.init_llama_params(jax.random.PRNGKey(0), CFG)
    b, block = 4, 8
    _, st = _pool_after_prefill(params, b)
    st2 = jax.tree.map(jnp.copy, st)
    active = jnp.ones((b,), bool)
    toks_ref, st_ref = llama.decode_block_pooled(
        params, st, active, jax.random.PRNGKey(2), CFG, block=block)
    rows = (jnp.zeros((b,)), jnp.zeros((b,), jnp.int32), jnp.ones((b,)))
    toks_r, st_r = llama.decode_block_pooled(
        params, st2, active, jax.random.PRNGKey(2), CFG, block=block,
        rows=rows)
    np.testing.assert_array_equal(np.asarray(toks_r), np.asarray(toks_ref))
    np.testing.assert_array_equal(np.asarray(st_r.pos),
                                  np.asarray(st_ref.pos))


def test_pooled_decode_mixed_rows_greedy_rows_exact():
    """In a mixed batch, greedy rows reproduce the all-greedy chain
    token for token; sampled rows are free to differ."""
    params = llama.init_llama_params(jax.random.PRNGKey(3), CFG)
    b, block = 4, 8
    _, st = _pool_after_prefill(params, b)
    st2 = jax.tree.map(jnp.copy, st)
    active = jnp.ones((b,), bool)
    toks_ref, _ = llama.decode_block_pooled(
        params, st, active, jax.random.PRNGKey(2), CFG, block=block)
    t = jnp.asarray([0.0, 0.9, 0.0, 1.2])
    rows = (t, jnp.asarray([0, 5, 0, 0], jnp.int32),
            jnp.asarray([1.0, 0.9, 1.0, 1.0]))
    toks_r, _ = llama.decode_block_pooled(
        params, st2, active, jax.random.PRNGKey(2), CFG, block=block,
        rows=rows)
    for i in (0, 2):
        np.testing.assert_array_equal(np.asarray(toks_r)[i],
                                      np.asarray(toks_ref)[i])


def test_prefill_slots_rows_greedy_matches_static():
    params = llama.init_llama_params(jax.random.PRNGKey(4), CFG)
    b = 4
    first_ref, _ = _pool_after_prefill(params, b)
    prompts = [[5, 9, 2], [7, 11, 13, 17], [3] * 6, [42, 43]]
    tokens = np.zeros((b, 8), np.int32)
    valid = np.zeros((b,), np.int32)
    for i, pr in enumerate(prompts):
        tokens[i, : len(pr)] = pr
        valid[i] = len(pr)
    st = llama.init_llama_pool_state(CFG, batch=b)
    rows = (jnp.zeros((b,)), jnp.zeros((b,), jnp.int32), jnp.ones((b,)))
    first_r, _ = llama.prefill_slots(
        params, jnp.asarray(tokens), jnp.asarray(valid), st,
        jnp.arange(b, dtype=jnp.int32), jnp.ones((b,), bool),
        jax.random.PRNGKey(1), CFG, rows=rows)
    np.testing.assert_array_equal(np.asarray(first_r),
                                  np.asarray(first_ref))


def test_spec_pooled_rows_greedy_rows_token_exact():
    """Mixed rows through the SPECULATIVE pooled path: greedy rows must
    equal the plain pooled greedy chain exactly (the argmax-acceptance
    override), for draft heads of any quality."""
    cfg = llama.LlamaConfig(vocab_size=128, n_layer=2, n_head=4,
                            n_kv_head=2, n_embd=32, intermediate_size=64,
                            max_seq_len=96, n_draft_heads=4)
    params = llama.init_llama_params(jax.random.PRNGKey(5), cfg)
    b, block = 4, 8
    prompts = [[5, 9, 2], [7, 11, 13, 17], [3] * 6, [42, 43]]
    tokens = np.zeros((b, 8), np.int32)
    valid = np.zeros((b,), np.int32)
    for i, pr in enumerate(prompts):
        tokens[i, : len(pr)] = pr
        valid[i] = len(pr)

    def fresh():
        st = llama.init_llama_pool_state(cfg, batch=b)
        _, st = llama.prefill_slots(
            params, jnp.asarray(tokens), jnp.asarray(valid), st,
            jnp.arange(b, dtype=jnp.int32), jnp.ones((b,), bool),
            jax.random.PRNGKey(1), cfg)
        return st

    active = jnp.ones((b,), bool)
    toks_ref, _ = llama.decode_block_pooled(
        params, fresh(), active, jax.random.PRNGKey(2), cfg, block=block)
    rows = (jnp.asarray([0.0, 0.8, 0.0, 1.1]),
            jnp.asarray([0, 0, 0, 6], jnp.int32),
            jnp.asarray([1.0, 0.9, 1.0, 1.0]))
    toks_r, st_r, iters = llama.decode_block_spec_pooled(
        params, fresh(), active, cfg, block=block, k_draft=3,
        rng=jax.random.PRNGKey(2), rows=rows)
    toks_r = np.asarray(toks_r)
    for i in (0, 2):
        np.testing.assert_array_equal(toks_r[i], np.asarray(toks_ref)[i])
    # every row advanced the full block
    np.testing.assert_array_equal(np.asarray(st_r.pos),
                                  np.asarray(fresh().pos) + block)
    assert int(np.asarray(iters).max()) <= block


def test_spec_pooled_rows_sampled_distribution_smoke():
    """Sampled rows under ``rows=`` draw from the same filtered target
    as the plain rows path: empirical first-token marginals over many
    rng draws stay close (TV distance) for a sharpened 8-way vocab."""
    cfg = llama.LlamaConfig(vocab_size=128, n_layer=2, n_head=2,
                            n_kv_head=1, n_embd=16, intermediate_size=32,
                            max_seq_len=64, n_draft_heads=2)
    params = llama.init_llama_params(jax.random.PRNGKey(8), cfg)
    b = 2
    tokens = np.zeros((b, 4), np.int32)
    tokens[:, :2] = [[5, 9], [7, 11]]
    valid = np.full((b,), 2, np.int32)
    rows = (jnp.full((b,), 0.9), jnp.zeros((b,), jnp.int32),
            jnp.ones((b,)))

    def first_tokens(seed, use_spec):
        st = llama.init_llama_pool_state(cfg, batch=b)
        _, st = llama.prefill_slots(
            params, jnp.asarray(tokens), jnp.asarray(valid), st,
            jnp.arange(b, dtype=jnp.int32), jnp.ones((b,), bool),
            jax.random.PRNGKey(1), cfg)
        if use_spec:
            toks, _, _ = llama.decode_block_spec_pooled(
                params, st, jnp.ones((b,), bool), cfg, block=2, k_draft=2,
                rng=jax.random.PRNGKey(seed), rows=rows)
        else:
            toks, _ = llama.decode_block_pooled(
                params, st, jnp.ones((b,), bool),
                jax.random.PRNGKey(seed), cfg, block=2, rows=rows)
        return np.asarray(toks)[:, 0]

    n = 192
    a = np.stack([first_tokens(s, True) for s in range(n)])
    c = np.stack([first_tokens(s, False) for s in range(n)])
    for row in range(b):
        va, ca = np.unique(a[:, row], return_counts=True)
        vc, cc = np.unique(c[:, row], return_counts=True)
        pa = {int(k): v / n for k, v in zip(va, ca)}
        pc = {int(k): v / n for k, v in zip(vc, cc)}
        keys = set(pa) | set(pc)
        tv = 0.5 * sum(abs(pa.get(k, 0) - pc.get(k, 0)) for k in keys)
        assert tv < 0.25, f"row {row}: TV {tv}"
