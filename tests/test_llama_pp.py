"""Pipeline-parallel Llama (models/llama_pp.py) on the virtual 8-device
mesh: layer-sharded stages + microbatch ppermute pipelining must be
invisible in the output — greedy tokens identical to the single-chip
pooled path, caches equal, state registers replicated.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmvox_tpu.models import llama, llama_pp
from llmvox_tpu.parallel.mesh import create_mesh

CFG = llama.LlamaConfig(vocab_size=128, n_layer=4, n_head=4, n_kv_head=2,
                        n_embd=32, intermediate_size=64, max_seq_len=96)


@pytest.fixture(scope="module")
def params():
    return llama.init_llama_params(jax.random.PRNGKey(0), CFG)


def _mesh(pp):
    import numpy as _np
    from jax.sharding import Mesh
    devs = jax.devices()[:pp]
    return Mesh(_np.asarray(devs).reshape(pp), (llama_pp.PP_AXIS,))


PROMPTS = [[5, 9, 2], [7, 11, 13, 17, 19], [3] * 9, [42, 43], [8] * 6,
           [21, 22, 23], [60], [2, 4, 6, 8]]


def _ref_prefill_and_decode(params, prompts, block):
    """Single-chip reference: prefill_slots + decode_block_pooled."""
    b = len(prompts)
    tpad = 16
    tokens = np.zeros((b, tpad), np.int32)
    valid = np.zeros((b,), np.int32)
    for i, p in enumerate(prompts):
        tokens[i, : len(p)] = p
        valid[i] = len(p)
    st = llama.init_llama_pool_state(CFG, batch=b)
    first, st = llama.prefill_slots(
        params, jnp.asarray(tokens), jnp.asarray(valid), st,
        jnp.arange(b, dtype=jnp.int32), jnp.ones((b,), bool),
        jax.random.PRNGKey(1), CFG)
    toks, st = llama.decode_block_pooled(
        params, st, jnp.ones((b,), bool), jax.random.PRNGKey(2), CFG,
        block=block)
    return np.asarray(first), np.asarray(toks), st, (tokens, valid)


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (2, 4), (4, 4), (4, 8)])
def test_pp_decode_matches_pooled(params, pp, n_micro):
    block = 4
    first_w, toks_w, st_w, (tokens, valid) = _ref_prefill_and_decode(
        params, PROMPTS, block)

    mesh = _mesh(pp)
    pparams = jax.device_put(
        params, llama_pp.llama_pp_param_shardings(mesh, params))
    st = llama.init_llama_pool_state(CFG, batch=len(PROMPTS))
    # prefill on the single-chip path, then place the state on the mesh
    first, st = llama.prefill_slots(
        params, jnp.asarray(tokens), jnp.asarray(valid), st,
        jnp.arange(len(PROMPTS), dtype=jnp.int32),
        jnp.ones((len(PROMPTS),), bool), jax.random.PRNGKey(1), CFG)
    np.testing.assert_array_equal(np.asarray(first), first_w)
    st = jax.device_put(st, llama_pp.llama_pp_state_shardings(mesh))

    decode = llama_pp.make_pp_decode(mesh, CFG, block=block,
                                     n_micro=n_micro)
    toks, st = decode(pparams, st, jnp.ones((len(PROMPTS),), bool),
                      jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(toks), toks_w)
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st_w.pos))
    np.testing.assert_array_equal(np.asarray(st.tok), np.asarray(st_w.tok))
    # a second chained block still matches (caches were written right)
    toks2_w, _ = llama.decode_block_pooled(
        params, st_w, jnp.ones((len(PROMPTS),), bool),
        jax.random.PRNGKey(3), CFG, block=block)
    toks2, _ = decode(pparams, st, jnp.ones((len(PROMPTS),), bool),
                      jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(toks2), np.asarray(toks2_w))


def test_pp_prefill_matches_prefill_slots(params):
    pp, block = 4, 4
    mesh = _mesh(pp)
    b = len(PROMPTS)
    tpad = 16
    tokens = np.zeros((b, tpad), np.int32)
    valid = np.zeros((b,), np.int32)
    for i, p in enumerate(PROMPTS):
        tokens[i, : len(p)] = p
        valid[i] = len(p)

    first_w, toks_w, st_w, _ = _ref_prefill_and_decode(params, PROMPTS,
                                                       block)

    pparams = jax.device_put(
        params, llama_pp.llama_pp_param_shardings(mesh, params))
    st = jax.device_put(llama.init_llama_pool_state(CFG, batch=b),
                        llama_pp.llama_pp_state_shardings(mesh))
    prefill = llama_pp.make_pp_prefill(mesh, CFG, n_micro=4)
    first, st = prefill(pparams, jnp.asarray(tokens), jnp.asarray(valid),
                        st, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(first), first_w)
    np.testing.assert_array_equal(np.asarray(st.pos), valid)

    # full pp chain: pp prefill -> pp decode == single-chip chain
    decode = llama_pp.make_pp_decode(mesh, CFG, block=block, n_micro=4)
    toks, st = decode(pparams, st, jnp.ones((b,), bool),
                      jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(toks), toks_w)


def test_pp_decode_freezes_inactive_rows(params):
    pp, block = 2, 4
    mesh = _mesh(pp)
    b = len(PROMPTS)
    tpad = 16
    tokens = np.zeros((b, tpad), np.int32)
    valid = np.zeros((b,), np.int32)
    for i, p in enumerate(PROMPTS):
        tokens[i, : len(p)] = p
        valid[i] = len(p)
    st = llama.init_llama_pool_state(CFG, batch=b)
    _, st = llama.prefill_slots(
        params, jnp.asarray(tokens), jnp.asarray(valid), st,
        jnp.arange(b, dtype=jnp.int32), jnp.ones((b,), bool),
        jax.random.PRNGKey(1), CFG)
    # the reference call donates its state; device_put's replicated
    # "copy" still shares the device-0 shard buffer with st, so the
    # donated side must be a genuinely fresh copy
    st_ref = jax.tree.map(jnp.copy, st)
    active = np.zeros((b,), bool)
    active[::2] = True
    toks_w, st_w = llama.decode_block_pooled(
        params, st_ref, jnp.asarray(active), jax.random.PRNGKey(2), CFG,
        block=block)
    pparams = jax.device_put(
        params, llama_pp.llama_pp_param_shardings(mesh, params))
    stp = jax.device_put(st, llama_pp.llama_pp_state_shardings(mesh))
    decode = llama_pp.make_pp_decode(mesh, CFG, block=block, n_micro=4)
    toks, stp = decode(pparams, stp, jnp.asarray(active),
                       jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(toks)[active],
                                  np.asarray(toks_w)[active])
    np.testing.assert_array_equal(np.asarray(stp.pos), np.asarray(st_w.pos))
    np.testing.assert_array_equal(np.asarray(stp.tok), np.asarray(st_w.tok))


def test_pp_requires_enough_microbatches():
    mesh = _mesh(4)
    with pytest.raises(AssertionError):
        llama_pp.make_pp_decode(mesh, CFG, n_micro=2)
