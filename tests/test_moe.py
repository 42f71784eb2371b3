"""Mixture-of-experts FFN (ops/moe.py) + MoE llama + expert parallelism.

The reference has no MoE (its LLM is dense, inference/llm_streaming.py:
30-45); this is the beyond-reference expert-parallel path.  Verification
strategy matches the house style: exact/near-exact parity against an
independent per-token, per-expert loop oracle, then sharded == unsharded
on the virtual 8-device mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmvox_tpu.models import llama
from llmvox_tpu.ops.moe import moe_capacity, moe_ffn
from llmvox_tpu.parallel.mesh import create_mesh
from llmvox_tpu.parallel.sharding import llama_param_shardings


def _softmax(v):
    v = v - v.max()
    e = np.exp(v)
    return e / e.sum()


def _silu(v):
    return v / (1.0 + np.exp(-v))


def _oracle_moe(x, rw, wg, wu, wd, top_k):
    """Per-token, per-expert numpy loop — no dispatch tensors at all."""
    n, c = x.shape
    out = np.zeros_like(x)
    logits = x @ rw
    for i in range(n):
        idx = np.argsort(-logits[i])[:top_k]
        w = _softmax(logits[i][idx])
        for wi, e in zip(w, idx):
            h = _silu(x[i] @ wg[e]) * (x[i] @ wu[e])
            out[i] += wi * (h @ wd[e])
    return out


def _moe_weights(rng, c=16, i=24, e=4):
    rw = rng.standard_normal((c, e)).astype(np.float32) * 0.5
    wg = rng.standard_normal((e, c, i)).astype(np.float32) * 0.2
    wu = rng.standard_normal((e, c, i)).astype(np.float32) * 0.2
    wd = rng.standard_normal((e, i, c)).astype(np.float32) * 0.2
    return rw, wg, wu, wd


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_ffn_matches_expert_loop(top_k):
    rng = np.random.default_rng(0)
    rw, wg, wu, wd = _moe_weights(rng)
    x = rng.standard_normal((3, 7, 16)).astype(np.float32)
    # capacity_factor large enough that nothing can drop => exact routing
    y, aux = jax.jit(moe_ffn, static_argnums=(5, 6))(
        jnp.asarray(x), jnp.asarray(rw), jnp.asarray(wg), jnp.asarray(wu),
        jnp.asarray(wd), top_k, 8.0)
    ref = _oracle_moe(x.reshape(-1, 16), rw, wg, wu, wd, top_k)
    np.testing.assert_allclose(np.asarray(y).reshape(-1, 16), ref,
                               atol=2e-5, rtol=2e-4)
    assert np.isfinite(float(aux)) and float(aux) > 0.5


@pytest.mark.parametrize("g", [3, 7, 21, 0])
def test_moe_grouped_drop_free_is_group_size_invariant(g):
    """With drop_free capacity the output is EXACTLY the ungrouped
    routing result for any group size (grouping only re-buckets the
    dispatch tensors; nothing can overflow) — the ADVICE r3 memory fix
    cannot change results on inference paths."""
    rng = np.random.default_rng(10)
    rw, wg, wu, wd = _moe_weights(rng)
    x = rng.standard_normal((21, 16)).astype(np.float32)
    y, _ = moe_ffn(jnp.asarray(x), jnp.asarray(rw), jnp.asarray(wg),
                   jnp.asarray(wu), jnp.asarray(wd), 2, 0.5,
                   group_size=g, drop_free=True)
    ref = _oracle_moe(x, rw, wg, wu, wd, 2)
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-5, rtol=2e-4)


def test_moe_grouped_capped_matches_single_group_when_no_drops():
    """Grouped dispatch with a roomy capacity factor == the single-group
    path (training semantics unchanged by the grouping rewrite)."""
    rng = np.random.default_rng(11)
    rw, wg, wu, wd = _moe_weights(rng)
    x = rng.standard_normal((4, 8, 16)).astype(np.float32)
    y0, a0 = moe_ffn(jnp.asarray(x), jnp.asarray(rw), jnp.asarray(wg),
                     jnp.asarray(wu), jnp.asarray(wd), 2, 8.0)
    y1, a1 = moe_ffn(jnp.asarray(x), jnp.asarray(rw), jnp.asarray(wg),
                     jnp.asarray(wu), jnp.asarray(wd), 2, 8.0,
                     group_size=8)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5,
                               rtol=2e-4)
    np.testing.assert_allclose(float(a0), float(a1), rtol=1e-5)


def test_moe_token_mask_keeps_padding_out_of_capacity():
    """ADVICE r3 (high): padding tokens must not consume expert capacity.
    All five tokens route to expert 0 with capacity 2; the first three are
    padding.  Unmasked, the pads win the capacity and the REAL tokens
    drop; with token_mask the real tokens take positions 0-1 and get
    their expert output, pads emit zero rows."""
    rng = np.random.default_rng(12)
    _, wg, wu, wd = _moe_weights(rng)
    rw = np.zeros((16, 4), np.float32)
    rw[:, 0] = 10.0
    x = np.abs(rng.standard_normal((5, 16))).astype(np.float32)
    mask = jnp.asarray([False, False, False, True, True])
    assert moe_capacity(5, 4, 1, 1.5) == 2

    y_unmasked, _ = moe_ffn(jnp.asarray(x), jnp.asarray(rw), jnp.asarray(wg),
                            jnp.asarray(wu), jnp.asarray(wd), 1, 1.5)
    np.testing.assert_allclose(np.asarray(y_unmasked)[3:], 0.0, atol=1e-7)

    y, aux = moe_ffn(jnp.asarray(x), jnp.asarray(rw), jnp.asarray(wg),
                     jnp.asarray(wu), jnp.asarray(wd), 1, 1.5,
                     token_mask=mask)
    ref = _oracle_moe(x[3:], rw, wg, wu, wd, 1)
    np.testing.assert_allclose(np.asarray(y)[3:], ref, atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(y)[:3], 0.0, atol=1e-7)
    # aux stats over real tokens only: everything on one of 4 experts
    # with top_k=1 -> E * f_0 * P_0 ~= 4
    assert 3.5 < float(aux) <= 4.01


def test_moe_capacity_drop_zeroes_overflow_tokens():
    """All tokens routed to expert 0 with capacity 1: the first token (in
    dispatch order) gets its expert output, the rest contribute zero —
    Switch-Transformer overflow semantics."""
    rng = np.random.default_rng(1)
    _, wg, wu, wd = _moe_weights(rng)
    rw = np.zeros((16, 4), np.float32)
    rw[:, 0] = 10.0
    x = np.abs(rng.standard_normal((1, 5, 16))).astype(np.float32)
    assert moe_capacity(5, 4, 1, 0.01) == 1
    y, _ = moe_ffn(jnp.asarray(x), jnp.asarray(rw), jnp.asarray(wg),
                   jnp.asarray(wu), jnp.asarray(wd), 1, 0.01)
    y = np.asarray(y)[0]
    ref0 = _oracle_moe(x[0, :1], rw, wg, wu, wd, 1)
    np.testing.assert_allclose(y[0], ref0[0], atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(y[1:], 0.0, atol=1e-7)


def _moe_cfg(**kw):
    base = dict(vocab_size=64, n_layer=2, n_head=4, n_kv_head=2,
                n_embd=32, intermediate_size=48, max_seq_len=64,
                n_experts=4, moe_top_k=2, moe_capacity_factor=8.0)
    base.update(kw)
    return llama.LlamaConfig(**base)


def test_moe_llama_forward_matches_layerwise_oracle():
    """apply_llama with experts == the same forward with the MoE FFN
    replaced by the numpy loop oracle (checked at the logits)."""
    cfg = _moe_cfg()
    params = llama.init_llama_params(jax.random.PRNGKey(0), cfg)
    ids = np.random.default_rng(2).integers(0, 64, (2, 9))
    got = np.asarray(llama.apply_llama(params, jnp.asarray(ids, jnp.int32),
                                       cfg))

    # independent recomputation: run each layer manually, numpy MoE
    p = jax.tree.map(np.asarray, params)
    x = p["tok_emb"][ids]
    b, t, c = x.shape
    for li in range(cfg.n_layer):
        lp = {k: v[li] for k, v in p["h"].items()}
        h = llama.rms_norm(jnp.asarray(x), jnp.asarray(lp["ln1_s"]),
                           cfg.rms_eps)
        q = (np.asarray(h) @ lp["wq"]).reshape(b, t, cfg.n_head, -1)
        k = (np.asarray(h) @ lp["wk"]).reshape(b, t, cfg.n_kv_head, -1)
        v = (np.asarray(h) @ lp["wv"]).reshape(b, t, cfg.n_kv_head, -1)
        q = np.asarray(llama.rope(jnp.asarray(q), jnp.arange(t)[None], cfg))
        k = np.asarray(llama.rope(jnp.asarray(k), jnp.arange(t)[None], cfg))
        kr = np.repeat(k, cfg.q_per_kv, axis=2)
        vr = np.repeat(v, cfg.q_per_kv, axis=2)
        att = np.zeros_like(q)
        scale = 1.0 / np.sqrt(q.shape[-1])
        for bi in range(b):
            for hi in range(cfg.n_head):
                s = q[bi, :, hi] @ kr[bi, :, hi].T * scale
                s = np.where(np.tril(np.ones((t, t), bool)), s, -np.inf)
                w = np.exp(s - s.max(-1, keepdims=True))
                w /= w.sum(-1, keepdims=True)
                att[bi, :, hi] = w @ vr[bi, :, hi]
        x = x + att.reshape(b, t, c) @ lp["wo"]
        h = np.asarray(llama.rms_norm(jnp.asarray(x),
                                      jnp.asarray(lp["ln2_s"]), cfg.rms_eps))
        moe = _oracle_moe(h.reshape(-1, c), lp["router"], lp["moe_wgate"],
                          lp["moe_wup"], lp["moe_wdown"], cfg.moe_top_k)
        x = x + moe.reshape(b, t, c)
    x = np.asarray(llama.rms_norm(jnp.asarray(x), jnp.asarray(p["lnf_s"]),
                                  cfg.rms_eps))
    ref = x @ p["head"]
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=5e-3)


def test_moe_greedy_decode_matches_full_context():
    """prefill + decode_block (greedy) == teacher-forced argmax chain
    through apply_llama — the cached MoE path agrees with the full
    forward (same pattern as test_llama.py's dense decode test)."""
    cfg = _moe_cfg()
    params = llama.init_llama_params(jax.random.PRNGKey(1), cfg)
    prompt = jnp.asarray(
        np.random.default_rng(3).integers(0, 64, (1, 5)), jnp.int32)

    state = llama.init_llama_decode_state(cfg, batch=1)
    logits, state = llama.prefill(params, prompt, state, cfg)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    toks, _ = llama.decode_block(params, first, state,
                                 jax.random.PRNGKey(0), cfg, block=6)
    got = np.concatenate([np.asarray(first)[:, None], np.asarray(toks)],
                         axis=1)[0]

    seq = list(np.asarray(prompt)[0])
    ref = []
    for _ in range(7):
        lg = llama.apply_llama(params, jnp.asarray([seq], jnp.int32), cfg)
        nxt = int(jnp.argmax(lg[0, -1]))
        ref.append(nxt)
        seq.append(nxt)
    assert got.tolist() == ref


def test_moe_pooled_decode_matches_b1():
    """decode_block_pooled with one active MoE row == the B=1
    decode_block chain (the pooled serving path works for experts)."""
    cfg = _moe_cfg()
    params = llama.init_llama_params(jax.random.PRNGKey(1), cfg)
    prompt = np.random.default_rng(4).integers(0, 64, (1, 5))

    state = llama.init_llama_decode_state(cfg, batch=1)
    logits, state = llama.prefill(params, jnp.asarray(prompt, jnp.int32),
                                  state, cfg)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    ref, _ = llama.decode_block(params, first, state, jax.random.PRNGKey(0),
                                cfg, block=6)

    pstate = llama.init_llama_pool_state(cfg, batch=3)
    pfirst, pstate = llama.prefill_slots(
        params, jnp.asarray(prompt, jnp.int32),
        jnp.asarray([5], jnp.int32), pstate, jnp.asarray([1], jnp.int32),
        jnp.asarray([True]), jax.random.PRNGKey(0), cfg)
    assert int(pfirst[0]) == int(first[0])
    toks, pstate = llama.decode_block_pooled(
        params, pstate, jnp.asarray([False, True, False]),
        jax.random.PRNGKey(0), cfg, block=6)
    assert np.asarray(toks)[1].tolist() == np.asarray(ref)[0].tolist()


def test_moe_pooled_decode_matches_b1_at_drop_prone_capacity():
    """ADVICE r3 (high) end to end: at Mixtral-like routing pressure
    (E=8, top_k=2, capacity_factor=2.0 — where capped capacity is n/2 and
    drops WOULD occur), a pooled row's tokens still equal its private B=1
    chain, whatever else shares the pool: inference paths are drop-free
    and padded/inactive rows are masked out of routing."""
    cfg = _moe_cfg(n_experts=8, moe_capacity_factor=2.0)
    params = llama.init_llama_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(9)
    prompts = [rng.integers(0, 64, (1, n)) for n in (5, 3, 7)]

    refs = []
    for prompt in prompts:
        state = llama.init_llama_decode_state(cfg, batch=1)
        logits, state = llama.prefill(
            params, jnp.asarray(prompt, jnp.int32), state, cfg)
        first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        toks, _ = llama.decode_block(params, first, state,
                                     jax.random.PRNGKey(0), cfg, block=6)
        refs.append([int(first[0])] + np.asarray(toks)[0].tolist())

    # all three prompts co-scheduled (mixed-length one-program prefill,
    # right-padded to 8), one pooled decode advances them together
    pstate = llama.init_llama_pool_state(cfg, batch=4)
    tokens = np.zeros((3, 8), np.int32)
    valid = np.zeros((3,), np.int32)
    for j, prompt in enumerate(prompts):
        tokens[j, : prompt.shape[1]] = prompt[0]
        valid[j] = prompt.shape[1]
    pfirst, pstate = llama.prefill_slots(
        params, jnp.asarray(tokens), jnp.asarray(valid), pstate,
        jnp.asarray([0, 1, 2], jnp.int32), jnp.asarray([True] * 3),
        jax.random.PRNGKey(0), cfg)
    toks, pstate = llama.decode_block_pooled(
        params, pstate, jnp.asarray([True, True, True, False]),
        jax.random.PRNGKey(0), cfg, block=6)
    for j in range(3):
        got = [int(pfirst[j])] + np.asarray(toks)[j].tolist()
        assert got == refs[j], f"row {j} diverged from its B=1 chain"


@pytest.mark.parametrize("ep,tp", [(4, 1), (4, 2)])
def test_moe_ep_sharded_matches_replicated(ep, tp):
    """Expert-parallel (and ep x tp) sharded forward == replicated — the
    GSPMD all-to-all dispatch is numerically the same program."""
    cfg = _moe_cfg()
    params = llama.init_llama_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(5).integers(0, 64, (2, 9)),
                      jnp.int32)
    ref = np.asarray(llama.apply_llama(params, ids, cfg))

    mesh = create_mesh(dp_size=8 // (ep * tp), ep_size=ep, tp_size=tp)
    sharded = jax.device_put(params, llama_param_shardings(mesh, params))
    got = np.asarray(jax.jit(llama.apply_llama,
                             static_argnums=(2,))(sharded, ids, cfg))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-4)


@pytest.fixture(scope="module")
def mixtral_pair():
    """Tiny random HF MixtralForCausalLM + its converted params — the MoE
    model family's checkpoint oracle (convert_llama_state_dict detects
    the block_sparse_moe layout)."""
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    from llmvox_tpu.tools.convert import convert_llama_state_dict

    cfg = _moe_cfg(vocab_size=128, max_seq_len=64)
    hf_cfg = MixtralConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.n_embd,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.n_layer, num_attention_heads=cfg.n_head,
        num_key_value_heads=cfg.n_kv_head,
        num_local_experts=cfg.n_experts,
        num_experts_per_tok=cfg.moe_top_k,
        max_position_embeddings=cfg.max_seq_len, rms_norm_eps=cfg.rms_eps,
        rope_theta=cfg.rope_theta, sliding_window=None,
        tie_word_embeddings=False, attn_implementation="eager")
    torch.manual_seed(0)
    hf = MixtralForCausalLM(hf_cfg).eval()
    params = jax.tree.map(
        jnp.asarray, convert_llama_state_dict(hf.state_dict(), cfg.n_layer))
    return hf, params, cfg


def test_mixtral_full_pass_matches_hf(mixtral_pair):
    """Converted Mixtral == HF forward.  HF routes by softmax over ALL
    experts then top-k + renormalize; ours softmaxes the top-k logits —
    algebraically the same distribution, so parity is float-exact-ish.
    HF also computes every routed token without capacity (our large
    capacity_factor guarantees no drops at these shapes)."""
    import torch
    hf, params, cfg = mixtral_pair
    ids = np.random.default_rng(7).integers(0, cfg.vocab_size, (2, 11))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    got = np.asarray(llama.apply_llama(params, jnp.asarray(ids, jnp.int32),
                                       cfg))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-3)


def test_mixtral_greedy_decode_matches_hf_generate(mixtral_pair):
    import torch
    hf, params, cfg = mixtral_pair
    prompt = np.random.default_rng(8).integers(0, cfg.vocab_size, (1, 6))
    with torch.no_grad():
        ref = hf.generate(torch.tensor(prompt), max_new_tokens=8,
                          do_sample=False).numpy()[0, 6:]
    state = llama.init_llama_decode_state(cfg, batch=1)
    logits, state = llama.prefill(params, jnp.asarray(prompt, jnp.int32),
                                  state, cfg)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    toks, _ = llama.decode_block(params, first, state, jax.random.PRNGKey(0),
                                 cfg, block=7)
    got = np.concatenate([np.asarray(first), np.asarray(toks)[0]])
    assert got.tolist() == ref.tolist()


def test_convert_ckpt_mixtral_roundtrips_into_the_server_factory(
        mixtral_pair, tmp_path):
    """convert_ckpt llama on a Mixtral HF dir emits the MoE config meta
    (n_experts/moe_top_k) and the npz feeds the serving factory — the MoE
    model family is servable end to end."""
    import dataclasses

    from llmvox_tpu.streams.jax_llm import JAXStreamModel, build_jax_stream
    from llmvox_tpu.tools import convert_ckpt
    from llmvox_tpu.utils.config import ServeConfig
    from tests.test_llama import _ToyTokenizer

    hf, params, cfg = mixtral_pair
    src = tmp_path / "hf"
    hf.save_pretrained(str(src))
    dst = tmp_path / "mixtral.npz"
    convert_ckpt.main(["llama", str(src), str(dst)])

    tok = _ToyTokenizer()
    scfg = dataclasses.replace(
        ServeConfig(), llm_backend="jax", llm_jax_params=str(dst),
        llm_block=4, llm_temperature=0.0, llm_max_tokens=10)
    model = build_jax_stream(scfg, tokenizer=tok)
    assert model.cfg.n_experts == cfg.n_experts
    assert model.cfg.moe_top_k == cfg.moe_top_k
    # ADVICE r3 (medium): converted checkpoints must serve drop-free —
    # the emitted capacity factor makes moe_capacity() == n at any shape
    assert model.cfg.moe_capacity_factor == pytest.approx(
        cfg.n_experts / cfg.moe_top_k)
    assert moe_capacity(640, cfg.n_experts, cfg.moe_top_k,
                        model.cfg.moe_capacity_factor) == 640
    got = "".join(model.predict({"system": "sys", "prompt": "hello"}))

    direct = JAXStreamModel(params, cfg, tok, block=4, temperature=0.0,
                            max_tokens=10, eos_text=scfg.eos_token)
    want = "".join(direct.predict({"system": "sys", "prompt": "hello"}))
    assert got == want and len(got) > 0


def test_mixtral_e8_parity_where_old_capacity_would_drop():
    """ADVICE r3 (medium): at E=8/top_k=2 the old serving default
    (cf=2.0) caps an expert at n/2 tokens, so imbalanced routing silently
    dropped tokens and diverged from HF.  With the converter's drop-free
    factor (E/k) the teacher-forced forward matches HF exactly even when
    a random router sends well over n/2 of the routes to one expert."""
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    from llmvox_tpu.tools.convert import convert_llama_state_dict

    cfg = _moe_cfg(vocab_size=128, n_experts=8,
                   moe_capacity_factor=8 / 2)
    hf_cfg = MixtralConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.n_embd,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.n_layer, num_attention_heads=cfg.n_head,
        num_key_value_heads=cfg.n_kv_head, num_local_experts=8,
        num_experts_per_tok=2, max_position_embeddings=cfg.max_seq_len,
        rms_norm_eps=cfg.rms_eps, rope_theta=cfg.rope_theta,
        sliding_window=None, tie_word_embeddings=False,
        attn_implementation="eager")
    torch.manual_seed(1)
    hf = MixtralForCausalLM(hf_cfg).eval()
    sd = hf.state_dict()
    # force heavy imbalance: bias every router strongly toward expert 0,
    # so > n/2 of the (token, slot) routes land there
    for li in range(cfg.n_layer):
        key = f"model.layers.{li}.block_sparse_moe.gate.weight"
        sd[key][0] += 3.0
    hf.load_state_dict(sd)
    params = jax.tree.map(jnp.asarray,
                          convert_llama_state_dict(sd, cfg.n_layer))
    ids = np.random.default_rng(13).integers(0, cfg.vocab_size, (2, 24))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    got = np.asarray(llama.apply_llama(params, jnp.asarray(ids, jnp.int32),
                                       cfg))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-3)
    # the old default WOULD have dropped here: capacity at cf=2.0 is n/2
    n = ids.size
    assert moe_capacity(n, 8, 2, 2.0) == n // 2


def test_moe_loss_grads_reach_router():
    """llama_loss with experts includes the aux term and its gradient
    reaches the router (balance pressure exists)."""
    cfg = _moe_cfg(moe_aux_weight=0.05)
    params = llama.init_llama_params(jax.random.PRNGKey(2), cfg)
    toks = jnp.asarray(np.random.default_rng(6).integers(0, 64, (2, 10)),
                       jnp.int32)
    loss, grads = jax.value_and_grad(llama.llama_loss)(params, toks, cfg)
    assert np.isfinite(float(loss))
    gr = np.asarray(grads["h"]["router"])
    assert np.isfinite(gr).all() and np.abs(gr).max() > 0
    # aux-less loss differs: the weight is live
    cfg0 = _moe_cfg(moe_aux_weight=0.0)
    loss0 = llama.llama_loss(params, toks, cfg0)
    assert abs(float(loss) - float(loss0)) > 1e-9


# ---- hand-written all-to-all expert parallelism (moe_ffn_a2a) ----------

def _a2a_setup(seed=0, e=8, c=16, i=32, n=64):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, c)).astype(np.float32))
    rw = jnp.asarray(rng.normal(size=(c, e)).astype(np.float32))
    wg = jnp.asarray((rng.normal(size=(e, c, i)) / np.sqrt(c))
                     .astype(np.float32))
    wu = jnp.asarray((rng.normal(size=(e, c, i)) / np.sqrt(c))
                     .astype(np.float32))
    wd = jnp.asarray((rng.normal(size=(e, i, c)) / np.sqrt(i))
                     .astype(np.float32))
    return x, rw, wg, wu, wd


@pytest.mark.parametrize("drop_free,cf,masked", [
    (True, 0.0, False),      # inference semantics (no drops possible)
    (False, 1.0, False),     # capped: drops exercise per-chip priority
    (False, 1.0, True),      # masked rows consume no capacity
])
def test_moe_a2a_matches_single_program(drop_free, cf, masked):
    """The hand-written shard_map all-to-all dispatch (ops/moe.py::
    moe_ffn_a2a — the fallback for when GSPMD's einsum partitioning
    disappoints) equals moe_ffn with groups aligned to the chip shards,
    forward AND aux, at drop-free and drop-prone capacities."""
    from llmvox_tpu.ops.moe import make_moe_a2a

    ep = 4
    x, rw, wg, wu, wd = _a2a_setup()
    n = x.shape[0]
    mask = None
    if masked:
        mask = jnp.asarray(
            np.random.default_rng(3).random(n) > 0.25)
    ref_y, ref_aux = moe_ffn(x, rw, wg, wu, wd, top_k=2,
                             capacity_factor=cf, token_mask=mask,
                             group_size=n // ep, drop_free=drop_free)

    mesh = create_mesh(dp_size=8 // ep, ep_size=ep)
    moe = make_moe_a2a(mesh, top_k=2, capacity_factor=cf,
                       drop_free=drop_free)
    got_y, got_aux = moe(x, rw, wg, wu, wd, token_mask=mask)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(ref_y),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(float(got_aux), float(ref_aux), rtol=1e-5)


def test_moe_a2a_grads_match_single_program():
    """all_to_all differentiates (its transpose is the inverse exchange):
    grads through the hand-written dispatch equal the single-program
    groups twin for every parameter, router included."""
    from llmvox_tpu.ops.moe import make_moe_a2a

    ep = 4
    x, rw, wg, wu, wd = _a2a_setup(seed=1)
    n = x.shape[0]
    mesh = create_mesh(dp_size=8 // ep, ep_size=ep)
    moe = make_moe_a2a(mesh, top_k=2, drop_free=True)

    def loss_ref(p):
        y, aux = moe_ffn(x, p["rw"], p["wg"], p["wu"], p["wd"], top_k=2,
                         group_size=n // ep, drop_free=True)
        return jnp.sum(y * y) + aux

    def loss_a2a(p):
        y, aux = moe(x, p["rw"], p["wg"], p["wu"], p["wd"])
        return jnp.sum(y * y) + aux

    p = {"rw": rw, "wg": wg, "wu": wu, "wd": wd}
    ref_l, ref_g = jax.value_and_grad(loss_ref)(p)
    got_l, got_g = jax.value_and_grad(loss_a2a)(p)
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
    for k in p:
        np.testing.assert_allclose(np.asarray(got_g[k]),
                                   np.asarray(ref_g[k]),
                                   rtol=5e-5, atol=5e-6, err_msg=k)


def test_moe_fsdp_expert_sharded_train_step():
    """ep-aware ZeRO-3 (parallel/sharding.py::llama_fsdp_shardings): MoE
    expert weights AND their Adam moments shard over ep plus a matrix dim
    over dp, and one adamw train step on the dp2 x ep4 mesh matches the
    replicated single-program twin — expert-sharded optimizer state for
    MoE training (the STATUS r3 follow-up)."""
    import optax

    from llmvox_tpu.parallel.mesh import DP_AXIS, EP_AXIS
    from llmvox_tpu.parallel.sharding import (llama_fsdp_shardings,
                                              opt_state_shardings)

    cfg = _moe_cfg()
    params = llama.init_llama_params(jax.random.PRNGKey(0), cfg)
    toks = jnp.asarray(np.random.default_rng(7).integers(0, 64, (8, 12)),
                       jnp.int32)
    tx = optax.adamw(1e-3)

    def step(p, s, batch):
        loss, grads = jax.value_and_grad(llama.llama_loss)(p, batch, cfg)
        upd, s = tx.update(grads, s, p)
        return optax.apply_updates(p, upd), s, loss

    # replicated twin
    ref_p, _, ref_loss = step(params, tx.init(params), toks)

    mesh = create_mesh(dp_size=2, ep_size=4)
    psh = llama_fsdp_shardings(mesh, params)
    sp = jax.device_put(params, psh)
    osh = opt_state_shardings(mesh, tx, params, psh)
    st = jax.jit(tx.init, out_shardings=osh)(sp)

    w = sp["h"]["moe_wgate"]                        # (L, E, C, I)
    assert EP_AXIS in tuple(w.sharding.spec)
    assert DP_AXIS in tuple(w.sharding.spec)
    shard = w.addressable_shards[0].data.shape
    assert shard[1] * 4 == w.shape[1] and shard[2] * 2 == w.shape[2]
    # Adam mu/nu carry the same expert sharding
    mus = [x for x in jax.tree.leaves(st)
           if hasattr(x, "shape") and x.shape == w.shape]
    assert mus and all(EP_AXIS in tuple(m.sharding.spec) for m in mus)

    from jax.sharding import NamedSharding, PartitionSpec as P
    stoks = jax.device_put(toks, NamedSharding(mesh, P(DP_AXIS, None)))
    got_p, _, got_loss = jax.jit(step)(sp, st, stoks)
    np.testing.assert_allclose(float(got_loss), float(ref_loss),
                               rtol=1e-5)
    for k in ("moe_wgate", "moe_wdown", "router", "wq"):
        np.testing.assert_allclose(np.asarray(got_p["h"][k]),
                                   np.asarray(ref_p["h"][k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_moe_spec_pooled_matches_greedy():
    """Speculative pooled decode routes the verify forward (T=k_draft+1)
    through the drop-free MoE `_mlp` — tokens must equal the plain MoE
    pooled path exactly, random (never-accepting) draft heads included.
    Closes the STATUS r3 'LLM-pool speculation x MoE' follow-up: the
    verify forward cannot drop (inference capacity = group size), so
    speculation is safe to serve on MoE checkpoints."""
    cfg = _moe_cfg(n_experts=8, moe_capacity_factor=2.0, n_draft_heads=3)
    params = llama.init_llama_params(jax.random.PRNGKey(3), cfg)
    prompts = [[5, 9, 2], [7, 11, 13, 17, 19], [3] * 9, [42]]
    tokens = np.zeros((4, 16), np.int32)
    valid = np.zeros((4,), np.int32)
    for i, p in enumerate(prompts):
        tokens[i, : len(p)] = p
        valid[i] = len(p)

    def prefill():
        st = llama.init_llama_pool_state(cfg, batch=4)
        _, st = llama.prefill_slots(
            params, jnp.asarray(tokens), jnp.asarray(valid), st,
            jnp.arange(4, dtype=jnp.int32), jnp.ones((4,), bool),
            jax.random.PRNGKey(1), cfg)
        return st

    active = jnp.asarray([True] * 4)
    st_g = prefill()
    want = []
    for i in range(2):
        toks, st_g = llama.decode_block_pooled(
            params, st_g, active, jax.random.PRNGKey(7 + i), cfg, block=8)
        want.append(np.asarray(toks))

    st = prefill()
    got = []
    for _ in range(2):
        toks, st, _iters = llama.decode_block_spec_pooled(
            params, st, active, cfg, block=8, k_draft=3)
        got.append(np.asarray(toks))
    np.testing.assert_array_equal(np.concatenate(got, 1),
                                  np.concatenate(want, 1))
    np.testing.assert_array_equal(np.asarray(st.pos), np.asarray(st_g.pos))
