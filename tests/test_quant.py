"""Int8 weight-only quantization (ops/quant.py): error bounds, model
parity, and pipeline integration.

Beyond-reference: the CUDA reference has no quantized serving path; this
is the TPU framework's HBM-bandwidth lever for the decode loops that
re-read the full weight set every step (streaming_server.py:323-354,
inference/llm_streaming.py:44-106)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmvox_tpu.models import decoder as dec
from llmvox_tpu.ops import nn
from llmvox_tpu.ops.quant import (Int8Linear, QuantizedTensor, dequantize,
                                  int8_matmul, quantize_decoder_params,
                                  quantize_llama_params,
                                  quantize_weight, quantized_bytes)
from llmvox_tpu.utils.config import DecoderConfig

SMALL = DecoderConfig(n_layer=2, n_head=2, n_embd=32, block_size=64,
                      vocab_size=16, bias=False,
                      text_embed_dim=12, speech_embed_dim=20,
                      text_vocab_size=20, pad_token_id=17, text_eos_id=18,
                      eoa_token_id=7)


def test_quantize_roundtrip_error_bound():
    """|w - dequant(quant(w))| <= s/2 elementwise, per output channel."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 48, 40)).astype(np.float32)
    w[:, :, 7] *= 50.0                      # one wild column: per-channel
    qt = quantize_weight(jnp.asarray(w))    # scales must isolate it
    assert qt.q.dtype == jnp.int8
    assert qt.q.shape == w.shape and qt.s.shape == (3, 1, 40)
    err = np.abs(np.asarray(dequantize(qt)) - w)
    bound = np.asarray(qt.s) / 2 + 1e-7
    assert np.all(err <= bound)
    # the wild column did not inflate its neighbours' error
    assert err[:, :, 8].max() <= np.abs(w[:, :, 8]).max() / 254 + 1e-7


def test_linear_accepts_quantized_weight():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((5, 24)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((24, 16)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((16,)).astype(np.float32))
    ref = nn.linear(x, w, b)
    out = nn.linear(x, quantize_weight(w), b)
    rel = (np.linalg.norm(np.asarray(out - ref))
           / np.linalg.norm(np.asarray(ref)))
    assert rel < 0.02


def test_quantize_decoder_tree_selectivity():
    params = dec.init_decoder_params(jax.random.PRNGKey(0), SMALL)
    qp = quantize_decoder_params(params)
    assert isinstance(qp["h"]["wqkv"], QuantizedTensor)
    assert isinstance(qp["head"], QuantizedTensor)
    # embeddings / norms stay dense
    assert not isinstance(qp["wpe"], QuantizedTensor)
    assert not isinstance(qp["h"]["ln1_s"], QuantizedTensor)
    # stored bytes shrink: int8 + scales vs f32
    assert quantized_bytes(qp) < 0.45 * quantized_bytes(params)


def test_decoder_forward_parity_under_int8():
    """Full-sequence logits with int8 weights stay close to f32."""
    params = dec.init_decoder_params(jax.random.PRNGKey(3), SMALL)
    qp = quantize_decoder_params(params)
    emb = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 12, SMALL.n_embd)).astype(np.float32))
    ref = np.asarray(dec.apply_decoder(params, emb, SMALL))
    out = np.asarray(dec.apply_decoder(qp, emb, SMALL))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.05
    # greedy argmax agreement stays high (random tiny model, 16-way)
    agree = np.mean(out.argmax(-1) == ref.argmax(-1))
    assert agree > 0.8


def test_decode_block_runs_quantized_and_matches_forward():
    """The scanned KV-cache decode accepts quantized params, and its
    tokens equal the quantized full-context greedy rollout (the same
    internal-consistency check test_decoder.py runs for dense)."""
    cfg = SMALL
    params = dec.init_decoder_params(jax.random.PRNGKey(5), cfg)
    qp = quantize_decoder_params(params)
    rng = np.random.default_rng(5)
    table = jnp.asarray(
        rng.standard_normal((cfg.text_vocab_size,
                             cfg.text_embed_dim)).astype(np.float32))
    codebook = jnp.asarray(
        rng.standard_normal((cfg.vocab_size,
                             cfg.speech_embed_dim)).astype(np.float32))
    text_ids = rng.integers(0, cfg.text_vocab_size, 10).astype(np.int32)
    block = 16
    window = np.full((block,), cfg.pad_token_id, np.int32)
    window[:10] = text_ids
    st = dec.init_decode_state(cfg, jnp.float32)
    toks, n, st = dec.decode_block(
        qp, table, codebook, st, jnp.asarray(window),
        jnp.asarray(10, jnp.int32), jnp.asarray(block, jnp.int32),
        cfg, block=block)
    toks = np.asarray(toks)
    assert int(n) >= 1

    # teacher-forced replay through the full forward with the SAME
    # quantized params must reproduce the stream
    emitted = [int(t) for t in toks if t >= 0]
    xs = []
    prev = 0
    for i in range(len(emitted)):
        tid = window[i] if i < 10 else cfg.pad_token_id
        temb = np.asarray(table[tid])
        sfeat = (np.zeros(cfg.speech_embed_dim, np.float32) if i == 0
                 else np.asarray(codebook[prev]))
        v = np.concatenate([temb, sfeat])
        xs.append(v / np.linalg.norm(v))
        prev = emitted[i]
    logits = dec.apply_decoder(qp, jnp.asarray(np.stack(xs)[None]), cfg)
    replay = list(np.asarray(jnp.argmax(logits[0], -1)))
    stop = next((k + 1 for k, t in enumerate(emitted)
                 if t == cfg.eoa_token_id), len(emitted))
    assert emitted[:stop] == replay[:stop]


def test_int8_matmul_parity():
    """w8a8: int8xint8 with dynamic per-token activation scales."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((7, 24)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((24, 16)).astype(np.float32))
    qt = quantize_weight(w, cls=Int8Linear)
    ref = np.asarray(x @ w)
    out = np.asarray(int8_matmul(x, qt))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.03
    # nn.linear dispatches on the container
    via_linear = np.asarray(nn.linear(x, qt))
    np.testing.assert_allclose(out, via_linear, rtol=1e-6, atol=1e-6)


def test_decoder_w8a8_forward_and_batched_decode():
    """w8a8 tree: layer weights Int8Linear, head weight-only; the full
    forward stays close and the batched pool decode program runs (the
    tree-aware per-layer slice in _decode_one_batch)."""
    cfg = SMALL
    params = dec.init_decoder_params(jax.random.PRNGKey(7), cfg)
    qp = quantize_decoder_params(params, mode="w8a8")
    assert isinstance(qp["h"]["wqkv"], Int8Linear)
    assert isinstance(qp["head"], QuantizedTensor)   # argmax fidelity
    emb = jnp.asarray(np.random.default_rng(8).standard_normal(
        (2, 12, cfg.n_embd)).astype(np.float32))
    ref = np.asarray(dec.apply_decoder(params, emb, cfg))
    out = np.asarray(dec.apply_decoder(qp, emb, cfg))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.08

    rng = np.random.default_rng(9)
    table = jnp.asarray(rng.standard_normal(
        (cfg.text_vocab_size, cfg.text_embed_dim)).astype(np.float32))
    codebook = jnp.asarray(rng.standard_normal(
        (cfg.vocab_size, cfg.speech_embed_dim)).astype(np.float32))
    b, block = 3, 8
    states = dec.init_decode_state_batch(cfg, b, jnp.float32)
    windows = np.full((b, block), cfg.pad_token_id, np.int32)
    toks, n, states = dec.decode_block_batch(
        qp, table, codebook, states, jnp.asarray(windows),
        jnp.zeros((b,), jnp.int32),
        jnp.full((b,), block, jnp.int32), cfg, block=block)
    assert np.asarray(toks).shape == (b, block)
    assert int(np.asarray(n).min()) >= 1


def test_llama_prefill_parity_under_int8():
    from llmvox_tpu.models import llama
    lcfg = llama.LlamaConfig(vocab_size=64, n_layer=2, n_head=4,
                             n_kv_head=2, n_embd=32, intermediate_size=96,
                             max_seq_len=64)
    params = llama.init_llama_params(jax.random.PRNGKey(0), lcfg)
    qp = quantize_llama_params(params)
    assert isinstance(qp["h"]["wq"], QuantizedTensor)
    assert not isinstance(qp["tok_emb"], QuantizedTensor)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, 64, (1, 12)), jnp.int32)
    ref = np.asarray(llama.apply_llama(params, ids, lcfg))
    out = np.asarray(llama.apply_llama(qp, ids, lcfg))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.05

    # the KV-cache block decode runs with a quantized tree and matches
    # the quantized full-context greedy continuation
    st = llama.init_llama_decode_state(lcfg, 1, jnp.float32)
    lg, st = llama.prefill_padded(params=qp, tokens=ids,
                                  valid_len=jnp.asarray(12, jnp.int32),
                                  state=st, cfg=lcfg)
    tok = jnp.argmax(lg, -1).astype(jnp.int32)
    toks, st = llama.decode_block(qp, tok, st, jax.random.PRNGKey(1),
                                  lcfg, block=4)
    seq = list(np.asarray(ids[0]))
    for _ in range(5):
        full = llama.apply_llama(qp, jnp.asarray([seq], jnp.int32), lcfg)
        seq.append(int(np.asarray(jnp.argmax(full[0, -1]))))
    got = [int(tok[0])] + [int(t) for t in np.asarray(toks[0])]
    assert got == seq[12:]


@pytest.mark.slow
def test_quantized_pool_streams():
    """DecodePool end-to-end with int8 decoder weights: the guarded
    dtype casts must leave q untouched and the batched program runs."""
    import asyncio

    from llmvox_tpu.serve.pool import DecodePool, PooledEngine
    from llmvox_tpu.serve.scheduler import StreamingScheduler
    from llmvox_tpu.streams.scripted import ScriptedStream
    from tests.tiny_stack import SERVE_CFG, make_engines

    eng = make_engines(0, SERVE_CFG, n=1)[0]
    qp = quantize_decoder_params(eng.params)
    pool = DecodePool(qp, np.asarray(eng.text_table), eng.codec,
                      capacity=2, dcfg=eng.dcfg, scfg=SERVE_CFG,
                      cache_dtype=jnp.float32, param_dtype=jnp.float32)
    assert isinstance(pool.params["h"]["wqkv"], QuantizedTensor)

    async def go():
        pe = [PooledEngine(pool, SERVE_CFG), PooledEngine(pool, SERVE_CFG)]
        try:
            sched = StreamingScheduler(pe, SERVE_CFG)
            stream = ScriptedStream(["Hello from int8."],
                                    eos_token=SERVE_CFG.eos_token)
            total = 0
            async for c in sched.run(stream.predict({})):
                total += len(c)
            return total
        finally:
            for e in pe:
                e.close()
            pool.stop()

    total = asyncio.run(asyncio.wait_for(go(), timeout=300))
    assert total > 0


def test_quantize4_roundtrip_error_bound_and_group_isolation():
    """w4: |w - dequant| <= s/2 per (group, column); a wild value only
    inflates its OWN group's scale, not the rest of the column."""
    from llmvox_tpu.ops.quant import Int4Tensor, quantize_weight4

    rng = np.random.default_rng(10)
    w = rng.standard_normal((2, 128, 24)).astype(np.float32)
    w[:, 3, 5] *= 60.0                       # wild entry in group 0
    qt = quantize_weight4(jnp.asarray(w), group=32)
    assert qt.q.dtype == jnp.int8                  # packed nibbles
    assert qt.q.shape == (2, 64, 24)               # Cin/2 bytes
    assert qt.shape == w.shape                     # logical shape
    assert qt.s.shape == (2, 4, 1, 24)
    deq = np.asarray(dequantize(qt))
    err = np.abs(deq - w).reshape(2, 4, 32, 24)
    bound = np.asarray(qt.s) / 2 + 1e-6
    assert np.all(err <= bound)
    # groups 1..3 of column 5 kept their own (small) scales
    assert np.asarray(qt.s)[0, 1:, 0, 5].max() < 1.0
    # non-divisible Cin falls back to one group
    qt1 = quantize_weight4(jnp.asarray(w[:, :100]), group=32)
    assert qt1.s.shape == (2, 1, 1, 24)
    assert isinstance(qt1, Int4Tensor)


def test_linear_accepts_int4_weight():
    from llmvox_tpu.ops.quant import quantize_weight4

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((16,)).astype(np.float32))
    ref = nn.linear(x, w, b)
    out = nn.linear(x, quantize_weight4(w, group=32), b)
    rel = (np.linalg.norm(np.asarray(out - ref))
           / np.linalg.norm(np.asarray(ref)))
    # 15 levels / group-32 scales put the inherent rms step error near
    # 10% on gaussian weights — real checkpoints (outlier-light after
    # group isolation) sit lower; this guards dispatch, not accuracy
    assert rel < 0.12


def test_decoder_w4_tree_and_forward_parity():
    """w4 tree: layer matmuls Int4Tensor, lm head stays w8 (argmax
    fidelity); stored bytes ~4x below f32; forward stays close and the
    scanned decode program runs."""
    from llmvox_tpu.ops.quant import Int4Tensor

    params = dec.init_decoder_params(jax.random.PRNGKey(13), SMALL)
    qp = quantize_decoder_params(params, mode="w4")
    assert isinstance(qp["h"]["wqkv"], Int4Tensor)
    assert isinstance(qp["head"], QuantizedTensor)   # w8 head
    assert not isinstance(qp["wpe"], (Int4Tensor, QuantizedTensor))
    assert quantized_bytes(qp) < 0.32 * quantized_bytes(params)

    emb = jnp.asarray(np.random.default_rng(14).standard_normal(
        (2, 12, SMALL.n_embd)).astype(np.float32))
    ref = np.asarray(dec.apply_decoder(params, emb, SMALL))
    out = np.asarray(dec.apply_decoder(qp, emb, SMALL))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.12

    rng = np.random.default_rng(15)
    table = jnp.asarray(rng.standard_normal(
        (SMALL.text_vocab_size, SMALL.text_embed_dim)).astype(np.float32))
    codebook = jnp.asarray(rng.standard_normal(
        (SMALL.vocab_size, SMALL.speech_embed_dim)).astype(np.float32))
    block = 8
    window = np.full((block,), SMALL.pad_token_id, np.int32)
    st = dec.init_decode_state(SMALL, jnp.float32)
    toks, n, st = dec.decode_block(
        qp, table, codebook, st, jnp.asarray(window),
        jnp.asarray(0, jnp.int32), jnp.asarray(block, jnp.int32),
        SMALL, block=block)
    assert int(n) >= 1 and np.asarray(toks).shape == (block,)


def test_llama_w4_decode_consistency():
    """w4 llama: KV-cache block decode matches the quantized
    full-context greedy continuation (same internal-consistency check
    the w8 test runs)."""
    from llmvox_tpu.models import llama
    from llmvox_tpu.ops.quant import Int4Tensor

    lcfg = llama.LlamaConfig(vocab_size=64, n_layer=2, n_head=4,
                             n_kv_head=2, n_embd=32, intermediate_size=96,
                             max_seq_len=64)
    params = llama.init_llama_params(jax.random.PRNGKey(20), lcfg)
    qp = quantize_llama_params(params, mode="w4")
    assert isinstance(qp["h"]["wq"], Int4Tensor)
    assert not isinstance(qp["tok_emb"], Int4Tensor)
    ids = jnp.asarray(np.random.default_rng(21).integers(
        0, 64, (1, 12)), jnp.int32)
    st = llama.init_llama_decode_state(lcfg, 1, jnp.float32)
    lg, st = llama.prefill_padded(params=qp, tokens=ids,
                                  valid_len=jnp.asarray(12, jnp.int32),
                                  state=st, cfg=lcfg)
    tok = jnp.argmax(lg, -1).astype(jnp.int32)
    toks, st = llama.decode_block(qp, tok, st, jax.random.PRNGKey(1),
                                  lcfg, block=4)
    seq = list(np.asarray(ids[0]))
    for _ in range(5):
        full = llama.apply_llama(qp, jnp.asarray([seq], jnp.int32), lcfg)
        seq.append(int(np.asarray(jnp.argmax(full[0, -1]))))
    got = [int(tok[0])] + [int(t) for t in np.asarray(toks[0])]
    assert got == seq[12:]


# ---------------------------------------------------------------------------
# MoE expert quantization (VERDICT r3 #5): the expert weights are exactly
# where an 8-expert model's parameter memory explodes, so they must ride
# the same w8/w8a8/w4 containers as the dense matmuls.  Router/norms stay
# full precision (rounding the router changes ROUTING, not just values).
# ---------------------------------------------------------------------------

def _moe_cfg(**kw):
    from llmvox_tpu.models import llama
    base = dict(vocab_size=64, n_layer=2, n_head=4, n_kv_head=2,
                n_embd=32, intermediate_size=48, max_seq_len=64,
                n_experts=4, moe_top_k=2, moe_capacity_factor=8.0)
    base.update(kw)
    return llama.LlamaConfig(**base)


def test_expert_matmul_parity_all_containers():
    """ops.moe.expert_matmul: the (E, R, Cin) @ (E, Cin, Cout) batched
    matmul matches the dense einsum under every quantized container,
    within each container's error envelope."""
    from llmvox_tpu.ops.moe import expert_matmul
    from llmvox_tpu.ops.quant import quantize_weight4

    rng = np.random.default_rng(30)
    x = jnp.asarray(rng.standard_normal((3, 5, 32)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 32, 24)).astype(np.float32))
    ref = np.asarray(jnp.einsum("erd,edc->erc", x, w))

    for qw, bound in ((quantize_weight(w), 0.02),
                      (quantize_weight(w, cls=Int8Linear), 0.03),
                      (quantize_weight4(w, group=16), 0.12)):
        out = np.asarray(expert_matmul(x, qw, None))
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < bound, (type(qw).__name__, rel)
    # per-expert scale isolation: expert 0's wild column must not
    # disturb expert 1's outputs at all
    w_wild = w.at[0, :, 3].mul(100.0)
    q = quantize_weight(w_wild)
    out = np.asarray(expert_matmul(x, q, None))
    ref_w = np.asarray(jnp.einsum("erd,edc->erc", x, w_wild))
    rel1 = (np.linalg.norm(out[1] - ref_w[1])
            / np.linalg.norm(ref_w[1]))
    assert rel1 < 0.02


@pytest.mark.parametrize("mode,bound", [("w8", 0.05), ("w8a8", 0.06),
                                        ("w4", 0.15)])
def test_llama_moe_quantized_tree_and_forward_parity(mode, bound):
    """quantize_llama_params reaches the expert weights; the router stays
    dense (identical routing); the full MoE forward stays inside the
    dense-quant error envelope."""
    from llmvox_tpu.models import llama
    from llmvox_tpu.ops.quant import Int4Tensor

    cfg = _moe_cfg()
    params = llama.init_llama_params(jax.random.PRNGKey(0), cfg)
    qp = quantize_llama_params(params, mode=mode)
    cls = {"w8": QuantizedTensor, "w8a8": Int8Linear,
           "w4": Int4Tensor}[mode]
    for k in ("moe_wgate", "moe_wup", "moe_wdown"):
        assert isinstance(qp["h"][k], cls), k
    assert not isinstance(qp["h"]["router"],
                          (QuantizedTensor, Int8Linear, Int4Tensor))
    if mode != "w4":
        # ~0.25 for the expert weights + the dense tok_emb/router/norm
        # leftovers, which loom large at these tiny test shapes
        assert quantized_bytes(qp) < 0.35 * quantized_bytes(params)

    ids = jnp.asarray(np.random.default_rng(2).integers(
        0, 64, (2, 9)), jnp.int32)
    ref = np.asarray(llama.apply_llama(params, ids, cfg))
    out = np.asarray(llama.apply_llama(qp, ids, cfg))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < bound, rel


def test_moe_pooled_decode_quantized_matches_b1():
    """Pooling exactness survives expert quantization: a pooled MoE row
    with w8 experts produces exactly the tokens of its private B=1
    quantized decode (the dense-quant invariant, at expert weights)."""
    from llmvox_tpu.models import llama

    cfg = _moe_cfg()
    params = llama.init_llama_params(jax.random.PRNGKey(1), cfg)
    qp = quantize_llama_params(params)
    prompt = np.random.default_rng(4).integers(0, 64, (1, 5))

    state = llama.init_llama_decode_state(cfg, batch=1)
    logits, state = llama.prefill(qp, jnp.asarray(prompt, jnp.int32),
                                  state, cfg)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    ref, _ = llama.decode_block(qp, first, state, jax.random.PRNGKey(0),
                                cfg, block=6)

    pstate = llama.init_llama_pool_state(cfg, batch=3)
    pfirst, pstate = llama.prefill_slots(
        qp, jnp.asarray(prompt, jnp.int32),
        jnp.asarray([5], jnp.int32), pstate, jnp.asarray([1], jnp.int32),
        jnp.asarray([True]), jax.random.PRNGKey(0), cfg)
    assert int(pfirst[0]) == int(first[0])
    toks, pstate = llama.decode_block_pooled(
        qp, pstate, jnp.asarray([False, True, False]),
        jax.random.PRNGKey(0), cfg, block=6)
    assert np.asarray(toks)[1].tolist() == np.asarray(ref)[0].tolist()
