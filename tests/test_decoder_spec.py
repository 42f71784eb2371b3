"""Speculative block decode (models/decoder.py::decode_block_spec).

The speech decoder's per-token loop is sequential because the input at
t+1 is the codebook embedding of token t (streaming_server.py:323-354).
Speculative decoding breaks that dependency with drafts + one parallel
verify forward.  The invariant under test: output is BIT-IDENTICAL to
greedy ``decode_block`` for ANY draft quality — a perfect (oracle) draft
only reduces the number of sequential iterations.
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
    window = jnp.asarray(rng.integers(0, 256, (32,)), jnp.int32)
    return params, table, codebook, window


def _greedy(params, table, codebook, window, limit, cfg=CFG, block=32):
    st = dec.init_decode_state(cfg, jnp.float32)
    toks, n, st = dec.decode_block(params, table, codebook, st, window,
                                   jnp.int32(20), jnp.int32(limit), cfg,
                                   block=block)
    return np.asarray(toks), int(n), st


def _spec(params, table, codebook, window, limit, drafts, cfg=CFG,
          block=32, k_draft=4):
    st = dec.init_decode_state(cfg, jnp.float32)
    toks, n, st, iters = dec.decode_block_spec(
        params, table, codebook, st, window, jnp.int32(20),
        jnp.int32(limit), cfg, block=block, k_draft=k_draft,
        draft_tokens=drafts)
    return np.asarray(toks), int(n), st, int(iters)


def test_oracle_draft_exact_and_fewer_iters(stack):
    params, table, codebook, window = stack
    want, n_want, st_want = _greedy(params, table, codebook, window, 32)
    drafts = jnp.asarray(np.maximum(want, 0), jnp.int32)
    got, n, st, iters = _spec(params, table, codebook, window, 32, drafts)
    np.testing.assert_array_equal(got, want)
    assert n == n_want
    assert int(st.pos) == int(st_want.pos)
    assert int(st.prev_token) == int(st_want.prev_token)
    # perfect drafts: every iteration commits 1 + k_draft tokens
    assert iters <= int(np.ceil(32 / 5)) + 1
    assert iters < n


def test_garbage_draft_still_exact(stack):
    params, table, codebook, window = stack
    want, n_want, _ = _greedy(params, table, codebook, window, 32)
    # adversarial drafts: constant wrong token -> every draft rejected,
    # but the fused forward's slot 0 (conditioned on the committed prev
    # token, not a draft) still commits 1 exact token per iteration
    drafts = jnp.zeros((32,), jnp.int32)
    got, n, _, iters = _spec(params, table, codebook, window, 32, drafts)
    if int(drafts[1]) == int(want[1]):  # freak collision: pick another
        drafts = jnp.ones((32,), jnp.int32)
        got, n, _, iters = _spec(params, table, codebook, window, 32,
                                 drafts)
    np.testing.assert_array_equal(got, want)
    assert n == n_want
    assert iters <= 32


def test_draft_heads_exact(stack):
    """Random (untrained) draft heads: correctness must not depend on
    draft quality."""
    params, table, codebook, window = stack
    cfg = dataclasses.replace(CFG, n_draft_heads=3)
    params_h = dec.init_decoder_params(jax.random.PRNGKey(1), cfg)
    want, n_want, _ = _greedy(params_h, table, codebook, window, 32,
                              cfg=cfg)
    st = dec.init_decode_state(cfg, jnp.float32)
    got, n, _, iters = dec.decode_block_spec(
        params_h, table, codebook, st, window, jnp.int32(20),
        jnp.int32(32), cfg, block=32, k_draft=3)
    np.testing.assert_array_equal(np.asarray(got), want)
    assert int(n) == n_want


def test_limit_pacing_matches(stack):
    params, table, codebook, window = stack
    for limit in (1, 2, 7, 31):
        want, n_want, st_want = _greedy(params, table, codebook, window,
                                        limit)
        drafts = jnp.asarray(np.maximum(want, 0), jnp.int32)
        got, n, st, _ = _spec(params, table, codebook, window, limit,
                              drafts)
        np.testing.assert_array_equal(got, want, err_msg=f"limit={limit}")
        assert n == n_want == limit
        assert int(st.pos) == int(st_want.pos)
        assert int(st.prev_token) == int(st_want.prev_token)


def test_eoa_mid_block_matches(stack):
    """Set eoa_token_id to a token greedy actually emits: both paths must
    stop there, emit -1 afterwards, and agree on done/pos."""
    params, table, codebook, window = stack
    base, _, _ = _greedy(params, table, codebook, window, 32)
    eoa = int(base[7])                  # force EOA at step 8
    cfg = dataclasses.replace(CFG, eoa_token_id=eoa)
    want, n_want, st_want = _greedy(params, table, codebook, window, 32,
                                    cfg=cfg)
    assert bool(st_want.done)
    drafts = jnp.asarray(np.maximum(base, 0), jnp.int32)
    got, n, st, _ = _spec(params, table, codebook, window, 32, drafts,
                          cfg=cfg)
    np.testing.assert_array_equal(got, want)
    assert n == n_want
    assert bool(st.done)
    assert int(st.pos) == int(st_want.pos)


def test_chained_spec_blocks_match_chained_greedy(stack):
    """State carried across spec calls continues the sequence exactly
    like chained decode_block calls (the streaming pattern)."""
    params, table, codebook, window = stack
    st_g = dec.init_decode_state(CFG, jnp.float32)
    st_s = dec.init_decode_state(CFG, jnp.float32)
    rng = np.random.default_rng(1)
    all_g, all_s = [], []
    for call in range(3):
        w = jnp.asarray(rng.integers(0, 256, (16,)), jnp.int32)
        tg, _, st_g = dec.decode_block(params, table, codebook, st_g, w,
                                       jnp.int32(40), jnp.int32(16), CFG,
                                       block=16)
        drafts = jnp.maximum(tg, 0)
        ts, _, st_s, _ = dec.decode_block_spec(
            params, table, codebook, st_s, w, jnp.int32(40),
            jnp.int32(16), CFG, block=16, k_draft=4, draft_tokens=drafts)
        all_g.append(np.asarray(tg))
        all_s.append(np.asarray(ts))
    np.testing.assert_array_equal(np.concatenate(all_s),
                                  np.concatenate(all_g))
    assert int(st_s.pos) == int(st_g.pos)


def test_engine_spec_decode_serves_identical_audio(stack):
    """ServeConfig.spec_decode through the full scheduler: an engine with
    draft heads in its checkpoint streams the SAME waveform as the plain
    decode path (the serving wiring of decode_block_spec)."""
    import asyncio

    from llmvox_tpu.codec.codec import WavCodec, init_codec_params
    from llmvox_tpu.serve.engine import TTSEngine
    from llmvox_tpu.serve.scheduler import StreamingScheduler
    from llmvox_tpu.streams.scripted import ScriptedStream
    from tests.tiny_stack import CODEC_CFG, DEC_CFG, SERVE_CFG

    dcfg = dataclasses.replace(DEC_CFG, n_draft_heads=2)
    params = dec.init_decoder_params(jax.random.PRNGKey(5), dcfg)
    rng = np.random.default_rng(6)
    table = rng.standard_normal(
        (dcfg.text_vocab_size, dcfg.text_embed_dim)).astype(np.float32)
    codec_params = init_codec_params(jax.random.PRNGKey(7), CODEC_CFG)

    def run(spec: bool):
        scfg = dataclasses.replace(SERVE_CFG, spec_decode=spec,
                                   spec_k_draft=2,
                                   fused_first_chunk=False,
                                   first_decode_block=0,
                                   decode_block_large=0)
        engines = []
        for _ in range(2):
            codec = WavCodec(codec_params, CODEC_CFG,
                             buckets=scfg.chunk_buckets)
            engines.append(TTSEngine(params, table, codec, dcfg, scfg,
                                     cache_dtype=jnp.float32))
        assert engines[0]._spec == spec
        sched = StreamingScheduler(engines, scfg)
        stream = ScriptedStream(["Spec decode test one.", "And two."],
                                eos_token=scfg.eos_token)

        async def go():
            out = []
            async for c in sched.run(stream.predict({})):
                out.append(c)
            return b"".join(out)

        return asyncio.run(asyncio.wait_for(go(), timeout=300))

    plain = run(False)
    spec = run(True)
    np.testing.assert_array_equal(np.frombuffer(spec, dtype="<f4"),
                                  np.frombuffer(plain, dtype="<f4"))


def test_mtp_loss_trains_draft_heads(stack):
    """decoder_loss with draft heads: finite, adds the aux term, and
    gradients flow into the heads (the trainer option's substance)."""
    cfg = dataclasses.replace(CFG, n_draft_heads=2)
    params = dec.init_decoder_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.standard_normal((2, 24, cfg.n_embd)),
                      jnp.float32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 24)),
                          jnp.int32)
    loss = dec.decoder_loss(params, emb, targets, cfg, train=False)
    base = {k: v for k, v in params.items() if k != "draft_heads"}
    loss_base = dec.decoder_loss(base, emb, targets, cfg, train=False)
    assert np.isfinite(float(loss)) and float(loss) > float(loss_base)

    grads = jax.grad(
        lambda p: dec.decoder_loss(p, emb, targets, cfg, train=False))(
            params)
    gh = np.asarray(grads["draft_heads"])
    assert np.abs(gh).max() > 0

    # mtp_weight=0 reduces to the base loss exactly
    loss0 = dec.decoder_loss(params, emb, targets, cfg, train=False,
                             mtp_weight=0.0)
    np.testing.assert_allclose(float(loss0), float(loss_base), rtol=1e-6)


def test_trainer_step_with_draft_heads(stack):
    """make_train_step compiles and runs with n_draft_heads > 0 (the
    trainer flag is usable end to end)."""
    from llmvox_tpu.train.optim import make_optimizer
    from llmvox_tpu.train.trainer import TrainState, make_train_step
    from llmvox_tpu.utils.config import TrainConfig

    cfg = dataclasses.replace(CFG, n_draft_heads=2)
    tcfg = TrainConfig(batch_size=2, gradient_accumulation_steps=1,
                       warmup_iters=1, lr_decay_iters=4)
    params = dec.init_decoder_params(jax.random.PRNGKey(3), cfg)
    tx = make_optimizer(tcfg, params)
    state = TrainState(params, jax.jit(tx.init)(params), jnp.int32(0))
    rng = np.random.default_rng(4)
    table = jnp.zeros((cfg.text_vocab_size, cfg.text_embed_dim))
    codebook = jnp.zeros((max(cfg.vocab_size, cfg.eoa_token_id + 1),
                          cfg.speech_embed_dim))
    text_ids = jnp.asarray(rng.integers(0, 256, (2, 32)), jnp.int32)
    targets = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32)),
                          jnp.int32)
    step = jax.jit(make_train_step(cfg, tx, jnp.float32))
    losses = []
    for i in range(3):
        state, loss = step(state, table, codebook, text_ids, targets,
                           jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_chunked_attention_non_multiple_cache(stack):
    """Cache capacities that are NOT multiples of the 512 attention chunk
    stay bit-exact past the chunk boundary: both decode_attention and the
    spec verifier halve the chunk until it divides S (a clamped
    dynamic_slice would silently mis-align the causal mask otherwise)."""
    params, table, codebook, window = stack
    cfg = dataclasses.replace(CFG, block_size=640)  # 640 % 512 != 0
    stg = dec.init_decode_state(cfg, jnp.float32)
    sts = dec.init_decode_state(cfg, jnp.float32)
    g_all, s_all = [], []
    for _ in range(9):  # 9 * 64 = 576 > 512: crosses the chunk boundary
        tg, _, stg = dec.decode_block(params, table, codebook, stg,
                                      window, jnp.int32(20), jnp.int32(64),
                                      cfg, block=64)
        ts, _, sts, _ = dec.decode_block_spec(
            params, table, codebook, sts, window, jnp.int32(20),
            jnp.int32(64), cfg, block=64, k_draft=4,
            draft_tokens=jnp.zeros((64,), jnp.int32))
        g_all.append(np.asarray(tg))
        s_all.append(np.asarray(ts))
    g, s = np.concatenate(g_all), np.concatenate(s_all)
    np.testing.assert_array_equal(g, s)
    assert int(stg.pos) == int(sts.pos) == 576
