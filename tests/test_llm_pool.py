"""Continuous-batching LLM pool (serve/llm_pool.py + the pooled ops in
models/llama.py).

The reference serves its LLM one torch generate() thread per request
(inference/llm_streaming.py:44-106); the pooled path batches every
in-flight request into ONE decode program with per-row positions.  These
tests prove the batched math is bit-equivalent to the B=1 serving path:
mixed-length one-program prefill == per-row prefill, pooled block decode
== per-row block decode, and the asyncio pool end-to-end reproduces the
B=1 greedy token stream under concurrency.
"""
import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llmvox_tpu.models import llama

CFG = llama.LlamaConfig(vocab_size=128, n_layer=2, n_head=4, n_kv_head=2,
                        n_embd=32, intermediate_size=64, max_seq_len=96)


@pytest.fixture(scope="module")
def params():
    return llama.init_llama_params(jax.random.PRNGKey(0), CFG)


def _b1_greedy(params, ids, n_tokens):
    """Reference sequence via the B=1 serving path (prefill_padded +
    decode_block): the first sampled token plus n_tokens-1 more."""
    bucket = 16
    while bucket < len(ids):
        bucket *= 2
    bucket = min(bucket, CFG.max_seq_len - 1)   # like JAXStreamModel's cap
    assert len(ids) <= bucket
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


PROMPTS = [[5, 9, 2], [7, 11, 13, 17, 19, 23, 29], [3] * 12, [42]]


def test_prefill_slots_mixed_lengths_one_program(params):
    """Mixed-length prompts prefill in ONE program (the per-row
    generalization of prefill_padded) and land in their slots: each
    slot's subsequent pooled greedy decode matches the B=1 path."""
    tpad = 16
    n = len(PROMPTS)
    tokens = np.zeros((n, tpad), np.int32)
    valid = np.zeros((n,), np.int32)
    for i, p in enumerate(PROMPTS):
        tokens[i, : len(p)] = p
        valid[i] = len(p)
    state = llama.init_llama_pool_state(CFG, batch=6)
    slots = np.asarray([5, 0, 2, 4], np.int32)   # scattered, out of order
    first, state = llama.prefill_slots(
        params, jnp.asarray(tokens), jnp.asarray(valid), state,
        jnp.asarray(slots), jnp.ones((n,), bool), jax.random.PRNGKey(1),
        CFG)
    first = np.asarray(first)
    assert np.asarray(state.pos)[slots].tolist() == valid.tolist()
    np.testing.assert_array_equal(np.asarray(state.tok)[slots], first)

    active = np.zeros((6,), bool)
    active[slots] = True
    toks, state = llama.decode_block_pooled(
        params, state, jnp.asarray(active), jax.random.PRNGKey(2), CFG,
        block=8)
    toks = np.asarray(toks)
    for i, p in enumerate(PROMPTS):
        want = _b1_greedy(params, p, 9)
        got = [int(first[i])] + toks[slots[i]].tolist()
        assert got == want, f"prompt {i}: {got} != {want}"


def test_prefill_slots_inactive_rows_are_dropped(params):
    """Padding rows of an arrival batch (active=False) must not disturb
    live slots — their scatter is redirected out of bounds."""
    state = llama.init_llama_pool_state(CFG, batch=3)
    ids = PROMPTS[0]
    tokens = np.zeros((2, 8), np.int32)
    tokens[0, : len(ids)] = ids
    valid = np.asarray([len(ids), 1], np.int32)
    _, state = llama.prefill_slots(
        params, jnp.asarray(tokens), jnp.asarray(valid), state,
        jnp.asarray([1, 1], np.int32),          # padding row AIMS at slot 1
        jnp.asarray([True, False]), jax.random.PRNGKey(3), CFG)
    # the padding row (garbage prompt, same slot id) must have lost
    state2 = llama.init_llama_pool_state(CFG, batch=3)
    _, state2 = llama.prefill_slots(
        params, jnp.asarray(tokens[:1]), jnp.asarray(valid[:1]), state2,
        jnp.asarray([1], np.int32), jnp.asarray([True]),
        jax.random.PRNGKey(3), CFG)
    np.testing.assert_array_equal(np.asarray(state.pos),
                                  np.asarray(state2.pos))
    np.testing.assert_allclose(np.asarray(state.k[:, 1, : len(ids)]),
                               np.asarray(state2.k[:, 1, : len(ids)]))


def test_decode_block_pooled_freezes_inactive_rows(params):
    """Inactive rows must not advance pos or change tok while active rows
    decode; reactivating them later continues their sequence exactly."""
    state = llama.init_llama_pool_state(CFG, batch=2)
    for i, p in enumerate(PROMPTS[:2]):
        tokens = np.zeros((1, 16), np.int32)
        tokens[0, : len(p)] = p
        _, state = llama.prefill_slots(
            params, jnp.asarray(tokens), jnp.asarray([len(p)], np.int32),
            state, jnp.asarray([i], np.int32), jnp.asarray([True]),
            jax.random.PRNGKey(4), CFG)
    # advance ONLY row 0 for a block, then both rows
    toks_a, state = llama.decode_block_pooled(
        params, state, jnp.asarray([True, False]), jax.random.PRNGKey(5),
        CFG, block=4)
    pos = np.asarray(state.pos)
    assert pos[1] == len(PROMPTS[1])             # frozen
    toks_b, state = llama.decode_block_pooled(
        params, state, jnp.asarray([True, True]), jax.random.PRNGKey(6),
        CFG, block=4)
    got0 = ([int(np.asarray(state.tok)[0])] if False else
            np.asarray(toks_a)[0].tolist() + np.asarray(toks_b)[0].tolist())
    want0 = _b1_greedy(params, PROMPTS[0], 9)[1:]
    assert got0 == want0
    # row 1, staggered by a block, still matches its own B=1 sequence
    want1 = _b1_greedy(params, PROMPTS[1], 5)[1:]
    assert np.asarray(toks_b)[1].tolist() == want1


def _run_pool(coro):
    return asyncio.run(asyncio.wait_for(coro, timeout=600))


def test_pool_generate_concurrent_matches_b1(params):
    """N concurrent generate() streams through one LLMPool reproduce the
    B=1 greedy sequences token for token — the round-3 flagship claim."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    pool = LLMPool(params, CFG, capacity=4, block=4,
                   prefill_buckets=(8, 16, 32))

    async def one(ids):
        out = []
        async for toks in pool.generate(ids, max_tokens=13):
            out.extend(toks)
        return out

    async def go():
        res = await asyncio.gather(*[one(p) for p in PROMPTS])
        pool.stop()
        return res

    results = _run_pool(go())
    for p, got in zip(PROMPTS, results):
        want = _b1_greedy(params, p, 13)
        assert got[: len(want)] == want, f"{p}: {got} != {want}"
        assert len(got) >= 13


def test_pool_staggered_arrivals_and_slot_reuse(params):
    """A request arriving mid-flight joins the running batch; a finished
    slot is reused by a later request with no state leakage."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    pool = LLMPool(params, CFG, capacity=2, block=4,
                   prefill_buckets=(8, 16))

    async def one(ids, n, delay=0.0):
        if delay:
            await asyncio.sleep(delay)
        out = []
        async for toks in pool.generate(ids, max_tokens=n):
            out.extend(toks)
            if len(out) >= n:
                break
        return out

    async def go():
        # 3 requests, capacity 2: the third waits for a free slot and
        # reuses it (staggered with the second's remaining blocks)
        r = await asyncio.gather(one(PROMPTS[0], 5),
                                 one(PROMPTS[1], 13, delay=0.01),
                                 one(PROMPTS[2], 9, delay=0.02))
        pool.stop()
        return r

    r0, r1, r2 = _run_pool(go())
    assert r0[:5] == _b1_greedy(params, PROMPTS[0], 5)
    assert r1[:13] == _b1_greedy(params, PROMPTS[1], 13)
    assert r2[:9] == _b1_greedy(params, PROMPTS[2], 9)


def test_pool_warmup_does_not_disturb_generation(params):
    """warmup() compiles every traffic program with active=False scatters;
    generation afterwards is unchanged."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    pool = LLMPool(params, CFG, capacity=2, block=4, prefill_buckets=(8,))
    pool.warmup()
    assert pool.prefill_calls == 0               # warmup isn't traffic

    async def go():
        out = []
        async for toks in pool.generate(PROMPTS[0], max_tokens=9):
            out.extend(toks)
        pool.stop()
        return out

    got = _run_pool(go())
    assert got[:9] == _b1_greedy(params, PROMPTS[0], 9)


def test_cancelled_stream_releases_slot(params):
    """A consumer that abandons its stream mid-generation (client
    disconnect) must release the slot so later requests don't starve."""
    from llmvox_tpu.serve.llm_pool import LLMPool
    from llmvox_tpu.streams.jax_llm import PooledJAXStreamModel
    from tests.test_llama import _ToyTokenizer

    pool = LLMPool(params, CFG, capacity=1, block=4,
                   prefill_buckets=(8, 16, 32))
    model = PooledJAXStreamModel(pool, _ToyTokenizer(), max_tokens=64)

    async def go():
        gen = model.predict({"system": "s", "prompt": "hello"})
        got_one = False
        async for _ in gen:
            got_one = True
            break                      # abandon mid-stream
        await gen.aclose()             # what the server's teardown does
        assert got_one
        # capacity is 1: a second request only works if the slot freed
        out = []
        async for d in model.predict({"system": "s", "prompt": "again"}):
            out.append(d)
        pool.stop()
        return out

    out = _run_pool(go())
    assert len("".join(out)) > 0


def test_pooled_ops_under_tp_sharding_match(params):
    """prefill_slots + decode_block_pooled with Megatron-TP-sharded
    params reproduce the unsharded pooled results exactly (GSPMD inserts
    the collectives through the vmapped cache writes and scatters)."""
    from llmvox_tpu.parallel import create_mesh
    from llmvox_tpu.parallel.sharding import llama_param_shardings

    mesh = create_mesh(dp_size=1, tp_size=2)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, s), params,
        llama_param_shardings(mesh, params))

    def run(p):
        state = llama.init_llama_pool_state(CFG, batch=3)
        tokens = np.zeros((2, 16), np.int32)
        valid = np.zeros((2,), np.int32)
        for i, pr in enumerate(PROMPTS[:2]):
            tokens[i, : len(pr)] = pr
            valid[i] = len(pr)
        first, state = llama.prefill_slots(
            p, jnp.asarray(tokens), jnp.asarray(valid), state,
            jnp.asarray([0, 2], np.int32), jnp.ones((2,), bool),
            jax.random.PRNGKey(0), CFG)
        toks, state = llama.decode_block_pooled(
            p, state, jnp.asarray([True, False, True]),
            jax.random.PRNGKey(1), CFG, block=6)
        return np.asarray(first), np.asarray(toks)

    f_ref, t_ref = run(params)
    f_tp, t_tp = run(sharded)
    np.testing.assert_array_equal(f_tp, f_ref)
    np.testing.assert_array_equal(t_tp[[0, 2]], t_ref[[0, 2]])


def test_pool_step_loop_crash_fails_waiters(params, monkeypatch):
    """A step-loop crash must fail every waiting future — including the
    in-flight ones popped at dispatch — so requests error instead of
    hanging forever."""
    from llmvox_tpu.serve import llm_pool as lp

    pool = lp.LLMPool(params, CFG, capacity=2, block=4,
                      prefill_buckets=(8,))

    def boom(*a, **k):
        raise RuntimeError("injected device failure")

    monkeypatch.setattr(lp.llama, "prefill_slots", boom)

    async def go():
        with pytest.raises(RuntimeError, match="injected"):
            async for _ in pool.generate(PROMPTS[0], max_tokens=9):
                pass
        pool.stop()

    _run_pool(go())


def test_pool_mixed_dtype_params_and_cache(params):
    """bf16 params with the default f32 cache must not break the layer
    scan's carry dtype (the einsum against the f32 cache promotes unless
    the residual is cast back — regression from the r3 bench)."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    pool = LLMPool(bf16, CFG, capacity=2, block=4, prefill_buckets=(8,))
    pool.warmup()

    async def go():
        out = []
        async for toks in pool.generate(PROMPTS[0], max_tokens=9):
            out.extend(toks)
        pool.stop()
        return out

    got = _run_pool(go())
    assert len(got) >= 9 and all(0 <= t < CFG.vocab_size for t in got)


def test_pooled_stream_model_text_deltas(params):
    """PooledJAXStreamModel: async predict() yields the same text as the
    B=1 JAXStreamModel for the same request (greedy)."""
    from llmvox_tpu.serve.llm_pool import LLMPool
    from llmvox_tpu.streams.jax_llm import (JAXStreamModel,
                                            PooledJAXStreamModel)
    from tests.test_llama import _ToyTokenizer

    tok = _ToyTokenizer()
    b1 = JAXStreamModel(params, CFG, tok, block=4, temperature=0.0,
                        max_tokens=12)
    want = "".join(b1.predict({"system": "s", "prompt": "hello"}))

    pool = LLMPool(params, CFG, capacity=2, block=4,
                   prefill_buckets=(8, 16, 32))
    model = PooledJAXStreamModel(pool, tok, max_tokens=12)
    model.load()

    async def drain(req):
        out = []
        async for d in model.predict(req):
            out.append(d)
        return out

    async def go():
        a, b = await asyncio.gather(
            drain({"system": "s", "prompt": "hello"}),
            drain({"system": "s", "prompt": "hello"}))
        pool.stop()
        return a, b

    got_a, got_b = _run_pool(go())
    assert "".join(got_a) == want
    assert "".join(got_b) == want
    assert got_a[-1] == tok.eos_token


def test_http_server_with_pooled_llm_and_pooled_tts(params):
    """Full pooled full-TPU stack over real HTTP: concurrent /tts
    requests share ONE batched LLM decode program AND one batched speech
    decode program (llm_backend=jax + llm_pool_capacity, the round-3
    serving configuration)."""
    import dataclasses
    import socket
    import threading
    import time
    from concurrent.futures import ThreadPoolExecutor

    import jax.numpy as jnp

    from llmvox_tpu.serve.client import collect_audio, stream_request
    from llmvox_tpu.serve.pool import DecodePool
    from llmvox_tpu.serve.server import TTSServer
    from llmvox_tpu.serve.llm_pool import LLMPool
    from llmvox_tpu.streams.jax_llm import PooledJAXStreamModel
    from tests.test_llama import _ToyTokenizer
    from tests.tiny_stack import SERVE_CFG, make_engines

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    cfg = dataclasses.replace(SERVE_CFG, api_host="127.0.0.1",
                              api_port=port, pool_capacity=4)
    eng = make_engines(0, cfg, n=1)[0]
    tok = _ToyTokenizer()
    tok.eos_token = cfg.eos_token
    llm_pool = LLMPool(params, CFG, capacity=2, block=4,
                       prefill_buckets=(16, 32))
    stream_model = PooledJAXStreamModel(llm_pool, tok, max_tokens=10)

    loop = asyncio.new_event_loop()
    holder = {}

    def run():
        asyncio.set_event_loop(loop)
        tts_pool = DecodePool(eng.params, np.asarray(eng.text_table),
                              eng.codec, capacity=4, dcfg=eng.dcfg,
                              scfg=cfg, cache_dtype=jnp.float32,
                              param_dtype=jnp.float32)
        srv = TTSServer(None, cfg, stream_model=stream_model,
                        pool=tts_pool)
        holder["srv"] = srv
        loop.run_until_complete(srv.serve())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(100):
        try:
            with socket.create_connection(("127.0.0.1", port),
                                          timeout=0.2):
                break
        except OSError:
            time.sleep(0.1)
    try:
        def one(i):
            wav, _ = collect_audio(stream_request(
                "127.0.0.1", port, "/tts",
                {"text": f"question number {i}"}, timeout=400))
            return wav

        with ThreadPoolExecutor(max_workers=2) as ex:
            wavs = list(ex.map(one, range(2)))
        for wav in wavs:
            assert len(wav) > 0 and np.isfinite(wav).all()
    finally:
        holder["srv"].shutdown()
        t.join(timeout=10)
        loop.close()


def test_pooled_stream_model_through_scheduler(params):
    """Full-TPU voice-chat path, pooled: two concurrent requests drive
    the pooled LLM AND the TTS scheduler; audio out for both."""
    from llmvox_tpu.serve.llm_pool import LLMPool
    from llmvox_tpu.serve.scheduler import StreamingScheduler
    from llmvox_tpu.streams.jax_llm import PooledJAXStreamModel
    from tests.test_llama import _ToyTokenizer
    from tests.tiny_stack import SERVE_CFG, make_engines

    tok = _ToyTokenizer()
    tok.eos_token = SERVE_CFG.eos_token
    pool = LLMPool(params, CFG, capacity=2, block=4,
                   prefill_buckets=(8, 16, 32))
    model = PooledJAXStreamModel(pool, tok, max_tokens=10)

    async def one(seed):
        engines = make_engines(seed, SERVE_CFG)
        sched = StreamingScheduler(engines, SERVE_CFG)
        chunks = []
        async for c in sched.run(model.predict(
                {"system": "s", "prompt": f"hi {seed}"})):
            chunks.append(c)
        return b"".join(chunks)

    async def go():
        a, b = await asyncio.gather(one(0), one(1))
        pool.stop()
        return a, b

    wav_a, wav_b = _run_pool(go())
    for blob in (wav_a, wav_b):
        wav = np.frombuffer(blob, dtype="<f4")
        assert len(wav) > 0 and np.isfinite(wav).all()


def test_llm_pool_restart_after_stop_serves_new_loop(params):
    """stop() must clear the pipelined in-flight record: a restart on a
    NEW event loop would otherwise try to resolve futures bound to the
    dead loop (llm_pool.py::stop)."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    pool = LLMPool(params, CFG, capacity=2, block=4, prefill_buckets=(8,))

    async def first():
        gen = pool.generate(PROMPTS[0], max_tokens=64)
        await gen.__anext__()              # prefill resolved
        for _ in range(500):               # wait for an in-flight record
            if pool._inflight:
                break
            await asyncio.sleep(0)
        pool.stop()
        await gen.aclose()

    asyncio.run(asyncio.wait_for(first(), timeout=600))
    assert pool._inflight is None          # the invariant under test

    async def second():
        out = []
        async for toks in pool.generate(PROMPTS[1], max_tokens=9):
            out.extend(toks)
        pool.stop()
        return out

    got = asyncio.run(asyncio.wait_for(second(), timeout=600))
    assert got[:9] == _b1_greedy(params, PROMPTS[1], 9)


def test_attn_window_bucket_matches_full_cache(params):
    """The pooled decode's bucketed attention window (attn_len) must be
    invisible in the output: rows never attend past their pos, so a
    bucket covering every active row's pos+block bound is exact."""
    CFG2 = llama.LlamaConfig(vocab_size=128, n_layer=2, n_head=4,
                             n_kv_head=2, n_embd=32, intermediate_size=64,
                             max_seq_len=512)
    params2 = llama.init_llama_params(jax.random.PRNGKey(0), CFG2)

    state_a = llama.init_llama_pool_state(CFG2, batch=2)
    state_b = llama.init_llama_pool_state(CFG2, batch=2)
    ids = PROMPTS[1]
    tokens = np.zeros((1, 16), np.int32)
    tokens[0, : len(ids)] = ids
    for which in range(2):
        st = state_a if which == 0 else state_b
        _, st = llama.prefill_slots(
            params2, jnp.asarray(tokens), jnp.asarray([len(ids)], np.int32),
            st, jnp.asarray([0], np.int32), jnp.asarray([True]),
            jax.random.PRNGKey(4), CFG2)
        if which == 0:
            state_a = st
        else:
            state_b = st
    active = jnp.asarray([True, False])
    toks_full, state_a = llama.decode_block_pooled(
        params2, state_a, active, jax.random.PRNGKey(5), CFG2, block=8)
    toks_win, state_b = llama.decode_block_pooled(
        params2, state_b, active, jax.random.PRNGKey(5), CFG2, block=8,
        attn_len=128)
    np.testing.assert_array_equal(np.asarray(toks_full)[0],
                                  np.asarray(toks_win)[0])
    # a second windowed block chained on the windowed state still matches
    toks_full2, _ = llama.decode_block_pooled(
        params2, state_a, active, jax.random.PRNGKey(6), CFG2, block=8)
    toks_win2, _ = llama.decode_block_pooled(
        params2, state_b, active, jax.random.PRNGKey(6), CFG2, block=8,
        attn_len=128)
    np.testing.assert_array_equal(np.asarray(toks_full2)[0],
                                  np.asarray(toks_win2)[0])


def test_llm_pool_picks_attn_bucket(params):
    """LLMPool tracks per-slot position upper bounds and the ladder:
    short conversations must decode at the smallest sufficient bucket."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    CFG2 = llama.LlamaConfig(vocab_size=128, n_layer=2, n_head=4,
                             n_kv_head=2, n_embd=32, intermediate_size=64,
                             max_seq_len=512)
    params2 = llama.init_llama_params(jax.random.PRNGKey(0), CFG2)
    pool = LLMPool(params2, CFG2, capacity=2, block=8,
                   prefill_buckets=(16, 32))
    assert pool.attn_buckets == (128, 256, 512)
    assert pool._attn_bucket(20) == 128
    assert pool._attn_bucket(129) == 256
    assert pool._attn_bucket(513) == 512

    async def go():
        out = []
        async for toks in pool.generate(PROMPTS[0], max_tokens=9):
            out.extend(toks)
        pool.stop()
        return out

    got = _run_pool(go())
    # greedy path must be unchanged by the window (ub stays < 128 here)
    assert len(got) >= 9
    assert max(pool._ub) <= 128


def _burst(pool, prompts, block_after=True):
    """Drive a simultaneous arrival burst: all prefills queued before the
    step loop's first dispatch, then one decode block per slot."""
    async def go():
        pool.start()
        slots = [await pool.acquire() for _ in prompts]
        futs = [pool.submit_prefill(s, list(p))
                for s, p in zip(slots, prompts)]
        firsts = await asyncio.gather(*futs)
        blocks = [[] for _ in prompts]
        if block_after:
            bfuts = [pool.submit_block(s) for s in slots]
            blocks = await asyncio.gather(*bfuts)
        for s in slots:
            pool.release(s)
        pool.stop()
        return list(firsts), [list(b) for b in blocks]
    return _run_pool(go())


def test_prefill_merge_burst_fewer_programs_same_tokens(params):
    """A mixed-length burst merged across buckets must cost fewer prefill
    programs (ceil(N/PREFILL_BATCH) instead of one per bucket group) and
    stream exactly the same greedy tokens as the unmerged per-bucket
    path and the B=1 reference."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    prompts = [PROMPTS[0], PROMPTS[1], PROMPTS[2], [8] * 20]
    buckets = (8, 16, 32)

    merged = LLMPool(params, CFG, capacity=4, block=4,
                     prefill_buckets=buckets, prefill_merge=True)
    f_m, b_m = _burst(merged, prompts)
    assert merged.prefill_calls == 1       # one program for the burst

    plain = LLMPool(params, CFG, capacity=4, block=4,
                    prefill_buckets=buckets, prefill_merge=False)
    f_p, b_p = _burst(plain, prompts)
    # lengths 3, 7 -> bucket 8; 12 -> 16; 20 -> 32: three bucket groups
    assert plain.prefill_calls == 3

    assert f_m == f_p and b_m == b_p
    for p, first, blk in zip(prompts, f_m, b_m):
        assert [first] + blk == _b1_greedy(params, p, 5)


def test_prefill_merge_chunks_stay_bucket_tight(params):
    """Sorting by length means same-size peers share a chunk: a burst of
    2xPREFILL_BATCH prompts in two length classes must run as one chunk
    per class (the short chunk at the SMALL bucket), not pay the big
    bucket for everything."""
    from llmvox_tpu.serve import llm_pool as lp

    pool = lp.LLMPool(params, CFG, capacity=8, block=4,
                      prefill_buckets=(8, 32), prefill_merge=True)
    short = [[3 + i] * 4 for i in range(4)]
    long = [[5 + i] * 25 for i in range(4)]
    seen_buckets = []
    orig = lp.llama.prefill_slots

    def spy(p, tokens, *a, **k):
        seen_buckets.append(tokens.shape)
        return orig(p, tokens, *a, **k)

    lp.llama.prefill_slots = spy
    try:
        # interleave so sorting, not arrival order, forms the chunks
        _burst(pool, [short[0], long[0], short[1], long[1], short[2],
                      long[2], short[3], long[3]], block_after=False)
    finally:
        lp.llama.prefill_slots = orig
    assert pool.prefill_calls == 2
    assert sorted(s[1] for s in seen_buckets) == [8, 32]
    assert all(s[0] == lp.LLMPool.PREFILL_BATCH for s in seen_buckets)


# ---------------------------------------------------------------------------
# shared-prefix KV cache (LLMPool.set_prefix / models.llama.prefix_kv)
# ---------------------------------------------------------------------------

PREFIX = [9, 4, 7, 1, 8, 3, 6, 2, 11, 5, 13, 10]    # 12-token "system" part


def test_prefix_prefill_matches_full_prefill(params):
    """prefix_kv + suffix prefill_slots == plain prefill_slots on the
    concatenated prompt: same first token, pos, caches, and the slot's
    greedy continuation."""
    sfx = [21, 22, 23, 24, 25]
    full = PREFIX + sfx

    def plain():
        st = llama.init_llama_pool_state(CFG, batch=2)
        tokens = np.zeros((1, 32), np.int32)
        tokens[0, : len(full)] = full
        return llama.prefill_slots(
            params, jnp.asarray(tokens), jnp.asarray([len(full)], np.int32),
            st, jnp.asarray([1], np.int32), jnp.ones((1,), bool),
            jax.random.PRNGKey(1), CFG)

    first_w, st_w = plain()

    pk, pv = llama.prefix_kv(params, jnp.asarray([PREFIX], jnp.int32), CFG)
    st = llama.init_llama_pool_state(CFG, batch=2)
    tokens = np.zeros((1, 8), np.int32)
    tokens[0, : len(sfx)] = sfx
    first, st = llama.prefill_slots(
        params, jnp.asarray(tokens), jnp.asarray([len(sfx)], np.int32),
        st, jnp.asarray([1], np.int32), jnp.ones((1,), bool),
        jax.random.PRNGKey(1), CFG, prefix_k=pk, prefix_v=pv)

    assert int(np.asarray(first)[0]) == int(np.asarray(first_w)[0])
    assert int(np.asarray(st.pos)[1]) == len(full)
    n = len(full)
    np.testing.assert_allclose(np.asarray(st.k[:, 1, :n]),
                               np.asarray(st_w.k[:, 1, :n]),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(st.v[:, 1, :n]),
                               np.asarray(st_w.v[:, 1, :n]),
                               atol=2e-5, rtol=2e-5)

    active = jnp.asarray([False, True])
    toks_w, _ = llama.decode_block_pooled(
        params, st_w, active, jax.random.PRNGKey(2), CFG, block=8)
    toks, _ = llama.decode_block_pooled(
        params, st, active, jax.random.PRNGKey(2), CFG, block=8)
    np.testing.assert_array_equal(np.asarray(toks)[1], np.asarray(toks_w)[1])


def test_pool_prefix_cache_matches_plain_pool(params):
    """Pool with set_prefix streams the same greedy tokens as the plain
    pool, for concurrent matching AND non-matching prompts."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    prompts = [PREFIX + [30 + i] for i in range(3)] + [[55, 56]]

    async def collect(pool):
        async def one(ids):
            out = []
            async for toks in pool.generate(ids, max_tokens=9):
                out.extend(toks)
            return out

        try:
            return await asyncio.gather(*(one(p) for p in prompts))
        finally:
            pool.stop()

    plain = LLMPool(params, CFG, capacity=4, block=4, prefill_buckets=(32,))
    want = _run_pool(collect(plain))

    pooled = LLMPool(params, CFG, capacity=4, block=4, prefill_buckets=(32,))
    pooled.set_prefix(PREFIX)
    assert pooled._prefix_ids == PREFIX
    got = _run_pool(collect(pooled))
    assert got == want

    # the non-matching prompt took the plain path, the matchers didn't
    plans = [pooled._plan(list(p))[0] for p in prompts]
    assert plans == [True, True, True, False]


def test_pool_prefix_edge_cases(params):
    """Prompt == prefix exactly, too-short prefixes, and prefixes that
    leave no room all fall back to the plain path."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    pool = LLMPool(params, CFG, capacity=2, block=4, prefill_buckets=(32,))
    pool.set_prefix(PREFIX)
    use, ids, cached = pool._plan(list(PREFIX))       # no suffix -> plain
    assert not use and ids == PREFIX and cached == len(PREFIX)

    pool.set_prefix([1, 2, 3])                        # below min_len
    assert pool._prefix_ids is None
    assert not pool._plan([1, 2, 3, 4])[0]

    pool.set_prefix(list(range(1, 90)))               # no bucket fits after
    assert pool._prefix_ids is None

    # warmup with a prefix compiles and doesn't disturb generation
    pool.set_prefix(PREFIX)
    pool.warmup()

    async def go():
        out = []
        async for toks in pool.generate(PREFIX + [33], max_tokens=9):
            out.extend(toks)
        pool.stop()
        return out

    got = _run_pool(go())
    assert got[:9] == _b1_greedy(params, PREFIX + [33], 9)


def test_pooled_stream_model_prefix_autodetect(params):
    """PooledJAXStreamModel.enable_prefix_cache finds the shared prompt
    prefix from the tokenizer itself and pins it in the pool; streamed
    text is unchanged."""
    from llmvox_tpu.serve.llm_pool import LLMPool
    from llmvox_tpu.streams.jax_llm import (ByteTokenizer,
                                            PooledJAXStreamModel,
                                            build_prompt_ids)

    # vocab must cover bytes; reuse CFG shapes with a byte vocab
    bcfg = llama.LlamaConfig(vocab_size=384, n_layer=2, n_head=4,
                             n_kv_head=2, n_embd=32, intermediate_size=64,
                             max_seq_len=256)
    bparams = llama.init_llama_params(jax.random.PRNGKey(0), bcfg)
    tok = ByteTokenizer()
    system = "You are a concise voice assistant."

    async def run_model(use_prefix):
        pool = LLMPool(bparams, bcfg, capacity=2, block=8,
                       prefill_buckets=(64,))
        model = PooledJAXStreamModel(pool, tok, max_tokens=24,
                                     eos_text="")
        if use_prefix:
            model.enable_prefix_cache(system)
            want = tok.encode(system + "\n\n")
            assert pool._prefix_ids == want
        out = []
        async for delta in model.predict({"system": system,
                                          "prompt": "hello there"}):
            out.append(delta)
        pool.stop()
        return "".join(out)

    want = _run_pool(run_model(False))
    got = _run_pool(run_model(True))
    assert got == want


# ---------------------------------------------------------------------------
# chunked prefill for long prompts (models.llama.prefill_slots_continue)
# ---------------------------------------------------------------------------


def test_chunked_prefill_device_op_matches_single_program(params):
    """chunk0 via prefill_slots + N continuation chunks must equal ONE
    prefill_slots over the whole prompt: same pos, caches, first token,
    and greedy continuation."""
    full = [(i * 7 + 3) % 100 for i in range(40)]     # 40 > bucket 32

    st_w = llama.init_llama_pool_state(CFG, batch=2)
    tokens = np.zeros((1, 64), np.int32)
    tokens[0, : len(full)] = full
    first_w, st_w = llama.prefill_slots(
        params, jnp.asarray(tokens), jnp.asarray([len(full)], np.int32),
        st_w, jnp.asarray([1], np.int32), jnp.ones((1,), bool),
        jax.random.PRNGKey(1), CFG)

    st = llama.init_llama_pool_state(CFG, batch=2)
    t0 = np.zeros((1, 8), np.int32)
    t0[0, :] = full[:8]                               # ragged chunk first
    _, st = llama.prefill_slots(
        params, jnp.asarray(t0), jnp.asarray([8], np.int32), st,
        jnp.asarray([1], np.int32), jnp.ones((1,), bool),
        jax.random.PRNGKey(9), CFG)
    first, st = llama.prefill_slots_continue(
        params, jnp.asarray([full[8:]], jnp.int32),
        jnp.asarray([32], jnp.int32), st, jnp.asarray([1], jnp.int32),
        jnp.ones((1,), bool), jnp.asarray([8], jnp.int32),
        jax.random.PRNGKey(1), CFG, final=True, attn_len=96)

    assert int(np.asarray(first)[0]) == int(np.asarray(first_w)[0])
    assert int(np.asarray(st.pos)[1]) == len(full)
    n = len(full)
    np.testing.assert_allclose(np.asarray(st.k[:, 1, :n]),
                               np.asarray(st_w.k[:, 1, :n]),
                               atol=2e-5, rtol=2e-5)
    active = jnp.asarray([False, True])
    toks_w, _ = llama.decode_block_pooled(
        params, st_w, active, jax.random.PRNGKey(2), CFG, block=8)
    toks, _ = llama.decode_block_pooled(
        params, st, active, jax.random.PRNGKey(2), CFG, block=8)
    np.testing.assert_array_equal(np.asarray(toks)[1], np.asarray(toks_w)[1])


def test_chunked_continue_inactive_rows_dropped(params):
    """A continuation chunk with active=False must leave the pool state
    untouched (the warmup path)."""
    st = llama.init_llama_pool_state(CFG, batch=2)
    tokens = np.zeros((1, 8), np.int32)
    tokens[0, :3] = PROMPTS[0]
    _, st = llama.prefill_slots(
        params, jnp.asarray(tokens), jnp.asarray([3], np.int32), st,
        jnp.asarray([0], np.int32), jnp.ones((1,), bool),
        jax.random.PRNGKey(1), CFG)
    before = jax.tree.map(np.asarray, st)
    _, st2 = llama.prefill_slots_continue(
        params, jnp.zeros((1, 32), jnp.int32), jnp.asarray([32], jnp.int32),
        st, jnp.asarray([0], jnp.int32), jnp.zeros((1,), jnp.bool_),
        jnp.asarray([3], jnp.int32), jax.random.PRNGKey(2), CFG,
        final=True, attn_len=96)
    after = jax.tree.map(np.asarray, st2)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("n", [33, 40, 64, 80])
def test_pool_long_prompt_matches_b1(params, n):
    """Prompts longer than the top prefill bucket (32) chunk-prefill up
    to the context cap and stream the same greedy tokens as the B=1
    path — including the exact-multiple boundary (64) and near-cap (80)."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    ids = [(i * 11 + 5) % 100 for i in range(n)]
    pool = LLMPool(params, CFG, capacity=2, block=4,
                   prefill_buckets=(8, 16, 32))
    use, planned, cached = pool._plan(list(ids))
    assert not use and planned == ids and cached == n

    async def go():
        out = []
        async for toks in pool.generate(ids, max_tokens=9):
            out.extend(toks)
        pool.stop()
        return out

    got = _run_pool(go())
    assert got[:9] == _b1_greedy(params, ids, 9)


def test_pool_chunked_disabled_truncates(params):
    """chunked_prefill=False restores the pre-chunking behavior: the
    prompt left-truncates at the largest bucket."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    ids = [(i * 11 + 5) % 100 for i in range(40)]
    pool = LLMPool(params, CFG, capacity=2, block=4,
                   prefill_buckets=(8, 16, 32), chunked_prefill=False)
    use, planned, cached = pool._plan(list(ids))
    assert not use and planned == ids[-32:] and cached == 32

    async def go():
        out = []
        async for toks in pool.generate(ids, max_tokens=9):
            out.extend(toks)
        pool.stop()
        return out

    got = _run_pool(go())
    assert got[:9] == _b1_greedy(params, ids[-32:], 9)


def test_pool_long_and_short_prompts_concurrent(params):
    """A long (chunked) prompt and short prompts in the same pool batch:
    everyone still matches their B=1 sequence."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    long_ids = [(i * 13 + 2) % 100 for i in range(50)]
    prompts = [PROMPTS[0], long_ids, PROMPTS[1]]
    pool = LLMPool(params, CFG, capacity=4, block=4,
                   prefill_buckets=(8, 16, 32))

    async def one(ids):
        out = []
        async for toks in pool.generate(ids, max_tokens=9):
            out.extend(toks)
        return out

    async def go():
        res = await asyncio.gather(*[one(p) for p in prompts])
        pool.stop()
        return res

    results = _run_pool(go())
    for p, got in zip(prompts, results):
        assert got[:9] == _b1_greedy(params, p, 9), f"len {len(p)}"


def test_pool_prefix_with_long_suffix_chunks(params):
    """A prompt matching the pinned prefix whose SUFFIX exceeds the
    prefix bucket ladder chunk-prefills (prefix class) and matches the
    plain pool's output."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    sfx = [(i * 17 + 4) % 100 for i in range(40)]
    full = PREFIX + sfx

    plain = LLMPool(params, CFG, capacity=2, block=4,
                    prefill_buckets=(8, 16, 32))

    async def run(pool, ids):
        out = []
        async for toks in pool.generate(ids, max_tokens=9):
            out.extend(toks)
        pool.stop()
        return out

    want = _run_pool(run(plain, full))

    pooled = LLMPool(params, CFG, capacity=2, block=4,
                     prefill_buckets=(8, 16, 32))
    pooled.set_prefix(PREFIX)
    use, planned, cached = pooled._plan(list(full))
    assert use and planned == sfx and cached == len(full)
    got = _run_pool(run(pooled, full))
    assert got == want


def test_pool_warmup_compiles_chunk_programs(params):
    """warmup() with chunking reachable compiles the continuation
    programs with active=False (no state disturbance), and a long prompt
    afterwards still matches B=1."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    ids = [(i * 19 + 7) % 100 for i in range(40)]
    pool = LLMPool(params, CFG, capacity=2, block=4,
                   prefill_buckets=(8, 16, 32))
    pool.warmup()
    assert pool.prefill_calls == 0

    async def go():
        out = []
        async for toks in pool.generate(ids, max_tokens=9):
            out.extend(toks)
        pool.stop()
        return out

    got = _run_pool(go())
    assert got[:9] == _b1_greedy(params, ids, 9)
    # 40 = ragged 8 + one 32-chunk: exactly two prefill programs
    assert pool.prefill_calls == 2


def test_pool_per_request_sampling_mixed(params):
    """per_request_sampling: one pool serves a greedy request and a
    sampled request CONCURRENTLY from the same compiled programs — the
    greedy request reproduces the B=1 greedy chain exactly, the sampled
    request's override actually takes effect (it diverges from greedy
    over repeated attempts), and stats report the mode."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    pool = LLMPool(params, CFG, capacity=4, block=4,
                   prefill_buckets=(8, 16, 32),
                   per_request_sampling=True)
    assert pool.stats()["per_request_sampling"] is True

    async def one(ids, sampling):
        out = []
        async for toks in pool.generate(ids, max_tokens=13,
                                        sampling=sampling):
            out.extend(toks)
        return out

    async def go():
        res = await asyncio.gather(
            one(PROMPTS[0], {"temperature": 0.0}),
            one(PROMPTS[1], {"temperature": 1.3, "top_p": 0.95}),
            one(PROMPTS[2], None),          # pool default (greedy)
        )
        return res

    g0, s1, g2 = _run_pool(go())
    assert g0[:13] == _b1_greedy(params, PROMPTS[0], 13)
    assert g2[:13] == _b1_greedy(params, PROMPTS[2], 13)

    # the sampled request draws from the filtered distribution: over a
    # few runs with fresh rng it must diverge from the greedy chain
    greedy1 = _b1_greedy(params, PROMPTS[1], 13)
    diverged = s1[:13] != greedy1
    for _ in range(4):
        if diverged:
            break
        nxt = _run_pool(one(PROMPTS[1], {"temperature": 1.3,
                                         "top_p": 0.95}))
        diverged = nxt[:13] != greedy1
    pool.stop()
    assert diverged, "temperature override never changed the output"


def test_pool_per_request_sampling_slot_reuse_resets(params):
    """A slot reused after a sampled request goes back to the new
    request's (default greedy) knobs — no sampling-state leakage."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    pool = LLMPool(params, CFG, capacity=1, block=4,
                   prefill_buckets=(8, 16),
                   per_request_sampling=True)

    async def one(ids, sampling):
        out = []
        async for toks in pool.generate(ids, max_tokens=9,
                                        sampling=sampling):
            out.extend(toks)
        return out

    async def go():
        await one(PROMPTS[0], {"temperature": 1.5})
        return await one(PROMPTS[3], None)

    got = _run_pool(go())
    pool.stop()
    assert got[:9] == _b1_greedy(params, PROMPTS[3], 9)


def test_pool_first_block_identity_and_widths(params):
    """VERDICT r3 #1: a fresh request's first decode step runs at the
    short first_block width (faster first text), later steps at the full
    block — and the emitted tokens are identical to the plain pool's.
    A request joining mid-flight must NOT shrink established streams'
    steps: its first chunk then arrives at the full block width."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    async def chunks_of(pool, ids, n):
        out = []
        async for toks in pool.generate(ids, max_tokens=n):
            out.append(list(toks))
        return out

    async def solo(pool):
        try:
            return await chunks_of(pool, PROMPTS[1], 13)
        finally:
            pool.stop()

    plain = LLMPool(params, CFG, capacity=4, block=8,
                    prefill_buckets=(16,))
    want = _run_pool(solo(plain))
    fb = LLMPool(params, CFG, capacity=4, block=8, first_block=4,
                 prefill_buckets=(16,))
    assert fb.first_block == 4
    got = _run_pool(solo(fb))
    flat = [t for c in got for t in c]
    flatw = [t for c in want for t in c]
    # identical tokens; lengths may differ (smaller first block
    # overshoots the max_tokens budget less)
    n = min(len(flat), len(flatw))
    assert n >= 13 and flat[:n] == flatw[:n]
    # chunk shape: [first token], first_block, then full blocks
    assert [len(c) for c in got][:3] == [1, 4, 8]

    # width rule at the dispatch level (deterministic): all-fresh step
    # -> first_block; any established row in the step -> full block
    fb2 = LLMPool(params, CFG, capacity=4, block=8, first_block=4,
                  prefill_buckets=(16,))

    async def widths():
        i0 = await fb2.acquire()
        i1 = await fb2.acquire()
        fb2.submit_prefill(i0, PROMPTS[0])
        fb2.submit_prefill(i1, PROMPTS[1])
        fb2.submit_block(i0)
        fb2.submit_block(i1)
        rec1 = fb2._dispatch()            # both rows fresh
        fb2.submit_block(i0)
        rec2 = fb2._dispatch()            # row 0 established
        i2 = await fb2.acquire()
        fb2.submit_prefill(i2, PROMPTS[2])
        fb2.submit_block(i2)
        fb2.submit_block(i0)
        rec3 = fb2._dispatch()            # fresh row 2 + established row 0
        return rec1[5], rec2[5], rec3[5]

    w1, w2, w3 = _run_pool(widths())
    assert (w1, w2, w3) == (4, 8, 8)


# ---------------------------------------------------------------------------
# Streaming prompts (VERDICT r3 #3 — the ASR/LLM overlap): a prompt fed
# to the pool in parts must generate EXACTLY what the whole prompt
# generates, for any split, including tokenizer-revision restarts.
# ---------------------------------------------------------------------------

async def _aiter(items):
    for it in items:
        await asyncio.sleep(0)
        yield it


@pytest.mark.parametrize("splits", [
    [3],                     # head only, tail at end
    [1],                     # 1-token head: buffering until >= 2
    [1, 1, 1, 1, 1, 1],      # trickle
    [5, 5, 5, 5, 5, 5, 5, 5],  # crosses the flush threshold (16)
    [30, 10],                # extend crosses the top bucket width (32)
])
def test_pool_streaming_prompt_matches_generate(params, splits):
    from llmvox_tpu.serve.llm_pool import LLMPool

    rng = np.random.default_rng(7)
    total = max(sum(splits) + 3, 12)
    prompt = [int(t) for t in rng.integers(1, 120, total)]
    parts, i = [], 0
    for s in splits:
        parts.append(prompt[i: i + s])
        i += s
    parts.append(prompt[i:])

    pool = LLMPool(params, CFG, capacity=2, block=4,
                   prefill_buckets=(8, 16, 32))

    async def go():
        want, got = [], []
        async for toks in pool.generate(prompt, max_tokens=13):
            want.extend(toks)
        async for toks in pool.generate_streaming_prompt(
                _aiter(parts), max_tokens=13):
            got.extend(toks)
        pool.stop()
        return want, got

    want, got = _run_pool(go())
    assert got == want
    assert want[:13] == _b1_greedy(params, prompt, 13)


def test_pool_streaming_prompt_restart_matches_generate(params):
    """A producer that discovers its submitted ids were wrong raises
    PromptRestart(final_ids); the output law is generate(final_ids)."""
    from llmvox_tpu.serve.llm_pool import LLMPool, PromptRestart

    final = [9, 8, 7, 6, 5, 4, 3, 2]

    async def parts():
        yield [1, 2, 3, 4, 5]     # wrong head, already prefilled
        await asyncio.sleep(0)
        raise PromptRestart(final)

    pool = LLMPool(params, CFG, capacity=2, block=4,
                   prefill_buckets=(8, 16, 32))

    async def go():
        want, got = [], []
        async for toks in pool.generate(final, max_tokens=9):
            want.extend(toks)
        async for toks in pool.generate_streaming_prompt(
                parts(), max_tokens=9):
            got.extend(toks)
        pool.stop()
        return want, got

    want, got = _run_pool(go())
    assert got == want


def test_pool_streaming_prompt_edge_cases(params):
    """Empty producer == generate([]); a single 1-token part == its
    plain generate; a concurrent plain request is undisturbed."""
    from llmvox_tpu.serve.llm_pool import LLMPool

    pool = LLMPool(params, CFG, capacity=3, block=4,
                   prefill_buckets=(8, 16, 32))

    async def drain(gen):
        out = []
        async for toks in gen:
            out.extend(toks)
        return out

    async def go():
        w_empty = await drain(pool.generate([], max_tokens=6))
        g_empty = await drain(pool.generate_streaming_prompt(
            _aiter([]), max_tokens=6))
        w_one = await drain(pool.generate([42], max_tokens=6))
        g_one, w_conc = await asyncio.gather(
            drain(pool.generate_streaming_prompt(_aiter([[42]]),
                                                 max_tokens=6)),
            drain(pool.generate(PROMPTS[1], max_tokens=6)))
        pool.stop()
        return w_empty, g_empty, w_one, g_one, w_conc

    w_empty, g_empty, w_one, g_one, w_conc = _run_pool(go())
    assert g_empty == w_empty
    assert g_one == w_one
    assert w_conc[:6] == _b1_greedy(params, PROMPTS[1], 6)


def test_pooled_stream_model_predict_streaming_matches_predict(params):
    """Adapter level: cumulative transcript strings through
    predict_streaming produce EXACTLY predict(final_text)'s text."""
    from llmvox_tpu.serve.llm_pool import LLMPool
    from llmvox_tpu.streams.jax_llm import PooledJAXStreamModel
    from tests.test_llama import _ToyTokenizer

    tok = _ToyTokenizer()
    pool = LLMPool(params, CFG, capacity=2, block=4,
                   prefill_buckets=(8, 16, 32))
    model = PooledJAXStreamModel(pool, tok, max_tokens=12)

    full = "hello there, how are you"
    cum = [full[:5], full[:9], full[:17], full]

    async def drain(agen):
        out = []
        async for d in agen:
            out.append(d)
        return out

    async def go():
        want = await drain(model.predict(
            {"system": "s", "prompt": full}))
        got = await drain(model.predict_streaming(
            {"system": "s"}, _aiter(cum)))
        # (text, done) tuple protocol (transcribe_stream_async) works too
        got2 = await drain(model.predict_streaming(
            {"system": "s"},
            _aiter([(c, c is cum[-1]) for c in cum])))
        pool.stop()
        return want, got, got2

    want, got, got2 = _run_pool(go())
    assert "".join(got) == "".join(want)
    assert "".join(got2) == "".join(want)


def test_pooled_stream_model_predict_streaming_tokenizer_revision(params):
    """A tokenizer that REVISES earlier ids once the text grows (the BPE
    boundary-merge hazard) trips the restart path; output still equals
    predict(final_text)."""
    from llmvox_tpu.serve.llm_pool import LLMPool
    from llmvox_tpu.streams.jax_llm import PooledJAXStreamModel
    from tests.test_llama import _ToyTokenizer

    class RevisingTokenizer(_ToyTokenizer):
        def encode(self, text):
            ids = super().encode(text)
            # long texts get a marker PREPENDED — earlier ids all shift
            return ([99] + ids) if len(text) > 24 else ids

    tok = RevisingTokenizer()
    pool = LLMPool(params, CFG, capacity=2, block=4,
                   prefill_buckets=(8, 16, 32))
    model = PooledJAXStreamModel(pool, tok, max_tokens=12)

    full = "hello there, how are you today"
    cum = [full[:8], full[:16], full]
    assert tok.encode("s\n\n" + full + "\n")[0] == 99   # revision happens

    async def drain(agen):
        out = []
        async for d in agen:
            out.append(d)
        return out

    async def go():
        want = await drain(model.predict({"system": "s", "prompt": full}))
        got = await drain(model.predict_streaming(
            {"system": "s"}, _aiter(cum)))
        pool.stop()
        return want, got

    want, got = _run_pool(go())
    assert "".join(got) == "".join(want)


def test_pooled_stream_model_streaming_over_cap_matches_plain(params):
    """A streaming prompt that exceeds the context cap degrades to the
    PLAIN path's left-truncation (keep the tail) via restart — identical
    output to predict(full_text), never head-keeping truncation."""
    from llmvox_tpu.serve.llm_pool import LLMPool
    from llmvox_tpu.streams.jax_llm import PooledJAXStreamModel
    from tests.test_llama import _ToyTokenizer

    tok = _ToyTokenizer()
    pool = LLMPool(params, CFG, capacity=2, block=4,
                   prefill_buckets=(8, 16, 32))
    model = PooledJAXStreamModel(pool, tok, max_tokens=8)

    full = "x" * 120          # 120 ids > ctx cap (91) at CFG shapes
    cum = [full[:40], full[:90], full]

    async def drain(agen):
        out = []
        async for d in agen:
            out.append(d)
        return out

    async def go():
        want = await drain(model.predict({"system": "s", "prompt": full}))
        got = await drain(model.predict_streaming(
            {"system": "s"}, _aiter(cum)))
        pool.stop()
        return want, got

    want, got = _run_pool(go())
    assert "".join(got) == "".join(want)
