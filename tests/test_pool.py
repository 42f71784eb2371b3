"""Continuous-batching pool: concurrent streaming requests share one
batched decode program and match the single-engine scheduler's output."""
import asyncio

import numpy as np
import jax.numpy as jnp
import pytest

from llmvox_tpu.serve.pool import DecodePool, PooledEngine
from llmvox_tpu.serve.scheduler import StreamingScheduler
from llmvox_tpu.streams.scripted import ScriptedStream

from tests.tiny_stack import SERVE_CFG, make_engines


def _reference_chunks(deltas):
    engines = make_engines(0, SERVE_CFG)
    sched = StreamingScheduler(engines, SERVE_CFG)
    stream = ScriptedStream(deltas, eos_token=SERVE_CFG.eos_token)

    async def go():
        out = []
        async for c in sched.run(stream.predict({})):
            out.append(len(c))
        return out

    return asyncio.run(asyncio.wait_for(go(), timeout=300))


@pytest.mark.slow
def test_concurrent_pooled_requests_match_single_engine():
    eng = make_engines(0, SERVE_CFG, n=1)[0]
    requests = [
        ["Hello", "there."],
        ["Second request arriving now."],
        ["Third one", "with two", "deltas."],
    ]
    expected = [_reference_chunks(d) for d in requests]

    async def go():
        pool = DecodePool(eng.params, np.asarray(eng.text_table), eng.codec,
                          capacity=8, dcfg=eng.dcfg, scfg=SERVE_CFG,
                          cache_dtype=jnp.float32, param_dtype=jnp.float32)

        async def one(deltas):
            engines = [PooledEngine(pool, SERVE_CFG),
                       PooledEngine(pool, SERVE_CFG)]
            sched = StreamingScheduler(engines, SERVE_CFG)
            stream = ScriptedStream(deltas, eos_token=SERVE_CFG.eos_token)
            out = []
            async for c in sched.run(stream.predict({}), trace=None):
                out.append(len(c))
            for e in engines:
                e.close()
            return out

        results = await asyncio.gather(*[one(d) for d in requests])
        pool.stop()
        return results

    results = asyncio.run(asyncio.wait_for(go(), timeout=600))
    for got, want in zip(results, expected):
        assert got == want


def test_fused_first_chunks_beyond_synth_batch_all_get_audio():
    """More simultaneous sentence starts than SYNTH_BATCH must chunk into
    extra vocode calls, not silently drop the fused path (pool.py step
    loop).  12 fused submissions land in ONE step: submissions are
    synchronous, so the step loop can't run until the first await."""
    eng = make_engines(0, SERVE_CFG, n=1)[0]
    n = 12
    dump = SERVE_CFG.initial_dump_size_1
    hop = eng.codec.cfg.hop_length

    async def go():
        pool = DecodePool(eng.params, np.asarray(eng.text_table), eng.codec,
                          capacity=n, dcfg=eng.dcfg, scfg=SERVE_CFG,
                          cache_dtype=jnp.float32, param_dtype=jnp.float32)
        assert n > pool.SYNTH_BATCH
        engines = [PooledEngine(pool, SERVE_CFG) for _ in range(n)]
        window = np.full(pool.block, eng.dcfg.pad_token_id, np.int32)
        window[0] = 7
        pendings = []
        for e in engines:
            e.new_state()
            p, _ = e.decode_block_fused_async(None, window, 1, pool.block,
                                              dump)
            pendings.append(p)
        results = await asyncio.gather(*[p.afetch() for p in pendings])
        steps = pool.steps
        for e in engines:
            e.close()
        pool.stop()
        return results, steps

    results, steps = asyncio.run(asyncio.wait_for(go(), timeout=600))
    assert steps == 1          # all 12 in one gathered step
    for out, audio in results:
        assert len(out) >= dump
        assert audio is not None and len(audio) == dump * hop * 4


def test_merged_pair_steps_match_sequential_steps():
    """Block merging (pool.py::_dispatch_step): a slot's two queued
    full-limit requests run as ONE double-width step whose per-request
    tokens must be bit-identical to two sequential single-width steps —
    including a slot that rides the big step with only one request."""
    import dataclasses

    eng = make_engines(0, SERVE_CFG, n=1)[0]
    scfg_m = dataclasses.replace(SERVE_CFG, pool_merge_blocks=True)
    scfg_s = dataclasses.replace(SERVE_CFG, pool_merge_blocks=False)

    def run(scfg):
        pool = DecodePool(eng.params, np.asarray(eng.text_table), eng.codec,
                          capacity=4, dcfg=eng.dcfg, scfg=scfg,
                          cache_dtype=jnp.float32, param_dtype=jnp.float32)
        blk = pool.block
        text = list(range(5, 5 + 2 * blk))

        async def go():
            engines = [PooledEngine(pool, scfg) for _ in range(2)]
            for e in engines:
                e.new_state()
            pendings = []
            for k, e in enumerate(engines):
                w1 = np.full(blk, eng.dcfg.pad_token_id, np.int32)
                w1[:blk] = text[:blk]
                w2 = np.full(blk, eng.dcfg.pad_token_id, np.int32)
                w2[:blk] = text[blk:2 * blk]
                # slot 0 queues a full-limit pair (mergeable); slot 1
                # queues one full + later one short (rides along)
                p1, _ = e.decode_block_async(None, w1, 2 * blk, blk)
                pendings.append(p1)
                if k == 0:
                    p2, _ = e.decode_block_async(None, w2, 2 * blk,
                                                 blk // 2)
                    pendings.append(p2)
            res = [await p.afetch() for p in pendings]
            merged = pool.merged_steps
            for e in engines:
                e.close()
            pool.stop()
            return res, merged

        res, merged = asyncio.run(asyncio.wait_for(go(), timeout=600))
        return res, merged

    want, merged_off = run(scfg_s)
    got, merged_on = run(scfg_m)
    assert merged_off == 0 and merged_on >= 1
    assert got == want


def test_pool_restart_after_stop_serves_new_loop():
    """stop() must clear the pipelined in-flight record: a restart on a
    NEW event loop would otherwise try to resolve futures bound to the
    dead loop (pool.py::stop)."""
    eng = make_engines(0, SERVE_CFG, n=1)[0]
    pool = DecodePool(eng.params, np.asarray(eng.text_table), eng.codec,
                      capacity=2, dcfg=eng.dcfg, scfg=SERVE_CFG,
                      cache_dtype=jnp.float32, param_dtype=jnp.float32)
    window = np.full(pool.block, eng.dcfg.pad_token_id, np.int32)
    window[0] = 7

    async def first():
        e = PooledEngine(pool, SERVE_CFG)
        e.new_state()
        e.decode_block_async(None, window, 1, pool.block)
        # let the loop dispatch so the in-flight record is populated
        for _ in range(500):
            if pool._inflight:
                break
            await asyncio.sleep(0)
        pool.stop()
        e.close()

    asyncio.run(asyncio.wait_for(first(), timeout=300))
    assert pool._inflight is None          # the invariant under test

    async def second():
        e = PooledEngine(pool, SERVE_CFG)  # start() on the new loop
        e.new_state()
        p, _ = e.decode_block_async(None, window, 1, pool.block)
        out = await p.afetch()
        pool.stop()
        e.close()
        return out

    out = asyncio.run(asyncio.wait_for(second(), timeout=300))
    assert len(out) >= 1


@pytest.mark.slow
def test_mesh_sharded_pool_matches_single_device():
    """DecodePool(mesh=...): slots shard over dp and every step runs one
    shard_map'd program across the mesh; the streamed audio must be
    byte-identical to the single-device pool (multi-chip pooled serving,
    runnable on a real slice with the same constructor argument)."""
    from llmvox_tpu.parallel import create_mesh

    requests = [["Mesh pool request one."], ["And a second", "stream."]]

    def run(mesh):
        eng = make_engines(0, SERVE_CFG, n=1)[0]

        async def go():
            pool = DecodePool(eng.params, np.asarray(eng.text_table),
                              eng.codec, capacity=4, dcfg=eng.dcfg,
                              scfg=SERVE_CFG, cache_dtype=jnp.float32,
                              param_dtype=jnp.float32, mesh=mesh)
            pool.warmup()

            async def one(deltas):
                engines = [PooledEngine(pool, SERVE_CFG),
                           PooledEngine(pool, SERVE_CFG)]
                sched = StreamingScheduler(engines, SERVE_CFG)
                stream = ScriptedStream(deltas,
                                        eos_token=SERVE_CFG.eos_token)
                out = []
                async for c in sched.run(stream.predict({}), trace=None):
                    out.append(c)
                for e in engines:
                    e.close()
                return b"".join(out)

            res = await asyncio.gather(*[one(d) for d in requests])
            pool.stop()
            return res

        return asyncio.run(asyncio.wait_for(go(), timeout=600))

    single = run(None)
    sharded = run(create_mesh(dp_size=2, tp_size=1))
    for a, b in zip(single, sharded):
        np.testing.assert_array_equal(np.frombuffer(b, dtype="<f4"),
                                      np.frombuffer(a, dtype="<f4"))


def _tiny_ladder(eng, caps=(4, 8), decay_s=0.0):
    # decay_s=0: instantaneous demand, so the routing assertions below
    # don't have to wait out the production high-water hold
    from llmvox_tpu.serve.pool import PoolLadder
    return PoolLadder([
        DecodePool(eng.params, np.asarray(eng.text_table), eng.codec,
                   capacity=c, dcfg=eng.dcfg, scfg=SERVE_CFG,
                   cache_dtype=jnp.float32, param_dtype=jnp.float32)
        for c in caps], decay_s=decay_s)


def test_pool_ladder_routes_and_migrates():
    """PoolLadder slot routing: engines land in the smallest pool that
    covers demand, overflow to the next rung, migrate UP at sentence
    boundaries when demand grows, and drift back DOWN when it shrinks."""
    eng = make_engines(0, SERVE_CFG, n=1)[0]

    async def go():
        ladder = _tiny_ladder(eng)
        p4, p8 = ladder.pools
        # two requests (2 engines each) fill the 4-slot rung
        reqs = [[PooledEngine(ladder, SERVE_CFG) for _ in range(2)]
                for _ in range(2)]
        assert all(e.pool is p4 for r in reqs for e in r)
        # a third request overflows to the 8-slot rung
        extra = [PooledEngine(ladder, SERVE_CFG) for _ in range(2)]
        assert all(e.pool is p8 for e in extra)
        assert ladder.active_total == 6
        # demand (6) now exceeds the small rung: sentence boundaries
        # migrate the original engines up
        for r in reqs:
            for e in r:
                e.new_state()
        assert all(e.pool is p8 for r in reqs for e in r)
        assert p4.active_count == 0 and p8.active_count == 6
        # load drops to one request -> next sentences drift back down
        for r in reqs:
            for e in r:
                e.close()
        assert ladder.active_total == 2
        for e in extra:
            e.new_state()
        assert all(e.pool is p4 for e in extra)
        for e in extra:
            e.close()
        ladder.stop()

    asyncio.run(asyncio.wait_for(go(), timeout=120))


@pytest.mark.slow
def test_pool_ladder_output_matches_single_engine():
    """A request whose engines migrate rungs mid-dialogue produces the
    same chunk schedule as the dedicated dual-replica scheduler."""
    eng = make_engines(0, SERVE_CFG, n=1)[0]
    deltas_a = ["Hello", "there.", "Another sentence", "now."]
    deltas_b = ["Second request arriving now."]
    want_a = _reference_chunks(deltas_a)
    want_b = _reference_chunks(deltas_b)

    async def go():
        ladder = _tiny_ladder(eng, caps=(2, 8))

        async def one(deltas, start_delay):
            await asyncio.sleep(start_delay)
            engines = [PooledEngine(ladder, SERVE_CFG),
                       PooledEngine(ladder, SERVE_CFG)]
            sched = StreamingScheduler(engines, SERVE_CFG)
            stream = ScriptedStream(deltas, eos_token=SERVE_CFG.eos_token)
            out = []
            async for c in sched.run(stream.predict({})):
                out.append(len(c))
            for e in engines:
                e.close()
            return out

        # request A starts alone in the 2-slot rung; B's arrival pushes
        # demand to 4, so A's later sentences migrate to the 8-slot rung
        got_a, got_b = await asyncio.gather(one(deltas_a, 0),
                                            one(deltas_b, 0.2))
        ladder.stop()
        return got_a, got_b

    got_a, got_b = asyncio.run(asyncio.wait_for(go(), timeout=600))
    assert got_a == want_a
    assert got_b == want_b


def test_pool_ladder_demand_high_water_decay():
    """Routing demand holds its recent peak for decay_s (burst waves 2+
    go straight to the big rung) and decays back afterwards."""
    import time as _time
    eng = make_engines(0, SERVE_CFG, n=1)[0]

    async def go():
        ladder = _tiny_ladder(eng, decay_s=0.5)
        p4, p8 = ladder.pools
        burst = [PooledEngine(ladder, SERVE_CFG) for _ in range(6)]
        assert ladder._demand() == 6
        for e in burst:
            e.close()
        # demand holds the peak while the wave gap is < decay_s:
        # a new arrival routes to the big rung even at zero occupancy
        assert ladder.target(extra=1) is p8
        e = PooledEngine(ladder, SERVE_CFG)
        assert e.pool is p8
        e.close()
        # after decay_s of low demand the target drifts back down
        _time.sleep(0.6)
        assert ladder.target(extra=1) is p4
        ladder.stop()

    asyncio.run(asyncio.wait_for(go(), timeout=120))


@pytest.mark.slow
def test_spec_pool_matches_greedy_pool():
    """ServeConfig.spec_decode through the POOL: a pool speculating with
    (untrained, random) draft heads streams byte-identical audio to the
    greedy pool — decode_block_spec_batch's per-row accept logic under
    the real scheduler/merge/fused-first-chunk traffic pattern."""
    import dataclasses

    import jax

    from llmvox_tpu.models import decoder as dec
    from tests.tiny_stack import CODEC_CFG, DEC_CFG
    from llmvox_tpu.codec.codec import WavCodec, init_codec_params

    cfg = dataclasses.replace(DEC_CFG, n_draft_heads=3)
    params = jax.device_get(
        dec.init_decoder_params(jax.random.PRNGKey(5), cfg))
    rng = np.random.default_rng(5)
    params = jax.tree.map(
        lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(np.float32),
        params)
    text_table = rng.standard_normal(
        (cfg.text_vocab_size, cfg.text_embed_dim)).astype(np.float32)
    codec_params = init_codec_params(jax.random.PRNGKey(6), CODEC_CFG)

    requests = [
        ["Speculative request one", "with two deltas."],
        ["Second concurrent request."],
        ["And a third one", "arriving too."],
    ]

    def run_with(scfg):
        codec = WavCodec(codec_params, CODEC_CFG,
                         buckets=scfg.chunk_buckets)
        pool = DecodePool(params, text_table, codec, capacity=8,
                          dcfg=cfg, scfg=scfg,
                          cache_dtype=jnp.float32,
                          param_dtype=jnp.float32)

        async def one(deltas):
            engines = [PooledEngine(pool, scfg), PooledEngine(pool, scfg)]
            sched = StreamingScheduler(engines, scfg)
            stream = ScriptedStream(deltas, eos_token=scfg.eos_token)
            out = []
            async for c in sched.run(stream.predict({}), trace=None):
                out.append(c)
            for e in engines:
                e.close()
            return b"".join(out)

        async def go():
            res = await asyncio.gather(*[one(d) for d in requests])
            pool.stop()
            return res, pool._spec

        return asyncio.run(asyncio.wait_for(go(), timeout=600))

    greedy, spec_off = run_with(SERVE_CFG)
    spec, spec_on = run_with(dataclasses.replace(
        SERVE_CFG, spec_decode=True, spec_k_draft=3))
    assert not spec_off and spec_on
    for i, (g, s) in enumerate(zip(greedy, spec)):
        assert g == s, f"request {i}: {len(g)} vs {len(s)} bytes"
