"""Adaptive speculation depth (serve/spec_control.py + DecodePool ladder).

The controller may only ever change SPEED: every rung — including the
greedy rung 0 — is bit-identical to the plain pooled block, so the pool
test asserts token-identity against a greedy pool across live rung
switches, and the unit tests pin the decision model (accept-probability
estimation, throughput ranking, hysteresis, dwell, greedy-parked probes).
"""
import asyncio
import dataclasses

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from llmvox_tpu.serve.spec_control import (SpecController, expected_commits,
                                           solve_p)


# ---------------------------------------------------------------------------
# model math
# ---------------------------------------------------------------------------

def test_expected_commits_matches_enumeration():
    """E[min(#leading accepts, k) + 1] by brute force over accept
    patterns must equal the closed form."""
    rng = np.random.default_rng(0)
    for k in (1, 2, 5):
        for p in (0.0, 0.3, 0.9, 1.0):
            # P(commits = i+1) = p^i (1-p) for i < k; P(= k+1) = p^k
            e = sum((i + 1) * (p ** i) * (1 - p) for i in range(k)) \
                + (k + 1) * p ** k
            assert abs(expected_commits(p, k) - e) < 1e-12
    assert expected_commits(rng.random(), 0) == 1.0


def test_solve_p_inverts_expected_commits():
    for k in (1, 3, 8):
        for p in (0.05, 0.5, 0.95):
            m = expected_commits(p, k)
            assert abs(solve_p(m, k) - p) < 1e-3
    # clamping: impossible means stay in [0, 1]
    assert solve_p(0.5, 4) == pytest.approx(0.0, abs=1e-3)
    assert solve_p(99.0, 4) == pytest.approx(1.0, abs=1e-3)


# ---------------------------------------------------------------------------
# controller decisions
# ---------------------------------------------------------------------------

def _ctl(**kw):
    kw.setdefault("ladder", (0, 4, 8))
    kw.setdefault("cost_ms", {0: 1.0, 4: 1.6, 8: 2.0})
    kw.setdefault("dwell", 2)
    kw.setdefault("probe_every", 100)
    return SpecController(**kw)


def test_controller_moves_to_best_rung():
    """High accept rate -> deepest rung wins; low -> greedy wins."""
    ctl = _ctl(k0=4)
    for _ in range(6):
        ctl.next_k()
        ctl.observe(4, commits=4.9, iters=1.0)     # near-perfect accepts
    assert ctl.k == 8                              # E_8(p~1)/2.0 > E_4/1.6

    ctl = _ctl(k0=4)
    for _ in range(6):
        ctl.next_k()
        ctl.observe(4, commits=1.02, iters=1.0)    # drafts never accept
    assert ctl.k == 0                              # 1/1.0 > E_4(~0)/1.6


def test_controller_hysteresis_and_dwell():
    """Inside the margin band the rung must not flap; right after a
    switch the dwell pins it regardless."""
    # costs tuned so rung 4 is ~8% better than rung 0 at p=0.5 — inside
    # the 15% default margin: no switch
    ctl = _ctl(k0=0, cost_ms={0: 1.0, 4: expected_commits(0.5, 4) / 1.08,
                              8: 100.0})
    ctl.p = 0.5
    for _ in range(10):
        k = ctl.next_k()
    assert k == 0 and ctl.switches == 0
    # dwell: a fresh controller with a huge advantage still waits
    ctl = _ctl(k0=0, cost_ms={0: 1.0, 4: 0.1, 8: 100.0}, dwell=5)
    ctl.p = 0.5
    ks = [ctl.next_k() for _ in range(8)]
    assert ks[:4] == [0, 0, 0, 0] and ks[-1] == 4


def test_controller_probes_when_parked_on_greedy():
    """Parked at rung 0, the controller must spend a probe step on a
    spec rung every probe_every steps so a shifted accept rate can be
    noticed (otherwise p-hat never updates again)."""
    ctl = _ctl(k0=0, probe_every=4)
    ctl.p = 0.01
    seen = [ctl.next_k() for _ in range(9)]
    assert ctl.probes >= 2
    assert any(k > 0 for k in seen)
    # after probes reveal near-perfect accepts, it climbs off greedy
    for _ in range(15):
        k = ctl.next_k()
        if k > 0:
            ctl.observe(k, commits=(k + 0.98), iters=1.0)
    assert ctl.k > 0


def test_controller_no_signal_no_costs_is_safe():
    """Before any accept signal it speculates (to get one); with no cost
    table it never switches — and never crashes."""
    ctl = SpecController((0, 4), k0=4, cost_ms=None)
    assert ctl.next_k() == 4
    ctl.observe(4, commits=2.0, iters=1.0)
    for _ in range(30):
        assert ctl.next_k() == 4
    assert ctl.switches == 0


# ---------------------------------------------------------------------------
# pool integration: live switching, identical output
# ---------------------------------------------------------------------------

def _spec_pool_fixture():
    from llmvox_tpu.models import decoder as dec
    from llmvox_tpu.codec.codec import WavCodec, init_codec_params
    from tests.tiny_stack import CODEC_CFG, DEC_CFG, SERVE_CFG

    cfg = dataclasses.replace(DEC_CFG, n_draft_heads=3)
    params = jax.device_get(
        dec.init_decoder_params(jax.random.PRNGKey(7), cfg))
    rng = np.random.default_rng(7)
    params = jax.tree.map(
        lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(np.float32),
        params)
    text_table = rng.standard_normal(
        (cfg.text_vocab_size, cfg.text_embed_dim)).astype(np.float32)
    codec_params = init_codec_params(jax.random.PRNGKey(8), CODEC_CFG)
    codec = WavCodec(codec_params, CODEC_CFG, buckets=SERVE_CFG.chunk_buckets)
    scfg = dataclasses.replace(SERVE_CFG, pool_merge_blocks=False,
                               pool_decode_block=8)
    return cfg, params, text_table, codec, scfg


def _drive_pool(pool, n_steps, text_vocab):
    """One slot, n sequential block submits; returns the token stream."""
    win = np.arange(pool.block, dtype=np.int32) % min(text_vocab, 7)

    async def go():
        pool.start()
        idx = pool.acquire()
        out = []
        for _ in range(n_steps):
            toks = await pool.submit(idx, win, text_len=5, limit=pool.block)
            out.extend(toks)
        pool.release(idx)
        pool.stop()
        return out

    return asyncio.run(asyncio.wait_for(go(), timeout=600))


def test_adaptive_pool_switches_and_stays_exact():
    """A pool with an adaptive ladder streams EXACTLY the greedy pool's
    tokens while the controller moves between rungs; with untrained
    heads and an honest cost table it parks on greedy."""
    from llmvox_tpu.serve.pool import DecodePool

    cfg, params, text_table, codec, scfg = _spec_pool_fixture()
    n_steps = 10

    greedy = DecodePool(params, text_table, codec, capacity=2, dcfg=cfg,
                        scfg=scfg, cache_dtype=jnp.float32,
                        param_dtype=jnp.float32)
    want = _drive_pool(greedy, n_steps, cfg.text_vocab_size)

    scfg_a = dataclasses.replace(scfg, spec_decode=True, spec_k_draft=3,
                                 spec_k_ladder=(0, 2, 3))
    pool = DecodePool(params, text_table, codec, capacity=2, dcfg=cfg,
                      scfg=scfg_a, cache_dtype=jnp.float32,
                      param_dtype=jnp.float32)
    assert pool._spec and pool._spec_ctl is not None
    # inject a deterministic cost table (calibration runs at warmup,
    # which this test skips): spec iterations 3x a greedy token — with
    # untrained heads (commits ~1/iter) greedy must win
    pool._spec_ctl = SpecController((0, 2, 3), k0=3,
                                    cost_ms={0: 1.0, 2: 3.0, 3: 3.0},
                                    dwell=2, probe_every=1000)
    got = _drive_pool(pool, n_steps, cfg.text_vocab_size)
    assert got == want
    assert pool._spec_ctl.k == 0 and pool._spec_ctl.switches == 1
    # untrained heads on a 16-token vocab accept ~half by chance; the
    # estimate just has to stay far from the ~1.0 a trained head gives
    assert pool._spec_ctl.p is not None and pool._spec_ctl.p < 0.9
    st = pool.stats()
    assert st["spec"]["k"] == 0 and st["steps"] == n_steps

    # a cost table where speculation is near-free keeps the deep rung
    # even at ~zero accepts, and the output is STILL identical
    pool2 = DecodePool(params, text_table, codec, capacity=2, dcfg=cfg,
                       scfg=scfg_a, cache_dtype=jnp.float32,
                       param_dtype=jnp.float32)
    pool2._spec_ctl = SpecController((0, 2, 3), k0=2,
                                     cost_ms={0: 1.0, 2: 0.2, 3: 0.1},
                                     dwell=2, probe_every=1000)
    got2 = _drive_pool(pool2, n_steps, cfg.text_vocab_size)
    assert got2 == want
    assert pool2._spec_ctl.k == 3 and pool2._spec_ctl.switches == 1


def test_adaptive_pool_probe_cycle_stays_exact():
    """Parked on greedy, the periodic probe step runs a spec rung —
    output must remain identical through probe steps."""
    from llmvox_tpu.serve.pool import DecodePool

    cfg, params, text_table, codec, scfg = _spec_pool_fixture()
    n_steps = 12

    greedy = DecodePool(params, text_table, codec, capacity=2, dcfg=cfg,
                        scfg=scfg, cache_dtype=jnp.float32,
                        param_dtype=jnp.float32)
    want = _drive_pool(greedy, n_steps, cfg.text_vocab_size)

    scfg_a = dataclasses.replace(scfg, spec_decode=True, spec_k_draft=2,
                                 spec_k_ladder=(0, 2))
    pool = DecodePool(params, text_table, codec, capacity=2, dcfg=cfg,
                      scfg=scfg_a, cache_dtype=jnp.float32,
                      param_dtype=jnp.float32)
    pool._spec_ctl = SpecController((0, 2), k0=2,
                                    cost_ms={0: 1.0, 2: 4.0},
                                    dwell=1, probe_every=3)
    got = _drive_pool(pool, n_steps, cfg.text_vocab_size)
    assert got == want
    assert pool._spec_ctl.k == 0          # parked on greedy
    assert pool._spec_ctl.probes >= 2     # but kept probing


def test_pool_calibration_produces_costs():
    """_calibrate_spec_costs returns a positive ms figure for every rung
    (per token for rung 0, per iteration for spec rungs)."""
    from llmvox_tpu.serve.pool import DecodePool

    cfg, params, text_table, codec, scfg = _spec_pool_fixture()
    scfg_a = dataclasses.replace(scfg, spec_decode=True, spec_k_draft=2,
                                 spec_k_ladder=(0, 2))
    pool = DecodePool(params, text_table, codec, capacity=2, dcfg=cfg,
                      scfg=scfg_a, cache_dtype=jnp.float32,
                      param_dtype=jnp.float32)
    costs = pool._calibrate_spec_costs(repeats=1)
    assert set(costs) == {0, 2}
    assert all(v > 0 for v in costs.values())
