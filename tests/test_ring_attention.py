"""Sequence-parallel (ring) attention tests on the virtual 8-device mesh.

Ring attention (ops/ring_attention.py) must be numerically the same op as
full causal attention — forward AND backward — for any sp ring size, and
the sequence-parallel trainer must optimize the same function the dp
trainer does (same loss on the same batch, loss decreases when training).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmvox_tpu.ops.attention import causal_attention
from llmvox_tpu.ops.ring_attention import make_ring_attention
from llmvox_tpu.parallel.mesh import create_mesh
from llmvox_tpu.train import data as dmod
from llmvox_tpu.train.trainer import Trainer
from llmvox_tpu.utils.config import DecoderConfig, TrainConfig

TINY = DecoderConfig(n_layer=2, n_head=2, n_embd=32, block_size=64,
                     vocab_size=16, bias=False, text_embed_dim=12,
                     speech_embed_dim=20, text_vocab_size=20,
                     pad_token_id=17, text_eos_id=18, eoa_token_id=7)


def _qkv(key, b, t, h, d, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (b, t, h, d), dtype),
            jax.random.normal(kk, (b, t, h, d), dtype),
            jax.random.normal(kv, (b, t, h, d), dtype))


@pytest.mark.parametrize("dp,sp,b,t", [(2, 4, 4, 64), (1, 8, 2, 32),
                                       (4, 2, 4, 48), (8, 1, 8, 16)])
def test_ring_forward_matches_causal(dp, sp, b, t):
    mesh = create_mesh(dp_size=dp, sp_size=sp)
    q, k, v = _qkv(jax.random.PRNGKey(t), b, t, 2, 16)
    attn = make_ring_attention(mesh)
    out = jax.jit(attn)(q, k, v)
    ref = causal_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_ring_grads_match_causal():
    mesh = create_mesh(dp_size=2, sp_size=4)
    b, t, h, d = 4, 64, 2, 16
    q, k, v = _qkv(jax.random.PRNGKey(0), b, t, h, d)
    cot = jax.random.normal(jax.random.PRNGKey(9), (b, t, h, d))
    attn = make_ring_attention(mesh)

    def loss(f):
        return lambda q, k, v: jnp.sum(f(q, k, v) * cot)

    g_ring = jax.jit(jax.grad(loss(attn), argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss(causal_attention), argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=3e-5, rtol=1e-4)


def test_ring_rejects_unsharded_t():
    mesh = create_mesh(dp_size=2, sp_size=4)
    q, k, v = _qkv(jax.random.PRNGKey(1), 2, 30, 2, 16)  # 30 % 4 != 0
    attn = make_ring_attention(mesh)
    with pytest.raises(ValueError):
        attn(q, k, v)


def _trainer(tmp, dp, sp):
    tcfg = TrainConfig(batch_size=8, gradient_accumulation_steps=1,
                       learning_rate=1e-3, warmup_iters=2,
                       lr_decay_iters=50, min_lr=1e-5, eval_interval=1000,
                       out_dir=tmp, dp_size=dp, tp_size=1, sp_size=sp)
    rng = np.random.default_rng(1)
    table = rng.standard_normal(
        (TINY.text_vocab_size, TINY.text_embed_dim)).astype(np.float32)
    codebook = rng.standard_normal(
        (max(TINY.vocab_size, TINY.eoa_token_id + 1),
         TINY.speech_embed_dim)).astype(np.float32)
    return Trainer(tcfg, TINY, table, codebook,
                   compute_dtype=jnp.float32)


def _fake_batches(cfg, bs, rng):
    while True:
        samples = []
        for _ in range(bs):
            n = int(rng.integers(3, 12))
            samples.append(dmod.Sample(
                text_ids=rng.integers(0, 16, n + 2).astype(np.int32),
                codes=rng.integers(0, cfg.vocab_size, n).astype(np.int32)))
        yield dmod.collate(samples, cfg, bucket=16)


def test_sp_trainer_same_loss_as_dp(tmp_path):
    """Same seed, same batch: the dp2xsp4 eval loss equals dp8's (the sp
    step computes the same function, just sharded differently)."""
    t_dp = _trainer(str(tmp_path / "dp"), 8, 1)
    t_sp = _trainer(str(tmp_path / "sp"), 2, 4)
    batch = next(_fake_batches(TINY, 8, np.random.default_rng(2)))
    l_dp = t_dp.estimate_loss(iter([batch]), 1)
    l_sp = t_sp.estimate_loss(iter([batch]), 1)
    assert abs(l_dp - l_sp) < 1e-4


@pytest.mark.slow
def test_sp_training_reduces_loss(tmp_path):
    tr = _trainer(str(tmp_path), 2, 4)
    rng = np.random.default_rng(3)
    batches = _fake_batches(TINY, 8, rng)
    losses = []
    for _ in range(30):
        text_ids, targets = next(batches)
        losses.append(tr.step(text_ids, targets))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


# ---------------------------------------------------------------------------
# Balanced zigzag layout (VERDICT r3 #6): same math, half the critical
# path.  Correctness = forward/grad parity vs full attention AND loss
# parity vs both the dp trainer and the plain ring, through the global
# T-permutation.
# ---------------------------------------------------------------------------
from llmvox_tpu.ops.ring_attention import (make_zigzag_ring_attention,
                                           zigzag_permutation)


def test_zigzag_permutation_bijection_and_layout():
    perm, inv = zigzag_permutation(32, 4)
    assert sorted(perm.tolist()) == list(range(32))
    assert np.array_equal(perm[inv], np.arange(32))
    # shard i holds original chunks i and 2n-1-i (tz = 4 rows each)
    for i in range(4):
        shard = perm[i * 8:(i + 1) * 8]
        assert shard[:4].tolist() == list(range(i * 4, i * 4 + 4))
        assert shard[4:].tolist() == list(range((7 - i) * 4, (7 - i) * 4 + 4))


def test_zigzag_permutation_rejects_indivisible():
    with pytest.raises(AssertionError):
        zigzag_permutation(30, 4)


@pytest.mark.parametrize("dp,sp,b,t", [(2, 4, 4, 64), (1, 8, 2, 32),
                                       (4, 2, 4, 48)])
def test_zigzag_forward_matches_causal(dp, sp, b, t):
    """attn_zig(x[perm]) == causal(x)[perm] — the permuted program
    computes exactly full causal attention, rows relabeled."""
    mesh = create_mesh(dp_size=dp, sp_size=sp)
    q, k, v = _qkv(jax.random.PRNGKey(t + 1), b, t, 2, 16)
    perm, _ = zigzag_permutation(t, sp)
    attn = make_zigzag_ring_attention(mesh)
    out = jax.jit(attn)(q[:, perm], k[:, perm], v[:, perm])
    ref = causal_attention(q, k, v)[:, perm]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_zigzag_matches_plain_ring():
    mesh = create_mesh(dp_size=2, sp_size=4)
    b, t = 4, 64
    q, k, v = _qkv(jax.random.PRNGKey(5), b, t, 2, 16)
    perm, inv = zigzag_permutation(t, 4)
    ring = jax.jit(make_ring_attention(mesh))(q, k, v)
    zig = jax.jit(make_zigzag_ring_attention(mesh))(
        q[:, perm], k[:, perm], v[:, perm])
    np.testing.assert_allclose(np.asarray(zig[:, inv]), np.asarray(ring),
                               atol=2e-5, rtol=1e-5)


def test_zigzag_grads_match_causal():
    mesh = create_mesh(dp_size=2, sp_size=4)
    b, t, h, d = 4, 64, 2, 16
    q, k, v = _qkv(jax.random.PRNGKey(0), b, t, h, d)
    cot = jax.random.normal(jax.random.PRNGKey(9), (b, t, h, d))
    perm, _ = zigzag_permutation(t, 4)
    attn = make_zigzag_ring_attention(mesh)

    def loss_zig(q, k, v):
        # permutation INSIDE the differentiated function, as the trainer
        # does — the gather's transpose (scatter) must differentiate too
        return jnp.sum(attn(q[:, perm], k[:, perm], v[:, perm])
                       * cot[:, perm])

    def loss_ref(q, k, v):
        return jnp.sum(causal_attention(q, k, v) * cot)

    g_zig = jax.jit(jax.grad(loss_zig, argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gz, gf in zip(g_zig, g_ref):
        np.testing.assert_allclose(np.asarray(gz), np.asarray(gf),
                                   atol=3e-5, rtol=1e-4)


def _trainer_layout(tmp, dp, sp, layout, mcfg=TINY):
    tcfg = TrainConfig(batch_size=8, gradient_accumulation_steps=1,
                       learning_rate=1e-3, warmup_iters=2,
                       lr_decay_iters=50, min_lr=1e-5, eval_interval=1000,
                       out_dir=tmp, dp_size=dp, tp_size=1, sp_size=sp,
                       sp_layout=layout)
    rng = np.random.default_rng(1)
    table = rng.standard_normal(
        (mcfg.text_vocab_size, mcfg.text_embed_dim)).astype(np.float32)
    codebook = rng.standard_normal(
        (max(mcfg.vocab_size, mcfg.eoa_token_id + 1),
         mcfg.speech_embed_dim)).astype(np.float32)
    return Trainer(tcfg, mcfg, table, codebook, compute_dtype=jnp.float32)


def test_zigzag_trainer_same_loss_as_dp_and_ring(tmp_path):
    """dp8 == ring dp2xsp4 == zigzag dp2xsp4 on the same batch: the
    permutation + balanced layout compute the same loss function."""
    t_dp = _trainer_layout(str(tmp_path / "dp"), 8, 1, "ring")
    t_zig = _trainer_layout(str(tmp_path / "zig"), 2, 4, "zigzag")
    batch = next(_fake_batches(TINY, 8, np.random.default_rng(2)))
    l_dp = t_dp.estimate_loss(iter([batch]), 1)
    l_zig = t_zig.estimate_loss(iter([batch]), 1)
    assert abs(l_dp - l_zig) < 1e-4
    # and one optimizer step runs (backward through gather + shard_map)
    text_ids, targets = batch
    loss = t_zig.step(text_ids, targets)
    assert np.isfinite(loss)


def test_zigzag_trainer_mtp_loss_matches_dp(tmp_path):
    """With draft heads, the MTP shifted targets must be built in
    ORIGINAL time order before the permutation — loss equality with the
    dp trainer proves it (a row-shift in zigzag order would train heads
    on the wrong 'next' sentence rows and diverge)."""
    import dataclasses
    mtp = dataclasses.replace(TINY, n_draft_heads=2)
    t_dp = _trainer_layout(str(tmp_path / "dp"), 8, 1, "ring", mtp)
    t_zig = _trainer_layout(str(tmp_path / "zig"), 2, 4, "zigzag", mtp)
    batch = next(_fake_batches(mtp, 8, np.random.default_rng(4)))
    l_dp = t_dp.estimate_loss(iter([batch]), 1)
    l_zig = t_zig.estimate_loss(iter([batch]), 1)
    assert abs(l_dp - l_zig) < 1e-4
