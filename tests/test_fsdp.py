"""FSDP/ZeRO-3-style sharded training state on the virtual 8-device mesh.

With ``TrainConfig.fsdp``, decoder parameters and Adam moments shard over
dp (parallel/sharding.py::decoder_fsdp_shardings); XLA derives the
per-layer all-gather / gradient reduce-scatter schedule from the
annotations.  Sharding must be invisible in the math: same loss as the
replicated trainer, training works, checkpoints roundtrip.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmvox_tpu.parallel.mesh import DP_AXIS
from llmvox_tpu.train import data as dmod
from llmvox_tpu.train.trainer import Trainer
from llmvox_tpu.utils.config import DecoderConfig, TrainConfig

TINY = DecoderConfig(n_layer=2, n_head=2, n_embd=32, block_size=64,
                     vocab_size=16, bias=False, text_embed_dim=12,
                     speech_embed_dim=20, text_vocab_size=20,
                     pad_token_id=17, text_eos_id=18, eoa_token_id=7)


def _trainer(tmp, fsdp):
    tcfg = TrainConfig(batch_size=8, gradient_accumulation_steps=1,
                       learning_rate=1e-3, warmup_iters=2,
                       lr_decay_iters=50, min_lr=1e-5, eval_interval=1000,
                       out_dir=tmp, dp_size=8, tp_size=1, fsdp=fsdp)
    rng = np.random.default_rng(1)
    table = rng.standard_normal(
        (TINY.text_vocab_size, TINY.text_embed_dim)).astype(np.float32)
    codebook = rng.standard_normal(
        (max(TINY.vocab_size, TINY.eoa_token_id + 1),
         TINY.speech_embed_dim)).astype(np.float32)
    return Trainer(tcfg, TINY, table, codebook, compute_dtype=jnp.float32)


def _fake_batches(cfg, bs, rng):
    while True:
        samples = []
        for _ in range(bs):
            n = int(rng.integers(3, 12))
            samples.append(dmod.Sample(
                text_ids=rng.integers(0, 16, n + 2).astype(np.int32),
                codes=rng.integers(0, cfg.vocab_size, n).astype(np.int32)))
        yield dmod.collate(samples, cfg, bucket=16)


def test_fsdp_params_and_moments_are_sharded(tmp_path):
    tr = _trainer(str(tmp_path), fsdp=True)
    w = tr.state.params["h"]["wqkv"]
    assert DP_AXIS in tuple(w.sharding.spec)
    # the addressable shard is 1/8 of the array (dp=8 splits dim 1)
    assert w.addressable_shards[0].data.shape[1] * 8 == w.shape[1]
    # Adam moments inherited the sharding through tx.init propagation
    mu = [x for x in jax.tree.leaves(tr.state.opt_state)
          if hasattr(x, "shape") and x.shape == w.shape]
    assert mu and all(
        m.addressable_shards[0].data.shape[1] * 8 == w.shape[1] for m in mu)


def test_fsdp_same_loss_as_replicated(tmp_path):
    t_rep = _trainer(str(tmp_path / "rep"), fsdp=False)
    t_fsdp = _trainer(str(tmp_path / "fsdp"), fsdp=True)
    batch = next(_fake_batches(TINY, 8, np.random.default_rng(2)))
    l_rep = t_rep.estimate_loss(iter([batch]), 1)
    l_fsdp = t_fsdp.estimate_loss(iter([batch]), 1)
    assert abs(l_rep - l_fsdp) < 1e-4
    # one train step: the sharded update tracks the replicated one
    s_rep = t_rep.step(*batch)
    s_fsdp = t_fsdp.step(*batch)
    assert abs(s_rep - s_fsdp) < 1e-4


def test_fsdp_checkpoint_roundtrip(tmp_path):
    tr = _trainer(str(tmp_path), fsdp=True)
    batches = _fake_batches(TINY, 8, np.random.default_rng(3))
    for _ in range(3):
        tr.step(*next(batches))
    probe = next(batches)
    before = tr.estimate_loss(iter([probe]), 1)
    path = tr.save_checkpoint("fsdp_ck")

    tr2 = _trainer(str(tmp_path), fsdp=True)
    tr2.load_checkpoint(path)
    after = tr2.estimate_loss(iter([probe]), 1)
    assert abs(before - after) < 1e-5
    # restored params kept the dp sharding
    w = tr2.state.params["h"]["wqkv"]
    assert DP_AXIS in tuple(w.sharding.spec)
    # and training continues from the restored state
    tr2.step(*next(batches))


@pytest.mark.slow
def test_fsdp_training_reduces_loss(tmp_path):
    tr = _trainer(str(tmp_path), fsdp=True)
    rng = np.random.default_rng(4)
    batches = _fake_batches(TINY, 8, rng)
    losses = [tr.step(*next(batches)) for _ in range(30)]
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_fsdp_composes_with_tp_and_sp(tmp_path):
    """The full composition on one 8-device mesh — dp=2 x sp=2 x tp=2
    with FSDP sharding params+moments over dp and tp taking the other
    matrix dim (ZeRO-3 + Megatron + ring attention in one train step):
    loss equals the replicated trainer's and training proceeds."""
    tcfg = TrainConfig(batch_size=8, gradient_accumulation_steps=1,
                       learning_rate=1e-3, warmup_iters=2,
                       lr_decay_iters=50, min_lr=1e-5, eval_interval=1000,
                       out_dir=str(tmp_path), dp_size=2, tp_size=2,
                       sp_size=2, fsdp=True)
    rng = np.random.default_rng(1)      # same tables as _trainer()
    table = rng.standard_normal(
        (TINY.text_vocab_size, TINY.text_embed_dim)).astype(np.float32)
    codebook = rng.standard_normal(
        (max(TINY.vocab_size, TINY.eoa_token_id + 1),
         TINY.speech_embed_dim)).astype(np.float32)
    tr = Trainer(tcfg, TINY, table, codebook, compute_dtype=jnp.float32)
    # params shard BOTH dims: dp on one matrix axis, tp on the other
    w = tr.state.params["h"]["wqkv"]
    spec = tuple(w.sharding.spec)
    assert DP_AXIS in spec and "tp" in spec
    shard = w.addressable_shards[0].data.shape
    assert shard[1] * 2 == w.shape[1] and shard[2] * 2 == w.shape[2]

    t_rep = _trainer(str(tmp_path / "rep"), fsdp=False)
    batch = next(_fake_batches(TINY, 8, np.random.default_rng(12)))
    l_rep = t_rep.estimate_loss(iter([batch]), 1)
    l_mix = tr.estimate_loss(iter([batch]), 1)
    assert abs(l_rep - l_mix) < 1e-4
    losses = [tr.step(*next(_fake_batches(TINY, 8,
                                          np.random.default_rng(13))))
              for _ in range(3)]
    assert all(np.isfinite(losses))
