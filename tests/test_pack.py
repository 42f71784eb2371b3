"""Sequence packing (train/data.py::collate_packed + the segment plumbing
through ops/attention.py and models/decoder.py) — VERDICT r3 #2.

The reference pads every batch row to the longest sample
(/root/reference/src/data.py:154-236), so short-sentence batches carry
dead pad FLOPs through the whole step; packing fills each row with whole
sentences under a block-diagonal-causal mask.  Correctness bar: a packed
batch must produce EXACTLY the loss of its unpacked twin — same
attention visibility (segments), same positional rows (pos_ids), same
prev-code input reset, same MTP shift masking.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmvox_tpu.models import decoder as dec
from llmvox_tpu.ops.attention import (causal_attention,
                                      flash_causal_attention)
from llmvox_tpu.train.data import (PackedBatchIterator, Sample,
                                   build_decoder_inputs, collate,
                                   collate_packed)
from llmvox_tpu.utils.config import DecoderConfig

CFG = DecoderConfig(n_layer=2, n_head=4, n_embd=64, block_size=64,
                    vocab_size=32, text_vocab_size=40, text_embed_dim=16,
                    speech_embed_dim=48, dropout=0.0,
                    pad_token_id=36, text_eos_id=37, eoa_token_id=31)


def _samples(rng, n, lo=4, hi=14):
    out = []
    for _ in range(n):
        nc = int(rng.integers(lo, hi))
        out.append(Sample(
            text_ids=rng.integers(0, 40, (nc + 1,)).astype(np.int32),
            codes=rng.integers(0, 30, (nc,)).astype(np.int32)))
    return out


def test_collate_packed_layout_and_leftover():
    rng = np.random.default_rng(0)
    samples = _samples(rng, 6, lo=5, hi=9)
    text, targets, seg, pos, left = collate_packed(samples, CFG, rows=2,
                                                   seq_len=16)
    assert text.shape == targets.shape == seg.shape == pos.shape == (2, 16)
    # segments are 1..n runs; padding is 0 with ignore_index targets
    for r in range(2):
        ids = seg[r][seg[r] > 0]
        assert list(ids) == sorted(ids)
        assert (targets[r][seg[r] == 0] == CFG.ignore_index).all()
        # per-segment: positions restart at 0, last target is EOA
        for s in np.unique(ids):
            span = np.where(seg[r] == s)[0]
            assert (pos[r][span] == np.arange(len(span))).all()
            assert targets[r][span[-1]] == CFG.eoa_token_id
    # conservation: every sample is either placed or left over
    placed = int((seg > 0).sum())
    assert placed + sum(min(len(s.codes) + 1, 16) for s in left) \
        == sum(min(len(s.codes) + 1, 16) for s in samples)


def test_packed_loss_equals_unpacked_twin():
    """Two short sentences packed into one row == the same two sentences
    as two unpacked rows: identical masked-CE (sum/count over the same
    valid positions, identical per-position logits)."""
    rng = np.random.default_rng(1)
    samples = _samples(rng, 2, lo=5, hi=8)
    params = dec.init_decoder_params(jax.random.PRNGKey(0), CFG)
    table = 0.02 * np.random.default_rng(2).standard_normal(
        (CFG.text_vocab_size, CFG.text_embed_dim)).astype(np.float32)
    codebook = np.random.default_rng(3).standard_normal(
        (CFG.eoa_token_id + 1, CFG.speech_embed_dim)).astype(np.float32)

    n_total = sum(len(s.codes) + 1 for s in samples)
    text_p, tgt_p, seg, pos, left = collate_packed(
        samples, CFG, rows=1, seq_len=n_total)
    assert not left and (seg > 0).all()

    def loss_packed():
        emb = build_decoder_inputs(jnp.asarray(table), jnp.asarray(codebook),
                                   jnp.asarray(text_p), jnp.asarray(tgt_p),
                                   CFG, pos_ids=jnp.asarray(pos))
        return float(dec.decoder_loss(params, emb, jnp.asarray(tgt_p), CFG,
                                      train=False,
                                      positions=jnp.asarray(pos),
                                      segments=jnp.asarray(seg)))

    # unpacked twin: bucket=1 => exact max-length rows, no extra padding
    text_u, tgt_u = collate(samples, CFG, bucket=1)
    emb_u = build_decoder_inputs(jnp.asarray(table), jnp.asarray(codebook),
                                 jnp.asarray(text_u), jnp.asarray(tgt_u),
                                 CFG)
    want = float(dec.decoder_loss(params, emb_u, jnp.asarray(tgt_u), CFG,
                                  train=False))
    assert loss_packed() == pytest.approx(want, rel=1e-5)


def test_packed_loss_with_draft_heads_masks_cross_sentence_shift():
    """MTP aux targets shifted past a sentence boundary must be ignored:
    packed loss with draft heads == the unpacked twin's loss (whose
    shifted targets fall into ignore_index padding at row ends)."""
    cfg = dataclasses.replace(CFG, n_draft_heads=2)
    rng = np.random.default_rng(4)
    samples = _samples(rng, 2, lo=6, hi=9)
    params = dec.init_decoder_params(jax.random.PRNGKey(1), cfg)
    table = 0.02 * np.random.default_rng(5).standard_normal(
        (cfg.text_vocab_size, cfg.text_embed_dim)).astype(np.float32)
    codebook = np.random.default_rng(6).standard_normal(
        (cfg.eoa_token_id + 1, cfg.speech_embed_dim)).astype(np.float32)

    n_total = sum(len(s.codes) + 1 for s in samples)
    text_p, tgt_p, seg, pos, _ = collate_packed(samples, cfg, rows=1,
                                                seq_len=n_total)
    emb_p = build_decoder_inputs(jnp.asarray(table), jnp.asarray(codebook),
                                 jnp.asarray(text_p), jnp.asarray(tgt_p),
                                 cfg, pos_ids=jnp.asarray(pos))
    got = float(dec.decoder_loss(params, emb_p, jnp.asarray(tgt_p), cfg,
                                 train=False, positions=jnp.asarray(pos),
                                 segments=jnp.asarray(seg)))

    text_u, tgt_u = collate(samples, cfg, bucket=1)
    emb_u = build_decoder_inputs(jnp.asarray(table), jnp.asarray(codebook),
                                 jnp.asarray(text_u), jnp.asarray(tgt_u),
                                 cfg)
    want = float(dec.decoder_loss(params, emb_u, jnp.asarray(tgt_u), cfg,
                                  train=False))
    # NOT exact: the unpacked twin's rows differ in length, so the
    # per-head valid sets match only when both rows pad to the same T —
    # bucket=1 gives T = max(len); shifted targets beyond each row's own
    # end are ignore_index in both layouts, so the sets DO match.
    assert got == pytest.approx(want, rel=1e-5)


def test_flash_segmented_matches_naive_segmented():
    """The tiled flash path with segments == the naive masked softmax at
    a flash-sized T (the training path packing actually runs)."""
    rng = np.random.default_rng(7)
    b, t, h, d = 2, 2048, 2, 16
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    # random segment runs incl. trailing padding zeros
    seg = np.zeros((b, t), np.int32)
    for r in range(b):
        o, s = 0, 1
        while o < t - 100:
            n = int(rng.integers(50, 400))
            seg[r, o: o + n] = s
            o += n
            s += 1
    seg = jnp.asarray(seg)
    want = causal_attention(q, k, v, segments=seg)
    got = flash_causal_attention(q, k, v, segments=seg, unroll_q=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-4)
    got2 = flash_causal_attention(q, k, v, segments=seg)   # scanned path
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               atol=2e-5, rtol=2e-4)


def test_packed_iterator_fixed_shape_and_coverage():
    rng = np.random.default_rng(8)
    samples = _samples(rng, 37, lo=4, hi=20)

    class DS:
        def __init__(self, s):
            self.samples = s

        def __len__(self):
            return len(self.samples)

        def __getitem__(self, i):
            return self.samples[i]

    it = iter(PackedBatchIterator(DS(samples), CFG, rows=2, seq_len=64,
                                  seed=0))
    total = 0
    for _ in range(12):
        text, targets, seg, pos, = next(it)
        assert text.shape == (2, 64)
        total += int((seg > 0).sum())
    want_epoch = sum(min(len(s.codes) + 1, 64) for s in samples)
    # 12 batches at >=50% occupancy must have consumed beyond one epoch
    assert total > want_epoch


def test_train_cli_pack_smoke(tmp_path):
    """`python -m llmvox_tpu.train --pack` runs end to end on a tiny
    synthetic dataset (the packed counterpart of test_train.py's CLI
    smoke)."""
    from llmvox_tpu.train import __main__ as train_main
    from llmvox_tpu.train.data import save_prepared

    rng = np.random.default_rng(10)
    samples = [Sample(text_ids=rng.integers(0, 384, 10).astype(np.int32),
                      codes=rng.integers(0, 15, int(n)).astype(np.int32))
               for n in rng.integers(6, 18, 10)]
    data = tmp_path / "data.npz"
    save_prepared(str(data), samples)

    out = tmp_path / "out"
    train_main.main([
        "--data_path", str(data), "--out_dir", str(out),
        "--max_iters", "3", "--batch_size", "2", "--dp_size", "2",
        "--gradient_accumulation_steps", "1",
        "--eval_interval", "2", "--eval_iters", "1", "--log_interval", "1",
        "--pack", "--pack_len", "64",
        "--n_layer", "2", "--n_head", "2", "--n_embd", "32",
        "--block_size", "64", "--vocab_size", "16",
        "--text_embed_dim", "12", "--speech_embed_dim", "20",
        "--eoa_token_id", "15",
    ])
    assert any(out.iterdir())


def test_trainer_packed_step_runs_and_loss_decreases():
    """End to end through Trainer.step with (seg, pos) batches on the
    8-device mesh: the packed program compiles, shards, and learns."""
    from llmvox_tpu.train.trainer import Trainer
    from llmvox_tpu.utils.config import TrainConfig

    tcfg = TrainConfig(dp_size=2, tp_size=1, learning_rate=3e-3,
                       warmup_iters=0, lr_decay_iters=40, min_lr=3e-4)
    rng = np.random.default_rng(9)
    table = 0.02 * rng.standard_normal(
        (CFG.text_vocab_size, CFG.text_embed_dim)).astype(np.float32)
    codebook = rng.standard_normal(
        (CFG.eoa_token_id + 1, CFG.speech_embed_dim)).astype(np.float32)
    trainer = Trainer(tcfg, CFG, table, codebook)

    samples = _samples(rng, 16, lo=4, hi=12)
    text, targets, seg, pos, _ = collate_packed(samples, CFG, rows=2,
                                                seq_len=64)
    first = trainer.step(text, targets, seg, pos)
    for _ in range(14):
        last = trainer.step(text, targets, seg, pos)
    assert np.isfinite(first) and last < first
