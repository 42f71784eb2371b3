"""Training-stack tests: LR schedule parity, decay mask, input construction,
a short DP training run on the virtual 8-device mesh, checkpoint roundtrip."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from llmvox_tpu.models import decoder as dec
from llmvox_tpu.parallel import create_mesh
from llmvox_tpu.train import data as dmod
from llmvox_tpu.train import optim
from llmvox_tpu.train.trainer import Trainer
from llmvox_tpu.utils.config import DecoderConfig, TrainConfig

TINY = DecoderConfig(n_layer=2, n_head=2, n_embd=32, block_size=64,
                     vocab_size=16, bias=False, text_embed_dim=12,
                     speech_embed_dim=20, text_vocab_size=20,
                     pad_token_id=17, text_eos_id=18, eoa_token_id=7)


def _reference_get_lr(cfg, it):
    """Inline reimplementation of the reference schedule (src/utils.py:105-123)."""
    if not cfg.decay_lr:
        return cfg.learning_rate
    if it < cfg.warmup_iters:
        return cfg.learning_rate * it / cfg.warmup_iters
    if it > cfg.lr_decay_iters:
        return cfg.min_lr
    r = (it - cfg.warmup_iters) / (cfg.lr_decay_iters - cfg.warmup_iters)
    coeff = 0.5 * (1.0 + math.cos(math.pi * r))
    return cfg.min_lr + coeff * (cfg.learning_rate - cfg.min_lr)


def test_lr_schedule_matches_reference():
    cfg = TrainConfig(warmup_iters=10, lr_decay_iters=100,
                      learning_rate=3e-4, min_lr=3e-6)
    sched = optim.lr_schedule(cfg)
    for it in [0, 1, 5, 9, 10, 11, 50, 99, 100, 101, 500]:
        np.testing.assert_allclose(float(sched(it)),
                                   _reference_get_lr(cfg, it), rtol=1e-6)


def test_decay_mask_selects_matmul_weights():
    params = dec.init_decoder_params(jax.random.PRNGKey(0), TINY)
    mask = optim.decay_mask(params)
    assert mask["wpe"] and mask["head"]
    assert mask["h"]["wqkv"] and mask["h"]["wo"]
    assert mask["h"]["wfc"] and mask["h"]["wproj"]
    assert not mask["h"]["ln1_s"] and not mask["h"]["ln2_s"]
    assert not mask["lnf_s"]


def test_collate_and_inputs_match_reference_semantics():
    cfg = TINY
    s1 = dmod.Sample(text_ids=np.array([3, 1, 18], np.int32),
                     codes=np.array([5, 6, 5], np.int32))
    s2 = dmod.Sample(text_ids=np.array([4, 18], np.int32),
                     codes=np.array([2], np.int32))
    text, targets = dmod.collate([s1, s2], cfg, bucket=8)
    assert text.shape == targets.shape == (2, 8)
    # targets: codes then EOA then ignore padding
    assert list(targets[0][:4]) == [5, 6, 5, cfg.eoa_token_id]
    assert (targets[0][4:] == cfg.ignore_index).all()
    assert list(targets[1][:2]) == [2, cfg.eoa_token_id]
    # text: ids then PAD
    assert list(text[0][:3]) == [3, 1, 18]
    assert (text[0][3:] == cfg.pad_token_id).all()

    rng = np.random.default_rng(0)
    table = rng.standard_normal((cfg.text_vocab_size, cfg.text_embed_dim)
                                ).astype(np.float32)
    codebook = rng.standard_normal((max(cfg.vocab_size, cfg.eoa_token_id + 1),
                                    cfg.speech_embed_dim)).astype(np.float32)
    emb = np.asarray(dmod.build_decoder_inputs(
        jnp.asarray(table), jnp.asarray(codebook), jnp.asarray(text),
        jnp.asarray(targets), cfg))
    assert emb.shape == (2, 8, cfg.n_embd)
    # position 0: zero speech feature
    e0 = np.concatenate([table[3], np.zeros(cfg.speech_embed_dim)])
    np.testing.assert_allclose(emb[0, 0], e0 / np.linalg.norm(e0), atol=1e-5)
    # position 1: speech feature of previous code 5
    e1 = np.concatenate([table[1], codebook[5]])
    np.testing.assert_allclose(emb[0, 1], e1 / np.linalg.norm(e1), atol=1e-5)
    # padded region: previous token is EOA
    epad = np.concatenate([table[cfg.pad_token_id],
                           codebook[cfg.eoa_token_id]])
    np.testing.assert_allclose(emb[0, 6], epad / np.linalg.norm(epad),
                               atol=1e-5)
    # all inputs unit-norm
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1),
                               np.ones((2, 8)), atol=1e-5)


@pytest.fixture(scope="module")
def tiny_trainer(tmp_path_factory):
    tcfg = TrainConfig(
        batch_size=8, gradient_accumulation_steps=1, learning_rate=1e-3,
        warmup_iters=2, lr_decay_iters=50, min_lr=1e-5, eval_interval=1000,
        out_dir=str(tmp_path_factory.mktemp("ckpt")), dp_size=-1, tp_size=1)
    rng = np.random.default_rng(1)
    table = rng.standard_normal((TINY.text_vocab_size, TINY.text_embed_dim)
                                ).astype(np.float32)
    codebook = rng.standard_normal((max(TINY.vocab_size, TINY.eoa_token_id + 1),
                                    TINY.speech_embed_dim)).astype(np.float32)
    mesh = create_mesh(dp_size=8, tp_size=1)
    return Trainer(tcfg, TINY, table, codebook, mesh=mesh,
                   compute_dtype=jnp.float32)


def _fake_batches(cfg, bs, rng):
    while True:
        samples = []
        for _ in range(bs):
            n = int(rng.integers(3, 12))
            samples.append(dmod.Sample(
                text_ids=rng.integers(0, 16, n + 2).astype(np.int32),
                codes=(rng.integers(0, cfg.vocab_size, n).astype(np.int32))))
        yield dmod.collate(samples, cfg, bucket=16)


@pytest.mark.slow
def test_training_reduces_loss_on_dp8_mesh(tiny_trainer):
    rng = np.random.default_rng(2)
    batches = _fake_batches(TINY, 8, rng)
    losses = []
    for _ in range(30):
        text_ids, targets = next(batches)
        losses.append(tiny_trainer.step(text_ids, targets))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_checkpoint_roundtrip(tiny_trainer):
    path = tiny_trainer.save_checkpoint()
    before = jax.device_get(tiny_trainer.state.params)
    it = tiny_trainer.iter_num
    # perturb, then restore
    rng = np.random.default_rng(3)
    batches = _fake_batches(TINY, 8, rng)
    text_ids, targets = next(batches)
    tiny_trainer.step(text_ids, targets)
    tiny_trainer.load_checkpoint(path)
    after = jax.device_get(tiny_trainer.state.params)
    assert tiny_trainer.iter_num == it
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)


def test_average_and_partial_checkpoints(tmp_path):
    from llmvox_tpu.train import checkpoint as ck
    t1 = {"a": {"w": np.ones((2, 2), np.float32)},
          "b": [np.full((3,), 2.0, np.float32)]}
    t2 = {"a": {"w": np.full((2, 2), 3.0, np.float32)},
          "b": [np.full((3,), 6.0, np.float32)]}
    p1, p2 = str(tmp_path / "c1.npz"), str(tmp_path / "c2.npz")
    ck.save_params_npz(p1, t1)
    ck.save_params_npz(p2, t2)
    avg = ck.average_checkpoints([p1, p2])
    np.testing.assert_allclose(avg["a"]["w"], 2.0)
    np.testing.assert_allclose(avg["b"][0], 4.0)
    template = {"a": {"w": np.zeros((2, 2), np.float32)},
                "b": [np.zeros((3,), np.float32)]}
    part = ck.load_partial(template, p2, keep=["a"])
    np.testing.assert_allclose(part["a"]["w"], 3.0)
    np.testing.assert_allclose(part["b"][0], 0.0)


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from llmvox_tpu.train import checkpoint as ck
    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
            "nested": {"b": np.ones((4,), np.float32)}}
    path = str(tmp_path / "orbax_ckpt")
    ck.save_orbax(path, tree)
    out = ck.load_orbax(path, template=jax.tree.map(np.zeros_like, tree))
    np.testing.assert_array_equal(out["w"], tree["w"])
    np.testing.assert_array_equal(out["nested"]["b"], tree["nested"]["b"])


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    """The decoder training CLI (reference train.py:47-136 counterpart)
    runs end-to-end on a tiny synthetic dataset."""
    from llmvox_tpu.train import __main__ as train_main
    from llmvox_tpu.train.data import Sample, save_prepared

    rng = np.random.default_rng(0)
    samples = [Sample(text_ids=rng.integers(0, 384, 12).astype(np.int32),
                      codes=rng.integers(0, 16, 20).astype(np.int32))
               for _ in range(4)]
    data = tmp_path / "data.npz"
    save_prepared(str(data), samples)

    out = tmp_path / "out"
    train_main.main([
        "--data_path", str(data), "--out_dir", str(out),
        "--max_iters", "3", "--batch_size", "2", "--dp_size", "2",
        "--gradient_accumulation_steps", "1",
        "--eval_interval", "2", "--eval_iters", "1", "--log_interval", "1",
        "--bucket", "32",
        # tiny model
        "--n_layer", "2", "--n_head", "2", "--n_embd", "32",
        "--block_size", "64", "--vocab_size", "16",
        "--text_embed_dim", "12", "--speech_embed_dim", "20",
        "--eoa_token_id", "15",
    ])
    assert any(out.iterdir())


@pytest.mark.slow
def test_grad_accumulation_matches_big_batch():
    """optax.MultiSteps(k) over k micro-batches == one k-times-bigger
    batch step (reference grad-accum semantics, train.py:353-365)."""
    import dataclasses
    from llmvox_tpu.train.trainer import Trainer
    from llmvox_tpu.utils.config import DecoderConfig, TrainConfig

    mcfg = DecoderConfig(n_layer=1, n_head=2, n_embd=32, block_size=32,
                         vocab_size=16, text_embed_dim=12,
                         speech_embed_dim=20, eoa_token_id=15)
    base = TrainConfig(batch_size=4, gradient_accumulation_steps=1,
                       dp_size=1, dtype="float32", grad_clip=0.0,
                       warmup_iters=0, lr_decay_iters=100)
    accum = dataclasses.replace(base, batch_size=2,
                                gradient_accumulation_steps=2)
    rng = np.random.default_rng(0)
    table = (0.02 * rng.standard_normal((mcfg.text_vocab_size,
                                         mcfg.text_embed_dim))
             ).astype(np.float32)
    cb = (0.02 * rng.standard_normal((16, mcfg.speech_embed_dim))
          ).astype(np.float32)
    text = rng.integers(0, 384, (4, 16)).astype(np.int32)
    tgt = rng.integers(0, 16, (4, 16)).astype(np.int32)

    tr_big = Trainer(base, mcfg, table, cb)
    tr_acc = Trainer(accum, mcfg, table, cb)
    # same init params
    tr_acc.state = tr_acc.state._replace(params=jax.device_put(
        jax.device_get(tr_big.state.params)))
    tr_big.step(text, tgt)
    tr_acc.step(text[:2], tgt[:2])
    tr_acc.step(text[2:], tgt[2:])
    pa = jax.device_get(tr_big.state.params)
    pb = jax.device_get(tr_acc.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(pa),
                    jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-4)


def test_mfu_accounts_for_log_interval():
    """Regression (VERDICT r1 weak #6): with log_interval > 1, dt spans
    log_interval iterations, so the token count in the MFU formula must be
    scaled by the same factor — the reported MFU equals the per-step rate."""
    from llmvox_tpu.train.trainer import Trainer, estimate_mfu
    from llmvox_tpu.utils.config import TrainConfig
    import llmvox_tpu.train.trainer as trmod

    tcfg = TrainConfig(batch_size=2, gradient_accumulation_steps=1,
                       dp_size=1, eval_interval=1000, log_interval=2,
                       warmup_iters=1, lr_decay_iters=10)
    rng = np.random.default_rng(0)
    table = rng.standard_normal((TINY.text_vocab_size, TINY.text_embed_dim)
                                ).astype(np.float32)
    cb = rng.standard_normal((max(TINY.vocab_size, TINY.eoa_token_id + 1),
                              TINY.speech_embed_dim)).astype(np.float32)
    tr = Trainer(tcfg, TINY, table, cb, compute_dtype=jnp.float32)

    # deterministic clock + step: each step takes exactly 1 fake second
    clock = {"t": 0.0}

    def fake_step(text_ids, targets):
        clock["t"] += 1.0
        tr.iter_num += 1
        return 0.0

    tr.step = fake_step
    real_time = trmod.time.time
    trmod.time = type("T", (), {"time": staticmethod(lambda: clock["t"])})
    try:
        b, t = 2, 16
        batches = iter([(np.zeros((b, t), np.int32),
                         np.zeros((b, t), np.int32))] * 4)
        logged = []

        class Cap:
            def log(self, it, d):
                logged.append((it, d))

        tr.train(batches, max_iters=4, log=lambda *a: None, logger=Cap())
    finally:
        trmod.time = __import__("time")
        assert real_time  # silence lint

    mfus = [d["mfu"] for _, d in logged if "mfu" in d]
    assert len(mfus) == 2  # logged at iters 2 and 4
    # seq_len = the batch's actual T (r5: the attention term follows the
    # step's real width, not cfg.block_size — see estimate_mfu)
    expect = estimate_mfu(TINY, tr.n_params, b * t, 1.0, seq_len=t)
    for m in mfus:
        np.testing.assert_allclose(m, expect, rtol=1e-6)


def test_remat_layers_matches_non_remat():
    """remat_layers (jax.checkpoint per block) must not change the math —
    same loss and grads, just less backward memory (the bs8/T8192 OOM
    fix; VERDICT r1 #6)."""
    import dataclasses
    from llmvox_tpu.models import decoder as dec2

    cfg = TINY
    rcfg = dataclasses.replace(TINY, remat_layers=True)
    params = dec2.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((2, 12, cfg.n_embd)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)), jnp.int32)

    def loss_fn(c):
        return lambda p: dec2.decoder_loss(p, emb, tgt, c, train=False)

    l0, g0 = jax.value_and_grad(loss_fn(cfg))(params)
    l1, g1 = jax.value_and_grad(loss_fn(rcfg))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)
