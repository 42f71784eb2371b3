"""Naive vs flash training attention at the bucketed widths.

The auto rule (ops/attention.py::causal_attention_auto) switches to
flash tiles only ABOVE T=1024, so the bench's bs8/T1024 MFU row runs
naive attention — which materializes (B, H, T, T) f32 scores for the
backward (~268 MB/layer at bs8/T1024).  This measures both paths per
(bs, T) on the real chip to place the threshold empirically.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
       python benchmarks/train_attn_probe.py
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from llmvox_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from llmvox_tpu.ops.attention import causal_attention_auto  # noqa: E402
from llmvox_tpu.train import data as dmod  # noqa: E402
from llmvox_tpu.train.trainer import Trainer, estimate_mfu  # noqa: E402
from llmvox_tpu.utils.config import DecoderConfig, TrainConfig  # noqa: E402


def measure(attn_fn, label, shapes=((8, 512), (8, 1024), (8, 2048))):
    mcfg = DecoderConfig()
    rng = np.random.default_rng(0)
    table = (0.02 * rng.standard_normal(
        (mcfg.text_vocab_size, mcfg.text_embed_dim))).astype(np.float32)
    codebook = (0.02 * rng.standard_normal(
        (max(mcfg.vocab_size, mcfg.eoa_token_id + 1),
         mcfg.speech_embed_dim))).astype(np.float32)
    out = {}
    for bs, t in shapes:
        tcfg = TrainConfig(batch_size=bs, gradient_accumulation_steps=1,
                           eval_interval=10**9)
        tr = Trainer(tcfg, mcfg, table, codebook, attn_fn=attn_fn)
        samples = [dmod.Sample(
            text_ids=rng.integers(0, 384, min(256, t // 2)).astype(np.int32),
            codes=rng.integers(0, mcfg.vocab_size, t - 1).astype(np.int32))
            for _ in range(bs)]
        text_ids, targets = dmod.collate(samples, mcfg, bucket=t)
        tr.step(text_ids, targets)
        tr.step(text_ids, targets)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            tr.step(text_ids, targets)
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times))
        mfu = estimate_mfu(mcfg, tr.n_params, bs * t, dt, seq_len=t)
        print(f"{label} bs{bs} T{t}: {dt * 1e3:.1f} ms "
              f"({bs * t / dt:.0f} tok/s, MFU {100 * mfu:.1f}%)",
              flush=True)
        out[(bs, t)] = dt
        del tr
    return out


def breakdown(bs=8, t=1024):
    """Where does the step's time go — forward, backward, optimizer?"""
    import jax
    import jax.numpy as jnp

    from llmvox_tpu.models import decoder as dec
    from llmvox_tpu.train.data import build_decoder_inputs
    from llmvox_tpu.train.trainer import make_eval_step

    mcfg = DecoderConfig()
    rng = np.random.default_rng(0)
    table = (0.02 * rng.standard_normal(
        (mcfg.text_vocab_size, mcfg.text_embed_dim))).astype(np.float32)
    codebook = (0.02 * rng.standard_normal(
        (max(mcfg.vocab_size, mcfg.eoa_token_id + 1),
         mcfg.speech_embed_dim))).astype(np.float32)
    tcfg = TrainConfig(batch_size=bs, gradient_accumulation_steps=1,
                       eval_interval=10**9)
    tr = Trainer(tcfg, mcfg, table, codebook)
    samples = [dmod.Sample(
        text_ids=rng.integers(0, 384, 256).astype(np.int32),
        codes=rng.integers(0, mcfg.vocab_size, t - 1).astype(np.int32))
        for _ in range(bs)]
    text_ids, targets = dmod.collate(samples, mcfg, bucket=t)
    ti, tg = jnp.asarray(text_ids), jnp.asarray(targets)

    fwd = jax.jit(make_eval_step(mcfg, jnp.bfloat16))

    def grad_only(params, table_, cb, ti_, tg_, key):
        def loss_fn(p):
            emb = build_decoder_inputs(table_, cb, ti_, tg_, mcfg)
            return dec.decoder_loss(p, emb.astype(jnp.bfloat16), tg_,
                                    mcfg, dropout_rng=key, train=True)
        return jax.value_and_grad(loss_fn)(params)

    go = jax.jit(grad_only)

    def timeit(fn, pick, *args, n=5):
        # block_until_ready returns early on the tunnel platform —
        # force the roundtrip by fetching a scalar output per call
        float(np.asarray(pick(fn(*args))).ravel()[0])
        float(np.asarray(pick(fn(*args))).ravel()[0])
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(np.asarray(pick(fn(*args))).ravel()[0])
            times.append(time.perf_counter() - t0)
        return 1e3 * float(np.median(times))

    key = jax.random.PRNGKey(0)
    print("fwd only   :", round(timeit(
        fwd, lambda o: o, tr.state.params, tr.text_table, tr.codebook,
        ti, tg), 1), "ms", flush=True)
    print("fwd+bwd    :", round(timeit(
        go, lambda o: o[0], tr.state.params, tr.text_table, tr.codebook,
        ti, tg, key), 1), "ms", flush=True)
    tr.step(text_ids, targets)   # compile
    tr.step(text_ids, targets)   # steady state
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        tr.step(text_ids, targets)
        times.append(time.perf_counter() - t0)
    print("full step  :", round(1e3 * float(np.median(times)), 1),
          "ms", flush=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "breakdown":
        breakdown()
        return
    naive = measure(None, "auto(naive@1024)")
    flash = measure(partial(causal_attention_auto, flash_threshold=256),
                    "flash")
    for k in naive:
        print(f"bs{k[0]} T{k[1]}: flash/naive = {naive[k] / flash[k]:.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
