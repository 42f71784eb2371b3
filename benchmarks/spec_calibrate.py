"""Speculative-decode accept-rate calibration on REALISTIC drafts.

VERDICT r3 #8: the cycle benchmark (spec_bench.py) trains heads on a
DETERMINISTIC process, so accepts saturate at k — an upper bound that
says nothing about where to SET k.  Real speech codes are only partially
predictable; what picks ``k_draft`` is the accept-vs-k curve on drafts of
realistic quality.

This harness trains the deployed-shape 30M decoder + ``n_heads`` MTP
draft heads through the SAME e2e train step the production trainer uses
(train/trainer.py::make_train_step with ``DecoderConfig.n_draft_heads``),
on a noisy Markov code process:

    next = (5*prev + 7) % 64   w.p. 1 - noise,   else uniform(64)

The learnable backbone stands in for the predictable component of speech
codes; ``noise`` sets the information-theoretic accept ceiling — head j
(predicting j+1 ahead) can be right w.p. at most ``(1-noise)^(j+1)``, so
``E[accepted/iter] <= sum_j (1-noise)^j`` regardless of training.  That
gives the curve the shape a real checkpoint shows: accepts saturate
around 1/noise while each extra k still widens the verify forward and
drafts more wasted tokens, so tok/s PEAKS at a finite k and falls past
it.  The served default (utils/config.py ``spec_k_draft``) derives from
this curve; a real checkpoint re-runs this sweep with its own data via
``--noise``-free offline codes (the sweep function takes any batch
maker).

One training run at ``n_heads`` serves every swept k: decode-time
``k_draft`` just slices ``params["draft_heads"][:k]``.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/spec_calibrate.py \
      [--steps 300] [--noise 0.25] [--ks 2,4,8,12,16]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_noisy_batch(rng: np.random.Generator, bs: int, t: int, pad: int,
                     noise: float):
    """Noisy Markov sequences over a 64-code subset (module docstring)."""
    codes = np.empty((bs, t), np.int64)
    codes[:, 0] = rng.integers(0, 64, bs)
    flip = rng.random((bs, t)) < noise
    rand = rng.integers(0, 64, (bs, t))
    for i in range(1, t):
        det = (5 * codes[:, i - 1] + 7) % 64
        codes[:, i] = np.where(flip[:, i], rand[:, i], det)
    text_ids = np.full((bs, t), pad, np.int32)
    return text_ids, codes.astype(np.int32)


def calibrate(steps: int = 300, noise: float = 0.25, n_heads: int = 16,
              ks=(2, 4, 8, 12, 16), blocks: int = 4, batch: int = 16,
              block: int = 64, seq: int = 256, reps: int = 3,
              verbose: bool = True) -> dict:
    """Train once with ``n_heads`` draft heads on the noisy process, then
    sweep decode-time k: accepted/iter, tok/s and speedup vs the greedy
    baseline, plus the curve's argmax (``best_k``).  Bit-exactness vs
    greedy is asserted per k (``mismatches`` in each row)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from llmvox_tpu.models import decoder as dec
    from llmvox_tpu.train.trainer import TrainState, make_train_step
    from llmvox_tpu.utils.config import DecoderConfig

    dev = jax.devices()[0]
    cfg = DecoderConfig(n_draft_heads=n_heads,
                        use_pallas_attention=(dev.platform != "cpu"))
    cfg = dataclasses.replace(cfg, eoa_token_id=10_000)
    params = dec.init_decoder_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    text_table = jnp.asarray(0.02 * rng.standard_normal(
        (cfg.text_vocab_size, cfg.text_embed_dim)).astype(np.float32))
    codebook = jnp.asarray(rng.standard_normal(
        (cfg.vocab_size, 512)).astype(np.float32))

    tx = optax.adamw(3e-4, b1=0.9, b2=0.95, weight_decay=0.0)
    step_fn = jax.jit(make_train_step(cfg, tx, jnp.bfloat16),
                      donate_argnums=(0,))
    state = TrainState(jax.device_put(params, dev),
                       jax.jit(tx.init)(params), jnp.int32(0))
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    loss = None
    for i in range(steps):
        text_ids, targets = make_noisy_batch(rng, batch, seq,
                                             cfg.pad_token_id, noise)
        key, sub = jax.random.split(key)
        state, loss = step_fn(state, text_table, codebook,
                              jnp.asarray(text_ids), jnp.asarray(targets),
                              sub)
        if verbose and (i % 100 == 0 or i == steps - 1):
            print(f"step {i}: loss {float(loss):.4f}", flush=True)
    train_s = time.time() - t0

    sparams = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, state.params)
    del state
    window = jnp.full((block,), cfg.pad_token_id, jnp.int32)
    tlen = jnp.asarray(0, jnp.int32)
    lim = jnp.asarray(block, jnp.int32)
    n_tok = block * blocks

    def greedy_rollout():
        st = dec.init_decode_state(cfg, jnp.bfloat16)
        outs = []
        for _ in range(blocks):
            toks, _, st = dec.decode_block(sparams, text_table, codebook,
                                           st, window, tlen, lim, cfg,
                                           block=block)
            outs.append(toks)
        return np.asarray(jnp.concatenate(outs))

    def spec_rollout(kd: int):
        st = dec.init_decode_state(cfg, jnp.bfloat16)
        outs, its = [], []
        for _ in range(blocks):
            toks, _, st, it = dec.decode_block_spec(
                sparams, text_table, codebook, st, window, tlen, lim,
                cfg, block=block, k_draft=kd)
            outs.append(toks)
            its.append(it)
        toks = np.asarray(jnp.concatenate(outs))
        return toks, int(sum(int(x) for x in jax.device_get(its)))

    greedy_rollout()
    greedy_rollout()
    g_times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        g_out = greedy_rollout()
        g_times.append(time.perf_counter() - t0)
    g_s = float(np.median(g_times))

    curve = []
    for kd in ks:
        kd = min(int(kd), n_heads)
        spec_rollout(kd)
        spec_rollout(kd)
        s_times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            s_out, iters = spec_rollout(kd)
            s_times.append(time.perf_counter() - t0)
        s_s = float(np.median(s_times))
        row = {
            "k": kd,
            "accepted_per_iter": round(n_tok / max(iters, 1) - 1, 2),
            "iters_per_block": round(iters / blocks, 2),
            "tok_s": round(n_tok / s_s, 1),
            "speedup": round(g_s / s_s, 2),
            "mismatches": int(np.sum(g_out != s_out)),
        }
        curve.append(row)
        if verbose:
            print(json.dumps(row), flush=True)

    # Decision stability (VERDICT r4 #4: best_k flipped 8<->12 between
    # runs at noise level): prefer the SMALLEST k unless a larger one is
    # >3% faster — ties and noise-level differences resolve to the
    # cheaper verify width.
    best = curve[0]
    for r in curve[1:]:
        if r["tok_s"] > 1.03 * best["tok_s"]:
            best = r
    return {
        "model": "deployed 30M decoder + trained MTP heads",
        "process": f"noisy Markov, noise={noise}",
        "accept_ceiling_per_iter": round(
            float(sum((1 - noise) ** j for j in range(1, n_heads + 1))), 2),
        "final_train_loss": round(float(loss), 4),
        "train_s": round(train_s, 1),
        "greedy_tok_s": round(n_tok / g_s, 1),
        "curve": curve,
        "best_k": best["k"],
        "best_speedup": best["speedup"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--noise", type=float, default=0.25)
    ap.add_argument("--n_heads", type=int, default=16)
    ap.add_argument("--ks", type=str, default="2,4,8,12,16")
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from llmvox_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    print(json.dumps(calibrate(
        steps=args.steps, noise=args.noise, n_heads=args.n_heads,
        ks=tuple(int(k) for k in args.ks.split(",")), blocks=args.blocks,
        block=args.block, reps=args.reps)))


if __name__ == "__main__":
    main()
