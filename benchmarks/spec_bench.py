"""Speculative decode with TRAINED draft heads: the measured speedup.

VERDICT r2 #7 landed the machinery (``models/decoder.py::
decode_block_spec`` — output bit-identical to greedy for any draft
quality) and the MTP trainer losses; what was missing is a measurement
where the heads actually accept.  No real checkpoint ships, so this
trains the DEPLOYED-shape 30M decoder (4L/8H/768, vocab 4096) on-chip on
a synthetic-but-learnable token process — a fixed permutation cycle over
a 64-code subset (``next = (prev + 7) % 64``), pure speech-conditioned
(text all PAD), which the model and all draft heads can learn to
near-determinism in a few hundred steps — then times greedy
``decode_block`` vs ``decode_block_spec`` on the same trained weights.

This is a mechanism benchmark: the ACCEPT RATE on real speech data is a
property of a real checkpoint, but the speedup-per-accept-rate curve and
the verify-forward overhead measured here transfer directly.

``measure_spec`` is imported by the repo-root ``bench.py`` so the
driver-recorded artifact and this standalone harness can't drift.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/spec_bench.py \
      [--steps 400] [--k_draft 4] [--blocks 8]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def make_batch(rng: np.random.Generator, bs: int, t: int, pad: int):
    """Cycle sequences: random start, next = (prev + 7) % 64."""
    start = rng.integers(0, 64, (bs, 1))
    steps = np.arange(t, dtype=np.int64)[None, :]
    targets = ((start + 7 * steps) % 64).astype(np.int32)
    text_ids = np.full((bs, t), pad, np.int32)
    return text_ids, targets


def measure_spec(steps: int = 400, k_draft: int = 4, blocks: int = 8,
                 batch: int = 16, block: int = 32, seq: int = 256,
                 verbose: bool = True, pool_batch: int = 0) -> dict:
    """Train MTP draft heads on the synthetic cycle, then time greedy
    ``decode_block`` vs ``decode_block_spec`` on the trained weights.
    ``pool_batch > 0`` additionally times the POOLED pair —
    ``decode_block_batch`` vs ``decode_block_spec_batch`` at that many
    concurrent rows (the serving pool's shape; ``pooled_*`` keys).
    Returns the result dict (see keys below); asserts nothing — the
    ``greedy_vs_spec_token_mismatches`` key is the bit-exactness check."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import optax

    from llmvox_tpu.models import decoder as dec
    from llmvox_tpu.train.trainer import TrainState, make_train_step
    from llmvox_tpu.utils.config import DecoderConfig

    dev = jax.devices()[0]

    cfg = DecoderConfig(n_draft_heads=k_draft)   # deployed + heads
    cfg = dataclasses.replace(cfg, eoa_token_id=10_000)  # no EOA in cycle
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
        text_ids, targets = make_batch(rng, batch, seq, cfg.pad_token_id)
        key, sub = jax.random.split(key)
        state, loss = step_fn(state, text_table, codebook,
                              jnp.asarray(text_ids), jnp.asarray(targets),
                              sub)
        if verbose and (i % 100 == 0 or i == steps - 1):
            print(f"step {i}: loss {float(loss):.4f}", flush=True)
    train_s = time.time() - t0

    # ---- measure: greedy vs speculative on the trained weights ---------
    sparams = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, state.params)
    del state
    kd, nblocks = k_draft, blocks
    window = jnp.full((block,), cfg.pad_token_id, jnp.int32)
    tlen = jnp.asarray(0, jnp.int32)
    lim = jnp.asarray(block, jnp.int32)

    def greedy_rollout():
        st = dec.init_decode_state(cfg, jnp.bfloat16)
        outs = []
        for _ in range(nblocks):
            toks, _, st = dec.decode_block(sparams, text_table, codebook,
                                           st, window, tlen, lim, cfg,
                                           block=block)
            outs.append(toks)
        return np.asarray(jnp.concatenate(outs))

    def spec_rollout():
        st = dec.init_decode_state(cfg, jnp.bfloat16)
        outs, its = [], []
        for _ in range(nblocks):
            toks, _, st, it = dec.decode_block_spec(
                sparams, text_table, codebook, st, window, tlen, lim,
                cfg, block=block, k_draft=kd)
            outs.append(toks)
            its.append(it)
        # ONE fetch for the whole chained rollout: an int(it) per block
        # would pay a full tunnel RTT per call and swamp the device time
        # (the original version of this bench did exactly that)
        toks = np.asarray(jnp.concatenate(outs))
        return toks, int(sum(int(x) for x in jax.device_get(its)))

    greedy_rollout(); spec_rollout()          # compile
    greedy_rollout(); spec_rollout()          # steady-state executables

    g_times, s_times = [], []
    for _ in range(5):
        t0 = time.perf_counter()
        g_out = greedy_rollout()
        g_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        s_out, iters = spec_rollout()
        s_times.append(time.perf_counter() - t0)

    n_tok = block * nblocks
    g_s, s_s = float(np.median(g_times)), float(np.median(s_times))
    mismatch = int(np.sum(g_out != s_out))

    pooled: dict = {}
    if pool_batch > 0:
        pb = pool_batch
        # match serve/pool.py: the pool force-enables the Pallas batched
        # decode attention on real TPUs, so the greedy baseline here must
        # use it too (the XLA batched flash loop is many times slower —
        # see the DecodePool constructor note); spec's verify forward
        # stays the XLA chunked path either way
        pcfg = dataclasses.replace(
            cfg, use_pallas_attention=(dev.platform != "cpu"))
        pwin = jnp.full((pb, block), cfg.pad_token_id, jnp.int32)
        ptl = jnp.zeros((pb,), jnp.int32)
        plim = jnp.full((pb,), block, jnp.int32)

        def pooled_greedy():
            st = dec.init_decode_state_batch(cfg, pb, jnp.bfloat16)
            outs = []
            for _ in range(nblocks):
                toks, _, st = dec.decode_block_batch(
                    sparams, text_table, codebook, st, pwin, ptl, plim,
                    pcfg, block=block)
                outs.append(toks)
            return np.asarray(jnp.concatenate(outs, axis=1))

        def pooled_spec():
            st = dec.init_decode_state_batch(cfg, pb, jnp.bfloat16)
            outs, its = [], []
            for _ in range(nblocks):
                toks, _, st, it = dec.decode_block_spec_batch(
                    sparams, text_table, codebook, st, pwin, ptl, plim,
                    pcfg, block=block, k_draft=kd)
                outs.append(toks)
                its.append(it)
            toks = np.asarray(jnp.concatenate(outs, axis=1))
            return toks, int(np.max(jax.device_get(jnp.stack(its)).sum(0)))

        pooled_greedy(); pooled_spec()        # compile
        pooled_greedy(); pooled_spec()        # steady-state executables
        pg_t, ps_t = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            pg_out = pooled_greedy()
            pg_t.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            ps_out, piters = pooled_spec()
            ps_t.append(time.perf_counter() - t0)
        pg_s, ps_s = float(np.median(pg_t)), float(np.median(ps_t))
        pooled = {
            "pooled_batch": pb,
            "pooled_greedy_tok_s": round(pb * n_tok / pg_s, 1),
            "pooled_spec_tok_s": round(pb * n_tok / ps_s, 1),
            "pooled_speedup": round(pg_s / ps_s, 2),
            "pooled_iters_per_block_worst_row": round(piters / nblocks, 2),
            "pooled_mismatches": int(np.sum(pg_out != ps_out)),
        }

    return {
        **pooled,
        "model": "deployed 30M decoder + trained MTP heads (synthetic cycle)",
        "final_train_loss": round(float(loss), 4),
        "train_s": round(train_s, 1),
        "k_draft": kd,
        "tokens_per_rollout": n_tok,
        "iters_per_block": round(iters / nblocks, 2),
        "accepted_per_iter": round(n_tok / max(iters, 1), 2),
        "greedy_tok_s": round(n_tok / g_s, 1),
        "spec_tok_s": round(n_tok / s_s, 1),
        "speedup": round(g_s / s_s, 2),
        "greedy_vs_spec_token_mismatches": mismatch,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--k_draft", type=int, default=4)
    ap.add_argument("--blocks", type=int, default=8,
                    help="blocks per measured rollout")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--block", type=int, default=32,
                    help="tokens per device call in the measured rollouts")
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--pool_batch", type=int, default=0,
                    help=">0: also time the pooled (batched) pair at "
                         "this many concurrent rows")
    args = ap.parse_args()

    from llmvox_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    print(json.dumps(measure_spec(
        steps=args.steps, k_draft=args.k_draft, blocks=args.blocks,
        batch=args.batch, block=args.block, seq=args.seq,
        pool_batch=args.pool_batch)))


if __name__ == "__main__":
    main()
