"""Pooled LLM speculative decode with TRAINED draft heads: the measurement.

The speech decoder's pooled speculation needed two rounds of kernel work
to win (XLA verify 0.67x -> per-query Pallas 1.17x -> MXU Pallas 1.72x,
see benchmarks/spec_bench.py and STATUS.md); this harness asks the same
question for the LLM pool's ``models/llama.py::decode_block_spec_pooled``
(landed token-exact in tests/test_llama_spec.py, never timed on silicon).

Same mechanism-benchmark design as spec_bench.py: no real checkpoint
ships, so a bench-shape byte-Llama (the 30M-class config bench.py serves)
trains on-chip on a deterministic permutation cycle (next = (prev+7)%64
over a 64-token subset) until the model and all MTP draft heads predict
it near-perfectly, then the pooled greedy block and the pooled
speculative block are timed on the same trained weights.  The accept
rate on real text is a property of a real checkpoint; the verify-forward
overhead and the speedup-per-accept curve measured here transfer.

``measure_llama_spec`` is imported by the repo-root ``bench.py`` so the
driver-recorded artifact and this standalone harness can't drift.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/llama_spec_bench.py \
      [--steps 300] [--k_draft 8] [--batch 8] [--blocks 6] [--block 32]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def cycle_batch(rng: np.random.Generator, bs: int, t: int) -> np.ndarray:
    """(bs, t) int32 cycle sequences: random start, next = (prev+7) % 64,
    shifted +1 so token 0 stays a never-seen pad."""
    start = rng.integers(0, 64, (bs, 1))
    steps = np.arange(t, dtype=np.int64)[None, :]
    return (1 + (start + 7 * steps) % 64).astype(np.int32)


def measure_llama_spec(steps: int = 300, k_draft: int = 8, blocks: int = 6,
                       batch: int = 8, block: int = 32,
                       train_batch: int = 32, train_seq: int = 256,
                       verbose: bool = True, moe: bool = False) -> dict:
    """Train MTP draft heads on the cycle, then time
    ``decode_block_pooled`` vs ``decode_block_spec_pooled`` at ``batch``
    concurrent rows (the LLM pool's serving shape).  Returns the result
    dict; the ``mismatches`` key is the live token-exactness check.

    ``moe=True`` swaps the dense FFN for an E=8/top-2 MoE (VERDICT r4
    #8): the verify forward at T=k_draft+1 must keep the drop-free
    routing invariant (proven in tests/test_llama_spec.py) AND still
    pay off in wall clock — this is the artifact row for that."""
    import jax
    import jax.numpy as jnp
    import optax

    from llmvox_tpu.models import llama

    dev = jax.devices()[0]

    # bench.py's served 30M-class byte-llama, plus draft heads.
    # moe: GShard token groups bound the dense-dispatch tensors and the
    # head-training batch drops to fit one chip (the bs32 MoE train step
    # wanted 46 GB of HBM at compile)
    moe_kw = dict(n_experts=8, moe_top_k=2, moe_group_size=256) if moe else {}
    if moe:
        # bs4: the E=8 train step must also fit WITH bench.py's resident
        # engines (bs8 fit standalone but OOMed in-context, r5)
        train_batch = min(train_batch, 4)
    cfg = llama.LlamaConfig(vocab_size=384, n_layer=8, n_head=8,
                            n_kv_head=4, n_embd=512,
                            intermediate_size=1408, max_seq_len=1024,
                            n_draft_heads=k_draft, **moe_kw)
    params = llama.init_llama_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    tx = optax.adamw(3e-4, b1=0.9, b2=0.95, weight_decay=0.0)

    @jax.jit
    def train_step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(llama.llama_loss)(
            params, tokens, cfg)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    opt_state = jax.jit(tx.init)(jax.device_put(params, dev))
    params = jax.device_put(params, dev)
    t0 = time.time()
    loss = None
    for i in range(steps):
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(cycle_batch(rng, train_batch,
                                                       train_seq)))
        if verbose and (i % 100 == 0 or i == steps - 1):
            print(f"step {i}: loss {float(loss):.4f}", flush=True)
    train_s = time.time() - t0
    del opt_state

    sparams = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    del params

    # ---- pooled rollouts on the trained weights -------------------------
    prompt_len = 32
    prompts = cycle_batch(rng, batch, prompt_len)
    active = jnp.ones((batch,), jnp.bool_)
    attn = next(b for b in llama.attn_window_ladder(cfg.max_seq_len)
                if b >= prompt_len + blocks * block + k_draft + 1)

    def fresh_state():
        st = llama.init_llama_pool_state(cfg, batch, jnp.bfloat16)
        _, st = llama.prefill_slots(
            sparams, jnp.asarray(prompts),
            jnp.full((batch,), prompt_len, jnp.int32), st,
            jnp.arange(batch, dtype=jnp.int32), active,
            jax.random.PRNGKey(3), cfg)
        return st

    def greedy_rollout():
        st = fresh_state()
        outs = []
        for _ in range(blocks):
            toks, st = llama.decode_block_pooled(
                sparams, st, active, jax.random.PRNGKey(0), cfg,
                block=block, attn_len=attn)
            outs.append(toks)
        return np.asarray(jnp.concatenate(outs, axis=1))

    def spec_rollout():
        st = fresh_state()
        outs, its = [], []
        for _ in range(blocks):
            toks, st, it = llama.decode_block_spec_pooled(
                sparams, st, active, cfg, block=block, k_draft=k_draft,
                attn_len=attn)
            outs.append(toks)
            its.append(it)
        # ONE fetch for the chained rollout (a per-block fetch pays a
        # tunnel RTT per call and swamps device time — spec_bench lesson)
        toks = np.asarray(jnp.concatenate(outs, axis=1))
        return toks, int(np.max(jax.device_get(jnp.stack(its)).sum(0)))

    # sampled pair: the served voice-chat path runs temperature 0.8 —
    # rejection-sampling speculation must win THERE to matter (tokens are
    # not comparable across the two samplers; throughput is)
    def greedy_rollout_sampled():
        st = fresh_state()
        outs = []
        for i in range(blocks):
            toks, st = llama.decode_block_pooled(
                sparams, st, active, jax.random.PRNGKey(50 + i), cfg,
                block=block, temperature=0.8, top_p=0.95, attn_len=attn)
            outs.append(toks)
        return np.asarray(jnp.concatenate(outs, axis=1))

    def spec_rollout_sampled():
        st = fresh_state()
        outs, its = [], []
        for i in range(blocks):
            toks, st, it = llama.decode_block_spec_pooled(
                sparams, st, active, cfg, block=block, k_draft=k_draft,
                rng=jax.random.PRNGKey(70 + i), temperature=0.8,
                top_p=0.95, attn_len=attn)
            outs.append(toks)
            its.append(it)
        toks = np.asarray(jnp.concatenate(outs, axis=1))
        return toks, int(np.max(jax.device_get(jnp.stack(its)).sum(0)))

    greedy_rollout(); spec_rollout()          # compile
    greedy_rollout(); spec_rollout()          # steady-state executables
    if not moe:                               # moe row: greedy pair only
        greedy_rollout_sampled(); spec_rollout_sampled()
        greedy_rollout_sampled(); spec_rollout_sampled()

    g_t, s_t, gs_t, ss_t = [], [], [], []
    for _ in range(5):
        t0 = time.perf_counter()
        g_out = greedy_rollout()
        g_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        s_out, iters = spec_rollout()
        s_t.append(time.perf_counter() - t0)
        if moe:
            continue
        t0 = time.perf_counter()
        greedy_rollout_sampled()
        gs_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _, s_iters = spec_rollout_sampled()
        ss_t.append(time.perf_counter() - t0)

    n_tok = blocks * block
    g_s, s_s = float(np.median(g_t)), float(np.median(s_t))
    gs_s = float(np.median(gs_t)) if gs_t else 0.0
    ss_s = float(np.median(ss_t)) if ss_t else 1.0
    if moe:
        return {
            "model": "bench 30M-class byte-llama + E=8/top-2 MoE FFN",
            "final_train_loss": round(float(loss), 4),
            "k_draft": k_draft,
            "greedy_agg_tok_s": round(batch * n_tok / g_s, 1),
            "spec_agg_tok_s": round(batch * n_tok / s_s, 1),
            "speedup": round(g_s / s_s, 2),
            "iters_per_block_worst_row": round(iters / blocks, 2),
            "mismatches": int(np.sum(g_out != s_out)),
        }
    return {
        "sampled_t08_greedy_agg_tok_s": round(batch * n_tok / gs_s, 1),
        "sampled_t08_spec_agg_tok_s": round(batch * n_tok / ss_s, 1),
        "sampled_t08_speedup": round(gs_s / ss_s, 2),
        "sampled_t08_iters_per_block_worst_row": round(s_iters / blocks, 2),
        "model": "bench 30M-class byte-llama + trained MTP heads (cycle)",
        "final_train_loss": round(float(loss), 4),
        "train_s": round(train_s, 1),
        "batch": batch,
        "k_draft": k_draft,
        "block": block,
        "tokens_per_rollout_per_row": n_tok,
        "iters_per_block_worst_row": round(iters / blocks, 2),
        "greedy_agg_tok_s": round(batch * n_tok / g_s, 1),
        "spec_agg_tok_s": round(batch * n_tok / s_s, 1),
        "speedup": round(g_s / s_s, 2),
        "mismatches": int(np.sum(g_out != s_out)),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--k_draft", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--blocks", type=int, default=6)
    ap.add_argument("--block", type=int, default=32)
    ap.add_argument("--moe", action="store_true")
    args = ap.parse_args()
    out = measure_llama_spec(steps=args.steps, k_draft=args.k_draft,
                             batch=args.batch, blocks=args.blocks,
                             block=args.block, moe=args.moe)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
