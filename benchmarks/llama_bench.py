"""TPU-hosted LLM decode throughput (models/llama.py).

Measures prefill latency and block-decode tokens/s for Llama-family
configs in bf16 — the text-side budget of the full-TPU voice-chat path
(the TTS side is bench.py's subject).

Run: python benchmarks/llama_bench.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from llmvox_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from llmvox_tpu.models import llama  # noqa: E402

CONFIGS = {
    # vocab padded 257 -> 384: a non-lane-aligned vocab costs 16x decode
    # throughput and 100x compile time (measured 58 vs 928-1177 tok/s,
    # 255 vs 2.6 s compile) — see LlamaConfig's docstring
    "30M": llama.LlamaConfig(vocab_size=384, n_layer=8, n_head=8,
                             n_kv_head=4, n_embd=512,
                             intermediate_size=1408, max_seq_len=1024),
    "350M": llama.LlamaConfig(vocab_size=32000, n_layer=24, n_head=16,
                              n_kv_head=8, n_embd=1024,
                              intermediate_size=2816, max_seq_len=2048),
}


def bench(name: str, cfg: llama.LlamaConfig, block: int = 16) -> dict:
    params = llama.init_llama_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, 128)),
                         jnp.int32)

    # window ladder, exactly as streams/jax_llm.py serves it: prefill
    # bounded to its bucket (fresh state), decode at the smallest
    # power-of-two window covering pos + block
    ladder = llama.attn_window_ladder(cfg.max_seq_len)

    def attn_for(needed):
        return next((b for b in ladder if needed <= b), ladder[-1])

    state = llama.init_llama_decode_state(cfg, 1, jnp.bfloat16)
    t0 = time.time()
    logits, state = llama.prefill_padded(
        params, prompt, jnp.asarray(128, jnp.int32), state, cfg,
        attn_len=128)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    toks, state = llama.decode_block(params, first, state,
                                     jax.random.PRNGKey(1), cfg,
                                     block=block,
                                     attn_len=attn_for(128 + block))
    np.asarray(toks)
    compile_s = time.time() - t0

    # prefill latency
    pf = []
    for _ in range(5):
        st = llama.init_llama_decode_state(cfg, 1, jnp.bfloat16)
        t0 = time.perf_counter()
        lg, st = llama.prefill_padded(params, prompt,
                                      jnp.asarray(128, jnp.int32), st, cfg,
                                      attn_len=128)
        np.asarray(lg)
        pf.append(time.perf_counter() - t0)

    # decode throughput: chained blocks, fetch at the end.  One
    # throwaway round first: the process's first chained-dispatch loop
    # pays ~a full tunnel RTT per call before the transport pipelines
    # (measured 259 -> 15 ms/block on the same executable)
    nblocks = 8

    def run_blocks(tok, st, pos):
        t0 = time.perf_counter()
        for _ in range(nblocks):
            toks, st = llama.decode_block(params, tok, st,
                                          jax.random.PRNGKey(2), cfg,
                                          block=block,
                                          attn_len=attn_for(pos + block))
            pos += block
            tok = toks[:, -1]
        np.asarray(tok)
        return time.perf_counter() - t0, tok, st, pos

    _, tok, st, pos = run_blocks(first, state, 128 + block)
    dec_s, _, _, _ = run_blocks(tok, st, pos)
    n_tok = nblocks * block
    return {
        "model": name,
        "params_M": round(llama.num_llama_params(params) / 1e6, 1),
        "compile_s": round(compile_s, 1),
        "prefill128_ms": round(1e3 * float(np.median(pf)), 1),
        "decode_tok_s": round(n_tok / dec_s, 1),
        "ms_per_block16": round(1e3 * dec_s / nblocks, 1),
    }


def main() -> None:
    for name, cfg in CONFIGS.items():
        print(bench(name, cfg))


if __name__ == "__main__":
    main()
