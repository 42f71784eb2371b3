"""TPU Whisper ASR benchmark: per-utterance latency + batched throughput.

The reference transcribes with the HF CUDA pipeline one utterance at a
time (inference/asr.py); this measures the JAX rebuild
(models/whisper.py) on the real chip at whisper-base-like shapes with
random weights (compute cost is weight-independent):

- encode latency (30 s mel window -> encoder states) and cross-KV time
- greedy decode tok/s (block decode, KV cache)
- single-utterance end-to-end latency for a typical ~25-token transcript
- batch-8 aggregate utterances/s through one program chain

``base_cfg``/``run_utterance`` are the ONE measurement harness — bench.py
imports them, so the driver-recorded numbers and this bench can never
drift apart.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/whisper_bench.py
"""
from __future__ import annotations

import json
import time

import numpy as np


def base_cfg():
    """whisper-base geometry (vocab/mel/window are the family constants)."""
    from llmvox_tpu.models import whisper as W
    return W.WhisperConfig(vocab_size=51865, d_model=512, enc_layers=6,
                           dec_layers=6, enc_heads=8, dec_heads=8,
                           enc_ffn=2048, dec_ffn=2048)


def make_params(cfg, dev=None):
    import jax
    import jax.numpy as jnp

    from llmvox_tpu.models import whisper as W
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          W.init_whisper_params(jax.random.PRNGKey(9), cfg))
    return jax.device_put(params, dev) if dev is not None else params


def run_utterance(params, cfg, wav1: np.ndarray, batch: int,
                  n_tokens: int = 32):
    """One utterance chain at ``batch``: log-mel -> encode -> cross-KV ->
    prefill -> greedy 16-token decode blocks.  Returns (encode+prefill
    seconds, decode seconds, total seconds)."""
    import jax.numpy as jnp

    from llmvox_tpu.models import whisper as W
    wav = np.repeat(wav1, batch, axis=0)
    t0 = time.perf_counter()
    mel = W.log_mel(jnp.asarray(wav), cfg)
    enc = W.encode(params, mel, cfg)
    cross = W.make_cross_kv(params, enc, cfg)
    st = W.init_whisper_decode_state(cfg, batch, jnp.bfloat16)
    forced = jnp.full((batch, 4), 3, jnp.int32)
    lg, st = W.prefill(params, forced, st, cross, cfg)
    tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
    t_enc = time.perf_counter()
    for _ in range((n_tokens + 15) // 16):
        toks, st = W.decode_block(params, tok, st, cross, cfg, block=16)
        tok = toks[:, -1]
    np.asarray(tok)
    t1 = time.perf_counter()
    return t_enc - t0, t1 - t_enc, t1 - t0


def run_utterance_stream(params, cfg, wav1: np.ndarray,
                         n_tokens: int = 32, block: int = 16,
                         ctx_frames=None):
    """``run_utterance``'s B=1 chain as a PARTIAL-RESULT stream: yields
    ``(blocks_done, n_blocks, seconds_since_start)`` after each decode
    block's tokens land on the host — the harness twin of
    JAXWhisperASR.transcribe_stream (same pipelining: block N+1 is in
    flight before block N is fetched), used by bench.py's overlapped
    speech-to-speech measurement.  ``ctx_frames`` runs the encoder at a
    short bucket window (the audio_ctx ladder, streams/asr.py::_pick_ctx)
    — pass the bucket the serve path would pick for this utterance."""
    import jax.numpy as jnp

    from llmvox_tpu.models import whisper as W
    if ctx_frames is not None:
        wav1 = W.pad_or_trim(wav1[:, :ctx_frames * cfg.hop_length], cfg,
                             ctx_frames)
    t0 = time.perf_counter()
    mel = W.log_mel(jnp.asarray(wav1), cfg)
    enc = W.encode(params, mel, cfg)
    cross = W.make_cross_kv(params, enc, cfg)
    st = W.init_whisper_decode_state(cfg, 1, jnp.bfloat16)
    forced = jnp.full((1, 4), 3, jnp.int32)
    lg, st = W.prefill(params, forced, st, cross, cfg)
    tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
    n_blocks = (n_tokens + block - 1) // block
    pend = None
    done = 0
    for _ in range(n_blocks):
        toks, st = W.decode_block(params, tok, st, cross, cfg, block=block)
        tok = toks[:, -1]
        if pend is not None:
            np.asarray(pend)        # fetch N-1 while N is in flight
            done += 1
            yield done, n_blocks, time.perf_counter() - t0
        pend = toks
    np.asarray(pend)
    yield done + 1, n_blocks, time.perf_counter() - t0


def bench_wav(cfg) -> np.ndarray:
    from llmvox_tpu.models import whisper as W
    rng = np.random.default_rng(0)
    t = np.arange(16000 * 5) / 16000
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)
             + 0.1 * rng.normal(size=t.size)).astype(np.float32)
    return W.pad_or_trim(audio, cfg)


def main() -> None:
    import jax

    from llmvox_tpu.utils.runtime import enable_compilation_cache
    enable_compilation_cache()

    cfg = base_cfg()
    params = make_params(cfg, jax.devices()[0])
    wav1 = bench_wav(cfg)

    run_utterance(params, cfg, wav1, 1)       # compile
    run_utterance(params, cfg, wav1, 1)       # steady-state executables
    encs, decs, totals = zip(*[run_utterance(params, cfg, wav1, 1)
                               for _ in range(5)])
    run_utterance(params, cfg, wav1, 8)
    run_utterance(params, cfg, wav1, 8)
    b_times = [run_utterance(params, cfg, wav1, 8)[2] for _ in range(3)]

    print(json.dumps({
        "model": "whisper-base-shape (random bf16)",
        "encode_plus_prefill_ms": round(1000 * float(np.median(encs)), 1),
        "decode_32tok_ms": round(1000 * float(np.median(decs)), 1),
        "decode_tok_s": round(32 / float(np.median(decs)), 1),
        "utterance_latency_ms": round(1000 * float(np.median(totals)), 1),
        "batch8_utterances_per_s": round(8 / float(np.median(b_times)), 2),
    }))


if __name__ == "__main__":
    main()
