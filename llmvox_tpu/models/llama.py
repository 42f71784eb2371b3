"""Llama-family causal LM in JAX — the full-TPU text-stream host.

SURVEY §7 "LLM hosting" names two options for the reference's torch +
flash-attn 8B LLM (inference/llm_streaming.py:30-45): (a) an external
text-stream endpoint, (b) a JAX port sharded with pjit.  (a) is
``streams/hf_llm.py`` / ``streams/remote.py``; this module is (b): a
RMSNorm / RoPE / GQA / SwiGLU decoder with the same TPU shape discipline
as the speech decoder (models/decoder.py) —

* stacked-layer parameters walked by one ``lax.scan`` (one compiled layer
  body);
* a fixed-capacity KV cache carried functionally through jit (position
  masking, no dynamic shapes);
* block decode: N tokens generated per device program, the host sees one
  dispatch per block (``streams/jax_llm.py`` streams the text out).

Weight layout matches ``tools/convert.py::convert_llama_state_dict`` (HF
``LlamaForCausalLM`` checkpoints); numerics are verified against the HF
torch implementation in ``tests/test_llama.py``.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from llmvox_tpu.ops import nn as ops
from llmvox_tpu.ops.attention import causal_attention_auto
from llmvox_tpu.ops.moe import moe_ffn


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    """Keep every dimension a multiple of 128 (the TPU lane width) —
    especially ``vocab_size``: a 257-entry vocab measured 16x slower
    decode and 100x slower compile than 256/384 (pad the embedding and
    head rows; unused ids are simply never sampled).  Real HF vocabs
    (32000, 128256) are already aligned."""
    vocab_size: int = 32000
    n_layer: int = 32
    n_head: int = 32
    n_kv_head: int = 8            # GQA; == n_head -> MHA
    n_embd: int = 4096
    intermediate_size: int = 11008
    max_seq_len: int = 4096       # KV-cache capacity
    rope_theta: float = 10000.0
    # llama3-type RoPE scaling (Llama 3.1/3.2 checkpoints): factor 0
    # disables it; otherwise matches HF's rope_type="llama3" frequency
    # rescaling (factor, low_freq_factor, high_freq_factor,
    # original_max_position_embeddings)
    rope_scaling_factor: float = 0.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_position: int = 8192
    rms_eps: float = 1e-5
    tie_embeddings: bool = False
    # mixture-of-experts FFN (ops/moe.py): n_experts > 0 replaces the dense
    # SwiGLU with top-k routed experts (GShard static-capacity dispatch,
    # expert axis shardable over the "ep" mesh axis).  Beyond-reference:
    # the reference's LLM is dense (inference/llm_streaming.py:30-45).
    n_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 2.0
    moe_aux_weight: float = 0.01
    # GShard token groups: dispatch/combine per group of this many tokens
    # (0 = one global group).  Bounds the dense dispatch tensors to
    # O(N * E * group) instead of O(N^2 * E) at training lengths (ADVICE
    # r3); per-group capacity/priority is the documented drop semantics.
    # Inference paths are drop-free regardless (ops/moe.py docstring).
    moe_group_size: int = 0
    # speculative decoding: Medusa/MTP-style draft heads — head j predicts
    # the token at t+2+j from position t's final (post-norm) hidden state.
    # Each head is a full (n_embd, vocab) projection, so its weight
    # traffic per step equals one extra lm_head read; keep n_draft_heads
    # modest (4-8) on large-vocab checkpoints.
    n_draft_heads: int = 0

    @property
    def head_dim(self) -> int:
        assert self.n_embd % self.n_head == 0
        return self.n_embd // self.n_head

    @property
    def q_per_kv(self) -> int:
        assert self.n_head % self.n_kv_head == 0
        return self.n_head // self.n_kv_head


jax.tree_util.register_static(LlamaConfig)


def init_llama_params(key: jax.Array, cfg: LlamaConfig) -> Dict:
    """Random params in the converted-checkpoint layout (HF init: N(0, 0.02),
    RMSNorm scales 1)."""
    hd, kvd = cfg.head_dim, cfg.n_kv_head * cfg.head_dim
    # Fixed key POSITIONS (not consumption order): dense models draw
    # tok_emb/attention/mlp/head keys at the same split indices every
    # version, so a given seed reproduces the same dense params forever.
    # MoE configs reuse the dense-mlp key slots for router/wgate/wup and
    # take the spare slot 10 for wdown (ADVICE r3: building the mlp dict
    # first silently shifted every dense tensor's key).
    ks = jax.random.split(key, 12)

    def norm(k, shape):
        return 0.02 * jax.random.normal(k, shape, jnp.float32)

    def stack(k, shape):
        return norm(k, (cfg.n_layer,) + shape)

    if cfg.n_experts:
        mlp = {
            "router": stack(ks[5], (cfg.n_embd, cfg.n_experts)),
            "moe_wgate": stack(ks[6], (cfg.n_experts, cfg.n_embd,
                                       cfg.intermediate_size)),
            "moe_wup": stack(ks[7], (cfg.n_experts, cfg.n_embd,
                                     cfg.intermediate_size)),
            "moe_wdown": stack(ks[10], (cfg.n_experts,
                                        cfg.intermediate_size,
                                        cfg.n_embd)),
        }
    else:
        mlp = {
            "wgate": stack(ks[5], (cfg.n_embd, cfg.intermediate_size)),
            "wup": stack(ks[6], (cfg.n_embd, cfg.intermediate_size)),
            "wdown": stack(ks[7], (cfg.intermediate_size, cfg.n_embd)),
        }
    params = {
        "tok_emb": norm(ks[0], (cfg.vocab_size, cfg.n_embd)),
        "h": {
            "ln1_s": jnp.ones((cfg.n_layer, cfg.n_embd)),
            "wq": stack(ks[1], (cfg.n_embd, cfg.n_head * hd)),
            "wk": stack(ks[2], (cfg.n_embd, kvd)),
            "wv": stack(ks[3], (cfg.n_embd, kvd)),
            "wo": stack(ks[4], (cfg.n_head * hd, cfg.n_embd)),
            "ln2_s": jnp.ones((cfg.n_layer, cfg.n_embd)),
            **mlp,
        },
        "lnf_s": jnp.ones((cfg.n_embd,)),
    }
    if not cfg.tie_embeddings:
        params["head"] = norm(ks[8], (cfg.n_embd, cfg.vocab_size))
    if cfg.n_draft_heads > 0:
        params["draft_heads"] = norm(
            ks[9], (cfg.n_draft_heads, cfg.n_embd, cfg.vocab_size))
    return params


def num_llama_params(params: Dict) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def attn_window_ladder(max_seq_len: int, min_window: int = 128
                       ) -> Tuple[int, ...]:
    """Power-of-two attention-window buckets (128, 256, ... capacity) for
    the ``attn_len`` knob of the decode paths: one compiled program per
    rung, each reading only its window of the KV cache.  128 is the TPU
    lane width — smaller windows would not tile better."""
    ladder = []
    b = min_window
    while b < max_seq_len:
        ladder.append(b)
        b *= 2
    ladder.append(max_seq_len)
    return tuple(ladder)


def rms_norm(x: jnp.ndarray, scale: jnp.ndarray, eps: float) -> jnp.ndarray:
    """LlamaRMSNorm: x / sqrt(mean(x^2) + eps) * scale, stats in fp32."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def _inv_freq(cfg: LlamaConfig, hd: int) -> jnp.ndarray:
    """Rotary inverse frequencies, with HF's llama3 rescaling when
    ``rope_scaling_factor`` is set (transformers ROPE_INIT_FUNCTIONS
    ["llama3"]): long-wavelength bands divide by the factor, short ones
    stay, the middle interpolates smoothly."""
    half = hd // 2
    inv = 1.0 / (cfg.rope_theta ** (jnp.arange(half, dtype=jnp.float32)
                                    * 2.0 / hd))
    if not cfg.rope_scaling_factor:
        return inv
    lo_wav = cfg.rope_original_max_position / cfg.rope_low_freq_factor
    hi_wav = cfg.rope_original_max_position / cfg.rope_high_freq_factor
    wavelen = 2.0 * math.pi / inv
    smooth = ((cfg.rope_original_max_position / wavelen
               - cfg.rope_low_freq_factor)
              / (cfg.rope_high_freq_factor - cfg.rope_low_freq_factor))
    interp = ((1.0 - smooth) * inv / cfg.rope_scaling_factor
              + smooth * inv)
    out = jnp.where(wavelen > lo_wav, inv / cfg.rope_scaling_factor, inv)
    mid = (wavelen <= lo_wav) & (wavelen >= hi_wav)
    return jnp.where(mid, interp, out)


def rope(x: jnp.ndarray, positions: jnp.ndarray,
         cfg: LlamaConfig) -> jnp.ndarray:
    """HF-convention rotary embedding on (..., T, n_head, head_dim).

    ``rotate_half`` splits the head dim in two contiguous halves:
    x' = x * cos + [-x2, x1] * sin, with angles pos * inv_freq
    (llama3-scaled when configured).
    """
    hd = x.shape[-1]
    half = hd // 2
    inv_freq = _inv_freq(cfg, hd)
    ang = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., T, half)
    cos = jnp.cos(ang)[..., None, :]                           # (..., T, 1, half)
    sin = jnp.sin(ang)[..., None, :]
    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., :half], x32[..., half:]
    out = jnp.concatenate([x1 * cos - x2 * sin,
                           x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _repeat_kv(x: jnp.ndarray, q_per_kv: int) -> jnp.ndarray:
    """(..., KV, hd) -> (..., KV*q_per_kv, hd), each kv head repeated for
    its query-head group (HF repeat_kv)."""
    if q_per_kv == 1:
        return x
    return jnp.repeat(x, q_per_kv, axis=-2)


def _gqa_cache_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                         v_cache: jnp.ndarray, valid: jnp.ndarray,
                         cfg: LlamaConfig) -> jnp.ndarray:
    """Grouped-query attention against a KV cache WITHOUT materializing
    the repeated heads: the decode loop is HBM-bandwidth-bound on cache
    reads, and ``jnp.repeat`` doubled (q_per_kv=2) or quadrupled that
    traffic — and allocated it — every single step.  Query head h uses
    kv head h // q_per_kv (HF repeat_kv's layout), expressed here by
    folding the group axis into the einsum.

    q: (B, T, H, hd); k_cache/v_cache: (B, S, KV, hd);
    valid: (B, T, S) or (T, S) bool.  Returns (B, T, H, hd).
    """
    b, t, h, hd = q.shape
    g = cfg.q_per_kv
    scale = 1.0 / math.sqrt(hd)
    qg = q.reshape(b, t, cfg.n_kv_head, g, hd)
    logits = jnp.einsum("btkgd,bskd->bkgts", qg, k_cache,
                        preferred_element_type=jnp.float32,
                        precision=ops.mm_precision(q.dtype)) * scale
    if valid.ndim == 2:
        valid = valid[None]
    logits = jnp.where(valid[:, None, None], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    att = jnp.einsum("bkgts,bskd->btkgd", w, v_cache,
                     precision=ops.mm_precision(q.dtype))
    return att.reshape(b, t, h, hd)


def _mlp(lp: Dict, h: jnp.ndarray, cfg: LlamaConfig,
         token_mask: Optional[jnp.ndarray] = None,
         drop_free: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The FFN half of a layer: dense SwiGLU, or top-k routed experts when
    ``cfg.n_experts > 0`` (ops/moe.py).  Returns ``(out, aux)`` — aux is
    the load-balancing loss term (0 for the dense path); decode paths
    drop it, :func:`llama_loss` accumulates it.

    ``token_mask`` (bool, h's shape minus the channel dim) marks REAL
    tokens: padded prefill positions and inactive pool rows are excluded
    from expert routing so they can never consume capacity a live token
    needs (ADVICE r3 high).  ``drop_free=True`` — every inference path —
    makes expert capacity cover the worst case so no token can drop: a
    request's output must not depend on co-scheduled pool rows or bucket
    padding, and HF's reference forward is capacity-free."""
    if cfg.n_experts:
        return moe_ffn(h, lp["router"], lp["moe_wgate"], lp["moe_wup"],
                       lp["moe_wdown"], cfg.moe_top_k,
                       cfg.moe_capacity_factor, token_mask=token_mask,
                       group_size=cfg.moe_group_size, drop_free=drop_free)
    gate = ops.linear(h, lp["wgate"])
    up = ops.linear(h, lp["wup"])
    out = ops.linear(jax.nn.silu(gate.astype(jnp.float32)
                                 ).astype(up.dtype) * up, lp["wdown"])
    return out, jnp.float32(0.0)


def apply_llama(params: Dict, tokens: jnp.ndarray, cfg: LlamaConfig,
                positions: Optional[jnp.ndarray] = None,
                return_hidden: bool = False,
                return_moe_aux: bool = False):
    """Teacher-forced forward: (B, T) int32 -> (B, T, V) logits.
    ``return_hidden=True`` also returns the post-final-norm hidden states
    (the draft heads' input); ``return_moe_aux=True`` appends the mean
    per-layer MoE load-balancing loss (0 for dense configs)."""
    b, t = tokens.shape
    hd = cfg.head_dim
    if positions is None:
        positions = jnp.arange(t)[None, :]
    x = params["tok_emb"][tokens]

    def block(x, lp):
        h = rms_norm(x, lp["ln1_s"], cfg.rms_eps)
        q = ops.linear(h, lp["wq"]).reshape(b, t, cfg.n_head, hd)
        k = ops.linear(h, lp["wk"]).reshape(b, t, cfg.n_kv_head, hd)
        v = ops.linear(h, lp["wv"]).reshape(b, t, cfg.n_kv_head, hd)
        q = rope(q, positions, cfg)
        k = rope(k, positions, cfg)
        att = causal_attention_auto(
            q, _repeat_kv(k, cfg.q_per_kv), _repeat_kv(v, cfg.q_per_kv))
        x = x + ops.linear(att.reshape(b, t, cfg.n_head * hd), lp["wo"])
        h = rms_norm(x, lp["ln2_s"], cfg.rms_eps)
        y, aux = _mlp(lp, h, cfg)
        x = x + y
        return x, aux

    x, auxs = lax.scan(block, x, params["h"])
    x = rms_norm(x, params["lnf_s"], cfg.rms_eps)
    head = params.get("head")
    if head is None:
        head = params["tok_emb"].T
    logits = ops.linear(x, head)
    out = (logits,)
    if return_hidden:
        out = out + (x,)
    if return_moe_aux:
        out = out + (jnp.mean(auxs),)
    return out if len(out) > 1 else logits


def _ce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def llama_loss(params: Dict, tokens: jnp.ndarray, cfg: LlamaConfig,
               mtp_weight: float = 0.2) -> jnp.ndarray:
    """Next-token cross-entropy over ``tokens`` (B, T); position t's
    hidden predicts tokens[t+1].  With ``cfg.n_draft_heads > 0`` adds the
    multi-token-prediction aux losses: draft head j predicts tokens[t+2+j]
    from the same hidden state — the shift convention
    ``decode_block_spec_pooled`` consumes (mirrors
    models/decoder.py::decoder_loss for the speech decoder).

    MoE configs (``cfg.n_experts > 0``) add the load-balancing aux loss
    (mean over layers, weight ``cfg.moe_aux_weight``) — without it top-k
    routing collapses onto a few experts and capacity drops explode."""
    moe = jnp.float32(0.0)
    if "draft_heads" not in params:
        if cfg.n_experts:
            logits, moe = apply_llama(params, tokens[:, :-1], cfg,
                                      return_moe_aux=True)
        else:
            logits = apply_llama(params, tokens[:, :-1], cfg)
        return _ce(logits, tokens[:, 1:]) + cfg.moe_aux_weight * moe
    if cfg.n_experts:
        logits, hidden, moe = apply_llama(params, tokens[:, :-1], cfg,
                                          return_hidden=True,
                                          return_moe_aux=True)
    else:
        logits, hidden = apply_llama(params, tokens[:, :-1], cfg,
                                     return_hidden=True)
    loss = _ce(logits, tokens[:, 1:]) + cfg.moe_aux_weight * moe
    n_heads = params["draft_heads"].shape[0]
    aux = 0.0
    for j in range(n_heads):
        shift = j + 2                     # hidden t -> tokens[t + shift]
        t_use = tokens.shape[1] - shift   # positions with a valid target
        if t_use <= 0:
            continue
        lj = ops.linear(hidden[:, :t_use], params["draft_heads"][j])
        aux = aux + _ce(lj, tokens[:, shift:])
    return loss + mtp_weight * aux / n_heads


class LlamaDecodeState(NamedTuple):
    k: jnp.ndarray        # (L, B, S, KV, hd)
    v: jnp.ndarray
    pos: jnp.ndarray      # scalar int32: tokens cached so far


def init_llama_decode_state(cfg: LlamaConfig, batch: int = 1,
                            dtype=jnp.float32) -> LlamaDecodeState:
    shape = (cfg.n_layer, batch, cfg.max_seq_len, cfg.n_kv_head,
             cfg.head_dim)
    return LlamaDecodeState(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                            jnp.asarray(0, jnp.int32))


def _layer_step(lp: Dict, x: jnp.ndarray, k_cache, v_cache, pos,
                cfg: LlamaConfig, attn_len: Optional[int] = None,
                token_mask: Optional[jnp.ndarray] = None):
    """One layer for T new tokens at absolute positions pos..pos+T-1 with
    the cache already holding ``pos`` tokens.  Returns (x, new_k, new_v)
    where new_k/new_v are the cache slices for these tokens.

    ``attn_len`` (static) bounds the attention read to the cache's first
    ``attn_len`` rows — exact iff the caller guarantees pos + T <=
    attn_len (see :func:`_layer_step_rows` for the bandwidth rationale);
    writes still target the full cache."""
    b, t, _ = x.shape
    hd = cfg.head_dim
    positions = pos + jnp.arange(t)[None, :]
    h = rms_norm(x, lp["ln1_s"], cfg.rms_eps)
    q = ops.linear(h, lp["wq"]).reshape(b, t, cfg.n_head, hd)
    k = ops.linear(h, lp["wk"]).reshape(b, t, cfg.n_kv_head, hd)
    v = ops.linear(h, lp["wv"]).reshape(b, t, cfg.n_kv_head, hd)
    q = rope(q, positions, cfg)
    k = rope(k, positions, cfg)
    k_cache = lax.dynamic_update_slice(
        k_cache, k.astype(k_cache.dtype), (0, pos, 0, 0))
    v_cache = lax.dynamic_update_slice(
        v_cache, v.astype(v_cache.dtype), (0, pos, 0, 0))
    # attention over the cache: key j valid for query i iff j <= pos + i
    ka, va = k_cache, v_cache
    if attn_len is not None and attn_len < ka.shape[1]:
        ka = ka[:, :attn_len]
        va = va[:, :attn_len]
    s = ka.shape[1]
    jpos = lax.broadcasted_iota(jnp.int32, (t, s), 1)
    ipos = lax.broadcasted_iota(jnp.int32, (t, s), 0)
    valid = jpos <= pos + ipos
    att = _gqa_cache_attention(q, ka, va, valid, cfg)
    x = x + ops.linear(att.reshape(b, t, cfg.n_head * hd), lp["wo"])
    h = rms_norm(x, lp["ln2_s"], cfg.rms_eps)
    y, _ = _mlp(lp, h, cfg, token_mask=token_mask, drop_free=True)
    x = x + y
    return x, k_cache, v_cache


def _forward_cached(params: Dict, tokens: jnp.ndarray,
                    state: LlamaDecodeState, cfg: LlamaConfig,
                    attn_len: Optional[int] = None
                    ) -> Tuple[jnp.ndarray, LlamaDecodeState]:
    """(B, T) new tokens -> (B, V) logits of the LAST position; cache
    extended.  One lax.scan over the stacked layers.  The final norm and
    head run on the last position only (the head matmul over all T
    positions is the one cost worth skipping in the decode loop)."""
    x, (new_k, new_v) = _scan_layers(params, tokens, state, cfg, attn_len)
    x = rms_norm(x[:, -1], params["lnf_s"], cfg.rms_eps)
    logits = ops.linear(x, _head(params))
    return logits, LlamaDecodeState(new_k, new_v,
                                    state.pos + tokens.shape[1])


def _scan_layers(params: Dict, tokens: jnp.ndarray,
                 state: LlamaDecodeState, cfg: LlamaConfig,
                 attn_len: Optional[int] = None,
                 token_mask: Optional[jnp.ndarray] = None):
    """Shared depth scan for both cached-forward variants."""
    x = params["tok_emb"][tokens]

    def body(carry, scan_in):
        x = carry
        lp, k_cache, v_cache = scan_in
        x, k_cache, v_cache = _layer_step(lp, x, k_cache, v_cache,
                                          state.pos, cfg, attn_len,
                                          token_mask)
        return x, (k_cache, v_cache)

    return lax.scan(body, x, (params["h"], state.k, state.v))


def _head(params: Dict) -> jnp.ndarray:
    head = params.get("head")
    return params["tok_emb"].T if head is None else head


def _filtered_logits(logits: jnp.ndarray, temperature: float,
                     top_k: int, top_p: float = 1.0) -> jnp.ndarray:
    """Temperature-scaled logits with top-k / nucleus filtering applied
    (filtered entries -inf) — the distribution :func:`_sample` draws from,
    exposed so the speculative sampler can evaluate the SAME target and
    draft distributions its acceptance test needs.  temperature > 0."""
    logits = logits.astype(jnp.float32) / temperature
    if top_k > 0 and top_k < logits.shape[-1]:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if 0.0 < top_p < 1.0:
        # HF semantics: keep the smallest prefix of descending-prob
        # tokens whose cumulative probability exceeds top_p (the first
        # token crossing the threshold is KEPT)
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = cum - probs < top_p          # prefix before crossing
        cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf),
                         axis=-1, keepdims=True)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


def _sample(logits: jnp.ndarray, rng: jax.Array, temperature: float,
            top_k: int, top_p: float = 1.0) -> jnp.ndarray:
    """Greedy when temperature == 0, else temperature sampling with
    optional top-k and nucleus (top-p) filtering — the reference's
    GenerationConfig knobs (hf_llm.py / llm_streaming.py)."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = _filtered_logits(logits, temperature, top_k, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Per-row sampling: every pooled row carries its OWN (temperature, top_k,
# top_p), so one compiled program serves any mix of per-request configs —
# no recompile per temperature, and greedy/sampled requests batch together.
# The reference cannot do this at all: one generate() thread per request
# with process-wide GenerationConfig (inference/llm_streaming.py:44-106).
# ---------------------------------------------------------------------------


def _filtered_logits_rows(logits: jnp.ndarray, t: jnp.ndarray,
                          k: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Row-vectorized :func:`_filtered_logits`: ``logits`` (..., B, V),
    ``t``/``k``/``p`` (B,).  Rows with t <= 0 are temperature-clamped to
    a value so small the filtered distribution is exactly one-hot at the
    argmax (greedy rows sample deterministically).  k <= 0 or k >= V
    disables top-k for that row; p outside (0, 1) disables top-p —
    matching the static path's skip conditions."""
    v = logits.shape[-1]
    t = jnp.maximum(t.astype(jnp.float32), 1e-6)
    x = logits.astype(jnp.float32) / t[..., None]
    kk = jnp.where((k > 0) & (k < v), k, v).astype(jnp.int32)
    srt = jnp.sort(x, axis=-1)                                # ascending
    kth = jnp.take_along_axis(
        srt, (v - kk)[..., None], axis=-1)                    # (..., B, 1)
    x = jnp.where(x < kth, -jnp.inf, x)
    # nucleus on the already top-k-filtered rows (static-path order)
    desc = srt[..., ::-1]
    desc = jnp.where(jnp.arange(v) < kk[..., None], desc, -jnp.inf)
    probs = jax.nn.softmax(desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = cum - probs < p[..., None]
    cutoff = jnp.min(jnp.where(keep, desc, jnp.inf), axis=-1,
                     keepdims=True)
    cutoff = jnp.where(((p > 0.0) & (p < 1.0))[..., None], cutoff,
                       -jnp.inf)
    return jnp.where(x < cutoff, -jnp.inf, x)


def _sample_rows(logits: jnp.ndarray, rng: jax.Array, t: jnp.ndarray,
                 k: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Row-vectorized :func:`_sample`: greedy rows (t <= 0) take the
    argmax exactly (their filtered distribution is one-hot, so the
    categorical draw is deterministic — asserted directly here to keep
    the guarantee independent of float behavior)."""
    out = jax.random.categorical(
        rng, _filtered_logits_rows(logits, t, k, p), axis=-1
    ).astype(jnp.int32)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jnp.where(t <= 0.0, greedy, out)


def _sample_maybe_rows(logits, rng, temperature, top_k, top_p, rows):
    """``rows`` (t, k, p) vectors override the static scalars when set."""
    if rows is None:
        return _sample(logits, rng, temperature, top_k, top_p)
    return _sample_rows(logits, rng, *rows)


@jax.jit
def prefill(params: Dict, tokens: jnp.ndarray, state: LlamaDecodeState,
            cfg: LlamaConfig) -> Tuple[jnp.ndarray, LlamaDecodeState]:
    """Cache the prompt; returns (last-position logits (B, V), state)."""
    return _forward_cached(params, tokens, state, cfg)


@partial(jax.jit, static_argnames=("attn_len",))
def prefill_padded(params: Dict, tokens: jnp.ndarray,
                   valid_len: jnp.ndarray, state: LlamaDecodeState,
                   cfg: LlamaConfig, attn_len: Optional[int] = None
                   ) -> Tuple[jnp.ndarray, LlamaDecodeState]:
    """Bucketed prefill: ``tokens`` (B, Tpad) right-padded, only the first
    ``valid_len`` positions are real.  ONE compiled program per bucket
    width instead of one per prompt length.

    Why padding is safe with this cache: pad positions write stale
    entries at cache slots >= valid_len, but the causal mask
    ``j <= pos + i`` with ``pos = valid_len`` hides them from every later
    query until the decode loop overwrites them in order; the returned
    logits are taken at the last VALID position, and pad queries'
    outputs are discarded.  ``valid_len`` must be UNIFORM across the
    batch (``pos`` is shared): use B=1 or equal-length prompts.

    ``attn_len`` (static): attention window bound, exact iff
    ``pos + Tpad <= attn_len`` — a FRESH state (pos=0) may pass
    ``attn_len=Tpad`` to skip reading the empty cache tail entirely.
    """
    valid_mask = jnp.broadcast_to(
        jnp.arange(tokens.shape[1]) < jnp.asarray(valid_len, jnp.int32),
        tokens.shape)
    logits_all, new_state = _forward_cached_all(params, tokens, state, cfg,
                                                attn_len,
                                                token_mask=valid_mask)
    valid_len = jnp.asarray(valid_len, jnp.int32)
    idx = jnp.broadcast_to(valid_len - 1, (tokens.shape[0],))
    logits = jnp.take_along_axis(logits_all, idx.reshape(-1, 1, 1),
                                 axis=1)[:, 0]
    new_state = new_state._replace(pos=state.pos + jnp.max(valid_len))
    return logits, new_state


def _forward_cached_all(params: Dict, tokens: jnp.ndarray,
                        state: LlamaDecodeState, cfg: LlamaConfig,
                        attn_len: Optional[int] = None,
                        token_mask: Optional[jnp.ndarray] = None
                        ) -> Tuple[jnp.ndarray, LlamaDecodeState]:
    """Like :func:`_forward_cached` but returns logits at EVERY position
    (B, T, V) — the padded-prefill helper needs the last valid one."""
    x, (new_k, new_v) = _scan_layers(params, tokens, state, cfg, attn_len,
                                     token_mask)
    x = rms_norm(x, params["lnf_s"], cfg.rms_eps)
    logits = ops.linear(x, _head(params))
    return logits, LlamaDecodeState(new_k, new_v,
                                    state.pos + tokens.shape[1])


@partial(jax.jit,
         static_argnames=("block", "temperature", "top_k", "top_p",
                          "attn_len"))
def decode_block(params: Dict, first_token: jnp.ndarray,
                 state: LlamaDecodeState, rng: jax.Array, cfg: LlamaConfig,
                 block: int = 16, temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, attn_len: Optional[int] = None
                 ) -> Tuple[jnp.ndarray, LlamaDecodeState]:
    """Generate ``block`` tokens on-device from ``first_token`` (B,) int32
    (the token sampled from the prefill logits).  Returns tokens generated
    AFTER first_token: (B, block), plus the state.  The host sees one
    dispatch per block; EOS handling is host-side (streams/jax_llm.py).

    ``attn_len`` (static): attention window bound — the caller must
    guarantee ``pos + block <= attn_len`` (streams/jax_llm.py tracks the
    position host-side and picks a power-of-two bucket); None attends
    over the whole cache."""

    def step(carry, _):
        tok, state, rng = carry
        logits, state = _forward_cached(params, tok[:, None], state, cfg,
                                        attn_len)
        rng, sub = jax.random.split(rng)
        nxt = _sample(logits, sub, temperature, top_k, top_p)
        return (nxt, state, rng), nxt

    (_, state, _), toks = lax.scan(
        step, (first_token, state, rng), None, length=block)
    return toks.swapaxes(0, 1), state


# ---------------------------------------------------------------------------
# Pooled continuous-batching decode (serve/llm_pool.py)
#
# The B=1 path above runs one private prefill + decode sequence per request,
# which serializes concurrent requests on the chip (the reference has the
# same property: one torch generate() thread per request,
# inference/llm_streaming.py:44-106).  The pooled path keeps ONE batched
# decode state with PER-ROW positions, so any mix of in-flight requests —
# each at a different point in its generation — advances in a single device
# program per block, exactly like the speech decoder's DecodePool.
# ---------------------------------------------------------------------------


class LlamaPoolState(NamedTuple):
    """Batched decode state with per-row progress.

    Unlike :class:`LlamaDecodeState` (scalar ``pos`` shared by the batch),
    every row carries its own ``pos``; ``tok`` carries each row's last
    sampled token ON DEVICE so the host never uploads tokens between
    blocks — prefill writes it, each block chains on it.
    """
    k: jnp.ndarray        # (L, B, S, KV, hd)
    v: jnp.ndarray
    pos: jnp.ndarray      # (B,) int32: tokens cached per row
    tok: jnp.ndarray      # (B,) int32: last sampled token per row


def init_llama_pool_state(cfg: LlamaConfig, batch: int,
                          dtype=jnp.float32) -> LlamaPoolState:
    shape = (cfg.n_layer, batch, cfg.max_seq_len, cfg.n_kv_head,
             cfg.head_dim)
    return LlamaPoolState(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                          jnp.zeros((batch,), jnp.int32),
                          jnp.zeros((batch,), jnp.int32))


def _layer_step_rows(lp: Dict, x: jnp.ndarray, k_cache, v_cache,
                     pos_vec: jnp.ndarray, cfg: LlamaConfig,
                     attn_len: Optional[int] = None,
                     token_mask: Optional[jnp.ndarray] = None):
    """One layer for T new tokens where row b sits at absolute position
    ``pos_vec[b]`` — the per-row counterpart of :func:`_layer_step`.
    Cache writes land at each row's own offset (vmapped dynamic-update
    slice); the causal mask is per-row (key j valid for row b's query i
    iff j <= pos_vec[b] + i).

    ``attn_len`` (static) bounds the attention read to the cache's first
    ``attn_len`` rows: the decode loop is bandwidth-bound on cache
    traffic (B * S * KV * hd per step), and most of a fixed-capacity
    cache is empty early in a conversation.  The CALLER must guarantee
    every row's pos + T <= attn_len (serve/llm_pool.py tracks each
    slot's position upper bound and picks a bucket); writes still target
    the full cache, so growing attn_len later loses nothing."""
    b, t, _ = x.shape
    hd = cfg.head_dim
    positions = pos_vec[:, None] + jnp.arange(t)[None, :]      # (B, T)
    h = rms_norm(x, lp["ln1_s"], cfg.rms_eps)
    q = ops.linear(h, lp["wq"]).reshape(b, t, cfg.n_head, hd)
    k = ops.linear(h, lp["wk"]).reshape(b, t, cfg.n_kv_head, hd)
    v = ops.linear(h, lp["wv"]).reshape(b, t, cfg.n_kv_head, hd)
    q = rope(q, positions, cfg)
    k = rope(k, positions, cfg)
    upd = jax.vmap(
        lambda c, u, p: lax.dynamic_update_slice(c, u, (p, 0, 0)))
    k_cache = upd(k_cache, k.astype(k_cache.dtype), pos_vec)
    v_cache = upd(v_cache, v.astype(v_cache.dtype), pos_vec)
    ka, va = k_cache, v_cache
    if attn_len is not None and attn_len < ka.shape[1]:
        ka = ka[:, :attn_len]
        va = va[:, :attn_len]
    s = ka.shape[1]
    jpos = lax.broadcasted_iota(jnp.int32, (t, s), 1)
    ipos = lax.broadcasted_iota(jnp.int32, (t, s), 0)
    valid = jpos[None] <= pos_vec[:, None, None] + ipos[None]  # (B, T, S)
    # cache dtype may differ from the activation dtype (e.g. f32 cache
    # under bf16 params) — cast after the value matmul so the residual
    # stream keeps x's dtype through the scan carry
    att = _gqa_cache_attention(q, ka, va, valid, cfg).astype(x.dtype)
    x = x + ops.linear(att.reshape(b, t, cfg.n_head * hd), lp["wo"])
    h = rms_norm(x, lp["ln2_s"], cfg.rms_eps)
    y, _ = _mlp(lp, h, cfg, token_mask=token_mask, drop_free=True)
    x = x + y
    return x, k_cache, v_cache


def _scan_layers_rows(params: Dict, tokens: jnp.ndarray, k, v,
                      pos_vec: jnp.ndarray, cfg: LlamaConfig,
                      attn_len: Optional[int] = None,
                      token_mask: Optional[jnp.ndarray] = None):
    x = params["tok_emb"][tokens]

    def body(carry, scan_in):
        x = carry
        lp, kc, vc = scan_in
        x, kc, vc = _layer_step_rows(lp, x, kc, vc, pos_vec, cfg, attn_len,
                                     token_mask)
        return x, (kc, vc)

    return lax.scan(body, x, (params["h"], k, v))


@jax.jit
def prefix_kv(params: Dict, tokens: jnp.ndarray, cfg: LlamaConfig
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher-forced KV rows for a SHARED prompt prefix: ``tokens``
    (1, P) -> (k, v) each (L, P, KV, hd).  Voice-chat requests all carry
    the same system preamble (the reference rebuilds it per request,
    inference/llm_streaming.py:57-66); computing its KV once lets
    :func:`prefill_slots` seed every slot with it and prefill only the
    per-request suffix."""
    p = tokens.shape[1]
    dtype = params["tok_emb"].dtype
    tmp_k = jnp.zeros((cfg.n_layer, 1, p, cfg.n_kv_head, cfg.head_dim),
                      dtype)
    tmp_v = jnp.zeros_like(tmp_k)
    _, (k, v) = _scan_layers_rows(params, tokens, tmp_k, tmp_v,
                                  jnp.zeros((1,), jnp.int32), cfg)
    return k[:, 0], v[:, 0]


@partial(jax.jit, static_argnames=("temperature", "top_k", "top_p"),
         donate_argnames=("state",))
def prefill_slots(params: Dict, tokens: jnp.ndarray,
                  valid_lens: jnp.ndarray, state: LlamaPoolState,
                  slots: jnp.ndarray, active: jnp.ndarray, rng: jax.Array,
                  cfg: LlamaConfig, temperature: float = 0.0,
                  top_k: int = 0, top_p: float = 1.0,
                  prefix_k: Optional[jnp.ndarray] = None,
                  prefix_v: Optional[jnp.ndarray] = None,
                  rows: Optional[Tuple] = None
                  ) -> Tuple[jnp.ndarray, LlamaPoolState]:
    """Prefill N mixed-length prompts into pool slots in ONE program.

    ``tokens`` (N, Tpad) right-padded, ``valid_lens`` (N,) per row — the
    per-row generalization VERDICT r2 asked for (prefill_padded requires a
    uniform valid_len).  Row n's KV rows land in ``state`` at
    ``slots[n]``; its first token is sampled from the logits at its own
    last valid position and stored in ``state.tok[slots[n]]`` (and
    returned, (N,) int32, for the host's text assembly).  Rows with
    ``active[n] == False`` are padding of the arrival batch: their slot
    index is redirected out of bounds and the scatter drops them
    (``mode="drop"``), so they cannot disturb live slots.

    With ``prefix_k``/``prefix_v`` ((L, P, KV, hd), from
    :func:`prefix_kv`), ``tokens`` are the SUFFIX after a shared P-token
    prefix: rows start at absolute position P (RoPE offsets included),
    attend the prefix rows, and the scatter writes prefix + suffix into
    the slot; ``pos`` becomes ``P + valid_lens``.  The prefix forward is
    never recomputed per request.

    Padding correctness is the same argument as :func:`prefill_padded`:
    pad positions write stale cache entries at j >= valid_lens[n], and the
    per-row decode mask ``j <= pos[b] + i`` with ``pos[b] = valid_lens[n]``
    hides them until the decode loop overwrites them in order.
    """
    n, tpad = tokens.shape
    cap = state.k.shape[1]
    dtype = state.k.dtype
    p = 0 if prefix_k is None else prefix_k.shape[1]
    tmp_k = jnp.zeros((cfg.n_layer, n, p + tpad, cfg.n_kv_head,
                       cfg.head_dim), dtype)
    tmp_v = jnp.zeros_like(tmp_k)
    if p:
        tmp_k = tmp_k.at[:, :, :p].set(prefix_k[:, None].astype(dtype))
        tmp_v = tmp_v.at[:, :, :p].set(prefix_v[:, None].astype(dtype))
    valid_lens = jnp.asarray(valid_lens, jnp.int32)
    tok_mask = ((jnp.arange(tpad)[None] < valid_lens[:, None])
                & active.astype(bool)[:, None])
    x, (new_k, new_v) = _scan_layers_rows(params, tokens, tmp_k, tmp_v,
                                          jnp.full((n,), p, jnp.int32), cfg,
                                          token_mask=tok_mask)
    x = rms_norm(x, params["lnf_s"], cfg.rms_eps)
    logits_all = ops.linear(x, _head(params))                  # (N, Tpad, V)
    idx = (valid_lens - 1).reshape(-1, 1, 1)
    logits = jnp.take_along_axis(logits_all, idx, axis=1)[:, 0]
    first = _sample_maybe_rows(logits, rng, temperature, top_k, top_p,
                               rows)                           # (N,)

    # scatter the prefilled rows into the pool state; OOB slot => dropped
    slot_ids = jnp.where(active, slots.astype(jnp.int32), cap)
    tpad_w = min(p + tpad, state.k.shape[2])
    k = state.k.at[:, slot_ids, :tpad_w].set(
        new_k[:, :, :tpad_w], mode="drop", unique_indices=False)
    v = state.v.at[:, slot_ids, :tpad_w].set(
        new_v[:, :, :tpad_w], mode="drop", unique_indices=False)
    pos = state.pos.at[slot_ids].set(p + valid_lens, mode="drop")
    tok = state.tok.at[slot_ids].set(first, mode="drop")
    return first, LlamaPoolState(k, v, pos, tok)


@partial(jax.jit, static_argnames=("final", "temperature", "top_k",
                                   "top_p", "attn_len"),
         donate_argnames=("state",))
def prefill_slots_continue(params: Dict, tokens: jnp.ndarray,
                           valid_lens: jnp.ndarray, state: LlamaPoolState,
                           slots: jnp.ndarray, active: jnp.ndarray,
                           pos0: jnp.ndarray, rng: jax.Array,
                           cfg: LlamaConfig, final: bool = True,
                           temperature: float = 0.0, top_k: int = 0,
                           top_p: float = 1.0,
                           attn_len: Optional[int] = None,
                           rows: Optional[Tuple] = None
                           ) -> Tuple[jnp.ndarray, LlamaPoolState]:
    """Continue a CHUNKED prefill: process ``tokens`` (N, Tpad) whose rows
    extend prompts already cached in ``state`` — row n's slot holds
    ``pos0[n]`` tokens, this chunk lands at positions pos0..pos0+len-1.

    Why chunks: :func:`prefill_slots` runs at a bucket width, so prompts
    longer than the largest bucket would be truncated even when the model
    context has room (the reference's HF path keeps full history,
    inference/llm_streaming.py:57-66).  The pool splits long prompts into
    bucket-width chunks: the first goes through :func:`prefill_slots`
    (fresh rows, optional shared prefix), each later chunk through this —
    gather the slots' cache rows (bounded by ``attn_len``), run the chunk
    at per-row offsets (RoPE positions and causal mask from ``pos0``, the
    same `_layer_step_rows` the pooled decode uses), scatter back.  Each
    chunk's queries attend the FULL cached prefix in one softmax, so the
    math equals a single-program prefill exactly — chunking changes
    program shapes, not results.

    ``final=False`` (middle chunks) skips the lm head and returns zeros
    for the sampled tokens; ``final=True`` samples each row's first token
    at its last valid position and writes it to ``state.tok`` like
    :func:`prefill_slots`.  Caller guarantees pos0 + Tpad <= attn_len.
    Inactive rows gather slot 0 harmlessly and their writes are dropped.
    """
    n, tpad = tokens.shape
    cap = state.k.shape[1]
    s = state.k.shape[2]
    if attn_len is not None and attn_len < s:
        s = attn_len
    gid = jnp.where(active, slots.astype(jnp.int32), 0)
    k_slot = state.k[:, gid, :s]
    v_slot = state.v[:, gid, :s]
    pos0 = jnp.asarray(pos0, jnp.int32)
    tok_mask = ((jnp.arange(tpad)[None]
                 < jnp.asarray(valid_lens, jnp.int32)[:, None])
                & active.astype(bool)[:, None])
    x, (new_k, new_v) = _scan_layers_rows(params, tokens, k_slot, v_slot,
                                          pos0, cfg, token_mask=tok_mask)
    slot_ids = jnp.where(active, slots.astype(jnp.int32), cap)
    k = state.k.at[:, slot_ids, :s].set(new_k, mode="drop",
                                        unique_indices=False)
    v = state.v.at[:, slot_ids, :s].set(new_v, mode="drop",
                                        unique_indices=False)
    valid_lens = jnp.asarray(valid_lens, jnp.int32)
    pos = state.pos.at[slot_ids].set(pos0 + valid_lens, mode="drop")
    if final:
        x = rms_norm(x, params["lnf_s"], cfg.rms_eps)
        logits_all = ops.linear(x, _head(params))
        idx = (valid_lens - 1).reshape(-1, 1, 1)
        logits = jnp.take_along_axis(logits_all, idx, axis=1)[:, 0]
        first = _sample_maybe_rows(logits, rng, temperature, top_k,
                                   top_p, rows)
        tok = state.tok.at[slot_ids].set(first, mode="drop")
    else:
        first = jnp.zeros((n,), jnp.int32)
        tok = state.tok
    return first, LlamaPoolState(k, v, pos, tok)


@partial(jax.jit,
         static_argnames=("block", "temperature", "top_k", "top_p",
                          "attn_len"),
         donate_argnames=("state",))
def decode_block_pooled(params: Dict, state: LlamaPoolState,
                        active: jnp.ndarray, rng: jax.Array,
                        cfg: LlamaConfig, block: int = 16,
                        temperature: float = 0.0, top_k: int = 0,
                        top_p: float = 1.0,
                        attn_len: Optional[int] = None,
                        rows: Optional[Tuple] = None
                        ) -> Tuple[jnp.ndarray, LlamaPoolState]:
    """Advance every ACTIVE row ``block`` tokens in one device program.

    Each row continues from its own ``state.tok`` / ``state.pos``;
    inactive rows ride along (their pos and tok are frozen, their masked
    garbage output is discarded by the host).  Returns (B, block) tokens —
    the tokens generated AFTER each row's ``state.tok``.  Host-side EOS
    handling, exactly like :func:`decode_block`.

    ``attn_len`` (static): attention window bucket — every active row
    must satisfy pos + block <= attn_len (see :func:`_layer_step_rows`);
    None attends over the whole cache.
    """
    active = active.astype(jnp.bool_)

    def step(carry, _):
        tok, k, v, pos, rng = carry
        x, (k, v) = _scan_layers_rows(params, tok[:, None], k, v, pos, cfg,
                                      attn_len, token_mask=active[:, None])
        x = rms_norm(x[:, -1], params["lnf_s"], cfg.rms_eps)
        logits = ops.linear(x, _head(params))
        rng, sub = jax.random.split(rng)
        nxt = _sample_maybe_rows(logits, sub, temperature, top_k, top_p,
                                 rows)
        nxt = jnp.where(active, nxt, tok)
        pos = pos + active.astype(jnp.int32)
        return (nxt, k, v, pos, rng), nxt

    (tok, k, v, pos, _), toks = lax.scan(
        step, (state.tok, state.k, state.v, state.pos, rng), None,
        length=block)
    return toks.swapaxes(0, 1), LlamaPoolState(k, v, pos, tok)


# ---------------------------------------------------------------------------
# Pooled speculative decode (greedy) — the LLM counterpart of
# models/decoder.py::decode_block_spec_batch.  No reference counterpart:
# the reference's LLM serving is one torch generate() thread per request
# (inference/llm_streaming.py:44-106) with per-token sequential decode.
# ---------------------------------------------------------------------------


def _hidden_logits(params: Dict, x: jnp.ndarray, cfg: LlamaConfig):
    """Final norm + lm head on (B, [T,] C) hidden states."""
    h = rms_norm(x, params["lnf_s"], cfg.rms_eps)
    return h, ops.linear(h, _head(params))


@partial(jax.jit, static_argnames=("block", "k_draft", "attn_len",
                                   "temperature", "top_k", "top_p"),
         donate_argnames=("state",))
def decode_block_spec_pooled(params: Dict, state: LlamaPoolState,
                             active: jnp.ndarray, cfg: LlamaConfig,
                             block: int = 16, k_draft: int = 4,
                             attn_len: Optional[int] = None,
                             draft_tokens: Optional[jnp.ndarray] = None,
                             rng: Optional[jax.Array] = None,
                             temperature: float = 0.0, top_k: int = 0,
                             top_p: float = 1.0,
                             rows: Optional[Tuple] = None
                             ) -> Tuple[jnp.ndarray, LlamaPoolState,
                                        jnp.ndarray]:
    """Speculative :func:`decode_block_pooled`: B pooled rows advance
    ``block`` tokens each in fewer sequential forwards when the drafts
    accept.

    Greedy mode (``temperature == 0``): output tokens equal the greedy
    pooled path's for any draft quality (acceptance commits only the
    verifier's own argmax chain; proven token-exact in
    tests/test_llama_spec.py and counted live by bench.py).

    Sampled mode (``temperature > 0``, requires ``rng``): standard
    speculative REJECTION sampling (Leviathan et al. 2023 / Chen et al.
    2023), so each emitted token is distributed EXACTLY as the plain
    sampled path's conditional — not approximately.  Per position j the
    draft d_j ~ q_j (draft head j's distribution under the same
    temperature/top-k/top-p filtering as the target) is accepted iff
    u_j < p_j(d_j)/q_j(d_j) with p_j the verifier's filtered
    distribution given the ACTUAL draft prefix; the first rejection
    emits a correction from norm(max(p_j - q_j, 0)) and stops the
    commit.  The Medusa-style heads propose each position independently
    of the draft tokens before it, which keeps the proof valid: d_j is
    independent of the acceptance outcomes, and the test uses the exact
    conditional p_j.  Distribution-exactness is tested statistically in
    tests/test_llama_spec.py (empirical marginals vs enumerated model
    conditionals).  With explicit ``draft_tokens`` the proposal is the
    one-hot at the given token (q_j = 1 at d_j), which is the same
    algorithm with a deterministic proposal.

    Per iteration: ONE batched step from each row's device-carried
    ``state.tok`` (also yielding the post-norm hidden the draft heads
    read), per-row drafts for the next ``k_draft`` positions
    (``params["draft_heads"]`` — head j guesses position +2+j — or the
    explicit ``draft_tokens`` (B, block) stream for tests), then ONE
    batched teacher-forced verify forward over all rows' drafts
    (``_scan_layers_rows`` at T=k_draft: per-row positions, per-row
    causal masks — the same kernel the mixed-length prefill uses).  Each
    row commits its matching draft prefix plus the verifier's first
    correction, so every iteration advances a row by 1..1+k_draft
    tokens.  Rows stop at ``block``; inactive rows ride along frozen.
    Mis-speculated cache rows sit above ``pos`` and are overwritten
    before any later query attends them (the padded-prefill argument).

    Why this wins: the decode loop is HBM-bandwidth-bound on weight +
    KV-cache reads, which the verify forward amortizes over k_draft+1
    positions; iterations shrink by the accept rate while each iteration
    costs ~2 memory sweeps instead of 1 — net ~(1+accepts)/2 fewer
    sweeps per token.  EOS stays host-side like the greedy path.

    ``attn_len`` (static): every active row must satisfy
    pos + block + k_draft + 1 <= attn_len (the verifier probes up to
    k_draft rows past the last committed token).

    Returns (tokens (B, block), state, iters (B,) — sequential forwards
    each row actually paid, for measurement).
    """
    kd = int(k_draft)
    bsz = state.pos.shape[0]
    active = active.astype(jnp.bool_)
    limits = jnp.where(active, jnp.int32(block), jnp.int32(0))
    # per-row params always take the sampled (rejection) structure: rows
    # with t <= 0 reduce to exact greedy inside it (their filtered
    # distributions are one-hot, and the acceptance/correction for those
    # rows is overridden with the argmax test outright so float ties
    # cannot blur the guarantee)
    sampling = temperature > 0.0 or rows is not None
    if sampling and rng is None:
        raise ValueError("sampled speculative decode needs rng")
    if rng is None:
        rng = jax.random.PRNGKey(0)      # greedy: carried but never used
    dpad = None
    if draft_tokens is not None:
        dpad = jnp.concatenate(
            [jnp.maximum(jnp.asarray(draft_tokens, jnp.int32), 0),
             jnp.zeros((bsz, kd + 1), jnp.int32)], axis=1)
    out0 = jnp.full((bsz, block + kd + 1), -1, jnp.int32)
    barange = jnp.arange(bsz)
    offs = jnp.arange(kd, dtype=jnp.int32)

    def iteration(carry):
        k, v, pos, tok, count, out, iters, key = carry
        active_it = count < limits
        key, k_tok1, k_d, k_u, k_corr = jax.random.split(key, 5)

        # ---- one batched step from each row's last token ----------------
        x, (k1, v1) = _scan_layers_rows(params, tok[:, None], k, v, pos,
                                        cfg, attn_len,
                                        token_mask=active_it[:, None])
        hidden, logits = _hidden_logits(params, x[:, -1], cfg)
        if rows is not None:
            token1 = _sample_rows(logits, k_tok1, *rows)
        elif sampling:
            token1 = _sample(logits, k_tok1, temperature, top_k, top_p)
        else:
            token1 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pos1 = pos + active_it.astype(jnp.int32)
        tok1 = jnp.where(active_it, token1, tok)

        # ---- per-row drafts for the next k_draft positions --------------
        qf = None
        if dpad is not None:
            d = jnp.take_along_axis(
                dpad, count[:, None] + 1 + offs[None], axis=1)
        else:
            dlogits = jnp.einsum(
                "bc,kcv->bkv", hidden.astype(jnp.float32),
                params["draft_heads"][:kd].astype(jnp.float32))  # (B,kd,V)
            if rows is not None:
                qf = _filtered_logits_rows(
                    dlogits, rows[0][:, None], rows[1][:, None],
                    rows[2][:, None])
                d = jax.random.categorical(k_d, qf,
                                           axis=-1).astype(jnp.int32)
            elif sampling:
                qf = _filtered_logits(dlogits, temperature, top_k, top_p)
                d = jax.random.categorical(k_d, qf,
                                           axis=-1).astype(jnp.int32)
            else:
                d = jnp.argmax(dlogits, axis=-1).astype(jnp.int32)

        # ---- ONE batched verify forward for every row's drafts ----------
        prevs = jnp.concatenate([token1[:, None], d[:, :-1]], axis=1)
        xs, (k2, v2) = _scan_layers_rows(
            params, prevs, k1, v1, pos1, cfg, attn_len,
            token_mask=jnp.broadcast_to(active_it[:, None], prevs.shape))
        _, vlogits = _hidden_logits(params, xs, cfg)             # (B,kd,V)

        if sampling:
            # ---- rejection-sampling acceptance (distribution-exact) -----
            if rows is not None:
                pf = _filtered_logits_rows(
                    vlogits, rows[0][:, None], rows[1][:, None],
                    rows[2][:, None])
            else:
                pf = _filtered_logits(vlogits, temperature, top_k, top_p)
            pp = jax.nn.softmax(pf, axis=-1)                     # target
            if qf is None:
                qp = jax.nn.one_hot(d, pp.shape[-1],
                                    dtype=jnp.float32)           # det. prop.
            else:
                qp = jax.nn.softmax(qf, axis=-1)                 # proposal
            p_d = jnp.take_along_axis(pp, d[..., None], axis=-1)[..., 0]
            q_d = jnp.take_along_axis(qp, d[..., None], axis=-1)[..., 0]
            u = jax.random.uniform(k_u, d.shape)
            accept = u * q_d < p_d                               # (B, kd)
            resid = jnp.maximum(pp - qp, 0.0)
            rsum = jnp.sum(resid, axis=-1, keepdims=True)
            # p == q => rejection has probability 0; guard the all-zero
            # residual so the (never-committed) correction sample is valid
            resid = jnp.where(rsum > 0, resid, pp)
            corr = jax.random.categorical(
                k_corr, jnp.log(jnp.maximum(resid, 1e-30)),
                axis=-1).astype(jnp.int32)
            vals = jnp.where(accept, d, corr)                    # (B, kd)
            if rows is not None:
                # greedy rows: exact argmax acceptance, independent of
                # one-hot float behavior
                g = (rows[0] <= 0.0)[:, None]
                a_greedy = jnp.argmax(vlogits, axis=-1).astype(jnp.int32)
                accept = jnp.where(g, d == a_greedy, accept)
                vals = jnp.where(g, a_greedy, vals)
        else:
            a = jnp.argmax(vlogits, axis=-1).astype(jnp.int32)   # (B, kd)
            accept = d == a
            vals = a

        # ---- each row commits its accepted prefix + first correction ----
        prefix_ok = jnp.concatenate(
            [jnp.ones((bsz, 1), bool),
             jnp.cumprod(accept[:, :-1].astype(jnp.int32),
                         axis=1).astype(bool)], axis=1)
        commit = (active_it[:, None] & prefix_ok
                  & (count[:, None] + 1 + offs[None] < limits[:, None]))
        n_commit = jnp.sum(commit.astype(jnp.int32), axis=1)     # (B,)

        pos2 = pos1 + n_commit
        last_v = jnp.take_along_axis(
            vals, jnp.maximum(n_commit - 1, 0)[:, None], axis=1)[:, 0]
        tok2 = jnp.where(n_commit > 0, last_v, tok1)

        emitted = jnp.where(
            jnp.concatenate([active_it[:, None], commit], axis=1),
            jnp.concatenate([token1[:, None], vals], axis=1), jnp.int32(-1))
        # frozen rows re-write -1 at [count..count+kd] — always >= their
        # final count, where out is still -1 (commits are prefix-shaped)
        out = out.at[barange[:, None],
                     count[:, None] + jnp.arange(kd + 1)[None]].set(emitted)
        count = count + active_it.astype(jnp.int32) + n_commit
        iters = iters + active_it.astype(jnp.int32)
        return k2, v2, pos2, tok2, count, out, iters, key

    def cond(carry):
        count = carry[4]
        return jnp.any(count < limits)

    k, v, pos, tok, count, out, iters, _ = lax.while_loop(
        cond, iteration,
        (state.k, state.v, state.pos, state.tok,
         jnp.zeros((bsz,), jnp.int32), out0, jnp.zeros((bsz,), jnp.int32),
         rng))
    return out[:, :block], LlamaPoolState(k, v, pos, tok), iters
