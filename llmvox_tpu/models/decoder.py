"""The LLMVoX speech-token decoder: a tiny GPT over fused text+speech embeddings.

Architecture parity with the reference (src/model.py:149-237): learned
absolute position embeddings ``wpe`` (no token-embedding table — inputs are
pre-built continuous embeddings), pre-LN transformer blocks with
tanh-approximate GELU MLPs, LayerNorm eps 1e-5, an lm_head onto 4096
WavTokenizer codes, and cross-entropy with ignore_index -1000.

TPU-first design (not a translation):

- parameters are plain pytrees with all transformer layers *stacked* along
  a leading axis, so both training and decode run the layer stack as one
  ``lax.scan`` body — one compiled block regardless of depth.
- decode uses a persistent, pre-allocated KV cache ``(L, S, C)`` plus a
  position index — replacing the reference's O(n^2) concat cache
  (src/model.py:74-79) and its 4 device round-trips per token
  (streaming_server.py:323-346).
- ``decode_block`` fuses the *entire* per-token pipeline on device —
  text-byte embedding lookup, previous-speech-token codebook lookup,
  concat + L2-normalize, transformer step, argmax, EOA detection — and
  scans it ``block`` tokens per device call.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from llmvox_tpu.ops import nn
from llmvox_tpu.ops.attention import (NEG_INF, causal_attention,
                                      causal_attention_auto, decode_attention)
from llmvox_tpu.utils.config import DecoderConfig


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_decoder_params(key: jax.Array, cfg: DecoderConfig) -> Dict:
    """GPT-2-style init (src/model.py:193-199): normal(0.02), residual
    projections scaled by 1/sqrt(2*n_layer), zeros for biases."""
    l, c = cfg.n_layer, cfg.n_embd
    ks = jax.random.split(key, 8)

    def norm(k, shape, std=0.02):
        return std * jax.random.normal(k, shape, jnp.float32)

    resid_std = 0.02 / math.sqrt(2 * l)
    h = {
        "ln1_s": jnp.ones((l, c)),
        "wqkv": norm(ks[0], (l, c, 3 * c)),
        "wo": norm(ks[1], (l, c, c), resid_std),
        "ln2_s": jnp.ones((l, c)),
        "wfc": norm(ks[2], (l, c, 4 * c)),
        "wproj": norm(ks[3], (l, 4 * c, c), resid_std),
    }
    if cfg.bias:
        h.update({
            "ln1_b": jnp.zeros((l, c)), "bqkv": jnp.zeros((l, 3 * c)),
            "bo": jnp.zeros((l, c)), "ln2_b": jnp.zeros((l, c)),
            "bfc": jnp.zeros((l, 4 * c)), "bproj": jnp.zeros((l, c)),
        })
    params = {
        "wpe": norm(ks[4], (cfg.block_size, c)),
        "h": h,
        "lnf_s": jnp.ones((c,)),
        "head": norm(ks[5], (c, cfg.vocab_size)),
    }
    if cfg.bias:
        params["lnf_b"] = jnp.zeros((c,))
    if cfg.n_draft_heads > 0:
        # speculative-decoding draft heads: head j predicts the token at
        # t+2+j from position t's final hidden state (trained with the
        # shifted aux losses in decoder_loss; verified/accepted at decode
        # time by decode_block_spec)
        params["draft_heads"] = norm(
            ks[6], (cfg.n_draft_heads, c, cfg.vocab_size))
    return params


def num_params(params: Dict, non_embedding: bool = True) -> int:
    n = sum(x.size for x in jax.tree.leaves(params))
    if non_embedding:
        n -= params["wpe"].size
    return n


def _get(p: Dict, key: str):
    return p.get(key, None)


# ---------------------------------------------------------------------------
# full-sequence forward (training / eval)
# ---------------------------------------------------------------------------

def apply_decoder(params: Dict, emb: jnp.ndarray, cfg: DecoderConfig,
                  *, dropout_rng: Optional[jax.Array] = None,
                  train: bool = False, return_hidden: bool = False,
                  attn_fn=None, positions: Optional[jnp.ndarray] = None,
                  segments: Optional[jnp.ndarray] = None):
    """(B, T, C) fused input embeddings -> (B, T, vocab) logits, causal.
    ``return_hidden=True`` also returns the final pre-head hidden states
    (the draft heads' input).  ``attn_fn`` overrides the attention op
    (same (B, T, H, D) q/k/v -> (B, T, H, D) contract) — used by the
    sequence-parallel trainer to swap in ring attention
    (ops/ring_attention.py) with the T axis sharded over the mesh.

    PACKED batches (train/data.py::collate_packed): ``positions`` (B, T)
    indexes the learned absolute positional table per SENTENCE (so a
    packed sentence sees exactly the wpe rows its unpacked twin would),
    and ``segments`` (B, T) makes attention block-diagonal-causal.  Not
    composable with a custom ``attn_fn`` (ring attention shards T; the
    zigzag permutation would scramble segment runs)."""
    b, t, c = emb.shape
    use_dropout = train and cfg.dropout > 0.0 and dropout_rng is not None
    if segments is not None:
        assert attn_fn is None, "packed segments need the default attention"
        attn_fn = partial(causal_attention_auto, segments=segments)

    def drop(x, rng):
        keep = jax.random.bernoulli(rng, 1.0 - cfg.dropout, x.shape)
        return jnp.where(keep, x / (1.0 - cfg.dropout), 0.0)

    wpe = (params["wpe"][:t] if positions is None
           else params["wpe"][positions])
    x = emb + wpe.astype(emb.dtype)
    if use_dropout:
        # reference dropout sites (src/model.py): embedding drop, the two
        # residual drops per block (after attention proj and after the
        # MLP proj).  The attention-matrix dropout inside SDPA is omitted
        # (inactive at the deployed dropout=0.0, and incompatible with
        # the blockwise flash path).
        emb_rng, layers_rng = jax.random.split(dropout_rng)
        x = drop(x, emb_rng)
        layer_rngs = jax.random.split(layers_rng, cfg.n_layer * 2).reshape(
            cfg.n_layer, 2, -1)
    else:
        layer_rngs = jnp.zeros((cfg.n_layer, 2, 2), jnp.uint32)

    def block(x, scan_in):
        p, rngs = scan_in
        hnorm = nn.layer_norm(x, p["ln1_s"], _get(p, "ln1_b"), cfg.ln_eps)
        qkv = nn.linear(hnorm, p["wqkv"], _get(p, "bqkv"))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = cfg.head_dim
        q = q.reshape(b, t, cfg.n_head, hd)
        k = k.reshape(b, t, cfg.n_head, hd)
        v = v.reshape(b, t, cfg.n_head, hd)
        a = (attn_fn or causal_attention_auto)(q, k, v).reshape(b, t, c)
        a = nn.linear(a, p["wo"], _get(p, "bo"))
        if use_dropout:
            a = drop(a, rngs[0])
        x = x + a
        hnorm = nn.layer_norm(x, p["ln2_s"], _get(p, "ln2_b"), cfg.ln_eps)
        m = nn.linear(hnorm, p["wfc"], _get(p, "bfc"))
        m = nn.gelu_tanh(m)
        m = nn.linear(m, p["wproj"], _get(p, "bproj"))
        if use_dropout:
            m = drop(m, rngs[1])
        x = x + m
        return x, None

    # remat_layers: recompute each block in the backward pass instead of
    # saving its intermediates (qkv, attention output, f32 MLP hidden —
    # the 4x(B,T,4C) f32 gelu inputs alone are 3 GB at bs8/T8192).
    # Trades ~1 extra forward of FLOPs for O(layers) less live memory.
    body = jax.checkpoint(block) if cfg.remat_layers else block
    x, _ = lax.scan(body, x, (params["h"], layer_rngs))
    x = nn.layer_norm(x, params["lnf_s"], _get(params, "lnf_b"), cfg.ln_eps)
    logits = nn.linear(x, params["head"]).astype(jnp.float32)
    if return_hidden:
        return logits, x
    return logits


def _masked_ce(logits: jnp.ndarray, targets: jnp.ndarray,
               ignore_index: int) -> jnp.ndarray:
    """Cross-entropy with ignore_index (src/model.py:229-230)."""
    valid = targets != ignore_index
    safe_targets = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def decoder_loss(params: Dict, emb: jnp.ndarray, targets: jnp.ndarray,
                 cfg: DecoderConfig, *,
                 dropout_rng: Optional[jax.Array] = None,
                 train: bool = True,
                 mtp_weight: float = 0.2, attn_fn=None,
                 positions: Optional[jnp.ndarray] = None,
                 segments: Optional[jnp.ndarray] = None,
                 perm: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Cross-entropy with ignore_index (src/model.py:229-230).

    With ``cfg.n_draft_heads > 0`` (params carry ``draft_heads``), adds
    the multi-token-prediction aux losses: head j is trained to predict
    the target shifted j+1 further ahead from the same hidden state, so
    its decode-time drafts approximate the model's own future greedy
    tokens (the only thing decode_block_spec needs — acceptance keeps
    correctness regardless).

    ``positions``/``segments``: packed-batch plumbing (see
    :func:`apply_decoder`); the MTP shifted targets additionally mask
    positions whose shifted target falls in a DIFFERENT sentence —
    without that, every packed boundary would train head j on the next
    sentence's codes.

    ``perm``: static (T,) zigzag permutation for the balanced sp ring
    layout (ops/ring_attention.py::zigzag_permutation) — emb, targets
    and the MTP shifted targets (computed in ORIGINAL time order first,
    because "t+shift" means adjacent original positions, not adjacent
    rows) are gathered through it and the positional table is indexed by
    it, so the loss equals the unpermuted loss exactly while attention
    (``attn_fn = make_zigzag_ring_attention(mesh)``) runs in the zigzag
    layout.  Cross-entropy is a masked mean over positions, so row order
    cancels.  Not composable with packed segments."""
    n_heads = (params["draft_heads"].shape[0]
               if "draft_heads" in params else 0)
    shifted = []
    for j in range(n_heads):
        shift = j + 1
        # hidden at position t predicts targets[t + shift]
        tgt = jnp.concatenate(
            [targets[:, shift:],
             jnp.full((targets.shape[0], shift), cfg.ignore_index,
                      targets.dtype)], axis=1)
        if segments is not None:
            seg_shift = jnp.concatenate(
                [segments[:, shift:],
                 jnp.zeros((segments.shape[0], shift),
                           segments.dtype)], axis=1)
            tgt = jnp.where(seg_shift == segments, tgt, cfg.ignore_index)
        shifted.append(tgt)
    if perm is not None:
        assert segments is None and positions is None, \
            "zigzag perm is not composable with packed batches"
        emb = emb[:, perm]
        targets = targets[:, perm]
        shifted = [t[:, perm] for t in shifted]
        positions = perm
    if n_heads == 0:
        logits = apply_decoder(params, emb, cfg, dropout_rng=dropout_rng,
                               train=train, attn_fn=attn_fn,
                               positions=positions, segments=segments)
        return _masked_ce(logits, targets, cfg.ignore_index)
    logits, hidden = apply_decoder(params, emb, cfg,
                                   dropout_rng=dropout_rng, train=train,
                                   return_hidden=True, attn_fn=attn_fn,
                                   positions=positions, segments=segments)
    loss = _masked_ce(logits, targets, cfg.ignore_index)
    aux = 0.0
    for j in range(n_heads):
        lj = nn.linear(hidden, params["draft_heads"][j]).astype(jnp.float32)
        aux = aux + _masked_ce(lj, shifted[j], cfg.ignore_index)
    return loss + mtp_weight * aux / n_heads


# ---------------------------------------------------------------------------
# streaming decode
# ---------------------------------------------------------------------------

class DecodeState(NamedTuple):
    """Per-stream decode state; reset at every sentence boundary
    (the scheduler's 'infinite dialogue' mechanism, streaming_server.py:406-417)."""

    k_cache: jnp.ndarray   # (L, S, C)
    v_cache: jnp.ndarray   # (L, S, C)
    pos: jnp.ndarray       # scalar int32, tokens generated so far
    prev_token: jnp.ndarray  # scalar int32
    done: jnp.ndarray      # scalar bool — EOA emitted


def crop_block_size(params: Dict, cfg: DecoderConfig,
                    new_block: int) -> Tuple[Dict, DecoderConfig]:
    """Shrink a trained model's context window (reference
    src/model.py:239-250 ``crop_block_size``): crop ``wpe`` to the new
    length.  No attention-bias buffer to crop here — masks are built from
    iotas at trace time.
    """
    import dataclasses
    assert new_block <= cfg.block_size
    params = dict(params)
    params["wpe"] = params["wpe"][:new_block]
    return params, dataclasses.replace(cfg, block_size=new_block)


def init_decode_state(cfg: DecoderConfig, dtype=jnp.bfloat16) -> DecodeState:
    l, s, c = cfg.n_layer, cfg.block_size, cfg.n_embd
    return DecodeState(
        k_cache=jnp.zeros((l, s, c), dtype),
        v_cache=jnp.zeros((l, s, c), dtype),
        pos=jnp.int32(0),
        prev_token=jnp.int32(0),
        done=jnp.bool_(False),
    )


def _decode_one(params: Dict, cfg: DecoderConfig, x: jnp.ndarray,
                state: DecodeState, return_logits: bool = False,
                return_hidden: bool = False):
    """One transformer step for one new position; x is (C,).

    Layers are a static python loop and the (L, S, C) caches are updated
    with per-layer ``dynamic_update_slice`` on the *carried* arrays — the
    donation-friendly form XLA turns into true in-place row writes (a
    scan-emitted fresh cache per step would risk full-cache copies).
    """
    pos = state.pos
    x = x + params["wpe"][pos].astype(x.dtype)

    def layer_body(carry, p):
        x, new_k, new_v, l = carry
        hnorm = nn.layer_norm(x, p["ln1_s"], _get(p, "ln1_b"), cfg.ln_eps)
        qkv = nn.linear(hnorm[None], p["wqkv"], _get(p, "bqkv"))[0]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        new_k = lax.dynamic_update_slice(
            new_k, k[None, None].astype(new_k.dtype), (l, pos, 0))
        new_v = lax.dynamic_update_slice(
            new_v, v[None, None].astype(new_v.dtype), (l, pos, 0))
        if cfg.use_pallas_attention:
            from llmvox_tpu.ops.pallas_attn import pallas_decode_attention
            a = pallas_decode_attention(q, new_k, new_v, pos,
                                        n_head=cfg.n_head, layer=l)
        else:
            kc = lax.dynamic_index_in_dim(new_k, l, 0, keepdims=False)
            vc = lax.dynamic_index_in_dim(new_v, l, 0, keepdims=False)
            a = decode_attention(q, kc, vc, pos, n_head=cfg.n_head)
        x = x + nn.linear(a[None], p["wo"], _get(p, "bo"))[0]
        hnorm = nn.layer_norm(x, p["ln2_s"], _get(p, "ln2_b"), cfg.ln_eps)
        m = nn.gelu_tanh(nn.linear(hnorm[None], p["wfc"], _get(p, "bfc")))
        x = x + nn.linear(m, p["wproj"], _get(p, "bproj"))[0]
        return (x, new_k, new_v, l + 1), None

    # rolled layer scan keeps the compiled decode program ~L*block times
    # smaller than full unrolling (compile time matters for serving warmup);
    # the caches ride the carry so writes stay in-place.
    (x, new_k, new_v, _), _ = lax.scan(
        layer_body, (x, state.k_cache, state.v_cache, jnp.int32(0)),
        params["h"], unroll=cfg.n_layer if cfg.unroll_layers else 1)

    x = nn.layer_norm(x, params["lnf_s"], _get(params, "lnf_b"), cfg.ln_eps)
    # the head matmul accumulates in f32 even under bf16 serving params so
    # the 4096-way argmax matches the reference's f32 softmax-argmax
    # (streaming_server.py:343-346)
    logits = jnp.dot(x, nn.dense_weight(params["head"], x.dtype),
                     preferred_element_type=jnp.float32)
    token = jnp.argmax(logits).astype(jnp.int32)
    if return_logits:
        return token, new_k, new_v, logits
    if return_hidden:
        return token, new_k, new_v, x
    return token, new_k, new_v


@partial(jax.jit, static_argnames=("cfg", "block"))
def decode_block(params: Dict, text_table: jnp.ndarray, codebook: jnp.ndarray,
                 state: DecodeState, text_window: jnp.ndarray,
                 text_len: jnp.ndarray, limit: jnp.ndarray,
                 cfg: DecoderConfig, block: int = 32):
    """Generate up to ``block`` speech tokens fully on device.

    Per step (mirrors streaming_server.py:323-354 semantics): the text id
    for position ``pos`` is the next unconsumed text id while
    ``pos < text_len`` and PAD (384) afterwards; the speech feature is the
    codebook embedding of the previous token (zeros at position 0); both
    are concatenated and L2-normalized (src/data.py:281-287) before the
    transformer step; the next token is the argmax over 4096 codes;
    EOA (453) sets ``done``.

    Args:
      text_table: (text_vocab, 256) byte-embedding table.
      codebook: (vq_bins, 512) speech codebook.
      text_window: (block,) int32 — ``text_ids[state.pos : state.pos+block]``
        host-side slice (385 already appended at sentence end by the
        scheduler; PAD-filled past the end).  Window-sized so each device
        call ships ~block*4 bytes, not the whole transcript.
      text_len: scalar int32 — absolute number of valid text ids.
      limit: scalar int32 — pacing: max tokens to generate this call
        (min(block, text available) while the sentence is still streaming).

    Returns:
      (tokens (block,) int32 with -1 at inactive slots, n_generated, state)
    """
    compute_dtype = state.k_cache.dtype

    def step(carry, i):
        st = carry
        active = jnp.logical_and(i < limit, jnp.logical_not(st.done))

        # While active, pos == initial_pos + i, so window index i is the
        # text id for this position.
        tid = jnp.where(st.pos < text_len, text_window[i], cfg.pad_token_id)
        temb = text_table[tid]
        sfeat = jnp.where(st.pos == 0, jnp.zeros((cfg.speech_embed_dim,)),
                          codebook[st.prev_token])
        x = nn.l2_normalize(jnp.concatenate([temb, sfeat]))
        x = x.astype(compute_dtype)

        token, new_k, new_v = _decode_one(params, cfg, x, st)

        # The cache write at ``pos`` is committed unconditionally: on an
        # inactive step ``pos`` does not advance, so the next active step
        # overwrites the same row before anything attends to it.  This keeps
        # the step free of full-cache selects.
        pos = jnp.where(active, st.pos + 1, st.pos)
        prev = jnp.where(active, token, st.prev_token)
        done = jnp.logical_or(
            st.done, jnp.logical_and(active, token == cfg.eoa_token_id))
        out = jnp.where(active, token, jnp.int32(-1))
        return DecodeState(new_k, new_v, pos, prev, done), out

    state, tokens = lax.scan(step, state, jnp.arange(block, dtype=jnp.int32))
    n = jnp.sum((tokens >= 0).astype(jnp.int32))
    return tokens, n, state


@partial(jax.jit, static_argnames=("cfg", "block", "top_k"))
def sample_block(params: Dict, text_table: jnp.ndarray, codebook: jnp.ndarray,
                 state: DecodeState, text_window: jnp.ndarray,
                 text_len: jnp.ndarray, limit: jnp.ndarray, key: jax.Array,
                 temperature: float, cfg: DecoderConfig, block: int = 32,
                 top_k: Optional[int] = None):
    """``decode_block`` with temperature/top-k sampling instead of argmax —
    the counterpart of GPT.generate (src/model.py:383-410), which the
    reference ships but whose server never uses (it decodes greedily).
    """
    compute_dtype = state.k_cache.dtype

    def step(carry, inp):
        st, k = carry
        i = inp
        k, sub = jax.random.split(k)
        active = jnp.logical_and(i < limit, jnp.logical_not(st.done))
        tid = jnp.where(st.pos < text_len, text_window[i], cfg.pad_token_id)
        temb = text_table[tid]
        sfeat = jnp.where(st.pos == 0, jnp.zeros((cfg.speech_embed_dim,)),
                          codebook[st.prev_token])
        x = nn.l2_normalize(jnp.concatenate([temb, sfeat]))
        x = x.astype(compute_dtype)
        _, new_k, new_v, logits = _decode_one(params, cfg, x, st,
                                              return_logits=True)
        logits = logits / jnp.maximum(temperature, 1e-6)
        if top_k is not None:
            kth = jax.lax.top_k(logits, top_k)[0][-1]
            logits = jnp.where(logits < kth, float("-inf"), logits)
        token = jax.random.categorical(sub, logits).astype(jnp.int32)
        pos = jnp.where(active, st.pos + 1, st.pos)
        prev = jnp.where(active, token, st.prev_token)
        done = jnp.logical_or(
            st.done, jnp.logical_and(active, token == cfg.eoa_token_id))
        out = jnp.where(active, token, jnp.int32(-1))
        return (DecodeState(new_k, new_v, pos, prev, done), k), out

    (state, _), tokens = lax.scan(
        step, (state, key), jnp.arange(block, dtype=jnp.int32))
    n = jnp.sum((tokens >= 0).astype(jnp.int32))
    return tokens, n, state


def _batched_decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                              v_cache: jnp.ndarray, pos: jnp.ndarray, *,
                              n_head: int, chunk: int = 512) -> jnp.ndarray:
    """Decode attention for B streams at per-stream positions.

    q: (B, C); caches: (B, S, C); pos: (B,).  Chunked online softmax with
    trip count from the deepest stream; shallower streams mask.
    """
    b, s, c = k_cache.shape
    chunk = min(chunk, s)
    h, d = n_head, c // n_head
    qh = q.reshape(b, h, d).astype(jnp.float32)
    scale = 1.0 / math.sqrt(d)
    nchunks = (jnp.max(pos) + chunk) // chunk

    def body(ci, carry):
        m, l, acc = carry
        start = ci * chunk
        kc = lax.dynamic_slice(k_cache, (0, start, 0), (b, chunk, c))
        vc = lax.dynamic_slice(v_cache, (0, start, 0), (b, chunk, c))
        kc = kc.reshape(b, chunk, h, d).astype(jnp.float32)
        vc = vc.reshape(b, chunk, h, d).astype(jnp.float32)
        logits = jnp.einsum("bhd,bshd->bhs", qh, kc,
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST) * scale
        idx = start + lax.broadcasted_iota(jnp.int32, (1, 1, chunk), 2)
        logits = jnp.where(idx <= pos[:, None, None], logits, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.einsum(
            "bhs,bshd->bhd", p, vc, preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)
        return m_new, l_new, acc_new

    m0 = jnp.full((b, h, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, d), jnp.float32)
    m, l, acc = lax.fori_loop(0, nchunks, body, (m0, l0, acc0))
    return (acc / l).reshape(b, c).astype(q.dtype)


def _decode_one_batch(params: Dict, cfg: DecoderConfig, x: jnp.ndarray,
                      state: DecodeState, return_hidden: bool = False):
    """Batched transformer step: x (B, C), caches (L, B, S, C), pos (B,).

    Layers are a static python loop so per-layer cache access is a
    contiguous [l] slice (no dynamic gather) and the per-stream row write
    is one scatter over (stream, position) pairs — this is why the batched
    path is hand-written rather than a vmap of the single-stream step
    (vmap lowers the cache ops to full-cache copies).
    """
    b = x.shape[0]
    pos = state.pos
    x = x + params["wpe"][pos].astype(x.dtype)
    new_k, new_v = state.k_cache, state.v_cache
    barange = jnp.arange(b)
    h_params = params["h"]

    for l in range(cfg.n_layer):
        # tree-aware layer slice: a stacked weight may be a quantized
        # NamedTuple (ops/quant.py), where val[l] would index FIELDS
        p = {key: jax.tree.map(lambda x: x[l], val)
             for key, val in h_params.items()}
        hnorm = nn.layer_norm(x, p["ln1_s"], _get(p, "ln1_b"), cfg.ln_eps)
        qkv = nn.linear(hnorm, p["wqkv"], _get(p, "bqkv"))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        new_k = new_k.at[l, barange, pos].set(k.astype(new_k.dtype))
        new_v = new_v.at[l, barange, pos].set(v.astype(new_v.dtype))
        if cfg.use_pallas_attention:
            from llmvox_tpu.ops.pallas_attn import (
                pallas_batched_decode_attention)
            # full caches + layer scalar: slicing new_k[l] for the kernel
            # operand would materialize a 100MB copy per launch
            a = pallas_batched_decode_attention(q, new_k, new_v, pos,
                                                n_head=cfg.n_head,
                                                layer=jnp.int32(l))
        else:
            a = _batched_decode_attention(q, new_k[l], new_v[l], pos,
                                          n_head=cfg.n_head)
        x = x + nn.linear(a, p["wo"], _get(p, "bo"))
        hnorm = nn.layer_norm(x, p["ln2_s"], _get(p, "ln2_b"), cfg.ln_eps)
        m = nn.gelu_tanh(nn.linear(hnorm, p["wfc"], _get(p, "bfc")))
        x = x + nn.linear(m, p["wproj"], _get(p, "bproj"))

    x = nn.layer_norm(x, params["lnf_s"], _get(params, "lnf_b"), cfg.ln_eps)
    logits = jnp.dot(x, nn.dense_weight(params["head"], x.dtype),
                     preferred_element_type=jnp.float32)
    tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if return_hidden:
        return tokens, new_k, new_v, x
    return tokens, new_k, new_v


@partial(jax.jit, static_argnames=("cfg", "block"))
def decode_block_batch(params: Dict, text_table: jnp.ndarray,
                       codebook: jnp.ndarray, states: DecodeState,
                       text_windows: jnp.ndarray, text_lens: jnp.ndarray,
                       limits: jnp.ndarray, cfg: DecoderConfig,
                       block: int = 32):
    """Multi-stream decode: B independent streams advance together, one
    weight read per step for the whole batch — the batched-KV-cache
    multi-stream serving path (BASELINE config #5; no reference
    counterpart — the reference pins one replica per GPU).

    Args:
      states: batched DecodeState (caches (L, B, S, C); pos/prev/done (B,)).
      text_windows: (B, block); text_lens, limits: (B,).
    Returns:
      (tokens (B, block) with -1 at inactive slots, n (B,), states)
    """
    compute_dtype = states.k_cache.dtype

    # NOTE on a road not taken: round 1 built a monolithic fused decode-step
    # Pallas kernel (all layers + head + argmax around a static weight-tile
    # DMA stream).  After three optimization rounds it ran 14.2 ms per
    # 8x32 block vs 9.5 ms for this per-layer XLA + Pallas-attention path:
    # at this shape the step is DMA-latency-bound, the 16 MB VMEM budget
    # caps the weight double-buffer at ~3.5 MB pieces, and XLA's deeper
    # matmul software pipeline wins.  The kernel was removed (git history:
    # ops/pallas_step.py); its transferable lessons — defer row scatters
    # one scan step to keep caches a single donated buffer, use per-layer
    # static-index cache scatters (the advanced-index form copies the
    # whole cache, ~2.6 ms/step) — are already applied here.

    def step(st, i):
        active = jnp.logical_and(i < limits, jnp.logical_not(st.done))
        tid = jnp.where(st.pos < text_lens, text_windows[:, i],
                        cfg.pad_token_id)
        temb = text_table[tid]                                  # (B, 256)
        sfeat = jnp.where((st.pos == 0)[:, None],
                          jnp.zeros((1, cfg.speech_embed_dim)),
                          codebook[st.prev_token])
        x = nn.l2_normalize(jnp.concatenate([temb, sfeat], axis=-1))
        x = x.astype(compute_dtype)

        tokens, new_k, new_v = _decode_one_batch(params, cfg, x, st)
        pos = jnp.where(active, st.pos + 1, st.pos)
        prev = jnp.where(active, tokens, st.prev_token)
        done = jnp.logical_or(
            st.done, jnp.logical_and(active, tokens == cfg.eoa_token_id))
        out = jnp.where(active, tokens, jnp.int32(-1))
        return DecodeState(new_k, new_v, pos, prev, done), out

    states, tokens = lax.scan(step, states,
                              jnp.arange(block, dtype=jnp.int32))
    tokens = jnp.swapaxes(tokens, 0, 1)                         # (B, block)
    n = jnp.sum((tokens >= 0).astype(jnp.int32), axis=-1)
    return tokens, n, states


def init_decode_state_batch(cfg: DecoderConfig, batch: int,
                            dtype=jnp.bfloat16) -> DecodeState:
    l, s, c = cfg.n_layer, cfg.block_size, cfg.n_embd
    return DecodeState(
        k_cache=jnp.zeros((l, batch, s, c), dtype),
        v_cache=jnp.zeros((l, batch, s, c), dtype),
        pos=jnp.zeros((batch,), jnp.int32),
        prev_token=jnp.zeros((batch,), jnp.int32),
        done=jnp.zeros((batch,), bool),
    )


# ---------------------------------------------------------------------------
# speculative block decode (beyond-reference; VERDICT r2 #7)
# ---------------------------------------------------------------------------

def _decode_many(params: Dict, cfg: DecoderConfig, xs: jnp.ndarray,
                 state: DecodeState, n: int, return_hidden: bool = False):
    """Teacher-forced verify forward: ``n`` new positions
    ``pos..pos+n-1`` in ONE pass (the speculative-decode verifier).

    Same math as ``n`` chained ``_decode_one`` steps given the same
    inputs, but the per-position sequential dependency is broken by
    feeding the DRAFT tokens as the previous-token features — the caller
    accepts only the prefix whose drafts matched.  Returns (argmax tokens
    (n,), new_k, new_v[, final hidden (n, C) when ``return_hidden``])."""
    pos = state.pos
    x = xs + lax.dynamic_slice_in_dim(params["wpe"], pos, n, 0).astype(
        xs.dtype)
    h_, d_ = cfg.n_head, cfg.head_dim

    def verify_attention(q, kfull, vfull, layer, chunk=512):
        """Chunked online-softmax attention for the ``n`` verify queries,
        reading cache chunks only up to position ``pos + n - 1`` (the
        full-cache einsum this replaces streamed all ``S`` rows per
        verify — at the deployed S=8192 that alone made speculation a
        net loss; measured in benchmarks/spec_bench.py).  Chunks are
        sliced straight from the FULL (L, S, C) caches: indexing
        ``cache[l]`` first materialized a 2x(S, C) layer copy per layer
        per iteration (~100 MB at the deployed shape, r5 finding)."""
        _, s, c = kfull.shape
        chunk = min(chunk, s)
        while s % chunk:
            # chunk must divide S: dynamic_slice clamps an out-of-range
            # start but the position mask (start + iota) would not follow,
            # misaligning the causal mask on the final partial chunk.
            chunk //= 2
        qh = q.reshape(n, h_, d_).astype(jnp.float32)
        scale = 1.0 / math.sqrt(d_)
        nchunks = (pos + n - 1 + chunk) // chunk

        def body(ci, carry):
            m, l, acc = carry
            start = ci * chunk
            kch = lax.dynamic_slice(kfull, (layer, start, 0),
                                    (1, chunk, c))
            vch = lax.dynamic_slice(vfull, (layer, start, 0),
                                    (1, chunk, c))
            kch = kch.reshape(chunk, h_, d_).astype(jnp.float32)
            vch = vch.reshape(chunk, h_, d_).astype(jnp.float32)
            logits = jnp.einsum("nhd,shd->nhs", qh, kch,
                                preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST) * scale
            jpos = start + lax.broadcasted_iota(jnp.int32, (n, 1, chunk), 2)
            ipos = lax.broadcasted_iota(jnp.int32, (n, 1, chunk), 0)
            logits = jnp.where(jpos <= pos + ipos, logits, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
            p = jnp.exp(logits - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * corr + jnp.einsum(
                "nhs,shd->nhd", p, vch,
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)
            return m_new, l_new, acc_new

        m0 = jnp.full((n, h_, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((n, h_, 1), jnp.float32)
        acc0 = jnp.zeros((n, h_, d_), jnp.float32)
        m, l, acc = lax.fori_loop(0, nchunks, body, (m0, l0, acc0))
        return (acc / l).reshape(n, cfg.n_embd)

    def layer_body(carry, p):
        x, new_k, new_v, l = carry
        hnorm = nn.layer_norm(x, p["ln1_s"], _get(p, "ln1_b"), cfg.ln_eps)
        qkv = nn.linear(hnorm, p["wqkv"], _get(p, "bqkv"))       # (n, 3C)
        q, kk, vv = jnp.split(qkv, 3, axis=-1)
        new_k = lax.dynamic_update_slice(
            new_k, kk[None].astype(new_k.dtype), (l, pos, 0))
        new_v = lax.dynamic_update_slice(
            new_v, vv[None].astype(new_v.dtype), (l, pos, 0))
        # NOTE(r5): routing this through pallas_verify_attention as a
        # B=1 view (full caches + layer scalar) was built and measured:
        # 8354 -> 5024 tok/s at k=8 in the calibration harness — kernel
        # launch + grid overhead dominates a (1, kd+1)-query problem.
        # The XLA chunked path stays for B=1; the kernel pays off only
        # in the BATCHED verify (_decode_many_batch).
        a = verify_attention(q, new_k, new_v, l).astype(x.dtype)
        x = x + nn.linear(a, p["wo"], _get(p, "bo"))
        hnorm = nn.layer_norm(x, p["ln2_s"], _get(p, "ln2_b"), cfg.ln_eps)
        m = nn.gelu_tanh(nn.linear(hnorm, p["wfc"], _get(p, "bfc")))
        x = x + nn.linear(m, p["wproj"], _get(p, "bproj"))
        return (x, new_k, new_v, l + 1), None

    (x, new_k, new_v, _), _ = lax.scan(
        layer_body, (x, state.k_cache, state.v_cache, jnp.int32(0)),
        params["h"])
    x = nn.layer_norm(x, params["lnf_s"], _get(params, "lnf_b"), cfg.ln_eps)
    logits = jnp.dot(x, nn.dense_weight(params["head"], x.dtype),
                     preferred_element_type=jnp.float32)
    if return_hidden:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_k, new_v, x
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_k, new_v


@partial(jax.jit, static_argnames=("cfg", "block", "k_draft"))
def decode_block_spec(params: Dict, text_table: jnp.ndarray,
                      codebook: jnp.ndarray, state: DecodeState,
                      text_window: jnp.ndarray, text_len: jnp.ndarray,
                      limit: jnp.ndarray, cfg: DecoderConfig,
                      block: int = 32, k_draft: int = 4,
                      draft_tokens: Optional[jnp.ndarray] = None):
    """Speculative ``decode_block``: greedy-exact output in fewer
    sequential steps when drafts are good.

    Each iteration runs ONE fused teacher-forced forward over ``k_draft
    + 1`` positions: slot 0 is conditioned on the committed previous
    token (always exact — a free greedy step), slots 1..k on the drafts
    carried from the previous iteration (``params["draft_heads"]`` on
    the hidden state at the last committed position, or the explicit
    ``draft_tokens`` stream indexed by relative position).  The model's
    own argmax is committed for slot 0 plus the prefix whose drafts
    matched.  Output is BIT-IDENTICAL to ``decode_block`` for any draft
    quality — drafts only change how many iterations the block takes
    (``iters`` in the return, for measurement).  Mis-speculated cache
    rows sit above ``pos`` and are overwritten before any later query
    can attend them (the same argument as the padded-prefill paths).

    Design history: the first version ran a fixed-length scan
    ((block+1)//2 worst-case iterations regardless of accepts), the
    second a while_loop of TWO forwards per iteration (a 1-position
    step for the bonus token + hidden-state drafts, then a k-wide
    verify).  Folding the step into the verify (drafts come from the
    verify pass's OWN hidden at the last-committed slot — the same
    hidden the separate step recomputed) halves the forwards and cache
    scatters per iteration at identical commit semantics; the only cost
    is cold drafts on each call's first iteration (VERDICT r4 #4,
    benchmarks/spec_bench.py).  Progress is still intrinsic: slot 0
    commits whenever the row is active, so count advances >= 1 per
    iteration until ``limit`` or EOA.

    Returns (tokens (block,), n_generated, state, iters_used).
    The per-token speech-feature dependency (input at t+1 is
    codebook[token_t], streaming_server.py:323-354) is why the reference
    can't batch this loop; drafts break it speculatively.
    """
    compute_dtype = state.k_cache.dtype
    kd = k_draft
    wpad = jnp.concatenate(
        [jnp.asarray(text_window, jnp.int32),
         jnp.full((kd + 1,), cfg.pad_token_id, jnp.int32)])
    dpad = None
    if draft_tokens is not None:
        dpad = jnp.concatenate(
            [jnp.maximum(jnp.asarray(draft_tokens, jnp.int32), 0),
             jnp.zeros((kd + 1,), jnp.int32)])
    out0 = jnp.full((block + kd + 1,), -1, jnp.int32)
    offs1 = jnp.arange(kd + 1, dtype=jnp.int32)

    def build_x(tid, prev, pos):
        temb = text_table[tid]
        sfeat = jnp.where(pos == 0, jnp.zeros((cfg.speech_embed_dim,)),
                          codebook[prev])
        return nn.l2_normalize(
            jnp.concatenate([temb, sfeat])).astype(compute_dtype)

    def drafts_for(count, hidden):
        """Drafts for relative indices ``count..count+kd-1`` — head j
        predicts j+1 positions ahead of ``hidden``'s position."""
        if dpad is not None:
            return lax.dynamic_slice(dpad, (count,), (kd,))
        return jnp.argmax(
            jnp.einsum("c,kcv->kv", hidden.astype(jnp.float32),
                       params["draft_heads"][:kd].astype(jnp.float32)),
            axis=-1).astype(jnp.int32)

    def iteration(carry):
        st, count, out, iters, d = carry
        active = jnp.logical_and(count < limit, jnp.logical_not(st.done))

        # ---- ONE fused forward over kd+1 positions --------------------
        prevs = jnp.concatenate([st.prev_token[None], d])
        tseg = lax.dynamic_slice(wpad, (count,), (kd + 1,))
        post = st.pos + offs1
        tids = jnp.where(post < text_len, tseg, cfg.pad_token_id)
        xs = jax.vmap(build_x)(tids, prevs, post)
        a, nk, nv, hidden = _decode_many(params, cfg, xs, st, kd + 1,
                                         return_hidden=True)

        # ---- commit slot 0 + the prefix whose drafts matched ----------
        match = d == a[:kd]
        prefix_ok = jnp.concatenate(
            [jnp.ones((1,), bool),
             jnp.cumprod(match.astype(jnp.int32)).astype(bool)])
        eoa_before = jnp.concatenate(
            [jnp.zeros((1,), bool),
             jnp.cumsum((a == cfg.eoa_token_id).astype(jnp.int32))[:-1]
             > 0])
        commit = (active & prefix_ok & (count + offs1 < limit)
                  & jnp.logical_not(eoa_before))
        m = jnp.sum(commit.astype(jnp.int32))      # >= 1 while active

        pos2 = st.pos + m
        last = jnp.where(m > 0, a[jnp.maximum(m - 1, 0)], st.prev_token)
        done2 = jnp.logical_or(
            st.done, jnp.any(commit & (a == cfg.eoa_token_id)))
        st2 = DecodeState(nk, nv, pos2, last, done2)

        # ---- next drafts from the last committed slot's hidden --------
        d2 = drafts_for(count + m, hidden[jnp.maximum(m - 1, 0)])

        out = lax.dynamic_update_slice(
            out, jnp.where(commit, a, jnp.int32(-1)), (count,))
        count = count + m
        iters = iters + active.astype(jnp.int32)
        return st2, count, out, iters, d2

    def cond(carry):
        st, count, _, _, _ = carry
        return jnp.logical_and(count < limit, jnp.logical_not(st.done))

    d0 = (lax.dynamic_slice(dpad, (0,), (kd,)) if dpad is not None
          else jnp.zeros((kd,), jnp.int32))
    st, count, out, iters, _ = lax.while_loop(
        cond, iteration, (state, jnp.int32(0), out0, jnp.int32(0), d0))
    return out[:block], count, st, iters


# ---------------------------------------------------------------------------
# batched speculative decode (the pooled-serving counterpart)
# ---------------------------------------------------------------------------

def _batched_verify_attention(q: jnp.ndarray, kc: jnp.ndarray,
                              vc: jnp.ndarray, pos: jnp.ndarray, *,
                              n_head: int, chunk: int = 512) -> jnp.ndarray:
    """Verify attention for B rows x n new positions at per-row offsets.

    q: (B, n, C); caches: (B, S, C); pos: (B,) — row b's query i sits at
    absolute position ``pos[b] + i`` and attends cache rows ``<= pos[b]+i``.
    Chunked online softmax like ``_batched_decode_attention``; the trip
    count covers the deepest row."""
    b, n, c = q.shape
    s = kc.shape[1]
    chunk = min(chunk, s)
    while s % chunk:
        chunk //= 2     # see decode_attention: chunk must divide S
    h, d = n_head, c // n_head
    qh = q.reshape(b, n, h, d).astype(jnp.float32)
    scale = 1.0 / math.sqrt(d)
    nchunks = (jnp.max(pos) + n - 1 + chunk) // chunk

    def body(ci, carry):
        m, l, acc = carry
        start = ci * chunk
        kch = lax.dynamic_slice(kc, (0, start, 0), (b, chunk, c))
        vch = lax.dynamic_slice(vc, (0, start, 0), (b, chunk, c))
        kch = kch.reshape(b, chunk, h, d).astype(jnp.float32)
        vch = vch.reshape(b, chunk, h, d).astype(jnp.float32)
        logits = jnp.einsum("bnhd,bshd->bnhs", qh, kch,
                            preferred_element_type=jnp.float32,
                            precision=lax.Precision.HIGHEST) * scale
        jpos = start + lax.broadcasted_iota(jnp.int32, (1, 1, 1, chunk), 3)
        ipos = lax.broadcasted_iota(jnp.int32, (1, n, 1, 1), 1)
        logits = jnp.where(jpos <= pos[:, None, None, None] + ipos,
                           logits, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.exp(logits - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.einsum(
            "bnhs,bshd->bnhd", p, vch,
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)
        return m_new, l_new, acc_new

    m0 = jnp.full((b, n, h, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, n, h, 1), jnp.float32)
    acc0 = jnp.zeros((b, n, h, d), jnp.float32)
    m, l, acc = lax.fori_loop(0, nchunks, body, (m0, l0, acc0))
    return (acc / l).reshape(b, n, c).astype(q.dtype)


def _decode_many_batch(params: Dict, cfg: DecoderConfig, xs: jnp.ndarray,
                       state: DecodeState, n: int,
                       return_hidden: bool = False):
    """Batched teacher-forced verify: B rows x ``n`` new positions each
    (row b at ``pos[b]..pos[b]+n-1``) in ONE pass.  xs: (B, n, C); caches
    (L, B, S, C).  Returns (argmax tokens (B, n), new_k, new_v[, final
    hidden (B, n, C) when ``return_hidden``])."""
    b = xs.shape[0]
    pos = state.pos                                             # (B,)
    posn = pos[:, None] + jnp.arange(n, dtype=jnp.int32)[None]  # (B, n)
    x = xs + params["wpe"][posn].astype(xs.dtype)
    new_k, new_v = state.k_cache, state.v_cache
    barange = jnp.arange(b)

    for l in range(cfg.n_layer):
        p = {key: jax.tree.map(lambda v: v[l], val)
             for key, val in params["h"].items()}
        hnorm = nn.layer_norm(x, p["ln1_s"], _get(p, "ln1_b"), cfg.ln_eps)
        qkv = nn.linear(hnorm, p["wqkv"], _get(p, "bqkv"))      # (B, n, 3C)
        q, kk, vv = jnp.split(qkv, 3, axis=-1)
        # NOTE(r3): writing these rows inside the verify kernel (DMA +
        # input_output_aliasing) was built and measured at 0.26x — a 4x
        # LOSS.  Mosaic requires DMA slice shapes AND offsets 8-row-
        # aligned even on HBM memrefs, so arbitrary-pos row writes need
        # an aligned-base restage (per-layer vmapped cache gathers + DUS
        # into a padded staging buffer) plus 2B serialized HBM->HBM DMAs
        # per layer before any chunk read can start — all of which costs
        # far more than the ~0.1-0.4 ms/iteration these two donated
        # scatters measure at (benchmarks/verify_probe.py).  The
        # scatters stay.
        new_k = new_k.at[l, barange[:, None], posn].set(
            kk.astype(new_k.dtype))
        new_v = new_v.at[l, barange[:, None], posn].set(
            vv.astype(new_v.dtype))
        if cfg.use_pallas_attention:
            from llmvox_tpu.ops.pallas_attn import pallas_verify_attention
            # full caches + layer scalar (slicing cache[l] as an operand
            # materializes a full-layer copy per launch)
            a = pallas_verify_attention(q, new_k, new_v, pos,
                                        n_head=cfg.n_head,
                                        layer=jnp.int32(l))
        else:
            a = _batched_verify_attention(q, new_k[l], new_v[l], pos,
                                          n_head=cfg.n_head)
        x = x + nn.linear(a, p["wo"], _get(p, "bo"))
        hnorm = nn.layer_norm(x, p["ln2_s"], _get(p, "ln2_b"), cfg.ln_eps)
        m = nn.gelu_tanh(nn.linear(hnorm, p["wfc"], _get(p, "bfc")))
        x = x + nn.linear(m, p["wproj"], _get(p, "bproj"))

    x = nn.layer_norm(x, params["lnf_s"], _get(params, "lnf_b"), cfg.ln_eps)
    logits = jnp.dot(x, nn.dense_weight(params["head"], x.dtype),
                     preferred_element_type=jnp.float32)
    if return_hidden:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_k, new_v, x
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), new_k, new_v


@partial(jax.jit, static_argnames=("cfg", "block", "k_draft"))
def decode_block_spec_batch(params: Dict, text_table: jnp.ndarray,
                            codebook: jnp.ndarray, states: DecodeState,
                            text_windows: jnp.ndarray,
                            text_lens: jnp.ndarray, limits: jnp.ndarray,
                            cfg: DecoderConfig, block: int = 32,
                            k_draft: int = 4,
                            draft_tokens: Optional[jnp.ndarray] = None):
    """Speculative ``decode_block_batch``: B pooled streams advance
    together, each committing its own accepted prefix per iteration —
    output BIT-IDENTICAL to ``decode_block_batch`` for any draft quality
    (the pooled serving path's speculation; no reference counterpart).

    Per iteration: ONE batched fused teacher-forced forward over
    ``k_draft + 1`` positions per row — slot 0 conditioned on the row's
    committed previous token (always exact), slots 1..k on the drafts
    carried from the previous iteration (``params["draft_heads"]`` on
    the hidden at the row's last committed slot, or the explicit
    ``draft_tokens`` (B, block) stream).  Each row commits slot 0 plus
    its matching draft prefix (see ``decode_block_spec`` for the
    fused-iteration design history).  Rows that exhaust their
    ``limits`` or hit EOA freeze (their cache writes land above ``pos``
    and are overwritten before anything attends them); the
    ``lax.while_loop`` runs until every row is done, so a batch's cost
    is its slowest row's iterations — the same worst case as the fixed
    ``block``-step greedy scan, reached only when drafts never accept.

    Returns (tokens (B, block) with -1 at inactive slots, n (B,), states,
    iters (B,) — per-row iterations actually spent, for measurement).
    """
    compute_dtype = states.k_cache.dtype
    bsz = states.pos.shape[0]
    kd = k_draft
    pad_cols = jnp.full((bsz, kd + 1), cfg.pad_token_id, jnp.int32)
    wpad = jnp.concatenate(
        [jnp.asarray(text_windows, jnp.int32), pad_cols], axis=1)
    dpad = None
    if draft_tokens is not None:
        dpad = jnp.concatenate(
            [jnp.maximum(jnp.asarray(draft_tokens, jnp.int32), 0),
             jnp.zeros((bsz, kd + 1), jnp.int32)], axis=1)
    out0 = jnp.full((bsz, block + kd + 1), -1, jnp.int32)
    barange = jnp.arange(bsz)
    offs = jnp.arange(kd, dtype=jnp.int32)
    offs1 = jnp.arange(kd + 1, dtype=jnp.int32)

    def iteration(carry):
        st, count, out, iters, d = carry    # count/iters (B,), d (B, kd)
        active = jnp.logical_and(count < limits, jnp.logical_not(st.done))

        # ---- ONE batched fused forward over kd+1 positions per row ----
        prevs = jnp.concatenate([st.prev_token[:, None], d], axis=1)
        tseg = jnp.take_along_axis(wpad, count[:, None] + offs1[None],
                                   axis=1)
        post = st.pos[:, None] + offs1[None]                 # (B, kd+1)
        tids = jnp.where(post < text_lens[:, None], tseg,
                         cfg.pad_token_id)
        tembs = text_table[tids]
        sfeats = jnp.where((post == 0)[..., None],
                           jnp.zeros((1, 1, cfg.speech_embed_dim)),
                           codebook[prevs])
        xs = nn.l2_normalize(jnp.concatenate([tembs, sfeats], axis=-1))
        a, nk, nv, hidden = _decode_many_batch(
            params, cfg, xs.astype(compute_dtype), st, kd + 1,
            return_hidden=True)

        # ---- each row commits slot 0 + its matching draft prefix ------
        match = d == a[:, :kd]
        prefix_ok = jnp.concatenate(
            [jnp.ones((bsz, 1), bool),
             jnp.cumprod(match.astype(jnp.int32), axis=1).astype(bool)],
            axis=1)
        eoa_before = jnp.concatenate(
            [jnp.zeros((bsz, 1), bool),
             jnp.cumsum((a == cfg.eoa_token_id).astype(jnp.int32),
                        axis=1)[:, :-1] > 0], axis=1)
        commit = (active[:, None] & prefix_ok
                  & (count[:, None] + offs1[None] < limits[:, None])
                  & jnp.logical_not(eoa_before))
        m = jnp.sum(commit.astype(jnp.int32), axis=1)        # (B,)

        pos2 = st.pos + m
        last_a = jnp.take_along_axis(
            a, jnp.maximum(m - 1, 0)[:, None], axis=1)[:, 0]
        last = jnp.where(m > 0, last_a, st.prev_token)
        done2 = jnp.logical_or(
            st.done, jnp.any(commit & (a == cfg.eoa_token_id), axis=1))
        st2 = DecodeState(nk, nv, pos2, last, done2)

        # ---- next drafts from each row's last committed hidden --------
        h_last = jnp.take_along_axis(
            hidden, jnp.maximum(m - 1, 0)[:, None, None], axis=1)[:, 0]
        if dpad is not None:
            d2 = jnp.take_along_axis(
                dpad, (count + m)[:, None] + offs[None], axis=1)
        else:
            d2 = jnp.argmax(
                jnp.einsum("bc,kcv->bkv", h_last.astype(jnp.float32),
                           params["draft_heads"][:kd].astype(jnp.float32)),
                axis=-1).astype(jnp.int32)                   # (B, kd)

        # frozen rows re-write -1 at [count..count+kd] — always >= their
        # final count, where out is still -1 (commits are prefix-shaped,
        # so nothing real was ever written at or above count)
        out = out.at[barange[:, None],
                     count[:, None] + offs1[None]].set(
            jnp.where(commit, a, jnp.int32(-1)))
        count = count + m
        iters = iters + active.astype(jnp.int32)
        return st2, count, out, iters, d2

    def cond(carry):
        st, count, _, _, _ = carry
        return jnp.any(jnp.logical_and(count < limits,
                                       jnp.logical_not(st.done)))

    d0 = (dpad[:, :kd] if dpad is not None
          else jnp.zeros((bsz, kd), jnp.int32))
    st, count, out, iters, _ = lax.while_loop(
        cond, iteration,
        (states, jnp.zeros((bsz,), jnp.int32), out0,
         jnp.zeros((bsz,), jnp.int32), d0))
    return out[:, :block], count, st, iters
