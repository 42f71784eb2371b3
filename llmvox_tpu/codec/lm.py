"""Encodec language model over RVQ codes — the compression-rate booster.

Re-creates the reference's ``LMModel`` + ``StreamingTransformerEncoder``
(WavTokenizer/encoder/model.py:27-66, encoder/modules/transformer.py:16-119)
as a TPU-first JAX module:

* layer parameters are stacked along a leading axis and the depth loop is a
  single ``lax.scan`` (one compiled layer body, weights streamed from HBM);
* the streaming state is a FIXED-SIZE right-aligned rolling buffer of the
  last ``past_context`` layer inputs (the reference concatenates and trims a
  growing list — dynamic shapes that would force an XLA recompile per step);
* masking is computed from ``(chunk length, frames buffered)`` with iota,
  no materialised position tensors.

Semantics notes (all verified against a torch oracle in
``tests/test_encodec_lm.py``):

* the reference seeds each layer's state with ONE zero frame
  (model.py's ``states = [zeros_like(x[:, :1])]``) whose projected key bias
  is attendable — we reproduce that by starting the buffer with one valid
  zero frame;
* layers are post-norm (torch ``TransformerEncoderLayer`` default
  ``norm_first=False``), activation is exact GELU;
* the attention window is ``0 <= query_pos - key_pos <= past_context``.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import nn as ops
from ..utils.config import CodecConfig


@dataclasses.dataclass(frozen=True)
class LMConfig:
    """Mirror of ``LMModel(n_q, card, dim, **transformer_kwargs)``
    (encoder/model.py:37-43, get_lm_model at model.py:199-217)."""
    n_q: int = 32
    card: int = 1024
    dim: int = 200
    num_layers: int = 5
    num_heads: int = 8
    hidden_scale: float = 4.0
    past_context: int = 262          # int(3.5 * frame_rate) for 24 kHz
    max_period: float = 10000.0
    norm_in: bool = True
    eps: float = 1e-5

    @property
    def hidden_dim(self) -> int:
        return int(self.dim * self.hidden_scale)

    @property
    def head_dim(self) -> int:
        assert self.dim % self.num_heads == 0
        return self.dim // self.num_heads


def lm_config_for(codec_cfg: CodecConfig) -> LMConfig:
    """The LM the reference attaches to a codec (model.py:199-205):
    ``LMModel(n_q, bins, num_layers=5, dim=200,
    past_context=int(3.5 * frame_rate))``."""
    hop = 1
    for d in codec_cfg.downsamples:
        hop *= d
    frame_rate = math.ceil(codec_cfg.sample_rate / hop)
    return LMConfig(n_q=codec_cfg.num_quantizers, card=codec_cfg.vq_bins,
                    past_context=int(3.5 * frame_rate))


def sin_embedding(positions: jnp.ndarray, dim: int,
                  max_period: float = 10000.0) -> jnp.ndarray:
    """``create_sin_embedding`` (transformer.py:16-27): cos half then sin
    half, period exponent ``idx / (half_dim - 1)``."""
    assert dim % 2 == 0
    half = dim // 2
    adim = jnp.arange(half, dtype=jnp.float32)
    phase = positions[..., None].astype(jnp.float32) / (
        max_period ** (adim / (half - 1)))
    return jnp.concatenate([jnp.cos(phase), jnp.sin(phase)], axis=-1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_linear(key, fan_in: int, fan_out: int) -> Dict:
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32,
                                -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def _init_layer(key, cfg: LMConfig) -> Dict:
    """One post-norm transformer encoder layer (torch layout, stacked later).

    ``qkv.w`` is (dim, 3*dim) = torch ``in_proj_weight.T``; attention out
    projection, the two FF linears and the two LayerNorms follow torch's
    ``TransformerEncoderLayer`` containers.
    """
    ks = jax.random.split(key, 4)
    d, h = cfg.dim, cfg.hidden_dim
    # torch MultiheadAttention: in_proj xavier_uniform, biases zero
    limit = math.sqrt(6.0 / (d + 3 * d))
    qkv_w = jax.random.uniform(ks[0], (d, 3 * d), jnp.float32, -limit, limit)
    return {
        "qkv": {"w": qkv_w, "b": jnp.zeros((3 * d,), jnp.float32)},
        "out": {**_init_linear(ks[1], d, d), "b": jnp.zeros((d,))},
        "ff1": _init_linear(ks[2], d, h),
        "ff2": _init_linear(ks[3], h, d),
        "norm1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
        "norm2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
    }


def init_transformer(key, cfg: LMConfig) -> Dict:
    """Stacked-layer params: every leaf has a leading ``num_layers`` axis so
    the depth loop is one ``lax.scan`` over weight slices."""
    keys = jax.random.split(key, cfg.num_layers)
    layers = [_init_layer(k, cfg) for k in keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    params = {"layers": stacked}
    if cfg.norm_in:
        params["norm_in"] = {"scale": jnp.ones((cfg.dim,)),
                             "bias": jnp.zeros((cfg.dim,))}
    return params


def init_lm(key, cfg: LMConfig) -> Dict:
    """LMModel params (model.py:42-44): per-codebook embeddings of
    cardinality ``card + 1`` (0 = missing) and per-codebook logit heads,
    both stacked on a leading ``n_q`` axis."""
    ke, kl, kt = jax.random.split(key, 3)
    emb = jax.random.normal(ke, (cfg.n_q, cfg.card + 1, cfg.dim),
                            jnp.float32)  # nn.Embedding default N(0,1)
    lin_keys = jax.random.split(kl, cfg.n_q)
    linears = [_init_linear(k, cfg.dim, cfg.card) for k in lin_keys]
    return {
        "emb": emb,
        "heads": jax.tree.map(lambda *xs: jnp.stack(xs), *linears),
        "transformer": init_transformer(kt, cfg),
    }


def init_stream_state(cfg: LMConfig, batch: int) -> Dict:
    """Fixed-shape streaming state.

    ``bufs[l]`` holds the last ``past_context`` inputs of layer ``l``,
    right-aligned (newest at the end).  ``length`` counts valid buffered
    frames; it starts at 1 because the reference seeds each state with one
    zero frame (model.py:106) whose projected key/value biases are real
    attention targets.  ``offset`` is the absolute position of the next
    input frame (for the sinusoidal embedding).
    """
    return {
        "bufs": jnp.zeros((cfg.num_layers, batch, cfg.past_context, cfg.dim),
                          jnp.float32),
        "length": jnp.asarray(1, jnp.int32),
        "offset": jnp.asarray(0, jnp.int32),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _streaming_attention(lp: Dict, x: jnp.ndarray, buf: jnp.ndarray,
                         length: jnp.ndarray, cfg: LMConfig) -> jnp.ndarray:
    """Windowed causal attention of the T current frames over
    (buffered ``length`` frames ++ current frames).

    Equivalent to ``StreamingTransformerEncoderLayer._sa_block``
    (transformer.py:44-59) with the growing ``x_past`` replaced by the
    fixed right-aligned buffer: buffer slot ``j`` is ``H - j`` frames in
    the past, so ``delta = i + H - j`` for query ``i``; in-chunk keys have
    ``delta = i - k``.  Valid iff ``0 <= delta <= past_context`` and the
    slot holds a real frame (``H - j <= length``).
    """
    b, t, d = x.shape
    h = cfg.past_context
    nh, hd = cfg.num_heads, cfg.head_dim

    keys_src = jnp.concatenate([buf, x], axis=1)          # (B, H+T, D)
    qkv_w, qkv_b = lp["qkv"]["w"], lp["qkv"]["b"]
    q = ops.linear(x, qkv_w[:, :d], qkv_b[:d])
    kv = ops.linear(keys_src, qkv_w[:, d:], qkv_b[d:])
    k, v = kv[..., :d], kv[..., d:]

    q = q.reshape(b, t, nh, hd).transpose(0, 2, 1, 3)      # (B, nh, T, hd)
    k = k.reshape(b, h + t, nh, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, h + t, nh, hd).transpose(0, 2, 1, 3)

    qpos = lax.broadcasted_iota(jnp.int32, (t, h + t), 0)
    kidx = lax.broadcasted_iota(jnp.int32, (t, h + t), 1)
    # delta for buffer slots (kidx < H) and for in-chunk keys (kidx >= H)
    delta = jnp.where(kidx < h, qpos + h - kidx, qpos - (kidx - h))
    valid = (delta >= 0) & (delta <= cfg.past_context)
    valid &= kidx >= h - length                            # real buffer slots

    scores = jnp.einsum("bnqh,bnkh->bnqk", q, k,
                        precision=ops.mm_precision(q.dtype))
    scores = scores / math.sqrt(hd)
    scores = jnp.where(valid[None, None], scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bnqk,bnkh->bnqh", attn, v,
                     precision=ops.mm_precision(v.dtype))
    out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
    return ops.linear(out, lp["out"]["w"], lp["out"]["b"])


def apply_transformer(params: Dict, x: jnp.ndarray, state: Dict,
                      cfg: LMConfig) -> Tuple[jnp.ndarray, Dict]:
    """``StreamingTransformerEncoder.forward`` (transformer.py:101-119):
    norm_in -> +sin positions -> scanned post-norm layers, each returning
    its INPUT as the state to buffer."""
    b, t, _ = x.shape
    if cfg.norm_in:
        ni = params["norm_in"]
        x = ops.layer_norm(x, ni["scale"], ni["bias"], cfg.eps)
    positions = jnp.arange(t)[None, :] + state["offset"]
    x = x + sin_embedding(positions, cfg.dim, cfg.max_period)

    length = state["length"]

    def layer_body(h, inputs):
        lp, buf = inputs
        sa_input = h
        h = h + _streaming_attention(lp, h, buf, length, cfg)
        h = ops.layer_norm(h, lp["norm1"]["scale"], lp["norm1"]["bias"],
                           cfg.eps)
        ff = ops.linear(ops.gelu_exact(
            ops.linear(h, lp["ff1"]["w"], lp["ff1"]["b"])),
            lp["ff2"]["w"], lp["ff2"]["b"])
        h = ops.layer_norm(h + ff, lp["norm2"]["scale"], lp["norm2"]["bias"],
                           cfg.eps)
        # roll the fixed buffer left by T and append this layer's input
        new_buf = jnp.concatenate([buf, sa_input], axis=1)[:, -buf.shape[1]:]
        return h, new_buf

    x, new_bufs = lax.scan(layer_body, x,
                           (params["layers"], state["bufs"]))
    new_state = {
        "bufs": new_bufs,
        "length": jnp.minimum(length + t, cfg.past_context),
        "offset": state["offset"] + t,
    }
    return x, new_state


def apply_lm(params: Dict, indices: jnp.ndarray, state: Dict,
             cfg: LMConfig) -> Tuple[jnp.ndarray, Dict]:
    """``LMModel.forward`` (model.py:46-66).

    ``indices``: (B, n_q, T) int32 of PREVIOUS-step codes + 1 (0 = missing,
    i.e. the first step).  Returns (probabilities (B, card, n_q, T),
    new streaming state).
    """
    b, k, t = indices.shape
    emb = params["emb"]                                    # (K, card+1, D)
    onek = jax.vmap(lambda e, idx: e[idx], in_axes=(0, 0))(
        emb, indices.transpose(1, 0, 2))                   # (K, B, T, D)
    x = jnp.sum(onek, axis=0)
    out, new_state = apply_transformer(params["transformer"], x, state, cfg)
    logits = jnp.einsum("btd,kdc->btkc", out, params["heads"]["w"],
                        precision=ops.mm_precision(out.dtype))
    logits = logits + params["heads"]["b"][None, None]
    probs = jax.nn.softmax(logits, axis=-1)                # over card
    return probs.transpose(0, 3, 2, 1), new_state          # (B, card, K, T)


@jax.jit
def _lm_step(params: Dict, indices: jnp.ndarray, state: Dict,
             cfg: LMConfig) -> Tuple[jnp.ndarray, Dict]:
    return apply_lm(params, indices, state, cfg)


def lm_step(params: Dict, indices: jnp.ndarray, state: Dict,
            cfg: LMConfig) -> Tuple[jnp.ndarray, Dict]:
    """One T=1 streaming LM step, jitted.  Used by BOTH the compressor and
    the decompressor so the two sides evaluate bit-identical pdfs (the
    arithmetic coder requires exactly matching cdfs)."""
    return _lm_step(params, indices, state, cfg)


jax.tree_util.register_static(LMConfig)
