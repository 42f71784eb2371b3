"""ConvNeXt vocoder backbone (WavTokenizer "VocosBackbone").

Structure mirrors WavTokenizer/decoder/models.py:152-235 exactly:
embed Conv1d(512->768, k7) -> pos_net [ResnetBlock x2, AttnBlock,
ResnetBlock x2, GroupNorm] -> AdaLayerNorm -> 12x ConvNeXtBlock
(dim 768, intermediate 2304, AdaLayerNorm over 4 bandwidth ids,
layer-scale gamma) -> final LayerNorm.

Design differences from the reference (TPU-first, not a translation):
- channel-last (B, L, C) layout throughout; no transposes around norms.
- the 12 ConvNeXt blocks are a single ``lax.scan`` over stacked params:
  one compiled block body instead of 12 unrolled, faster compiles and
  identical math.
- AdaLayerNorm scale/shift are gathered once per call (bandwidth_id is a
  scalar), then fused into the norm by XLA.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

from llmvox_tpu.ops import nn
from llmvox_tpu.utils.config import CodecConfig


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def _init_resnet_block(key, dim: int) -> Dict:
    k1, k2 = jax.random.split(key)
    return {
        "norm1_s": jnp.ones((dim,)), "norm1_b": jnp.zeros((dim,)),
        "conv1_w": _trunc_normal(k1, (3, dim, dim)), "conv1_b": jnp.zeros((dim,)),
        "norm2_s": jnp.ones((dim,)), "norm2_b": jnp.zeros((dim,)),
        "conv2_w": _trunc_normal(k2, (3, dim, dim)), "conv2_b": jnp.zeros((dim,)),
    }


def _init_attn_block(key, dim: int) -> Dict:
    ks = jax.random.split(key, 4)
    return {
        "norm_s": jnp.ones((dim,)), "norm_b": jnp.zeros((dim,)),
        "q_w": _trunc_normal(ks[0], (dim, dim)), "q_b": jnp.zeros((dim,)),
        "k_w": _trunc_normal(ks[1], (dim, dim)), "k_b": jnp.zeros((dim,)),
        "v_w": _trunc_normal(ks[2], (dim, dim)), "v_b": jnp.zeros((dim,)),
        "proj_w": _trunc_normal(ks[3], (dim, dim)), "proj_b": jnp.zeros((dim,)),
    }


def init_backbone(key: jax.Array, cfg: CodecConfig) -> Dict:
    dim = cfg.backbone_dim
    inter = cfg.backbone_intermediate_dim
    nlayers = cfg.backbone_num_layers
    nemb = cfg.adanorm_num_embeddings
    keys = jax.random.split(key, 16)
    gamma0 = 1.0 / nlayers  # layer_scale_init_value (models.py:183)

    def stack(i, f):
        # Fold the group index in so dwconv/pw1/pw2 get independent init
        # streams (previously all three split the same key).
        ks = jax.random.split(jax.random.fold_in(keys[15], i), nlayers)
        return jnp.stack([f(ks[j]) for j in range(nlayers)])

    convnext = {
        "dwconv_w": stack(0, lambda k: _trunc_normal(k, (7, 1, dim))),
        "dwconv_b": jnp.zeros((nlayers, dim)),
        "norm_scale": jnp.ones((nlayers, nemb, dim)),
        "norm_shift": jnp.zeros((nlayers, nemb, dim)),
        "pw1_w": stack(1, lambda k: _trunc_normal(k, (dim, inter))),
        "pw1_b": jnp.zeros((nlayers, inter)),
        "pw2_w": stack(2, lambda k: _trunc_normal(k, (inter, dim))),
        "pw2_b": jnp.zeros((nlayers, dim)),
        "gamma": jnp.full((nlayers, dim), gamma0),
    }
    return {
        "embed": {"w": _trunc_normal(keys[0], (7, cfg.backbone_input_channels, dim)),
                  "b": jnp.zeros((dim,))},
        "pos_net": {
            "res0": _init_resnet_block(keys[1], dim),
            "res1": _init_resnet_block(keys[2], dim),
            "attn": _init_attn_block(keys[3], dim),
            "res2": _init_resnet_block(keys[4], dim),
            "res3": _init_resnet_block(keys[5], dim),
            "gn_s": jnp.ones((dim,)), "gn_b": jnp.zeros((dim,)),
        },
        "adanorm": {"scale": jnp.ones((nemb, dim)), "shift": jnp.zeros((nemb, dim))},
        "convnext": convnext,
        "final_ln": {"s": jnp.ones((dim,)), "b": jnp.zeros((dim,))},
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _resnet_block(p: Dict, x: jnp.ndarray, cfg: CodecConfig,
                  valid_len=None, mask=None) -> jnp.ndarray:
    """GroupNorm -> swish -> conv3 -> GroupNorm -> swish -> conv3, residual
    (decoder/models.py:58-78; dropout is inference-off).

    With a validity mask, every conv input holds exact zeros at padding
    positions (matching torch Conv1d's zero padding at the true length), so
    the valid positions are bit-equivalent to an exact-length run.
    """
    h = nn.group_norm(x, p["norm1_s"], p["norm1_b"],
                      cfg.groupnorm_groups, cfg.groupnorm_eps, valid_len)
    h = nn.swish(h)
    h = nn.conv1d(h, p["conv1_w"], p["conv1_b"], padding=[(1, 1)])
    if mask is not None:
        h = h * mask
    h = nn.group_norm(h, p["norm2_s"], p["norm2_b"],
                      cfg.groupnorm_groups, cfg.groupnorm_eps, valid_len)
    h = nn.swish(h)
    h = nn.conv1d(h, p["conv2_w"], p["conv2_b"], padding=[(1, 1)])
    out = x + h
    if mask is not None:
        out = out * mask
    return out


def _attn_block(p: Dict, x: jnp.ndarray, cfg: CodecConfig,
                valid_len=None, mask=None) -> jnp.ndarray:
    """Single-head full attention over frames (decoder/models.py:107-127)."""
    c = x.shape[-1]
    h = nn.group_norm(x, p["norm_s"], p["norm_b"],
                      cfg.groupnorm_groups, cfg.groupnorm_eps, valid_len)
    q = nn.linear(h, p["q_w"], p["q_b"])
    k = nn.linear(h, p["k_w"], p["k_b"])
    v = nn.linear(h, p["v_w"], p["v_b"])
    logits = jnp.einsum("blc,bmc->blm", q, k,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST) * (c ** -0.5)
    if valid_len is not None:
        vl = jnp.asarray(valid_len, jnp.int32).reshape(-1, 1, 1)
        kmask = jax.lax.broadcasted_iota(jnp.int32, (1, 1, x.shape[1]), 2)
        logits = jnp.where(kmask < vl, logits, float("-inf"))
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("blm,bmc->blc", w, v,
                     precision=jax.lax.Precision.HIGHEST)
    out = nn.linear(out, p["proj_w"], p["proj_b"])
    out = x + out
    if mask is not None:
        out = out * mask
    return out


def _ada_layer_norm(scale_emb, shift_emb, x, cond_id, eps):
    """LayerNorm without affine, then per-condition scale/shift
    (decoder/modules.py:63-86)."""
    scale = scale_emb[cond_id]
    shift = shift_emb[cond_id]
    y = nn.layer_norm(x, None, None, eps)
    return y * scale.astype(y.dtype) + shift.astype(y.dtype)


def _convnext_block(p: Dict, x: jnp.ndarray, cond_id, eps: float,
                    mask=None) -> jnp.ndarray:
    """Depthwise k7 -> AdaLN -> pw1 -> GELU(exact) -> pw2 -> gamma, residual
    (decoder/modules.py:43-60)."""
    residual = x
    dim = x.shape[-1]
    h = nn.conv1d(x, p["dwconv_w"], p["dwconv_b"], padding=[(3, 3)], groups=dim)
    h = _ada_layer_norm(p["norm_scale"], p["norm_shift"], h, cond_id, eps)
    h = nn.linear(h, p["pw1_w"], p["pw1_b"])
    h = nn.gelu_exact(h)
    h = nn.linear(h, p["pw2_w"], p["pw2_b"])
    h = p["gamma"].astype(h.dtype) * h
    out = residual + h
    if mask is not None:
        out = out * mask
    return out


def apply_backbone(params: Dict, features: jnp.ndarray, bandwidth_id,
                   cfg: CodecConfig, valid_len=None) -> jnp.ndarray:
    """(B, L, 512) features -> (B, L, 768) hidden states.

    Mirrors VocosBackbone.forward (decoder/models.py:223-235).  With
    ``valid_len`` (traced scalar), frames at index >= valid_len are masked
    through every global op (GroupNorm stats, attention keys, conv
    paddings), making positions [0, valid_len) bit-equivalent to running
    at the exact length — this is what lets the streaming path decode
    ragged final chunks with a handful of static bucket shapes.
    """
    eps = cfg.ln_eps
    mask = None
    if valid_len is not None:
        valid_len = jnp.asarray(valid_len, jnp.int32)
        l = features.shape[1]
        mask = (lax.broadcasted_iota(jnp.int32, (1, l, 1), 1)
                < valid_len.reshape(-1, 1, 1)).astype(features.dtype)
        features = features * mask
    x = nn.conv1d(features, params["embed"]["w"], params["embed"]["b"],
                  padding=[(3, 3)])
    if mask is not None:
        x = x * mask
    pn = params["pos_net"]
    x = _resnet_block(pn["res0"], x, cfg, valid_len, mask)
    x = _resnet_block(pn["res1"], x, cfg, valid_len, mask)
    x = _attn_block(pn["attn"], x, cfg, valid_len, mask)
    x = _resnet_block(pn["res2"], x, cfg, valid_len, mask)
    x = _resnet_block(pn["res3"], x, cfg, valid_len, mask)
    x = nn.group_norm(x, pn["gn_s"], pn["gn_b"],
                      cfg.groupnorm_groups, cfg.groupnorm_eps, valid_len)
    x = _ada_layer_norm(params["adanorm"]["scale"], params["adanorm"]["shift"],
                        x, bandwidth_id, eps)
    if mask is not None:
        x = x * mask

    def body(h, layer_params):
        return _convnext_block(layer_params, h, bandwidth_id, eps, mask), None

    x, _ = lax.scan(body, x, params["convnext"])
    x = nn.layer_norm(x, params["final_ln"]["s"], params["final_ln"]["b"], eps)
    return x


# ---------------------------------------------------------------------------
# VocosResNetBackbone — the reference's shipped alternative backbone
# (decoder/models.py:238-264 with ResBlock1, decoder/modules.py:89-191)
# ---------------------------------------------------------------------------

def init_resnet_backbone(key: jax.Array, input_channels: int, dim: int,
                         num_blocks: int,
                         layer_scale_init_value: float = None) -> Dict:
    ks = jax.random.split(key, num_blocks + 1)
    gamma0 = layer_scale_init_value or 1.0 / num_blocks / 3.0

    def wn_conv(k, ksize, cin, cout):
        p = jax.tree_util.tree_map(
            lambda a: a, {"b": jnp.zeros((cout,))})
        w = _trunc_normal(k, (ksize, cin, cout))
        from llmvox_tpu.ops.nn import weight_norm_init
        p.update(weight_norm_init(w))
        return p

    blocks = []
    for i in range(num_blocks):
        bk = jax.random.split(ks[i], 6)
        convs1 = [wn_conv(bk[j], 3, dim, dim) for j in range(3)]
        convs2 = [wn_conv(bk[3 + j % 3], 3, dim, dim) for j in range(3)]
        blocks.append({
            "convs1": convs1, "convs2": convs2,
            "gamma": [jnp.full((dim,), gamma0) for _ in range(3)],
        })
    return {"embed": wn_conv(ks[-1], 3, input_channels, dim),
            "blocks": blocks}


def _resblock1(p: Dict, x: jnp.ndarray, lrelu_slope: float = 0.1,
               dilations=(1, 3, 5)) -> jnp.ndarray:
    """HiFi-GAN V1 ResBlock without upsampling (modules.py:172-181)."""
    for c1, c2, gamma, dil in zip(p["convs1"], p["convs2"], p["gamma"],
                                  dilations):
        xt = nn.leaky_relu(x, lrelu_slope)
        pad = (3 * dil - dil) // 2
        xt = nn.conv1d(xt, nn.effective_weight(c1), c1["b"],
                       padding=[(pad, pad)], dilation=dil)
        xt = nn.leaky_relu(xt, lrelu_slope)
        xt = nn.conv1d(xt, nn.effective_weight(c2), c2["b"],
                       padding=[(1, 1)])
        if gamma is not None:
            xt = gamma.astype(xt.dtype) * xt
        x = xt + x
    return x


def apply_resnet_backbone(params: Dict, features: jnp.ndarray,
                          **_) -> jnp.ndarray:
    """(B, L, Cin) -> (B, L, dim); VocosResNetBackbone.forward
    (models.py:260-264)."""
    x = nn.conv1d(features, nn.effective_weight(params["embed"]),
                  params["embed"]["b"], padding=[(1, 1)])
    for block in params["blocks"]:
        x = _resblock1(block, x)
    return x
