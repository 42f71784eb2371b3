"""SEANet encoder (and decoder) — the codec's analysis network.

TPU rebuild of the Encodec SEANet encoder as configured by WavTokenizer
(reference: WavTokenizer/encoder/modules/seanet.py:66-144 instantiated at
decoder/feature_extractors.py:71-74): Conv k7 -> 4 stages of
(residual block + ELU + strided downsample conv with kernel 2*ratio),
ratios reversed to [2, 4, 5, 8] (320x total -> 75 frames/s at 24 kHz),
channels 32->64->128->256->512, a 2-layer skip LSTM, then ELU + Conv k7
to dim 512.

Notes:
- weight_norm is folded into plain kernels at checkpoint conversion
  (g * v / ||v|| is a constant at inference); params here are plain.
- "reflect" same-style padding with the encodec asymmetric rule
  (encoder/modules/conv.py:195-211) is computed from static shapes.
- the LSTM is a lax.scan over time; residual blocks use true_skip=False,
  i.e. a 1x1-conv shortcut (feature_extractors.py:74).
"""
from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp
from jax import lax

from llmvox_tpu.ops import nn
from llmvox_tpu.utils.config import CodecConfig


def _elu(x):
    return jax.nn.elu(x.astype(jnp.float32)).astype(x.dtype)


def _pad_reflect(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    """Reflect-pad the length axis of (B, L, C)."""
    if left == 0 and right == 0:
        return x
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")


def _sconv_padding(length: int, kernel: int, stride: int, dilation: int = 1):
    """Encodec SConv1d padding rule (encoder/modules/conv.py:54-61,195-211)."""
    keff = (kernel - 1) * dilation + 1
    pt = keff - stride
    n_frames = (length - keff + pt) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (keff - pt)
    extra = ideal - length
    right = pt // 2
    left = pt - right
    return left, right + extra


def sconv1d(x: jnp.ndarray, p: Dict, *,
            stride: int = 1, dilation: int = 1) -> jnp.ndarray:
    """SConv1d with reflect 'same-style' padding.

    ``p`` holds either a folded kernel {w, b} (inference) or weight-norm
    params {g, v, b} (training — the reference trains all SEANet convs
    under weight_norm, encoder/modules/conv.py:27-28).
    """
    w = nn.effective_weight(p)
    left, right = _sconv_padding(x.shape[1], w.shape[0], stride, dilation)
    x = _pad_reflect(x, left, right)
    return nn.conv1d(x, w, p["b"], stride=stride, padding="VALID",
                     dilation=dilation)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _kaiming_conv(key, k, cin, cout):
    fan_in = k * cin
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, (k, cin, cout), jnp.float32, -bound, bound)


def init_seanet_encoder(key: jax.Array, cfg: CodecConfig,
                        weight_norm: bool = False) -> Dict:
    ratios = list(reversed(cfg.downsamples))   # [2, 4, 5, 8]
    nf = cfg.n_filters
    dim = cfg.seanet_dimension
    keys = iter(jax.random.split(key, 64))

    def conv(k, cin, cout):
        w = _kaiming_conv(next(keys), k, cin, cout)
        if weight_norm:
            p = nn.weight_norm_init(w)
            p["b"] = jnp.zeros((cout,))
            return p
        return {"w": w, "b": jnp.zeros((cout,))}

    params: Dict = {"conv_in": conv(cfg.seanet_kernel_size, 1, nf)}
    stages: List[Dict] = []
    mult = 1
    for ratio in ratios:
        ch = mult * nf
        hidden = ch // cfg.seanet_compress
        res_layers = []
        for j in range(cfg.seanet_n_residual_layers):
            res_layers.append({
                "conv1": conv(cfg.seanet_residual_kernel_size, ch, hidden),
                "conv2": conv(1, hidden, ch),
                "shortcut": conv(1, ch, ch),   # true_skip=False
            })
        stages.append({
            "res": res_layers,
            "down": conv(ratio * 2, ch, ch * 2),
        })
        mult *= 2
    params["stages"] = stages

    lstm_layers = []
    h = mult * nf
    for _ in range(cfg.seanet_lstm_layers):
        bound = math.sqrt(1.0 / h)
        lstm_layers.append({
            "wi": jax.random.uniform(next(keys), (h, 4 * h), jnp.float32, -bound, bound),
            "wh": jax.random.uniform(next(keys), (h, 4 * h), jnp.float32, -bound, bound),
            "bi": jnp.zeros((4 * h,)),
            "bh": jnp.zeros((4 * h,)),
        })
    params["lstm"] = lstm_layers
    params["conv_out"] = conv(cfg.seanet_last_kernel_size, mult * nf, dim)
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _lstm_layer(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """One torch-compatible LSTM layer over (B, L, H); gate order i,f,g,o."""
    b, l, hdim = x.shape
    h0 = jnp.zeros((b, p["wh"].shape[0]), x.dtype)
    c0 = jnp.zeros_like(h0)
    xg = jnp.einsum("blh,hg->blg", x, p["wi"].astype(x.dtype)) + p["bi"].astype(x.dtype)

    def step(carry, gx):
        h, c = carry
        gates = gx + jnp.dot(h, p["wh"].astype(h.dtype)) + p["bh"].astype(h.dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, ys = lax.scan(step, (h0, c0), jnp.swapaxes(xg, 0, 1))
    return jnp.swapaxes(ys, 0, 1)


def init_seanet_decoder(key: jax.Array, cfg: CodecConfig,
                        weight_norm: bool = False) -> Dict:
    """SEANet decoder (encoder/modules/seanet.py:147-238): Conv k7 -> LSTM
    -> per ratio [8,5,4,2]: ELU + ConvTranspose(k=2r, stride r) + resblock,
    halving channels -> ELU + Conv k7 -> 1 channel.

    Present in the deployed checkpoint but unused at inference (decode runs
    through the ConvNeXt backbone + ISTFT head instead); kept for
    checkpoint completeness and Encodec-style decoding.
    """
    ratios = list(cfg.downsamples)  # decoder order [8, 5, 4, 2]
    nf = cfg.n_filters
    keys = iter(jax.random.split(key, 64))

    def conv(k, cin, cout):
        w = _kaiming_conv(next(keys), k, cin, cout)
        if weight_norm:
            p = nn.weight_norm_init(w)
            p["b"] = jnp.zeros((cout,))
            return p
        return {"w": w, "b": jnp.zeros((cout,))}

    mult = 2 ** len(ratios)
    params: Dict = {"conv_in": conv(cfg.seanet_kernel_size,
                                    cfg.seanet_dimension, mult * nf)}
    h = mult * nf
    lstm_layers = []
    for _ in range(cfg.seanet_lstm_layers):
        bound = math.sqrt(1.0 / h)
        lstm_layers.append({
            "wi": jax.random.uniform(next(keys), (h, 4 * h), jnp.float32,
                                     -bound, bound),
            "wh": jax.random.uniform(next(keys), (h, 4 * h), jnp.float32,
                                     -bound, bound),
            "bi": jnp.zeros((4 * h,)), "bh": jnp.zeros((4 * h,)),
        })
    params["lstm"] = lstm_layers

    stages: List[Dict] = []
    for ratio in ratios:
        ch = mult * nf
        out = ch // 2
        hidden = out // cfg.seanet_compress
        # ConvTranspose kernel layout (K, Cout, Cin) for conv1d_transpose
        wt = _kaiming_conv(next(keys), ratio * 2, out, ch)
        up = (dict(nn.weight_norm_init(wt), b=jnp.zeros((out,)))
              if weight_norm else {"w": wt, "b": jnp.zeros((out,))})
        res_layers = []
        for _ in range(cfg.seanet_n_residual_layers):
            res_layers.append({
                "conv1": conv(cfg.seanet_residual_kernel_size, out, hidden),
                "conv2": conv(1, hidden, out),
                "shortcut": conv(1, out, out),
            })
        stages.append({"up": up, "res": res_layers})
        mult //= 2
    params["stages"] = stages
    params["conv_out"] = conv(cfg.seanet_last_kernel_size, nf, 1)
    return params


def apply_seanet_decoder(params: Dict, z: jnp.ndarray,
                         cfg: CodecConfig) -> jnp.ndarray:
    """(B, L, dim) features -> (B, ~L*320) waveform."""
    ratios = list(cfg.downsamples)
    x = sconv1d(z, params["conv_in"])
    lstm_in = x
    for layer in params["lstm"]:
        x = _lstm_layer(layer, x)
    x = x + lstm_in
    for ratio, stage in zip(ratios, params["stages"]):
        x = _elu(x)
        w = nn.effective_weight(stage["up"])
        y = nn.conv1d_transpose(x, w, stage["up"]["b"], stride=ratio)
        # asymmetric unpad (encoder/modules/conv.py:248-253)
        pt = ratio * 2 - ratio
        right = pt // 2
        left = pt - right
        x = y[:, left: y.shape[1] - right]
        for j, res in enumerate(stage["res"]):
            h = _elu(x)
            h = sconv1d(h, res["conv1"],
                        dilation=cfg.seanet_dilation_base ** j)
            h = _elu(h)
            h = sconv1d(h, res["conv2"])
            s = sconv1d(x, res["shortcut"])
            x = s + h
    x = _elu(x)
    x = sconv1d(x, params["conv_out"])
    return x[..., 0]


def apply_seanet_encoder(params: Dict, wav: jnp.ndarray,
                         cfg: CodecConfig) -> jnp.ndarray:
    """(B, T) waveform -> (B, L, dim) embeddings, L = ceil(T / 320)."""
    ratios_runtime = list(reversed(cfg.downsamples))
    x = wav[..., None]  # (B, T, 1)
    x = sconv1d(x, params["conv_in"])
    for stage in params["stages"]:
        for j, res in enumerate(stage["res"]):
            h = _elu(x)
            # dilation grows as base**j within a stage (seanet.py:116-117)
            h = sconv1d(h, res["conv1"],
                        dilation=cfg.seanet_dilation_base ** j)
            h = _elu(h)
            h = sconv1d(h, res["conv2"])
            s = sconv1d(x, res["shortcut"])
            x = s + h
        x = _elu(x)
        x = sconv1d(x, stage["down"], stride=ratios_runtime.pop(0))
    lstm_in = x
    for layer in params["lstm"]:
        x = _lstm_layer(layer, x)
    x = x + lstm_in  # skip connection (encoder/modules/lstm.py:30-38)
    x = _elu(x)
    x = sconv1d(x, params["conv_out"])
    return x
