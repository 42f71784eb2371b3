"""Small neural-net building ops shared by the decoder and the codec.

All tensors are channel-last ``(B, L, C)`` — the TPU-friendly layout (the
lane dimension maps to channels).  The reference uses torch channel-first
``(B, C, L)``; semantics here are verified against torch in tests.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def layer_norm(x: jnp.ndarray, scale: Optional[jnp.ndarray],
               bias: Optional[jnp.ndarray], eps: float) -> jnp.ndarray:
    """LayerNorm over the last axis (biased variance, like F.layer_norm)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    if scale is not None:
        y = y * scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               num_groups: int, eps: float,
               valid_len: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """GroupNorm for (B, L, C): stats over (L, channels-in-group).

    Matches torch.nn.GroupNorm applied to (B, C, L) (reference
    WavTokenizer/decoder/models.py:15-16).  With ``valid_len``, statistics
    are computed over positions [0, valid_len) only and padding positions
    are zeroed — bit-equivalent to running at the exact unpadded length
    (used for static-shape ragged-chunk decode).
    """
    b, l, c = x.shape
    g = num_groups
    x32 = x.astype(jnp.float32).reshape(b, l, g, c // g)
    if valid_len is None:
        mean = jnp.mean(x32, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=(1, 3), keepdims=True)
        mask = None
    else:
        # valid_len is a scalar or a per-batch (B,) vector
        vl = jnp.asarray(valid_len, jnp.int32).reshape(-1, 1, 1, 1)
        mask = (lax.broadcasted_iota(jnp.int32, (1, l, 1, 1), 1)
                < vl).astype(jnp.float32)
        denom = vl.astype(jnp.float32) * (c // g)
        x32 = x32 * mask
        mean = jnp.sum(x32, axis=(1, 3), keepdims=True) / denom
        xc = (x32 - mean) * mask
        var = jnp.sum(jnp.square(xc), axis=(1, 3), keepdims=True) / denom
    y = ((x32 - mean) * lax.rsqrt(var + eps)).reshape(b, l, c)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if mask is not None:
        y = y * mask.reshape(mask.shape[0], l, 1)
    return y.astype(x.dtype)


def mm_precision(dtype) -> lax.Precision:
    """Matmul precision by operand dtype.

    f32 operands force HIGHEST: the default would silently truncate them
    to bf16 on the MXU (the original parity bug — see conv/linear call
    sites and the torch-oracle tests).  bf16 operands use DEFAULT: a
    single MXU pass with f32 internal accumulation is already exact for
    bf16 inputs, and HIGHEST would select a multi-pass algorithm several
    times slower (measured 394 -> ~100 ms on the T=8192 training
    forward).
    """
    return (lax.Precision.HIGHEST if dtype == jnp.float32
            else lax.Precision.DEFAULT)


def conv1d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None,
           *, stride: int = 1, padding="SAME", dilation: int = 1,
           groups: int = 1) -> jnp.ndarray:
    """1-D convolution on (B, L, C) with kernel (K, Cin/groups, Cout)."""
    if isinstance(padding, int):
        padding = [(padding, padding)]
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride,),
        padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        precision=mm_precision(x.dtype),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv1d_transpose(x: jnp.ndarray, w: jnp.ndarray,
                     b: Optional[jnp.ndarray] = None, *, stride: int = 1,
                     padding="VALID") -> jnp.ndarray:
    """Transposed 1-D convolution on (B, L, C), kernel (K, Cout, Cin).

    Matches torch.nn.ConvTranspose1d with padding=0 when ``padding='VALID'``
    (trimming is done by the caller, as in the reference SEANet decoder).
    """
    # with transpose_kernel=True, lax.conv_transpose takes the kernel in
    # (K, Cout, Cin) layout and matches torch ConvTranspose1d exactly
    # (verified against torch in tests)
    y = lax.conv_transpose(
        x, w.astype(x.dtype), strides=(stride,), padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
        transpose_kernel=True,
        precision=mm_precision(x.dtype),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def dense_weight(w, dtype) -> jnp.ndarray:
    """Materialize a matmul weight at ``dtype``: plain arrays cast,
    int8-quantized weights (ops/quant.py) dequantize."""
    from llmvox_tpu.ops import quant
    if isinstance(w, (quant.QuantizedTensor, quant.Int8Linear,
                      quant.Int4Tensor)):
        return quant.dequantize(w, dtype)
    return w.astype(dtype)


def linear(x: jnp.ndarray, w: jnp.ndarray,
           b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dense layer; w is (Cin, Cout) — torch Linear.weight transposed.

    ``w`` may be quantized (ops/quant.py): a QuantizedTensor (int8) or
    Int4Tensor (group-wise int4) dequantizes into the matmul operand
    (weight-only), an Int8Linear runs the matmul natively in int8 with
    dynamically quantized activations."""
    from llmvox_tpu.ops import quant
    if isinstance(w, quant.Int8Linear):
        y = quant.int8_matmul(x, w)
    elif isinstance(w, quant.Int4Tensor) and w.q.ndim == 2:
        if jax.default_backend() == "tpu":
            from llmvox_tpu.ops.pallas_quant import pallas_int4_matmul
            y = pallas_int4_matmul(x, w)
        else:
            y = quant.int4_matmul(x, w)
    else:
        y = jnp.dot(x, dense_weight(w, x.dtype),
                    preferred_element_type=x.dtype,
                    precision=mm_precision(x.dtype))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv2d(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None,
           *, stride=(1, 1), padding="SAME", groups: int = 1) -> jnp.ndarray:
    """2-D convolution on (B, H, W, C) with kernel (KH, KW, Cin/groups, Cout)."""
    if isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = [(padding[0], padding[0]), (padding[1], padding[1])]
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=tuple(stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=mm_precision(x.dtype),
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def weight_norm_init(w: jnp.ndarray) -> dict:
    """Decompose a kernel into weight-norm params {g, v}: w = g * v/||v||.

    Norm is over all axes except the *output-channel* axis, which for our
    kernel layouts ((K, Cin, Cout) / (KH, KW, Cin, Cout) / (Cin, Cout)) is
    the last — the counterpart of torch weight_norm(dim=0) on
    (Cout, Cin, K) kernels.
    """
    axes = tuple(range(w.ndim - 1))
    g = jnp.sqrt(jnp.sum(jnp.square(w), axis=axes, keepdims=True))
    return {"g": g, "v": w}


def effective_weight(p: dict) -> jnp.ndarray:
    """Resolve {g, v} weight-norm params (training) or plain {w} (folded)."""
    if "v" in p:
        v = p["v"]
        axes = tuple(range(v.ndim - 1))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
        return p["g"] * v / jnp.maximum(norm, 1e-12)
    return p["w"]


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.1) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    """Tanh-approximate GELU — the decoder activation (src/model.py:21-26)."""
    x32 = x.astype(jnp.float32)
    c = math.sqrt(2.0 / math.pi)
    y = 0.5 * x32 * (1.0 + jnp.tanh(c * (x32 + 0.044715 * x32 ** 3)))
    return y.astype(x.dtype)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact GELU — the codec ConvNeXt activation (decoder/modules.py:35)."""
    return jax.nn.gelu(x, approximate=False)


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) — the codec pos_net activation (decoder/models.py:10-12)."""
    return x * jax.nn.sigmoid(x.astype(jnp.float32)).astype(x.dtype)


def l2_normalize(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """F.normalize(p=2, dim=-1, eps=eps): x / max(||x||_2, eps)."""
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(x32), axis=-1, keepdims=True))
    return (x32 / jnp.maximum(norm, eps)).astype(x.dtype)
