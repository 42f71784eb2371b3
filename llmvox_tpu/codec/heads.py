"""ISTFT vocoder head.

Mirrors WavTokenizer/decoder/heads.py:24-67: Linear(768 -> n_fft + 2)
predicts (log-magnitude, phase); S = clip(exp(mag), 1e2) * (cos p + i sin p);
custom "same"-padded ISTFT reconstructs hop_length * T samples.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from llmvox_tpu.ops import nn
from llmvox_tpu.ops.istft import istft_same
from llmvox_tpu.utils.config import CodecConfig


def init_istft_head(key: jax.Array, cfg: CodecConfig) -> Dict:
    out_dim = cfg.n_fft + 2
    w = 0.02 * jax.random.truncated_normal(
        key, -2.0, 2.0, (cfg.backbone_dim, out_dim), jnp.float32)
    return {"w": w, "b": jnp.zeros((out_dim,))}


def apply_istft_head(params: Dict, x: jnp.ndarray, cfg: CodecConfig,
                     valid_len=None) -> jnp.ndarray:
    """(B, L, 768) hidden -> (B, hop_length * L) waveform."""
    h = nn.linear(x, params["w"], params["b"]).astype(jnp.float32)
    nbins = cfg.n_fft // 2 + 1
    mag = jnp.exp(h[..., :nbins])
    mag = jnp.minimum(mag, 1e2)  # safeguard (heads.py:56)
    phase = h[..., nbins:]
    spec = mag * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    return istft_same(spec, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                      valid_len=valid_len)
