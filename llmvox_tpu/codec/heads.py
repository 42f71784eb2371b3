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


# ---------------------------------------------------------------------------
# IMDCT head variants (reference heads.py:70-157 — shipped alternatives to
# the deployed ISTFT head)
# ---------------------------------------------------------------------------

def init_imdct_symexp_head(key: jax.Array, dim: int, mdct_frame_len: int,
                           sample_rate: int = None) -> Dict:
    """IMDCTSymExpHead (heads.py:70-120): Linear -> symexp -> IMDCT, with
    optional mel-scale-weighted last-layer init."""
    out_dim = mdct_frame_len // 2
    w = 0.02 * jax.random.truncated_normal(key, -2.0, 2.0, (dim, out_dim),
                                           jnp.float32)
    if sample_rate is not None:
        import numpy as np
        m_max = 2595.0 * np.log10(1.0 + (sample_rate // 2) / 700.0)
        m_pts = np.linspace(0, m_max, out_dim)
        f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
        scale = 1.0 - f_pts / f_pts.max()
        w = w * jnp.asarray(scale[None, :], jnp.float32)
    return {"w": w, "b": jnp.zeros((out_dim,))}


def apply_imdct_symexp_head(params: Dict, x: jnp.ndarray,
                            mdct_frame_len: int,
                            clip_audio: bool = False) -> jnp.ndarray:
    from llmvox_tpu.ops.istft import imdct
    h = nn.linear(x, params["w"], params["b"]).astype(jnp.float32)
    h = jnp.sign(h) * (jnp.exp(jnp.abs(h)) - 1.0)        # symexp
    h = jnp.clip(h, -1e2, 1e2)
    audio = imdct(h, frame_len=mdct_frame_len)
    if clip_audio:
        audio = jnp.clip(audio, -1.0, 1.0)
    return audio


def init_imdct_cos_head(key: jax.Array, dim: int, mdct_frame_len: int) -> Dict:
    """IMDCTCosHead (heads.py:123-157): Linear -> exp(m)*cos(p) -> IMDCT."""
    w = 0.02 * jax.random.truncated_normal(key, -2.0, 2.0,
                                           (dim, mdct_frame_len), jnp.float32)
    return {"w": w, "b": jnp.zeros((mdct_frame_len,))}


def apply_imdct_cos_head(params: Dict, x: jnp.ndarray, mdct_frame_len: int,
                         clip_audio: bool = False) -> jnp.ndarray:
    from llmvox_tpu.ops.istft import imdct
    h = nn.linear(x, params["w"], params["b"]).astype(jnp.float32)
    m, p = jnp.split(h, 2, axis=-1)
    m = jnp.minimum(jnp.exp(m), 1e2)
    audio = imdct(m * jnp.cos(p), frame_len=mdct_frame_len)
    if clip_audio:
        audio = jnp.clip(audio, -1.0, 1.0)
    return audio
