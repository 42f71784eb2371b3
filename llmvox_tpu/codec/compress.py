"""LM-entropy-coded compression of RVQ code streams.

This is the consumer the reference builds its LM for
(``EncodecModel.get_lm_model``, WavTokenizer/encoder/model.py:199-217):
instead of storing each code with ``log2(bins)`` raw bits, an arithmetic
coder spends bits according to the LM's per-step predictive distribution —
well-predicted codes cost (far) less than their raw width.

Wire format (little-endian):
    u8  n_q        number of codebooks
    u32 T          number of frames
    u8  pad        reserved (0)
    AC bitstream   n_q symbols per frame, frame-major

Both directions drive the SAME jitted LM step (``codec.lm.lm_step``) one
frame at a time, so the pdf the decoder sees is bit-identical to the one
the encoder used — the correctness condition of arithmetic coding.  The
LM forward runs on the accelerator; only the bit IO is host-side.
"""
from __future__ import annotations

import io
import struct
from typing import Dict

import jax.numpy as jnp
import numpy as np

from . import lm as lm_mod
from .entropy import ArithmeticCoder, ArithmeticDecoder, quantized_cdf


def compress_codes(params: Dict, codes: np.ndarray,
                   cfg: lm_mod.LMConfig) -> bytes:
    """Entropy-code ``codes`` (n_q, T) int32 in [0, card)."""
    codes = np.asarray(codes, np.int64)
    k, t = codes.shape
    if k != cfg.n_q:
        raise ValueError(f"codes have {k} codebooks, LM expects {cfg.n_q}")
    if codes.size and (codes.min() < 0 or codes.max() >= cfg.card):
        raise ValueError(
            f"code values must lie in [0, {cfg.card}); got "
            f"[{codes.min()}, {codes.max()}]")
    fo = io.BytesIO()
    fo.write(struct.pack("<BIB", k, t, 0))
    coder = ArithmeticCoder(fo)
    state = lm_mod.init_stream_state(cfg, batch=1)
    # LM input at frame i is frame i-1's codes + 1; 0 means "no history"
    prev = np.zeros((1, k, 1), np.int32)
    for i in range(t):
        probs, state = lm_mod.lm_step(params, jnp.asarray(prev), state, cfg)
        pdf = np.asarray(probs[0, :, :, 0], np.float64)     # (card, n_q)
        for q in range(k):
            coder.push(int(codes[q, i]), quantized_cdf(pdf[:, q]))
        prev = codes[None, :, i:i + 1].astype(np.int32) + 1
    coder.flush()
    return fo.getvalue()


def decompress_codes(params: Dict, data: bytes,
                     cfg: lm_mod.LMConfig) -> np.ndarray:
    """Inverse of :func:`compress_codes`; returns (n_q, T) int32 codes."""
    fo = io.BytesIO(data)
    k, t, _ = struct.unpack("<BIB", fo.read(6))
    if k != cfg.n_q:
        raise ValueError(f"stream has {k} codebooks, LM expects {cfg.n_q}")
    decoder = ArithmeticDecoder(fo)
    state = lm_mod.init_stream_state(cfg, batch=1)
    prev = np.zeros((1, k, 1), np.int32)
    out = np.zeros((k, t), np.int32)
    for i in range(t):
        probs, state = lm_mod.lm_step(params, jnp.asarray(prev), state, cfg)
        pdf = np.asarray(probs[0, :, :, 0], np.float64)
        for q in range(k):
            sym = decoder.pull(quantized_cdf(pdf[:, q]))
            if sym is None:
                raise ValueError("compressed stream ended early")
            out[q, i] = sym
        prev = out[None, :, i:i + 1] + 1
    return out
