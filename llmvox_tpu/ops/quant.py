"""Int8 / int4 quantization for the serving paths (beyond-reference).

Streaming decode on TPU is HBM-bandwidth-bound: every decode step re-reads
the full weight set (the reference re-reads them in fp16 through CUDA
kernels, streaming_server.py:323-354 / inference/llm_streaming.py — it has
no quantized path at all).  Storing matmul weights as int8 with one
float scale per output channel halves the bytes streamed from HBM; the
dequantize (``q * s``) fuses into the matmul operand read in XLA, so the
MXU still computes in bf16/f32 with full-precision accumulation.

Design:

- :class:`QuantizedTensor` is a NamedTuple pytree leaf-pair ``(q, s)``
  that flows through ``jax.device_put`` / ``lax.scan`` over stacked layer
  params / jit boundaries like any other param subtree.  Stacked layout
  ``(L, Cin, Cout)`` quantizes to ``q (L, Cin, Cout) int8`` +
  ``s (L, 1, Cout) float`` so a scan's per-layer slice stays a valid
  (Cin, Cout)-weight QuantizedTensor.
- ``ops.nn.linear`` (and the decoder's raw-head ``dense_weight`` helper)
  accept either a plain array or a QuantizedTensor, so every model —
  speech decoder, Llama, Whisper — gains an int8 mode without touching
  its forward code.
- Quantization is symmetric per-output-channel over the contraction
  (Cin) axis: ``s = max|w| / 127`` per output column; error is bounded
  by ``s/2`` per weight (~0.4% of the column's max).  Parity bounds are
  proven in tests/test_quant.py.

Embeddings, norm scales, tables, and biases stay in full precision —
they are lookup/elementwise traffic, not matmul streams.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp


class QuantizedTensor(NamedTuple):
    """Symmetric per-channel int8 weight: ``w ~= q.astype(f) * s``."""

    q: jnp.ndarray   # int8, the original weight's shape
    s: jnp.ndarray   # float scale, broadcastable against q

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        # the *logical* dtype (what dequantization produces by default)
        return self.s.dtype


def quantize_weight(w: jnp.ndarray, contract_axis: int = -2,
                    cls=None) -> QuantizedTensor:
    """Quantize a dense weight to int8 with one scale per output channel.

    ``contract_axis`` is the reduction (Cin) axis of the matmul this
    weight feeds — scales are computed over it (and broadcast along it),
    so each output channel dequantizes independently.  ``cls`` picks the
    container (QuantizedTensor = weight-only dequant, Int8Linear =
    int8xint8 compute).
    """
    w = jnp.asarray(w)
    amax = jnp.max(jnp.abs(w), axis=contract_axis, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return (cls or QuantizedTensor)(q=q, s=s.astype(jnp.float32))


class Int8Linear(NamedTuple):
    """Int8 weight for int8xint8 MXU compute (w8a8): activations are
    dynamically quantized per token at the call site and the matmul runs
    natively in int8 with int32 accumulation — the weight never converts
    back to bf16, so XLA cannot hoist a dequantized copy out of the
    decode ``lax.scan`` (the failure mode of weight-only dequant: the
    ``q * s`` producer is loop-invariant, and materializing it would
    re-spend the HBM bytes the quantization saved).  On v5e-class MXUs
    int8 also doubles the peak MACs vs bf16."""

    q: jnp.ndarray   # int8 (…, Cin, Cout)
    s: jnp.ndarray   # float (…, 1, Cout) — per-output-channel weight scale

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return self.s.dtype


class Int4Tensor(NamedTuple):
    """Symmetric group-wise int4 weight, stored PACKED: two 4-bit values
    per int8 byte along the contraction axis — 4x fewer weight bytes in
    HBM than bf16.  Packing into plain int8 instead of the native s4
    dtype is deliberate: int8 arrays cross jit boundaries, device_put,
    and host transfers on every backend, while s4 jit *inputs* trip a
    relayout recursion on the tunneled TPU runtime (probed; jit s4
    *outputs* were fine).  The unpack (two arithmetic shifts + an
    interleave) runs inside the consuming program.

    15 levels are too coarse for a whole Cin column, so scales are
    per-group along the contraction axis (default 64):
    ``w[..., g*G:(g+1)*G, c] ~= q * s[..., g, 0, c]``.  Rows 2i / 2i+1
    pack into the low / high nibble of byte i.

    Stacked layout ``(L, Cin, Cout)`` keeps scan-compatibility: a
    ``lax.scan`` per-layer slice of ``(q, s)`` is itself a valid
    Int4Tensor."""

    q: jnp.ndarray   # int8 (…, Cin/2, Cout), two s4 nibbles per byte
    s: jnp.ndarray   # float (…, n_groups, 1, Cout)

    @property
    def shape(self):
        # the LOGICAL weight shape
        return (*self.q.shape[:-2], 2 * self.q.shape[-2], self.q.shape[-1])

    @property
    def dtype(self):
        return self.s.dtype


def quantize_weight4(w: jnp.ndarray, group: int = 256) -> Int4Tensor:
    """Quantize a (…, Cin, Cout) weight to packed int4 with one scale
    per ``group`` rows of the contraction axis per output channel.
    Ranges clip to ±7 (symmetric; -8 stays unused so +w and -w quantize
    identically).  Cin must be even; scales fall back to one group when
    Cin % group != 0."""
    w = jnp.asarray(w)
    cin, cout = w.shape[-2], w.shape[-1]
    assert cin % 2 == 0, "int4 packing needs an even contraction dim"
    g = group if group > 0 and cin % group == 0 else cin
    lead = w.shape[:-2]
    wg = w.reshape(*lead, cin // g, g, cout)
    amax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 7.0
    q = jnp.clip(jnp.round(wg / s), -7, 7).astype(jnp.int8)
    q = q.reshape(*lead, cin, cout)
    lo, hi = q[..., 0::2, :], q[..., 1::2, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    return Int4Tensor(q=packed, s=s.astype(jnp.float32))


def _unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Packed int8 (…, Cin/2, Cout) -> int8 (…, Cin, Cout) in [-7, 7].
    Arithmetic shifts sign-extend each nibble."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)
    hi = jnp.right_shift(packed, 4)
    q = jnp.stack([lo, hi], axis=-2)          # (…, Cin/2, 2, Cout)
    return q.reshape(*packed.shape[:-2], 2 * packed.shape[-2],
                     packed.shape[-1])


def dequantize(w, dtype=None) -> jnp.ndarray:
    """Quantized weight -> dense array (plain arrays pass through)."""
    if isinstance(w, (QuantizedTensor, Int8Linear)):
        dtype = dtype or w.s.dtype
        return w.q.astype(dtype) * w.s.astype(dtype)
    if isinstance(w, Int4Tensor):
        dtype = dtype or w.s.dtype
        q = _unpack_int4(w.q)
        cin, cout = q.shape[-2], q.shape[-1]
        ng = w.s.shape[-3]
        lead = q.shape[:-2]
        qg = q.reshape(*lead, ng, cin // ng, cout).astype(dtype)
        return (qg * w.s.astype(dtype)).reshape(q.shape)
    return w if dtype is None else w.astype(dtype)


def int4_matmul(x: jnp.ndarray, w: Int4Tensor) -> jnp.ndarray:
    """``x @ dequant(w)`` built so the packed bytes are what HBM
    streams.

    The naive route (unpack -> interleave -> reshape -> dot) makes XLA
    materialize a dense bf16 weight every decode step — measured 5x
    SLOWER than bf16 at 1B shapes, because the stack/reshape in the
    operand producer blocks dot fusion.  This formulation keeps every
    weight-side op elementwise on the packed buffer:

    - even/odd logical rows live in the low/high nibble of the same
      packed row, so ``x_even @ lo + x_odd @ hi`` needs only two
      arithmetic shifts (no interleave — the SLICE moves to the tiny
      activation side);
    - the per-(group, column) scale is constant along the contraction
      within a group, so it pulls OUT of the dot:
      ``x_g @ (q_g * s_g) == (x_g @ q_g) * s_g`` — a group-batched
      einsum, output scaled per (g, c), then summed over groups.
    """
    q, s = w.q, w.s                      # (P, C) packed, (G, 1, C)
    p, c = q.shape[-2], q.shape[-1]
    g = s.shape[-3]
    gp = p // g                          # packed rows per group
    f = jnp.float32
    # bf16 dot operands: exact for nibble values in [-7, 7], and half
    # the bytes of f32 if XLA materializes instead of fusing the shifts
    op = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    lo = jnp.right_shift(jnp.left_shift(q, 4), 4).reshape(g, gp, c)
    hi = jnp.right_shift(q, 4).reshape(g, gp, c)
    lead = x.shape[:-1]
    xe = x[..., 0::2].reshape(*lead, g, gp).astype(op)
    xo = x[..., 1::2].reshape(*lead, g, gp).astype(op)
    ye = jnp.einsum("...gk,gkc->...gc", xe, lo.astype(op),
                    preferred_element_type=f)
    yo = jnp.einsum("...gk,gkc->...gc", xo, hi.astype(op),
                    preferred_element_type=f)
    y = jnp.sum((ye + yo) * s[..., 0, :].astype(f), axis=-2)
    return y.astype(x.dtype)


def int8_matmul(x: jnp.ndarray, w: Int8Linear) -> jnp.ndarray:
    """``x @ dequant(w)`` computed as int8xint8 on the MXU.

    Activations quantize symmetrically per token (row): ``sx = max|x| /
    127`` over the channel axis.  The int32 accumulator is exact, so the
    only error sources are the two rounding steps; scales apply to the
    int32 output (cheap elementwise, nothing loop-invariant to hoist).
    """
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    sx = jnp.maximum(ax, 1e-8) / 127.0
    qx = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        qx, w.q, (((qx.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    scale = sx * w.s.reshape(w.s.shape[-1]).astype(jnp.float32)
    return (y.astype(jnp.float32) * scale).astype(x.dtype)


def _quantize_named(tree: Dict, names: Sequence[str],
                    cls=QuantizedTensor,
                    keep_w8: Sequence[str] = ()) -> Dict:
    """Replace dict entries whose key is in ``names`` (at any nesting
    level) by quantized containers; everything else is kept as-is.
    Keys in ``keep_w8`` always get the weight-only container even when
    ``cls`` is Int8Linear (e.g. lm heads, where activation rounding
    would cost argmax fidelity for a matmul that runs once per step)."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = _quantize_named(v, names, cls, keep_w8)
        elif (k in names
                and not isinstance(v, (QuantizedTensor, Int8Linear,
                                       Int4Tensor))):
            if cls is Int4Tensor and k not in keep_w8:
                out[k] = quantize_weight4(v)
            else:
                out[k] = quantize_weight(
                    v, cls=QuantizedTensor if k in keep_w8 else cls)
        else:
            out[k] = v
    return out


def _mode_cls(mode: str):
    if mode == "w8":
        return QuantizedTensor
    if mode == "w8a8":
        return Int8Linear
    if mode == "w4":
        return Int4Tensor
    raise ValueError(f"unknown quantization mode {mode!r} "
                     "(expected 'w8', 'w8a8' or 'w4')")


# matmul-weight key sets per model family (everything is (…, Cin, Cout))
DECODER_MATMUL_KEYS = ("wqkv", "wo", "wfc", "wproj", "head")
LLAMA_MATMUL_KEYS = ("wq", "wk", "wv", "wo", "wgate", "wup", "wdown",
                     "head", "moe_wgate", "moe_wup", "moe_wdown")
WHISPER_MATMUL_KEYS = ("wq", "wk", "wv", "wo", "xwq", "xwk", "xwv", "xwo",
                       "fc1_w", "fc2_w")
HEAD_KEYS = ("head",)


def quantize_decoder_params(params: Dict, mode: str = "w8") -> Dict:
    """Int8-quantize the speech decoder's matmul weights
    (models/decoder.py).  ``wpe`` / norms / draft heads stay full
    precision (draft logits drive acceptance-rate, not correctness, but
    they are tiny and read once per iteration — not worth the error).
    In ``w8a8`` mode the lm head stays weight-only: its 4096-way argmax
    is the output token."""
    return _quantize_named(params, DECODER_MATMUL_KEYS, _mode_cls(mode),
                           keep_w8=HEAD_KEYS)


def quantize_llama_params(params: Dict, mode: str = "w8") -> Dict:
    """Int8-quantize a Llama param tree (models/llama.py).  ``tok_emb``
    stays dense: it is an embedding gather, and for tied-embedding
    models its transpose doubles as the head.  In ``w8a8`` mode the lm
    head stays weight-only (sampling fidelity).  MoE expert weights
    (``moe_wgate/wup/wdown``) quantize too — per-(expert, out-channel)
    scales (per group for w4), applied through
    ``ops.moe.expert_matmul``'s container dispatch; the ROUTER stays
    full precision (its argmax-like top-k picks experts — rounding there
    changes routing, not just values — and it is one (C, E) matmul per
    layer, not a parameter-memory term)."""
    return _quantize_named(params, LLAMA_MATMUL_KEYS, _mode_cls(mode),
                           keep_w8=HEAD_KEYS)


def quantize_whisper_params(params: Dict, mode: str = "w8") -> Dict:
    """Int8-quantize a Whisper param tree (models/whisper.py); conv
    frontend, embeddings (the decoder's ``tok_emb`` doubles as the tied
    head) and norms stay dense."""
    return _quantize_named(params, WHISPER_MATMUL_KEYS, _mode_cls(mode))


def quantized_bytes(params) -> int:
    """Total parameter bytes as stored (int8 leaves count 1 B/elem;
    Int4Tensor's packed bytes already hold two weights each)."""
    return sum(int(x.size) * x.dtype.itemsize
               for x in jax.tree.leaves(params))
