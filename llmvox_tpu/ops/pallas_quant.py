"""Pallas int4 matmul: the MXU reads PACKED nibbles from HBM.

Why a kernel: XLA cannot stream 4-bit weights.  The unpack
(shift/interleave) in a dot-operand producer blocks fusion, so XLA
either materializes a dense bf16 copy every decode step (measured 5x
slower than bf16 at 1B shapes) or — with the nibble-split einsum in
ops/quant.py::int4_matmul — reads the packed buffer once per nibble,
landing at int8 bytes, not int4.  Only a kernel can unpack both nibbles
from ONE pass over the packed bytes (reference counterpart: the fp16
CUDA decode loops, inference/llm_streaming.py:44-106 — the reference
has no quantized path at all).

MEASURED VERDICT (v5e, 1B-class, B=1 block-16 decode,
benchmarks/quant_bench.py): this kernel 61-63 ms vs 83 ms for the
einsum lowering and 240 ms for naive dequant — but w8 runs 31-32 ms.
Low-batch int4 decode on v5e is VPU-BOUND, not bandwidth-bound: every
weight element costs ~4 vector ops (int32 nibble shifts, scale
multiply, bf16 casts) against ~1 for int8's fused dequant, and at M=8
the MXU can't amortize it.  The halved DMA bytes cannot buy that back.
So: w4 = 4x HBM capacity (fit an 8B model in ~4.5 GB), w8 = decode
speed.  A hardware s4-dequant data path (or big-M prefill, where
compute/byte is 16x better) is what would flip it.

Layout contract (ops/quant.py::quantize_weight4): logical rows 2i /
2i+1 live in the low / high nibble of packed row i, scales are one
float per (group, output column) with groups along the contraction
axis.  The kernel therefore takes the activation pre-split into
even/odd logical rows (two tiny strided slices of x done in XLA — the
weight-side traffic is what matters) and computes

    out[m, c] = sum_g (xe_g @ lo_g + xo_g @ hi_g)[m, c] * s[g, c]

with one grid step per (m-tile, cout-tile, group): the per-group
partial dot pulls the scale out of the contraction (it is constant
along it within a group), so weights never materialize dequantized —
two arithmetic shifts and two bf16 casts in VMEM feed the MXU directly.
Pallas double-buffers the packed-tile DMAs across grid steps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

COUT_TILE = 256   # lane-dim tile; every deployed Cout is a multiple
M_TILE = 128      # row tile cap for prefill-sized activations


def _kernel(xe_ref, xo_ref, q_ref, s_ref, out_ref, *, pkg: int):
    """One grid step = ``kgrp`` scale-groups of packed rows against one
    (m, cout) tile.  Dequantization happens in VMEM (a broadcast
    multiply — VMEM traffic, not HBM), so each step runs ONE pair of
    large dots instead of one tiny dot per group: with per-group dots
    the MXU is latency-bound at (m, pkg) x (pkg, ct) granularity —
    measured 2.4x slower end-to-end at 1B shapes."""
    ci = pl.program_id(2)
    # Mosaic has no int8 shifts (arith.shli fails to legalize) — extract
    # nibbles in int32
    q = q_ref[:].astype(jnp.int32)
    kgrp, ct = s_ref.shape[0], q_ref.shape[-1]
    s = jnp.broadcast_to(s_ref[:], (kgrp, pkg, ct)).reshape(q.shape)
    lo = ((jnp.left_shift(q, 28) >> 28) * s).astype(jnp.bfloat16)
    hi = ((q >> 4) * s).astype(jnp.bfloat16)
    part = (jnp.dot(xe_ref[:].astype(jnp.bfloat16), lo,
                    preferred_element_type=jnp.float32)
            + jnp.dot(xo_ref[:].astype(jnp.bfloat16), hi,
                      preferred_element_type=jnp.float32))

    @pl.when(ci == 0)
    def _init():
        out_ref[:] = part

    @pl.when(ci != 0)
    def _acc():
        out_ref[:] += part


@functools.partial(jax.jit, static_argnames=("interpret",))
def _int4_mm(xe, xo, q, s3, *, interpret=False):
    m = xe.shape[0]
    pk, cout = q.shape
    g = s3.shape[0]
    pkg = pk // g
    mt = min(m, M_TILE)
    ct = COUT_TILE * 2 if cout % (COUT_TILE * 2) == 0 else \
        (COUT_TILE if cout % COUT_TILE == 0 else cout)
    # fold several scale-groups into one grid step: big dots keep the
    # MXU pipeline full, and the packed block stays modest in VMEM
    kgrp = 1
    for k in (8, 4, 2):
        if g % k == 0 and pkg * k * ct <= 512 * 1024:
            kgrp = k
            break
    grid = (pl.cdiv(m, mt), pl.cdiv(cout, ct), g // kgrp)
    return pl.pallas_call(
        functools.partial(_kernel, pkg=pkg),
        out_shape=jax.ShapeDtypeStruct((m, cout), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((mt, pkg * kgrp), lambda mo, co, ci: (mo, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mt, pkg * kgrp), lambda mo, co, ci: (mo, ci),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pkg * kgrp, ct), lambda mo, co, ci: (ci, co),
                         memory_space=pltpu.VMEM),
            # (kgrp, 1, ct): a sublane-1 2-D block violates Mosaic's
            # last-two-dims tiling rule; with the group axis leading,
            # the last two dims equal / divide the array dims
            pl.BlockSpec((kgrp, 1, ct), lambda mo, co, ci: (ci, 0, co),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mt, ct), lambda mo, co, ci: (mo, co),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xe, xo, q, s3)


def pallas_int4_matmul(x: jnp.ndarray, w, *, interpret: bool = False
                       ) -> jnp.ndarray:
    """``x @ dequant(w)`` for an ops.quant.Int4Tensor, streaming packed
    bytes.  ``x`` is (..., Cin); ``w.q`` must be a per-layer 2-D slice
    (scan bodies hand those out).  Rows pad to the f32 sublane (8)."""
    q, s = w.q, w.s
    assert q.ndim == 2, "pallas_int4_matmul wants a per-layer 2-D weight"
    lead = x.shape[:-1]
    cin = x.shape[-1]
    xf = x.reshape(-1, cin)
    n = xf.shape[0]
    npad = max(8, -(-n // 8) * 8)
    if npad != n:
        xf = jnp.pad(xf, ((0, npad - n), (0, 0)))
    xe = xf[:, 0::2]
    xo = xf[:, 1::2]
    out = _int4_mm(xe, xo, q, s, interpret=interpret)
    return out[:n].reshape(*lead, q.shape[-1]).astype(x.dtype)
