"""Pallas TPU kernel: fused single-token decode attention over the KV cache.

Replaces the lax chunked decode attention (ops/attention.py) on the
serving hot path: one kernel performs the whole masked flash-style
attention for a token — double-buffered DMA streams only the *filled*
cache chunks from HBM into VMEM (compute and traffic scale with ``pos``,
not capacity), and the per-head math is expressed without lane-splitting
reshapes via a head-selector matmul:

  logits[s, h] = sum_c (K[s, c] * q[c]) * M[c, h],  M[c, h] = [c // D == h]

so every op is a native VPU elementwise or MXU matmul on (chunk, C)
tiles.  Numerics match ops.attention.decode_attention (tested in
interpret mode on CPU and compiled on TPU).
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _kernel(scal_ref, q_ref, k_hbm, v_hbm, out_ref, *, n_head: int,
            chunk: int, s_total: int):
    c = q_ref.shape[-1]
    d = c // n_head
    scale = 1.0 / math.sqrt(d)
    layer = scal_ref[0]
    pos = scal_ref[1]
    nchunks = (pos + chunk) // chunk  # ceil((pos+1)/chunk), dynamic

    # head selector M (C, H): M[i, h] = 1 iff i // d == h
    ci = lax.broadcasted_iota(jnp.int32, (c, n_head), 0)
    hi = lax.broadcasted_iota(jnp.int32, (c, n_head), 1)
    sel = (ci // d == hi).astype(jnp.float32)          # (C, H)

    q = q_ref[:].astype(jnp.float32)                    # (1, C)

    def body(kbuf, vbuf, sems):
        def dma(slot, idx, which):
            src = k_hbm if which == 0 else v_hbm
            buf = kbuf if which == 0 else vbuf
            return pltpu.make_async_copy(
                src.at[layer, pl.ds(idx * chunk, chunk), :],
                buf.at[slot], sems.at[which, slot])

        dma(0, 0, 0).start()
        dma(0, 0, 1).start()

        def loop(ci_, carry):
            m, l, acc = carry                           # (1,H),(1,H),(1,C)
            slot = ci_ % 2
            nxt = (ci_ + 1) % 2

            @pl.when(ci_ + 1 < nchunks)
            def _():
                dma(nxt, ci_ + 1, 0).start()
                dma(nxt, ci_ + 1, 1).start()

            dma(slot, ci_, 0).wait()
            dma(slot, ci_, 1).wait()

            kc = kbuf[slot].astype(jnp.float32)         # (chunk, C)
            vc = vbuf[slot].astype(jnp.float32)
            t = kc * q                                   # broadcast (chunk, C)
            logits = jnp.dot(t, sel,
                             preferred_element_type=jnp.float32) * scale
            idx = ci_ * chunk + lax.broadcasted_iota(
                jnp.int32, (chunk, 1), 0)
            logits = jnp.where(idx <= pos, logits, NEG_INF)  # (chunk, H)

            m_new = jnp.maximum(m, jnp.max(logits, axis=0, keepdims=True))
            p = jnp.exp(logits - m_new)                  # (chunk, H)
            corr = jnp.exp(m - m_new)                    # (1, H)
            l_new = l * corr + jnp.sum(p, axis=0, keepdims=True)
            p_full = jnp.dot(p, sel.T,
                             preferred_element_type=jnp.float32)  # (chunk, C)
            corr_full = jnp.dot(corr, sel.T,
                                preferred_element_type=jnp.float32)  # (1, C)
            acc_new = acc * corr_full + jnp.sum(vc * p_full, axis=0,
                                                keepdims=True)
            return m_new, l_new, acc_new

        m0 = jnp.full((1, n_head), NEG_INF, jnp.float32)
        l0 = jnp.zeros((1, n_head), jnp.float32)
        acc0 = jnp.zeros((1, c), jnp.float32)
        m, l, acc = lax.fori_loop(0, nchunks, loop, (m0, l0, acc0))
        l_full = jnp.dot(l, sel.T, preferred_element_type=jnp.float32)
        out_ref[:] = (acc / l_full).astype(out_ref.dtype)

    pl.run_scoped(
        body,
        kbuf=pltpu.VMEM((2, chunk, c), k_hbm.dtype),
        vbuf=pltpu.VMEM((2, chunk, c), v_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


def _batched_kernel(pos_ref, q_ref, k_hbm, v_hbm, out_ref, *, n_head: int,
                    chunk: int, s_total: int):
    """Per-stream program: grid dim 0 = stream index; caches are
    (B, S, C) in HBM and each program DMAs only its own stream's filled
    chunks."""
    b = pl.program_id(0)
    c = q_ref.shape[-1]
    d = c // n_head
    scale = 1.0 / math.sqrt(d)
    pos = pos_ref[b]
    nchunks = (pos + chunk) // chunk

    ci_idx = lax.broadcasted_iota(jnp.int32, (c, n_head), 0)
    hi_idx = lax.broadcasted_iota(jnp.int32, (c, n_head), 1)
    sel = (ci_idx // d == hi_idx).astype(jnp.float32)

    # row-b extract via one-hot matmul (Mosaic cannot prove dynamic
    # sublane indices aligned; a (1, B) @ (B, C) is free)
    nb = q_ref.shape[0]
    onehot = (lax.broadcasted_iota(jnp.int32, (1, nb), 1)
              == b).astype(jnp.float32)
    q = jnp.dot(onehot, q_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)     # (1, C)

    def body(kbuf, vbuf, sems):
        def dma(slot, idx, which):
            src = k_hbm if which == 0 else v_hbm
            buf = kbuf if which == 0 else vbuf
            return pltpu.make_async_copy(
                src.at[b, pl.ds(idx * chunk, chunk), :],
                buf.at[slot], sems.at[which, slot])

        dma(0, 0, 0).start()
        dma(0, 0, 1).start()

        def loop(ci_, carry):
            m, l, acc = carry
            slot = ci_ % 2
            nxt = (ci_ + 1) % 2

            @pl.when(ci_ + 1 < nchunks)
            def _():
                dma(nxt, ci_ + 1, 0).start()
                dma(nxt, ci_ + 1, 1).start()

            dma(slot, ci_, 0).wait()
            dma(slot, ci_, 1).wait()

            kc = kbuf[slot].astype(jnp.float32)
            vc = vbuf[slot].astype(jnp.float32)
            t = kc * q
            logits = jnp.dot(t, sel,
                             preferred_element_type=jnp.float32) * scale
            idx = ci_ * chunk + lax.broadcasted_iota(
                jnp.int32, (chunk, 1), 0)
            logits = jnp.where(idx <= pos, logits, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(logits, axis=0, keepdims=True))
            p = jnp.exp(logits - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=0, keepdims=True)
            p_full = jnp.dot(p, sel.T, preferred_element_type=jnp.float32)
            corr_full = jnp.dot(corr, sel.T,
                                preferred_element_type=jnp.float32)
            acc_new = acc * corr_full + jnp.sum(vc * p_full, axis=0,
                                                keepdims=True)
            return m_new, l_new, acc_new

        m0 = jnp.full((1, n_head), NEG_INF, jnp.float32)
        l0 = jnp.zeros((1, n_head), jnp.float32)
        acc0 = jnp.zeros((1, c), jnp.float32)
        m, l, acc = lax.fori_loop(0, nchunks, loop, (m0, l0, acc0))
        l_full = jnp.dot(l, sel.T, preferred_element_type=jnp.float32)
        # masked row write: grid programs run sequentially, each sets its row
        row = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
        out_ref[:] = jnp.where(row == b,
                               (acc / l_full).astype(out_ref.dtype),
                               out_ref[:])

    pl.run_scoped(
        body,
        kbuf=pltpu.VMEM((2, chunk, c), k_hbm.dtype),
        vbuf=pltpu.VMEM((2, chunk, c), v_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


def _batched_kernel_v2(scal_ref, q_ref, k_hbm, v_hbm, out_ref, *,
                       n_head: int, chunk: int, s_total: int, nb: int):
    """Single-program batched kernel: the (stream, chunk) iteration space
    is flattened and DMA is double-buffered across the *flat* index, so
    stream b+1's chunks stream in while stream b computes (the grid-per-
    stream variant serializes each program behind its own DMA latency).

    All streams run ``ncmax = ceil((max(pos)+1)/chunk)`` chunk slots;
    shallower streams' extra slots are fully masked (their DMA cost is
    bounded by the deepest stream).
    """
    c = q_ref.shape[-1]
    d = c // n_head
    scale = 1.0 / math.sqrt(d)
    layer = scal_ref[0]

    pmax = scal_ref[1]
    for i in range(1, nb):
        pmax = jnp.maximum(pmax, scal_ref[1 + i])
    ncmax = (pmax + chunk) // chunk
    total = nb * ncmax

    ci_idx = lax.broadcasted_iota(jnp.int32, (c, n_head), 0)
    hi_idx = lax.broadcasted_iota(jnp.int32, (c, n_head), 1)
    sel = (ci_idx // d == hi_idx).astype(jnp.float32)
    qall = q_ref[:].astype(jnp.float32)                  # (nb, C)
    row_iota = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)

    def body(kbuf, vbuf, sems, mrow, lrow, accrow):
        def dma(slot, f, which):
            b = f // ncmax
            ci_ = f % ncmax
            src = k_hbm if which == 0 else v_hbm
            buf = kbuf if which == 0 else vbuf
            return pltpu.make_async_copy(
                src.at[layer, b, pl.ds(ci_ * chunk, chunk), :],
                buf.at[slot], sems.at[which, slot])

        dma(0, 0, 0).start()
        dma(0, 0, 1).start()

        def loop(f, _):
            b = f // ncmax
            ci_ = f % ncmax
            slot = f % 2
            nxt = (f + 1) % 2

            @pl.when(f + 1 < total)
            def _():
                dma(nxt, f + 1, 0).start()
                dma(nxt, f + 1, 1).start()

            dma(slot, f, 0).wait()
            dma(slot, f, 1).wait()

            pos_b = scal_ref[1 + b]

            @pl.when(ci_ == 0)
            def _():
                mrow[:] = jnp.full((1, n_head), NEG_INF, jnp.float32)
                lrow[:] = jnp.zeros((1, n_head), jnp.float32)
                accrow[:] = jnp.zeros((1, c), jnp.float32)

            @pl.when(ci_ * chunk <= pos_b)
            def _():
                onehot = (lax.broadcasted_iota(jnp.int32, (1, nb), 1)
                          == b).astype(jnp.float32)
                q = jnp.dot(onehot, qall,
                            preferred_element_type=jnp.float32)  # (1, C)
                kc = kbuf[slot].astype(jnp.float32)
                vc = vbuf[slot].astype(jnp.float32)
                t = kc * q
                logits = jnp.dot(t, sel,
                                 preferred_element_type=jnp.float32) * scale
                idx = ci_ * chunk + lax.broadcasted_iota(
                    jnp.int32, (chunk, 1), 0)
                logits = jnp.where(idx <= pos_b, logits, NEG_INF)
                m = mrow[:]
                m_new = jnp.maximum(m, jnp.max(logits, axis=0,
                                               keepdims=True))
                p = jnp.exp(logits - m_new)
                corr = jnp.exp(m - m_new)
                lrow[:] = lrow[:] * corr + jnp.sum(p, axis=0, keepdims=True)
                p_full = jnp.dot(p, sel.T,
                                 preferred_element_type=jnp.float32)
                corr_full = jnp.dot(corr, sel.T,
                                    preferred_element_type=jnp.float32)
                accrow[:] = accrow[:] * corr_full + jnp.sum(
                    vc * p_full, axis=0, keepdims=True)
                mrow[:] = m_new

            @pl.when(ci_ == ncmax - 1)
            def _():
                l_full = jnp.dot(lrow[:], sel.T,
                                 preferred_element_type=jnp.float32)
                result = (accrow[:] / l_full).astype(out_ref.dtype)
                out_ref[:] = jnp.where(row_iota == b, result, out_ref[:])

            return _

        lax.fori_loop(0, total, lambda f, carry: (loop(f, carry), None)[1],
                      None)

    pl.run_scoped(
        body,
        kbuf=pltpu.VMEM((2, chunk, c), k_hbm.dtype),
        vbuf=pltpu.VMEM((2, chunk, c), v_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
        mrow=pltpu.VMEM((1, n_head), jnp.float32),
        lrow=pltpu.VMEM((1, n_head), jnp.float32),
        accrow=pltpu.VMEM((1, c), jnp.float32),
    )


@partial(jax.jit, static_argnames=("n_head", "chunk", "interpret", "v2"))
def pallas_batched_decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                                    v_cache: jnp.ndarray, pos: jnp.ndarray,
                                    *, n_head: int, chunk: int = 512,
                                    interpret: bool = False,
                                    v2: bool = True,
                                    layer=None) -> jnp.ndarray:
    """Batched decode attention: q (B, C), caches (B, S, C), pos (B,).

    One grid program per stream; each DMAs only its own filled chunks, so
    per-stream compute scales with that stream's position.  Replaces the
    XLA lowering of the batched flash loop, which relayouts (B, chunk, C)
    tiles per head-split and measured ~27x the rest of the decode step.
    """
    if k_cache.ndim == 3:
        # (B, S, C) caches: wrap as a 1-layer (1, B, S, C) view
        k_cache = k_cache[None]
        v_cache = v_cache[None]
        layer = jnp.int32(0)
    _, b, s, c = k_cache.shape
    chunk = min(chunk, s)
    assert s % chunk == 0
    assert layer is not None, "4-D caches need the layer index"
    scalars = jnp.concatenate([
        jnp.reshape(jnp.asarray(layer, jnp.int32), (1,)),
        jnp.asarray(pos, jnp.int32)])
    if v2:
        kernel = partial(_batched_kernel_v2, n_head=n_head, chunk=chunk,
                         s_total=s, nb=b)
        grid = ()
    else:
        raise NotImplementedError("v1 grid kernel removed from wrapper")
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((b, c), q.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(scalars, q, k_cache, v_cache)
    return out


def _verify_kernel(scal_ref, q_ref, k_hbm, v_hbm, out_ref, *, n_head: int,
                   chunk: int, nb: int, nq: int):
    """Batched VERIFY attention: nq teacher-forced queries per row (the
    speculative decoder's verify forward, models/decoder.py::
    _decode_many_batch).  Row b's query j sits at absolute position
    ``pos_b + j`` and attends cache rows ``<= pos_b + j``.

    Iteration space is the flat (row, chunk) index with double-buffered
    DMA across it, like ``_batched_kernel_v2``; every chunk feeds ALL nq
    queries (one DMA read amortized over the whole draft window — the
    reason speculation beats per-token decode on cache bandwidth).
    q_ref is the flattened (nb*nq, C) query block; out the same."""
    c = q_ref.shape[-1]
    d = c // n_head
    scale = 1.0 / math.sqrt(d)
    layer = scal_ref[0]

    pmax = scal_ref[1]
    for i in range(1, nb):
        pmax = jnp.maximum(pmax, scal_ref[1 + i])
    ncmax = (pmax + nq - 1 + chunk) // chunk
    total = nb * ncmax

    ci_idx = lax.broadcasted_iota(jnp.int32, (c, n_head), 0)
    hi_idx = lax.broadcasted_iota(jnp.int32, (c, n_head), 1)
    sel = (ci_idx // d == hi_idx).astype(jnp.float32)    # (C, H)
    row_iota = lax.broadcasted_iota(jnp.int32, (nb * nq, 1), 0)

    def body(kbuf, vbuf, sems, mrows, lrows, accrows):
        def dma(slot, f, which):
            b = f // ncmax
            ci_ = f % ncmax
            src = k_hbm if which == 0 else v_hbm
            buf = kbuf if which == 0 else vbuf
            return pltpu.make_async_copy(
                src.at[layer, b, pl.ds(ci_ * chunk, chunk), :],
                buf.at[slot], sems.at[which, slot])

        dma(0, 0, 0).start()
        dma(0, 0, 1).start()

        def loop(f, _):
            b = f // ncmax
            ci_ = f % ncmax
            slot = f % 2
            nxt = (f + 1) % 2

            @pl.when(f + 1 < total)
            def _():
                dma(nxt, f + 1, 0).start()
                dma(nxt, f + 1, 1).start()

            dma(slot, f, 0).wait()
            dma(slot, f, 1).wait()

            pos_b = scal_ref[1 + b]

            @pl.when(ci_ == 0)
            def _():
                mrows[:] = jnp.full((nq, n_head), NEG_INF, jnp.float32)
                lrows[:] = jnp.zeros((nq, n_head), jnp.float32)
                accrows[:] = jnp.zeros((nq, c), jnp.float32)

            @pl.when(ci_ * chunk <= pos_b + nq - 1)
            def _():
                # row b's query block via one-hot matmul (dynamic sublane
                # slices are not provably aligned for Mosaic)
                qi = lax.broadcasted_iota(jnp.int32, (nq, nb * nq), 0)
                qj = lax.broadcasted_iota(jnp.int32, (nq, nb * nq), 1)
                pick = (qj == b * nq + qi).astype(jnp.float32)
                qb = jnp.dot(pick, q_ref[:].astype(jnp.float32),
                             preferred_element_type=jnp.float32)  # (nq, C)
                kc = kbuf[slot].astype(jnp.float32)     # (chunk, C)
                vc = vbuf[slot].astype(jnp.float32)
                sidx = ci_ * chunk + lax.broadcasted_iota(
                    jnp.int32, (chunk, 1), 0)
                for j in range(nq):
                    t = kc * qb[j: j + 1]               # (chunk, C)
                    logits = jnp.dot(
                        t, sel, preferred_element_type=jnp.float32) * scale
                    logits = jnp.where(sidx <= pos_b + j, logits, NEG_INF)
                    m = mrows[j: j + 1]                 # (1, H)
                    m_new = jnp.maximum(
                        m, jnp.max(logits, axis=0, keepdims=True))
                    p = jnp.exp(logits - m_new)         # (chunk, H)
                    corr = jnp.exp(m - m_new)
                    lrows[j: j + 1] = (lrows[j: j + 1] * corr
                                       + jnp.sum(p, axis=0, keepdims=True))
                    p_full = jnp.dot(p, sel.T,
                                     preferred_element_type=jnp.float32)
                    corr_full = jnp.dot(corr, sel.T,
                                        preferred_element_type=jnp.float32)
                    accrows[j: j + 1] = (accrows[j: j + 1] * corr_full
                                         + jnp.sum(vc * p_full, axis=0,
                                                   keepdims=True))
                    mrows[j: j + 1] = m_new

            @pl.when(ci_ == ncmax - 1)
            def _():
                l_full = jnp.dot(lrows[:], sel.T,
                                 preferred_element_type=jnp.float32)
                res = (accrows[:] / l_full)             # (nq, C)
                # place row b's block into the flat output
                pi = lax.broadcasted_iota(jnp.int32, (nb * nq, nq), 0)
                pj = lax.broadcasted_iota(jnp.int32, (nb * nq, nq), 1)
                place = (pi == b * nq + pj).astype(jnp.float32)
                full = jnp.dot(place, res,
                               preferred_element_type=jnp.float32)
                keep = jnp.logical_and(row_iota >= b * nq,
                                       row_iota < (b + 1) * nq)
                out_ref[:] = jnp.where(keep, full.astype(out_ref.dtype),
                                       out_ref[:])

            return _

        lax.fori_loop(0, total, lambda f, carry: (loop(f, carry), None)[1],
                      None)

    pl.run_scoped(
        body,
        kbuf=pltpu.VMEM((2, chunk, c), k_hbm.dtype),
        vbuf=pltpu.VMEM((2, chunk, c), v_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
        mrows=pltpu.VMEM((nq, n_head), jnp.float32),
        lrows=pltpu.VMEM((nq, n_head), jnp.float32),
        accrows=pltpu.VMEM((nq, c), jnp.float32),
    )


def _verify_kernel_mxu(scal_ref, qT_ref, k_hbm, v_hbm, outT_ref, *,
                       n_head: int, chunk: int, nb: int, nq: int):
    """MXU formulation of the verify kernel: all nq queries' logits in ONE
    (chunk, C) @ (C, nq*H) matmul against a per-row expanded query matrix
    Qp[c, j*H+h] = q_j[c] * [c//D == h], and the value accumulation as a
    contract-first-axis matmul into (C, nq*H) "transposed space" — no
    per-query loop, no in-kernel transposes (q arrives and the output
    leaves transposed; XLA handles both outside).  The per-query-loop
    variant measured 1.17x pooled-spec speedup at B=8/k=12 because each
    chunk paid ~4 VPU passes per query; this one is two MXU matmuls +
    one exp per chunk.

    NOTE(r3): a write_kv variant (the verify step's own new KV rows
    DMA'd into the aliased caches here, replacing the spec decode's two
    XLA scatters per layer) was built and measured 0.26x — Mosaic
    requires DMA slice shapes AND offsets 8-row-aligned even on HBM
    memrefs, so arbitrary-pos writes need an aligned-base restage whose
    XLA-side gathers/DUS plus 2B serialized in-kernel HBM->HBM DMAs per
    layer cost far more than the ~0.1-0.4 ms the donated scatters
    measure at (benchmarks/verify_probe.py).  Deleted; scatters stay."""
    c = qT_ref.shape[0]
    d = c // n_head
    scale = 1.0 / math.sqrt(d)
    nh = nq * n_head
    layer = scal_ref[0]

    pmax = scal_ref[1]
    for i in range(1, nb):
        pmax = jnp.maximum(pmax, scal_ref[1 + i])
    ncmax = (pmax + nq - 1 + chunk) // chunk
    total = nb * ncmax

    # static selector masks (iota-only, no reshapes):
    #   selK (C, nq*H):  [c // D == k % H]   — expands queries to columns
    #   Bexp (nq, nq*H): [k // H == j]       — tiles q columns per head
    cK = lax.broadcasted_iota(jnp.int32, (c, nh), 0)
    kK = lax.broadcasted_iota(jnp.int32, (c, nh), 1)
    selK = (cK // d == kK % n_head).astype(jnp.float32)
    jB = lax.broadcasted_iota(jnp.int32, (nq, nh), 0)
    kB = lax.broadcasted_iota(jnp.int32, (nq, nh), 1)
    Bexp = (kB // n_head == jB).astype(jnp.float32)
    kB2 = lax.broadcasted_iota(jnp.int32, (nh, nq), 0)
    jB2 = lax.broadcasted_iota(jnp.int32, (nh, nq), 1)
    BsumT = (kB2 // n_head == jB2).astype(jnp.float32)   # (nq*H, nq)
    colk = lax.broadcasted_iota(jnp.int32, (1, nh), 1)
    out_col = lax.broadcasted_iota(jnp.int32, (1, nb * nq), 1)

    def body(kbuf, vbuf, sems, qprime, accR, mrow, lrow):
        def dma(slot, f, which):
            b = f // ncmax
            ci_ = f % ncmax
            src = k_hbm if which == 0 else v_hbm
            buf = kbuf if which == 0 else vbuf
            return pltpu.make_async_copy(
                src.at[layer, b, pl.ds(ci_ * chunk, chunk), :],
                buf.at[slot], sems.at[which, slot])

        dma(0, 0, 0).start()
        dma(0, 0, 1).start()

        def loop(f, _):
            b = f // ncmax
            ci_ = f % ncmax
            slot = f % 2
            nxt = (f + 1) % 2

            @pl.when(f + 1 < total)
            def _():
                dma(nxt, f + 1, 0).start()
                dma(nxt, f + 1, 1).start()

            dma(slot, f, 0).wait()
            dma(slot, f, 1).wait()

            pos_b = scal_ref[1 + b]

            @pl.when(ci_ == 0)
            def _():
                # row b's query block, already transposed: pick nq columns
                pi = lax.broadcasted_iota(jnp.int32, (nb * nq, nq), 0)
                pj = lax.broadcasted_iota(jnp.int32, (nb * nq, nq), 1)
                pickT = (pi == b * nq + pj).astype(jnp.float32)
                q_t = jnp.dot(qT_ref[:].astype(jnp.float32), pickT,
                              preferred_element_type=jnp.float32)  # (C,nq)
                qprime[:] = jnp.dot(
                    q_t, Bexp, preferred_element_type=jnp.float32) * selK
                mrow[:] = jnp.full((1, nh), NEG_INF, jnp.float32)
                lrow[:] = jnp.zeros((1, nh), jnp.float32)
                accR[:] = jnp.zeros((c, nh), jnp.float32)

            @pl.when(ci_ * chunk <= pos_b + nq - 1)
            def _():
                kc = kbuf[slot].astype(jnp.float32)      # (chunk, C)
                vc = vbuf[slot].astype(jnp.float32)
                logits = jnp.dot(kc, qprime[:],
                                 preferred_element_type=jnp.float32) * scale
                sidx = ci_ * chunk + lax.broadcasted_iota(
                    jnp.int32, (chunk, 1), 0)
                logits = jnp.where(sidx <= pos_b + colk // n_head,
                                   logits, NEG_INF)      # (chunk, nq*H)
                m = mrow[:]
                m_new = jnp.maximum(m, jnp.max(logits, axis=0,
                                               keepdims=True))
                p = jnp.exp(logits - m_new)              # (chunk, nq*H)
                corr = jnp.exp(m - m_new)                # (1, nq*H)
                lrow[:] = lrow[:] * corr + jnp.sum(p, axis=0, keepdims=True)
                # value accumulation in transposed space: (C, nq*H)
                a_chunk = lax.dot_general(
                    vc, p, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                accR[:] = accR[:] * corr + a_chunk
                mrow[:] = m_new

            @pl.when(ci_ == ncmax - 1)
            def _():
                # collapse the per-head columns back to per-query outputs:
                # outT[c, j] = accR[c, jH + c//D] / l[0, jH + c//D]
                outT_b = jnp.dot(accR[:] * selK, BsumT,
                                 preferred_element_type=jnp.float32)
                lT_b = jnp.dot(lrow[:] * selK, BsumT,
                               preferred_element_type=jnp.float32)
                resT = outT_b / lT_b                      # (C, nq)
                pi = lax.broadcasted_iota(jnp.int32, (nq, nb * nq), 0)
                pj = lax.broadcasted_iota(jnp.int32, (nq, nb * nq), 1)
                place = (pj == b * nq + pi).astype(jnp.float32)
                placed = jnp.dot(resT, place,
                                 preferred_element_type=jnp.float32)
                keep = jnp.logical_and(out_col >= b * nq,
                                       out_col < (b + 1) * nq)
                outT_ref[:] = jnp.where(keep,
                                        placed.astype(outT_ref.dtype),
                                        outT_ref[:])

            return _

        lax.fori_loop(0, total, lambda f, carry: (loop(f, carry), None)[1],
                      None)

    scope = dict(
        kbuf=pltpu.VMEM((2, chunk, c), k_hbm.dtype),
        vbuf=pltpu.VMEM((2, chunk, c), v_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
        qprime=pltpu.VMEM((c, nh), jnp.float32),
        accR=pltpu.VMEM((c, nh), jnp.float32),
        mrow=pltpu.VMEM((1, nh), jnp.float32),
        lrow=pltpu.VMEM((1, nh), jnp.float32),
    )
    pl.run_scoped(body, **scope)


@partial(jax.jit, static_argnames=("n_head", "chunk", "interpret", "mxu"))
def pallas_verify_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                            v_cache: jnp.ndarray, pos: jnp.ndarray, *,
                            n_head: int, chunk: int = 512,
                            interpret: bool = False, mxu: bool = True,
                            layer=None) -> jnp.ndarray:
    """Batched verify attention for the speculative decoder.

    Args:
      q: (B, n, C) — n teacher-forced queries per row, row b's query j at
        absolute position ``pos[b] + j`` (attends cache ``<= pos[b]+j``).
      k_cache, v_cache: (B, S, C) — or FULL (L, B, S, C) caches plus a
        ``layer`` scalar (pass the full caches from the decode loop:
        slicing ``cache[l]`` materializes a full-layer copy per launch).
      pos: (B,) int32.
    Returns: (B, n, C) attention outputs.

    Numerics match models.decoder._batched_verify_attention (interpret
    mode on CPU; compiled on TPU)."""
    if k_cache.ndim == 3:
        k_cache = k_cache[None]
        v_cache = v_cache[None]
        layer = jnp.int32(0)
    _, b, s, c = k_cache.shape
    nq = q.shape[1]
    chunk = min(chunk, s)
    assert s % chunk == 0
    assert layer is not None, "4-D caches need the layer index"
    scalars = jnp.concatenate([
        jnp.reshape(jnp.asarray(layer, jnp.int32), (1,)),
        jnp.asarray(pos, jnp.int32)])
    specs = dict(
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )
    if mxu:
        # queries in and outputs out TRANSPOSED (C-major) so the kernel
        # needs no in-kernel transposes; XLA does both conversions
        outT = pl.pallas_call(
            partial(_verify_kernel_mxu, n_head=n_head, chunk=chunk,
                    nb=b, nq=nq),
            out_shape=jax.ShapeDtypeStruct((c, b * nq), q.dtype),
            **specs,
        )(scalars, q.reshape(b * nq, c).T, k_cache, v_cache)
        return outT.T.reshape(b, nq, c)
    out = pl.pallas_call(
        partial(_verify_kernel, n_head=n_head, chunk=chunk, nb=b, nq=nq),
        out_shape=jax.ShapeDtypeStruct((b * nq, c), q.dtype),
        **specs,
    )(scalars, q.reshape(b * nq, c), k_cache, v_cache)
    return out.reshape(b, nq, c)


@partial(jax.jit, static_argnames=("n_head", "chunk", "interpret"))
def pallas_decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                            v_cache: jnp.ndarray, pos: jnp.ndarray, *,
                            n_head: int, chunk: int = 512,
                            interpret: bool = False,
                            layer=None) -> jnp.ndarray:
    """Drop-in replacement for ops.attention.decode_attention.

    Args:
      q: (C,) current token's query.
      k_cache, v_cache: (S, C) — or the FULL (L, S, C) caches plus a
        ``layer`` scalar.  Passing the full cache matters inside the decode
        loop: slicing ``cache[l]`` for the kernel operand materializes a
        full-layer copy per launch (measured ~5x the kernel itself).
      pos: scalar int32.
    Returns: (C,) attention output.
    """
    if k_cache.ndim == 2:
        k_cache = k_cache[None]
        v_cache = v_cache[None]
        layer = jnp.int32(0)
    _, s, c = k_cache.shape
    chunk = min(chunk, s)
    assert s % chunk == 0
    assert layer is not None, "3-D caches need the layer index"
    scalars = jnp.stack([jnp.asarray(layer, jnp.int32),
                         jnp.asarray(pos, jnp.int32)])
    out = pl.pallas_call(
        partial(_kernel, n_head=n_head, chunk=chunk, s_total=s),
        out_shape=jax.ShapeDtypeStruct((1, c), q.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(scalars, q[None], k_cache, v_cache)
    return out[0]
