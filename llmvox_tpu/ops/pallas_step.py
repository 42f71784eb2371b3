"""Pallas TPU kernel: one fused batched decode step (all layers + head).

Replaces the per-layer XLA + attention-kernel pipeline of
``models/decoder._decode_one_batch`` with a single kernel launch per
decode step.  The decode step at serving batch sizes is pure HBM
streaming — ~66 MB of weights plus the filled KV prefix per step against
a few MFLOPs of compute — so the kernel is organized around the DMA
pipeline, not the math:

- Every weight matrix is pre-packed into uniform (C, C) bf16 tiles
  (``pack_step_weights``) and streamed HBM->VMEM through a two-slot
  double buffer in one fixed static schedule: q,k,v, wo, 4x fc, 4x proj
  per layer, then ceil(V/C) head tiles.  Compute rides behind the
  stream; the MXU matmuls on (B, C) activations are ~100x cheaper than
  the transfers that feed them.
- Attention streams only each stream's *filled* history chunks and adds
  the current token's contribution from registers; the step's k/v rows
  are emitted as small (B, L, C) outputs for the caller to scatter
  (HBM cache refs are tiled on (S, C), so an arbitrary-position
  single-row DMA cannot be expressed in-kernel).
- The head runs on the same tile stream; logits accumulate in VMEM and
  argmax happens in-kernel, so a step returns just (B,) token ids.

Counterpart of the reference's per-token GPT forward (src/model.py:
149-237 + torch SDPA); semantics mirror _decode_one_batch exactly
(deployed config: no biases, scale-only LayerNorm).

STATUS: correct (interpret-mode equivalence vs the lax step, and
token-exact single steps on a real v5e-1) but EXPERIMENTAL and off by
default.  In the decode scan: 14.2 ms per 8-stream 32-token block vs
9.5 ms for the per-layer XLA + pallas-attention path.  Two scan-glue
lessons already applied: (a) the row scatter is DEFERRED to the top of
the next scan step (the kernel only reads history < pos, so writing
step i's rows at step i+1 keeps the caches one donated buffer), and
(b) the scatter uses per-layer static-leading-index `.at[l, b, pos]`
updates — the full-L advanced-index form lowered to ~2.6 ms/step of
whole-cache copies (97 -> 14 ms/block from that one change).  The
remaining 0.15 ms/step gap vs XLA is the weight-tile stream: 54 small
(C, C) DMAs with a 3-slot buffer can't match XLA's deeper matmul
software pipeline.  Next-round ideas: fewer/bigger pieces (one DMA per
weight matrix with lane-sliced buffer views + a transposed-rhs
dot_general for wproj), or pallas grid-over-layers with BlockSpec
index maps so the pallas pipeline itself streams the per-layer
weights.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def head_tiles(c: int, vocab: int) -> int:
    return -(-vocab // c)


def piece_widths(cfg):
    """Static per-piece column widths, all (C, w) row-major with w <= 3C.

    Per layer: qkv (3C) | wo (C) | fcA (3C) | fcB (C) | projT-A (3C) |
    projT-B (C) — wproj is packed TRANSPOSED so every piece keeps C rows
    (the kernel contracts it with a transposed-rhs dot_general).  The
    head pads its columns to a multiple of C and splits into <=3C pieces.
    """
    c, v = cfg.n_embd, cfg.vocab_size
    per_layer = [3 * c, c, 3 * c, c, 3 * c, c]
    widths = per_layer * cfg.n_layer
    rem = head_tiles(c, v) * c
    while rem > 0:
        w = min(rem, 3 * c)
        widths.append(w)
        rem -= w
    return widths


def pack_step_weights(params: Dict, cfg, dtype=None) -> jnp.ndarray:
    """Stack every step weight into (P, C, 3C) row-major pieces in kernel
    order (columns beyond each piece's true width are zero padding that
    is never transferred — the kernel DMAs ``[:, :width]`` slices).

    Cheap (one ~66 MB device copy per decode_block call, amortized over
    the block); keeps the kernel's DMA schedule fully static.
    """
    c, v, l_ = cfg.n_embd, cfg.vocab_size, cfg.n_layer
    h = params["h"]
    pieces = []
    for l in range(l_):
        pieces.append(h["wqkv"][l])                     # (C, 3C)
        pieces.append(h["wo"][l])                       # (C, C)
        wfc = h["wfc"][l]                               # (C, 4C)
        pieces += [wfc[:, :3 * c], wfc[:, 3 * c:]]
        wpt = h["wproj"][l].T                           # (C, 4C)
        pieces += [wpt[:, :3 * c], wpt[:, 3 * c:]]
    nh = head_tiles(c, v)
    head = jnp.pad(params["head"], ((0, 0), (0, nh * c - v)))
    off = 0
    while off < nh * c:
        w = min(nh * c - off, 3 * c)
        pieces.append(head[:, off:off + w])
        off += w
    padded = [jnp.pad(p, ((0, 0), (0, 3 * c - p.shape[1]))) for p in pieces]
    return jnp.stack([t.astype(dtype) if dtype is not None else t
                      for t in padded])


def _ln(x, scale, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * scale


def _gelu_tanh(x):
    # reference src/model.py:21-26 new_gelu
    return 0.5 * x * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi)
                                     * (x + 0.044715 * x ** 3)))


def _step_kernel(scal_ref, x_ref, ln1_ref, ln2_ref, lnf_ref, tiles_hbm,
                 k_in, v_in, tok_ref, krows_ref, vrows_ref, *, n_layer: int,
                 n_head: int, chunk: int, nb: int, vocab: int, eps: float):
    """Single program; scal = pos (nb,); x (nb, C) input embeddings."""
    c = x_ref.shape[-1]
    d = c // n_head
    scale = 1.0 / math.sqrt(d)
    nht = head_tiles(c, vocab)
    # static piece schedule (see piece_widths)
    widths = [3 * c, c, 3 * c, c, 3 * c, c] * n_layer
    rem = nht * c
    head_ws = []
    while rem > 0:
        head_ws.append(min(rem, 3 * c))
        rem -= head_ws[-1]
    widths += head_ws
    n_pieces = len(widths)

    ci_idx = lax.broadcasted_iota(jnp.int32, (c, n_head), 0)
    hi_idx = lax.broadcasted_iota(jnp.int32, (c, n_head), 1)
    sel = (ci_idx // d == hi_idx).astype(jnp.float32)    # (C, H)
    row_iota = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)

    def body(wbuf, wsem, kcbuf, vcbuf, csems, mall, lall, accall,
             logits):
        # ---- static weight-piece stream ------------------------------
        # One DMA per weight matrix (qkv / wo / fc / projT halves / head
        # halves) — exact [:, :width] slices, zero padding transferred.
        # 3-slot rotation: a prefetch never targets the slot the current
        # compute is reading (the scalar core runs ahead of the vector
        # core, so same-piece reuse would race the DMA with the dot).
        pctr = [0]

        def wdma(slot, p):
            w = widths[p]
            return pltpu.make_async_copy(
                tiles_hbm.at[p, :, pl.ds(0, w)],
                wbuf.at[slot, :, pl.ds(0, w)], wsem.at[slot])

        wdma(0, 0).start()
        if n_pieces > 1:
            wdma(1, 1).start()

        def take(width):
            """Wait the next piece (must have this width); prefetch two
            ahead; return its buffer slot."""
            p = pctr[0]
            assert widths[p] == width, (p, widths[p], width)
            slot = p % 3
            wdma(slot, p).wait()
            if p + 2 < n_pieces:
                wdma((p + 2) % 3, p + 2).start()
            pctr[0] = p + 1
            return slot

        def take_dot(hval, width):
            slot = take(width)
            return jnp.dot(hval,
                           wbuf[slot][:, :width].astype(jnp.float32),
                           preferred_element_type=jnp.float32)

        def take_dot_t(hval, width):
            """hval (nb, width) @ piece(C, width)^T -> (nb, C)."""
            slot = take(width)
            return lax.dot_general(
                hval, wbuf[slot][:, :width].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        # ---- per-layer step -----------------------------------------
        x = x_ref[:].astype(jnp.float32)                  # (nb, C)

        def cdma(slot, b, ci_, which, l):
            src = k_in if which == 0 else v_in
            buf = kcbuf if which == 0 else vcbuf
            return pltpu.make_async_copy(
                src.at[l, b, pl.ds(ci_ * chunk, chunk), :],
                buf.at[slot], csems.at[which, slot])

        for l in range(n_layer):
            h1 = _ln(x, ln1_ref[pl.ds(l, 1)].astype(jnp.float32), eps)
            qkv = take_dot(h1, 3 * c)                     # (nb, 3C)
            q = qkv[:, :c]
            k = qkv[:, c:2 * c]
            v = qkv[:, 2 * c:]

            # emit this layer's k/v rows; the caller scatters them into
            # the (L, B, S, C) caches (HBM cache refs are tiled on
            # (S, C), so an arbitrary-position single-row DMA can't be
            # expressed in-kernel — and the XLA scatter is cheap).  The
            # current token's attention term below comes from registers,
            # so attention never needs these rows in HBM.
            krows_ref[:, l, :] = k.astype(krows_ref.dtype)
            vrows_ref[:, l, :] = v.astype(vrows_ref.dtype)

            # ---- attention ------------------------------------------
            # Per-stream loops handle only the HISTORY chunks (positions
            # differ per stream); the current-token term and the final
            # softmax merge run vectorized over all streams — the per-b
            # unrolled form of those ~10 vector ops dominated the step.
            for b in range(nb):
                pos_b = scal_ref[b]
                nch = (pos_b + chunk - 1) // chunk   # history = [0, pos)
                onehot = (lax.broadcasted_iota(jnp.int32, (1, nb), 1)
                          == b).astype(jnp.float32)
                qb = jnp.dot(onehot, q, preferred_element_type=jnp.float32)

                @pl.when(nch > 0)
                def _(b=b, l=l):
                    cdma(0, b, 0, 0, l).start()
                    cdma(0, b, 0, 1, l).start()

                def chunk_body(ci_, carry, b=b, l=l, pos_b=pos_b, qb=qb):
                    m, lsum, acc = carry
                    slot = ci_ % 2
                    nxt = (ci_ + 1) % 2

                    # prefetch the next chunk into the other slot before
                    # blocking on this one (same pattern as pallas_attn)
                    @pl.when(ci_ + 1 < (pos_b + chunk - 1) // chunk)
                    def _():
                        cdma(nxt, b, ci_ + 1, 0, l).start()
                        cdma(nxt, b, ci_ + 1, 1, l).start()

                    cdma(slot, b, ci_, 0, l).wait()
                    cdma(slot, b, ci_, 1, l).wait()

                    kc = kcbuf[slot].astype(jnp.float32)
                    vc = vcbuf[slot].astype(jnp.float32)
                    t = kc * qb
                    lg = jnp.dot(t, sel,
                                 preferred_element_type=jnp.float32) * scale
                    idx = ci_ * chunk + lax.broadcasted_iota(
                        jnp.int32, (chunk, 1), 0)
                    lg = jnp.where(idx < pos_b, lg, NEG_INF)
                    m_new = jnp.maximum(m, jnp.max(lg, axis=0,
                                                   keepdims=True))
                    p = jnp.exp(lg - m_new)
                    corr = jnp.exp(m - m_new)
                    l_new = lsum * corr + jnp.sum(p, axis=0, keepdims=True)
                    p_full = jnp.dot(p, sel.T,
                                     preferred_element_type=jnp.float32)
                    corr_full = jnp.dot(corr, sel.T,
                                        preferred_element_type=jnp.float32)
                    acc_new = acc * corr_full + jnp.sum(vc * p_full, axis=0,
                                                        keepdims=True)
                    return m_new, l_new, acc_new

                m0 = jnp.full((1, n_head), NEG_INF, jnp.float32)
                l0 = jnp.zeros((1, n_head), jnp.float32)
                a0 = jnp.zeros((1, c), jnp.float32)
                m, lsum, acc = lax.fori_loop(0, nch, chunk_body,
                                             (m0, l0, a0))
                mall[:] = jnp.where(row_iota == b, m, mall[:])
                lall[:] = jnp.where(row_iota == b, lsum, lall[:])
                accall[:] = jnp.where(row_iota == b, acc, accall[:])

            # current-token term + merge, vectorized over streams
            lg = jnp.dot(q * k, sel,
                         preferred_element_type=jnp.float32) * scale
            m = mall[:]                                   # (nb, H)
            m_new = jnp.maximum(m, lg)
            p = jnp.exp(lg - m_new)
            corr = jnp.exp(m - m_new)
            l_new = lall[:] * corr + p
            p_full = jnp.dot(p, sel.T,
                             preferred_element_type=jnp.float32)   # (nb, C)
            corr_full = jnp.dot(corr, sel.T,
                                preferred_element_type=jnp.float32)
            acc = accall[:] * corr_full + v * p_full
            l_full = jnp.dot(l_new, sel.T,
                             preferred_element_type=jnp.float32)
            a_out = acc / l_full                          # (nb, C)

            x = x + take_dot(a_out, c)                    # wo

            h2 = _ln(x, ln2_ref[pl.ds(l, 1)].astype(jnp.float32), eps)
            m1 = _gelu_tanh(take_dot(h2, 3 * c))          # (nb, 3C)
            m2 = _gelu_tanh(take_dot(h2, c))              # (nb, C)
            x = x + take_dot_t(m1, 3 * c)                 # projT first 3C
            x = x + take_dot_t(m2, c)                     # projT last C

        # ---- head + argmax ------------------------------------------
        hf = _ln(x, lnf_ref[:].astype(jnp.float32), eps)
        off = 0
        for w in head_ws:
            logits[:, off:off + w] = take_dot(hf, w)
            off += w
        lg = logits[:]
        col = lax.broadcasted_iota(jnp.int32, lg.shape, 1)
        lg = jnp.where(col < vocab, lg, NEG_INF)
        tok_ref[:] = jnp.argmax(lg, axis=-1,
                                keepdims=True).astype(jnp.int32)

    nht = head_tiles(c, vocab)
    pl.run_scoped(
        body,
        wbuf=pltpu.VMEM((3, c, 3 * c), tiles_hbm.dtype),
        wsem=pltpu.SemaphoreType.DMA((3,)),
        kcbuf=pltpu.VMEM((2, chunk, c), k_in.dtype),
        vcbuf=pltpu.VMEM((2, chunk, c), v_in.dtype),
        csems=pltpu.SemaphoreType.DMA((2, 2)),
        mall=pltpu.VMEM((nb, n_head), jnp.float32),
        lall=pltpu.VMEM((nb, n_head), jnp.float32),
        accall=pltpu.VMEM((nb, c), jnp.float32),
        logits=pltpu.VMEM((nb, nht * c), jnp.float32),
    )


@partial(jax.jit, static_argnames=("n_layer", "n_head", "vocab", "eps",
                                   "chunk", "interpret"))
def fused_decode_step(tiles: jnp.ndarray, ln1: jnp.ndarray, ln2: jnp.ndarray,
                      lnf: jnp.ndarray, x: jnp.ndarray, k_cache: jnp.ndarray,
                      v_cache: jnp.ndarray, pos: jnp.ndarray, *,
                      n_layer: int, n_head: int, vocab: int,
                      eps: float = 1e-5, chunk: int = 512,
                      interpret: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One whole decode step for B streams in one kernel launch.

    Args:
      tiles: (P, C, 3C) bf16 pieces from ``pack_step_weights``.
      ln1, ln2: (L, C) scale stacks; lnf: (C,) final scale.
      x: (B, C) input embeddings (wpe already added).
      k_cache, v_cache: (L, B, S, C); position ``pos`` NOT yet written —
        the kernel reads only history [0, pos) and emits the current
        rows for the caller to scatter.
      pos: (B,) int32 current positions.
    Returns: (tokens (B,), k_rows (B, L, C), v_rows (B, L, C)).
    """
    l_, b, s, c = k_cache.shape
    chunk = min(chunk, s)
    assert s % chunk == 0
    scal = jnp.asarray(pos, jnp.int32)
    kernel = partial(_step_kernel, n_layer=n_layer, n_head=n_head,
                     chunk=chunk, nb=b, vocab=vocab, eps=eps)
    tok, k_rows, v_rows = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
            jax.ShapeDtypeStruct((b, l_, c), k_cache.dtype),
            jax.ShapeDtypeStruct((b, l_, c), v_cache.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(scal, x, ln1, ln2, jnp.reshape(lnf, (1, -1)), tiles, k_cache, v_cache)
    return tok[:, 0], k_rows, v_rows
