"""Continuous-batching pool for the TPU-hosted text LLM.

The reference serves its LLM with one private torch ``generate()`` thread
per request (inference/llm_streaming.py:44-106); the round-2 JAX port kept
that shape — one B=1 prefill + decode sequence per request — which
serializes concurrent requests on the chip while the pooled speech decoder
batches.  This module is the LLM counterpart of ``serve/pool.py``: N
in-flight requests share ONE batched decode program
(``models.llama.decode_block_pooled``) with per-row positions, and
mixed-length prompts prefill into their slots in one program
(``models.llama.prefill_slots``).

Latency design mirrors DecodePool, plus one trick the per-row state makes
possible: each row's last sampled token is carried ON DEVICE
(``LlamaPoolState.tok``), so a request's first decode block can be
submitted *before* the host has seen its prefill's first token — prefill
and first block run back-to-back in one pool iteration, one fetch round
trip to the first ``1 + block`` tokens.
"""
from __future__ import annotations

import asyncio
from collections import deque
from typing import AsyncIterator, Deque, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llmvox_tpu.models import llama


class PromptRestart(Exception):
    """Raised by a streaming-prompt producer when already-submitted ids
    turned out wrong (a tokenizer revised its own earlier output — rare
    BPE boundary merges).  Carries the FINAL prompt ids; the pool
    recovers with one plain fresh prefill of them, so the output is
    always exactly ``generate(final_ids)``."""

    def __init__(self, ids: List[int]):
        super().__init__("streaming prompt restarted")
        self.ids = list(ids)


class _PrefillReq:
    __slots__ = ("slot", "ids", "future", "prefix", "final", "extend")

    def __init__(self, slot: int, ids: List[int], future: asyncio.Future,
                 prefix: bool = False, final: bool = True,
                 extend: bool = False):
        self.slot = slot
        self.ids = ids              # suffix ids when prefix=True
        self.future = future
        self.prefix = prefix        # reuse the pool's shared-prefix KV
        self.final = final          # False: a streaming-prompt part —
        self.extend = extend        # more ids follow before sampling


class _LSlot:
    __slots__ = ("active", "queue", "blocks_done")

    def __init__(self):
        self.active = False
        self.queue: Deque[asyncio.Future] = deque()
        self.blocks_done = 0        # decode blocks dispatched this request

    def clear(self):
        while self.queue:
            fut = self.queue.popleft()
            if not fut.done():
                fut.cancel()


class LLMPool:
    """Fixed-capacity batched Llama decoder shared by all live requests."""

    # Arrival batches pad to 1 (the steady-state single arrival) or this
    # (bursts): two compiled prefill programs per bucket, not one per
    # arrival count.
    PREFILL_BATCH = 4

    def __init__(self, params, cfg: "llama.LlamaConfig", *,
                 capacity: int = 8, block: int = 16,
                 first_block: int = 0,
                 temperature: float = 0.0, top_k: int = 0,
                 top_p: float = 1.0, dtype=None,
                 device: Optional[jax.Device] = None,
                 prefill_buckets: Sequence[int] = (32, 64, 128, 256, 512),
                 seed: int = 0, pipeline_depth: int = 2,
                 spec_k: int = 0, spec_ladder: Sequence[int] = (),
                 prefill_merge: bool = True,
                 chunked_prefill: bool = True,
                 per_request_sampling: bool = False):
        self.cfg = cfg
        self.B = capacity
        self.block = block
        # Small FIRST decode block for fresh requests (VERDICT r3 #1, the
        # TTS engines' first_decode_block pattern): a fresh request's
        # first text reaches the TTS path after prefill + ONE decode
        # block, so a request-1-only step at a shorter width cuts that
        # block's compute AND brings the first delta forward.  A step
        # runs at first_block only when EVERY row in it is on its first
        # block (at 1-way that is exactly the fresh request; under load,
        # established streams are never slowed).  Width never changes
        # results — consumers count the tokens each future resolves with.
        self.first_block = (int(first_block)
                            if 0 < int(first_block) < block else 0)
        self.pipeline_depth = max(1, int(pipeline_depth))
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        # Per-request sampling: every pooled program takes per-ROW
        # (temperature, top_k, top_p) vectors (models/llama.py rows=),
        # so one compiled program serves any mix of request configs —
        # greedy rows stay exact, sampled rows stay distribution-exact,
        # and changing a knob never recompiles.  Costs a per-step sort
        # for the filtering even when every row is greedy, so it is
        # opt-in (--llm_per_request_sampling).
        self.per_request = bool(per_request_sampling)
        self._samp = np.tile(np.asarray(
            [temperature, float(top_k), top_p], np.float32),
            (capacity, 1))
        # speculative decode (models/llama.py::decode_block_spec_pooled):
        # needs trained draft heads in the checkpoint — silently fall back
        # to the normal pooled block otherwise.  Greedy mode commits the
        # verifier's argmax chain (token-identical to the plain block);
        # sampled mode uses rejection sampling (distribution-exact, same
        # temperature/top-k/top-p filtering).  Either way spec only
        # changes speed, never the output law.
        self.spec_k = int(spec_k)
        # Burst arrivals: merge pending prefills ACROSS buckets into
        # full PREFILL_BATCH chunks (see _run_prefills) instead of one
        # program per bucket group.
        self.prefill_merge = bool(prefill_merge)
        # Long prompts: prefill in bucket-width chunks instead of
        # left-truncating at the largest bucket (models/llama.py::
        # prefill_slots_continue) — the reference's HF path keeps full
        # history, so must the pool.  Off: pre-r3.6 truncation.
        self.chunked_prefill = bool(chunked_prefill)
        # Adaptive speculation depth (VERDICT r3 #4, the TTS pool's
        # serve/spec_control.py ported to the LLM pool): a LADDER of
        # compiled k rungs — always including rung 0, the plain pooled
        # block — switched between at step boundaries from the live
        # accept statistics decode_block_spec_pooled already returns.
        # Every rung is token-identical (greedy rows) or
        # distribution-exact (sampled rows) to the plain block, so a
        # served checkpoint whose draft heads never accept parks on
        # greedy speed instead of a permanent ~2x loss.
        ladder = tuple(int(k) for k in (spec_ladder or ()))
        has_heads = "draft_heads" in params
        self._adaptive = has_heads and any(k > 0 for k in ladder)
        self.use_spec = (self.spec_k > 0 or self._adaptive) and has_heads
        self._spec_ctl = None
        if self._adaptive:
            from llmvox_tpu.serve.spec_control import SpecController
            rungs = sorted({k for k in ladder if k >= 0} | {0})
            self._spec_rungs = tuple(rungs)
            self._spec_ctl = SpecController(
                rungs, k0=self.spec_k if self.spec_k in rungs else None)
        elif self.use_spec:
            self._spec_rungs = (self.spec_k,)
        else:
            self._spec_rungs = (0,)
        # the verifier writes up to k+1 cache rows past the last
        # committed token; reserve the DEEPEST rung's headroom in every
        # capacity check (rung switches must never change what fits)
        self._spec_margin = (max(self._spec_rungs) + 1 if self.use_spec
                             else 0)
        if dtype is not None:
            params = jax.tree.map(
                lambda x: x.astype(dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
        self.cache_dtype = dtype or jnp.float32
        if device is not None:
            params = jax.device_put(params, device)
        self.params = params
        # prompts longer than the largest bucket keep their tail; buckets
        # must leave room for at least one decode block
        cap = cfg.max_seq_len - block - 1 - self._spec_margin
        self.buckets = tuple(sorted(b for b in prefill_buckets if b <= cap))
        if not self.buckets:
            self.buckets = (min(16, cap),)
        self.state = llama.init_llama_pool_state(cfg, capacity,
                                                 self.cache_dtype)
        # Attention-window bucket ladder: the pooled decode step is
        # bandwidth-bound on KV-cache reads (B * S * KV * hd per token),
        # and most of a fixed-capacity cache is empty early in a
        # conversation — attend only over a bucket covering every active
        # row's position upper bound (tracked host-side at dispatch
        # time; models/llama.py::decode_block_pooled attn_len).
        self._ub = [0] * self.B
        self.attn_buckets = tuple(
            b for b in llama.attn_window_ladder(cfg.max_seq_len)
            if b >= self.block + 1 or b == cfg.max_seq_len)
        self._rng = jax.random.PRNGKey(seed)
        # shared-prefix KV cache (set_prefix): system preambles are
        # identical across voice-chat requests, so their prefill is
        # computed once and scattered into each slot
        self._prefix_ids: Optional[List[int]] = None
        self._prefix_k = self._prefix_v = None
        self._prefix_buckets: Tuple[int, ...] = ()
        self.slots = [_LSlot() for _ in range(self.B)]
        self._prefills: Deque[_PrefillReq] = deque()
        self._free: Optional[asyncio.Queue] = None
        self._task: Optional[asyncio.Task] = None
        self._wake: Optional[asyncio.Event] = None
        self._inflight = None
        self.steps = 0
        self.prefill_calls = 0

    # -- slot lifecycle -------------------------------------------------
    def _ensure_free_queue(self) -> asyncio.Queue:
        if self._free is None:
            self._free = asyncio.Queue()
            for i in range(self.B):
                self._free.put_nowait(i)
        return self._free

    async def acquire(self) -> int:
        """Wait for a free slot (requests beyond capacity queue here)."""
        idx = await self._ensure_free_queue().get()
        self.slots[idx].active = True
        self.slots[idx].blocks_done = 0
        return idx

    def _drop_slot_prefills(self, idx: int) -> None:
        """Cancel QUEUED prefills for a slot.  Two fresh prefills for one
        slot must never share a dispatch cycle (the merge would scatter
        both rows into the same slot in one program) — the restart path
        drops the stale ones before resubmitting."""
        keep: Deque[_PrefillReq] = deque()
        while self._prefills:
            r = self._prefills.popleft()
            if r.slot == idx:
                if not r.future.done():
                    r.future.cancel()
            else:
                keep.append(r)
        self._prefills = keep

    def release(self, idx: int) -> None:
        slot = self.slots[idx]
        slot.active = False
        slot.clear()
        self._drop_slot_prefills(idx)
        self._ensure_free_queue().put_nowait(idx)

    # -- request API ----------------------------------------------------
    def bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def set_prefix(self, ids: Sequence[int], min_len: int = 8) -> None:
        """Pin the KV rows of a shared prompt prefix (one
        ``models.llama.prefix_kv`` forward, computed HERE, once); later
        prefills whose prompt starts with these ids prefill only the
        suffix — per request, the prefix forward is never paid again.
        Requests that don't match fall back to the plain path silently.
        Call before :meth:`warmup` so the prefix programs compile with
        the rest.  A too-short or too-long prefix disables the cache."""
        ids = list(int(t) for t in ids)
        cap = (self.cfg.max_seq_len - self.block - 1 - self._spec_margin)
        pbuckets = tuple(b for b in self.buckets if len(ids) + b <= cap)
        if len(ids) < min_len or not pbuckets:
            self._prefix_ids = None
            self._prefix_k = self._prefix_v = None
            self._prefix_buckets = ()
            return
        k, v = llama.prefix_kv(self.params,
                               jnp.asarray([ids], jnp.int32), self.cfg)
        self._prefix_ids = ids
        self._prefix_k = k.astype(self.cache_dtype)
        self._prefix_v = v.astype(self.cache_dtype)
        self._prefix_buckets = pbuckets

    def _ctx_cap(self) -> int:
        """Max cacheable prompt length: leave room for one decode block
        (+ the speculation verify rows)."""
        return self.cfg.max_seq_len - self.block - 1 - self._spec_margin

    def _chunk0_len(self, n: int, buckets: Tuple[int, ...]) -> Optional[int]:
        """First-chunk length for an n-token chunked prefill: the ragged
        remainder goes FIRST (through the existing bucketed prefill_slots
        programs), every later chunk is exactly ``self.buckets[-1]`` wide
        — so all continuation cache writes are in bounds with no new
        program shapes.  Returns None when no r ≡ n (mod CW) fits the
        class's first-chunk bucket ladder (possible for the prefix class
        when its top bucket is smaller than CW)."""
        cw = self.buckets[-1]
        r = n % cw or cw
        return r if r <= buckets[-1] else None

    def _plan(self, ids: List[int]) -> Tuple[bool, List[int], int]:
        """(use_prefix, prefill_ids, cached_len) for a prompt.  The
        prefix path needs a strictly longer prompt (the suffix samples
        the first token); with chunked prefill either class takes
        prompts up to the context cap, otherwise prompts left-truncate
        at the largest bucket (the pre-chunking behavior, like the B=1
        path's context-cap truncation but tighter)."""
        cap = self._ctx_cap()
        pids = self._prefix_ids
        if pids is not None and len(ids) > len(pids) \
                and list(ids[: len(pids)]) == pids:
            sfx = list(ids[len(pids):])
            if len(sfx) <= self._prefix_buckets[-1]:
                return True, sfx, len(pids) + len(sfx)
            if (self.chunked_prefill
                    and len(pids) + len(sfx) <= cap
                    and self._chunk0_len(len(sfx),
                                         self._prefix_buckets) is not None):
                return True, sfx, len(pids) + len(sfx)
        limit = cap if self.chunked_prefill else self.buckets[-1]
        ids2 = list(ids)[-limit:] or [0]
        return False, ids2, len(ids2)

    def submit_prefill(self, idx: int, ids: List[int],
                       final: bool = True) -> asyncio.Future:
        """Enqueue a prompt prefill into slot ``idx``; resolves with the
        first sampled token (int).  Prompts longer than the largest bucket
        are left-truncated (keep the tail, like the B=1 path); prompts
        starting with the pinned prefix prefill only their suffix.
        ``final=False``: a streaming-prompt head — more ids will follow
        via :meth:`submit_prefill_extend` before any decode block, so the
        resolved token is mid-prompt garbage the caller must ignore."""
        loop = asyncio.get_running_loop()
        fut = loop.create_future()
        use_pfx, ids, _ = self._plan(list(ids))
        self._prefills.append(_PrefillReq(idx, ids, fut, use_pfx,
                                          final=final))
        if self._wake is not None:
            self._wake.set()
        return fut

    def submit_prefill_extend(self, idx: int, ids: List[int],
                              final: bool = True) -> asyncio.Future:
        """Enqueue MORE prompt ids for a slot whose head already
        prefilled (streaming prompts, e.g. a live ASR transcript): the
        chunk lands at the slot's current cached upper bound through the
        same compiled ``prefill_slots_continue`` program the chunked-
        prefill path uses.  ``final=True`` samples the real first token
        at the last new position (the caller guarantees ``ids`` is then
        non-empty).  FIFO with submit_prefill, so the head's program
        always runs first."""
        loop = asyncio.get_running_loop()
        fut = loop.create_future()
        self._prefills.append(_PrefillReq(idx, list(ids), fut,
                                          final=final, extend=True))
        if self._wake is not None:
            self._wake.set()
        return fut

    def submit_block(self, idx: int) -> asyncio.Future:
        """Enqueue one decode block for slot ``idx``; resolves with the
        block's tokens (List[int]).  Chains on the slot's on-device state,
        so it can be submitted before the prefill result is known."""
        loop = asyncio.get_running_loop()
        fut = loop.create_future()
        self.slots[idx].queue.append(fut)
        if self._wake is not None:
            self._wake.set()
        return fut

    def _next_key(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def set_sampling(self, idx: int, temperature: Optional[float] = None,
                     top_k: Optional[int] = None,
                     top_p: Optional[float] = None) -> None:
        """Per-request sampling knobs for slot ``idx`` (None keeps the
        pool default for that knob).  No-op unless the pool was built
        with ``per_request_sampling``."""
        self._samp[idx] = [
            self.temperature if temperature is None else float(temperature),
            float(self.top_k if top_k is None else int(top_k)),
            self.top_p if top_p is None else float(top_p)]

    def _rows_for(self, slot_ids) -> Optional[Tuple]:
        """(t, k, p) device vectors for prefill rows that land in
        ``slot_ids`` (padding rows read slot 0's knobs — their sampled
        token is dropped by the scatter anyway)."""
        if not self.per_request:
            return None
        s = self._samp[np.asarray(slot_ids, np.int64) % self.B]
        return (jnp.asarray(s[:, 0]), jnp.asarray(s[:, 1], jnp.int32),
                jnp.asarray(s[:, 2]))

    def _rows_all(self) -> Optional[Tuple]:
        if not self.per_request:
            return None
        return (jnp.asarray(self._samp[:, 0]),
                jnp.asarray(self._samp[:, 1], jnp.int32),
                jnp.asarray(self._samp[:, 2]))

    # -- device programs ------------------------------------------------
    def _run_prefills(self, reqs: List[_PrefillReq]
                      ) -> List[Tuple[jnp.ndarray, List[_PrefillReq]]]:
        """Run pending prefills in as few device programs as possible.
        Returns (first_tokens device array, group requests) pairs; tokens
        are fetched with the iteration's single device_get.

        With ``prefill_merge`` (default): within a prefix class, sort by
        prompt length (descending) and cut full PREFILL_BATCH chunks
        ACROSS buckets; each chunk runs at the bucket covering its
        longest member.  A burst of N mixed-length arrivals costs
        ceil(N/PREFILL_BATCH) programs instead of one per bucket group,
        and — because the padding rows of a nearly-full bucket group are
        filled with REAL rows from the next bucket down — usually fewer
        padded token-rows too (e.g. lengths [500,500,130,130,60,60,30,30]:
        4 programs / 2560 rows unmerged vs 2 programs / 2304 rows
        merged).  Sorting keeps chunks bucket-tight, so a short prompt
        only pays a large bucket when there aren't enough same-size
        peers to fill a chunk; per-row ``valid_lens`` keep the math
        exact either way.  Off: one group per (bucket, prefix) — tighter
        compute per row, more programs per burst (the pre-r3.5
        behavior, for FLOPs-bound big-model shapes).

        Arrival counts still pad to 1 (the steady-state single arrival)
        or PREFILL_BATCH, so the compiled-program set is unchanged."""
        out = []
        exts = [r for r in reqs if r.extend]
        reqs = [r for r in reqs if not r.extend]
        for pfx in (False, True):
            rs = [r for r in reqs if r.prefix == pfx]
            if not rs:
                continue
            buckets = self._prefix_buckets if pfx else self.buckets
            plen = len(self._prefix_ids) if pfx else 0
            if self.chunked_prefill:
                longs = [r for r in rs if len(r.ids) > buckets[-1]]
                for r in longs:
                    out.append(self._run_chunked(r, pfx, buckets, plen))
                rs = [r for r in rs if len(r.ids) <= buckets[-1]]
                if not rs:
                    continue
            if self.prefill_merge:
                rs.sort(key=lambda r: len(r.ids), reverse=True)
                chunks = [rs[c0: c0 + self.PREFILL_BATCH]
                          for c0 in range(0, len(rs), self.PREFILL_BATCH)]
            else:
                grouped: Dict[int, List[_PrefillReq]] = {}
                for r in rs:
                    b = next(b for b in buckets if len(r.ids) <= b)
                    grouped.setdefault(b, []).append(r)
                chunks = [g[c0: c0 + self.PREFILL_BATCH]
                          for g in grouped.values()
                          for c0 in range(0, len(g), self.PREFILL_BATCH)]
            for part in chunks:
                need = max(len(r.ids) for r in part)
                bucket = next(b for b in buckets if need <= b)
                npad = 1 if len(part) == 1 else self.PREFILL_BATCH
                tokens = np.zeros((npad, bucket), np.int32)
                valid = np.ones((npad,), np.int32)
                slot_ids = np.zeros((npad,), np.int32)
                active = np.zeros((npad,), bool)
                for j, r in enumerate(part):
                    tokens[j, : len(r.ids)] = r.ids
                    valid[j] = len(r.ids)
                    slot_ids[j] = r.slot
                    active[j] = True
                first, self.state = llama.prefill_slots(
                    self.params, jnp.asarray(tokens), jnp.asarray(valid),
                    self.state, jnp.asarray(slot_ids), jnp.asarray(active),
                    self._next_key(), self.cfg,
                    temperature=self.temperature, top_k=self.top_k,
                    top_p=self.top_p,
                    prefix_k=self._prefix_k if pfx else None,
                    prefix_v=self._prefix_v if pfx else None,
                    rows=self._rows_for(slot_ids))
                self.prefill_calls += 1
                for r in part:
                    self._ub[r.slot] = plen + len(r.ids)
                out.append((first, part))
        # streaming-prompt extensions AFTER fresh heads: a head and its
        # extend submitted in the same cycle still run in program order,
        # so the extend's pos (the slot's _ub) is always set by then
        for r in exts:
            out.append(self._run_extend(r))
        return out

    def _run_extend(self, r: _PrefillReq
                    ) -> Tuple[jnp.ndarray, List[_PrefillReq]]:
        """Extend a slot's cached prompt with more ids (the streaming-
        prompt path — VERDICT r3 #3's ASR/LLM overlap): chunks of the
        top bucket width run through the SAME compiled
        :func:`llama.prefill_slots_continue` program the chunked-prefill
        path uses (ragged lengths ride the per-row ``valid_lens``),
        landing at the slot's current cached upper bound.  The last chunk
        samples the real first token when ``r.final``."""
        cw = self.buckets[-1]
        pos = self._ub[r.slot]
        rest = list(r.ids) or [0]   # callers guarantee non-empty finals
        first = None
        while rest:
            chunk, rest = rest[:cw], rest[cw:]
            tokens = np.zeros((1, cw), np.int32)
            tokens[0, : len(chunk)] = chunk
            first, self.state = llama.prefill_slots_continue(
                self.params, jnp.asarray(tokens),
                jnp.asarray([len(chunk)], jnp.int32), self.state,
                jnp.asarray([r.slot], jnp.int32), jnp.ones((1,), bool),
                jnp.asarray([pos], jnp.int32), self._next_key(),
                self.cfg, final=r.final and not rest,
                temperature=self.temperature, top_k=self.top_k,
                top_p=self.top_p,
                attn_len=self._attn_bucket(pos + cw),
                rows=self._rows_for([r.slot]))
            self.prefill_calls += 1
            pos += len(chunk)
        self._ub[r.slot] = pos
        return first, [r]

    def _run_chunked(self, r: _PrefillReq, pfx: bool,
                     buckets: Tuple[int, ...], plen: int
                     ) -> Tuple[jnp.ndarray, List[_PrefillReq]]:
        """Prefill one LONG prompt (> the class's largest bucket) as a
        chain of device programs: the ragged remainder goes first through
        the existing bucketed :func:`llama.prefill_slots` (its sampled
        token is mid-prompt garbage, overwritten below), then exact
        ``buckets[-1]``-width chunks through
        :func:`llama.prefill_slots_continue`, the last with
        ``final=True`` to sample the real first token.  Dispatch-only —
        the donated pool state sequences the chain, and the final chunk's
        token rides the iteration's single fetch like any other group."""
        cw = self.buckets[-1]
        ids = r.ids
        r0 = self._chunk0_len(len(ids), buckets)
        bucket = next(b for b in buckets if r0 <= b)
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, :r0] = ids[:r0]
        first, self.state = llama.prefill_slots(
            self.params, jnp.asarray(tokens),
            jnp.asarray([r0], jnp.int32), self.state,
            jnp.asarray([r.slot], jnp.int32), jnp.ones((1,), bool),
            self._next_key(), self.cfg, temperature=self.temperature,
            top_k=self.top_k, top_p=self.top_p,
            prefix_k=self._prefix_k if pfx else None,
            prefix_v=self._prefix_v if pfx else None,
            rows=self._rows_for([r.slot]))
        self.prefill_calls += 1
        pos = plen + r0
        rest = ids[r0:]
        while rest:
            chunk, rest = rest[:cw], rest[cw:]   # exact cw wide: r0
            # absorbed the remainder, so every write stays in bounds
            first, self.state = llama.prefill_slots_continue(
                self.params, jnp.asarray([chunk], jnp.int32),
                jnp.asarray([cw], jnp.int32), self.state,
                jnp.asarray([r.slot], jnp.int32), jnp.ones((1,), bool),
                jnp.asarray([pos], jnp.int32), self._next_key(),
                self.cfg, final=not rest, temperature=self.temperature,
                top_k=self.top_k, top_p=self.top_p,
                attn_len=self._attn_bucket(pos + cw),
                rows=self._rows_for([r.slot]))
            self.prefill_calls += 1
            pos += cw
        self._ub[r.slot] = pos
        return first, [r]

    def _attn_bucket(self, needed: int) -> int:
        for b in self.attn_buckets:
            if needed <= b:
                return b
        return self.attn_buckets[-1]

    # -- step loop ------------------------------------------------------
    def _dispatch(self):
        """Run pending prefills + one batched decode block — device
        dispatches only, no host fetch.  Block futures are popped HERE
        so the next dispatch sees each slot's issue-ahead request.
        Returns the in-flight record or None when nothing is queued."""
        prefill_out = []
        blocks: List[Tuple[int, asyncio.Future]] = []
        toks = iters = None
        rung = 0
        width = self.block
        try:
            if self._prefills:
                reqs = [r for r in self._prefills
                        if not r.future.done()]
                self._prefills.clear()
                if reqs:
                    prefill_out = self._run_prefills(reqs)
            heads = [i for i, s in enumerate(self.slots)
                     if s.active and s.queue]
            if heads:
                active = np.zeros((self.B,), bool)
                active[heads] = True
                for i in heads:
                    blocks.append((i, self.slots[i].queue.popleft()))
                width = self.block
                if (self.first_block
                        and all(self.slots[i].blocks_done == 0
                                for i in heads)):
                    width = self.first_block
                attn = self._attn_bucket(
                    max(self._ub[i] for i in heads) + width
                    + self._spec_margin)
                for i in heads:
                    self._ub[i] += width
                    self.slots[i].blocks_done += 1
                rung = (self._spec_ctl.next_k()
                        if self._spec_ctl is not None
                        else (self.spec_k if self.use_spec else 0))
                if rung > 0:
                    toks, self.state, iters = llama.decode_block_spec_pooled(
                        self.params, self.state, jnp.asarray(active),
                        self.cfg, block=width, k_draft=rung,
                        attn_len=attn, rng=self._next_key(),
                        temperature=self.temperature, top_k=self.top_k,
                        top_p=self.top_p, rows=self._rows_all())
                    if self._spec_ctl is None:
                        iters = None    # fixed-k: no controller to feed
                else:
                    toks, self.state = llama.decode_block_pooled(
                        self.params, self.state, jnp.asarray(active),
                        self._next_key(), self.cfg, block=width,
                        temperature=self.temperature, top_k=self.top_k,
                        top_p=self.top_p, attn_len=attn,
                        rows=self._rows_all())
                self.steps += 1
        except BaseException as exc:
            # futures already popped here would otherwise hang their
            # waiters forever — fail them before the crash handler runs
            for _, part in prefill_out:
                for r in part:
                    if not r.future.done():
                        r.future.set_exception(exc)
            if "reqs" in locals():
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(exc)
            for _, fut in blocks:
                if not fut.done():
                    fut.set_exception(exc)
            raise
        if not prefill_out and toks is None:
            return None
        return prefill_out, blocks, toks, rung, iters, width

    async def _resolve(self, inflight) -> None:
        """ONE fetch round trip for an in-flight iteration's results."""
        prefill_out, blocks, toks, rung, iters, width = inflight
        firsts_h, toks_h, iters_h = await asyncio.to_thread(
            jax.device_get, ([f for f, _ in prefill_out], toks, iters))
        if iters_h is not None and self._spec_ctl is not None and blocks:
            # accept statistics for the adaptive controller (active rows
            # only): each block-request row committed exactly ``width``
            # tokens over iters_h[i] sequential forwards
            act = [i for i, _ in blocks]
            self._spec_ctl.observe(
                rung, float(width * len(act)),
                float(sum(iters_h[i] for i in act)))
        for (_, part), vals in zip(prefill_out, firsts_h):
            for j, r in enumerate(part):
                if not r.future.done():
                    r.future.set_result(int(vals[j]))
        if toks_h is not None:
            for i, fut in blocks:
                if not fut.done():
                    fut.set_result([int(t) for t in toks_h[i]])

    async def _resolve_task(self, inflight) -> None:
        """Per-iteration fetch task: a failed fetch must fail its own
        iteration's futures (popped from the queues at dispatch, so the
        crash handler can no longer see them)."""
        try:
            await self._resolve(inflight)
        except BaseException as exc:
            cancelled = isinstance(exc, asyncio.CancelledError)
            prefill_out, blocks = inflight[0], inflight[1]

            def _fail(fut):
                if not fut.done():
                    # pool teardown: cancel, don't park an exception on
                    # futures nobody will await
                    if cancelled:
                        fut.cancel()
                    else:
                        fut.set_exception(exc)

            for _, part in prefill_out:
                for r in part:
                    _fail(r.future)
            for _, fut in blocks:
                _fail(fut)
            raise

    async def _step_loop(self) -> None:
        """Pipelined like serve/pool.py::_step_loop, to
        ``pipeline_depth`` in-flight iterations: each dispatch (chained
        on the on-device state — the per-slot last token lives in
        LlamaPoolState.tok, so no host value is needed) starts its own
        concurrent fetch task, and the loop blocks only on the OLDEST.
        Fetch round trips overlap on the transport
        (benchmarks/fetch_probe.py), so depth>=2 makes the loop
        decode-bound instead of RTT-bound.  generate() issues ahead one
        block (two outstanding per slot) — what depth 2 needs."""
        self._inflight = deque()   # (record, fetch task), oldest first
        while True:
            while len(self._inflight) < self.pipeline_depth:
                nxt = self._dispatch()
                if nxt is None:
                    break
                self._inflight.append(
                    (nxt, asyncio.create_task(self._resolve_task(nxt))))
            if self._inflight:
                _, task = self._inflight.popleft()
                await task
                # let consumers enqueue follow-ups / new arrivals join
                await asyncio.sleep(0)
            elif (not self._prefills
                    and not any(s.active and s.queue
                                for s in self.slots)):
                await self._wake.wait()
                self._wake.clear()

    def start(self) -> None:
        if self._task is None:
            self._wake = asyncio.Event()
            self._task = asyncio.create_task(self._step_loop())

            def _report(task):
                if task.cancelled():
                    return
                exc = task.exception()
                if exc is not None:
                    import traceback
                    print("LLMPool step loop crashed:",
                          "".join(traceback.format_exception(exc)),
                          flush=True)
                    # In-flight iterations need no help: their fetch
                    # tasks run independently and _resolve_task fails
                    # its own iteration's futures on a fetch error.
                    self._inflight = None
                    for s in self.slots:
                        while s.queue:
                            fut = s.queue.popleft()
                            if not fut.done():
                                fut.set_exception(exc)
                    while self._prefills:
                        r = self._prefills.popleft()
                        if not r.future.done():
                            r.future.set_exception(exc)
                    self._task = None

            self._task.add_done_callback(_report)

    def stop(self) -> None:
        if self._task is not None:
            self._task.cancel()
            self._task = None
        # a restart (new event loop) must not resolve stale in-flight
        # records from the cancelled loop
        if self._inflight:
            for rec, task in self._inflight:
                task.cancel()
                prefill_out, blocks = rec[0], rec[1]
                for _, part in prefill_out:
                    for r in part:
                        if not r.future.done():
                            r.future.cancel()
                for _, fut in blocks:
                    if not fut.done():
                        fut.cancel()
        self._inflight = None

    def stats(self) -> Dict:
        """Operational counters for GET /stats (serve/server.py)."""
        out = {
            "capacity": self.B,
            "active": sum(1 for s in self.slots if s.active),
            "steps": self.steps,
            "prefill_calls": self.prefill_calls,
            "block": self.block,
            "first_block": self.first_block,
            "spec_k": self.spec_k if self.use_spec else 0,
            "prefix_cached": self._prefix_ids is not None,
            "chunked_prefill": self.chunked_prefill,
            "per_request_sampling": self.per_request,
        }
        spec = self.spec_stats()
        if spec is not None:
            out["spec"] = spec
        return out

    # -- warmup ---------------------------------------------------------
    def warmup(self, buckets: Optional[Sequence[int]] = None) -> None:
        """Compile every traffic program before requests arrive: both
        prefill arrival sizes per bucket, the pooled decode block, and the
        steady-state executables (jit-output states carry different
        device layouts than constructor-made ones — run each program in
        the chained prefill->decode->decode cycle it sees in traffic,
        twice; see serve/pool.py::warmup for the measured history)."""
        buckets = tuple(buckets) if buckets is not None else self.buckets
        inactive = jnp.zeros((self.B,), jnp.bool_)
        for _ in range(2):
            variants = [(b, False) for b in buckets]
            if self._prefix_ids is not None:
                variants += [(b, True) for b in self._prefix_buckets
                             if buckets is self.buckets or b in buckets]
            for bucket, pfx in variants:
                for npad in (1, self.PREFILL_BATCH):
                    tokens = jnp.zeros((npad, bucket), jnp.int32)
                    valid = jnp.ones((npad,), jnp.int32)
                    slot_ids = jnp.zeros((npad,), jnp.int32)
                    # active=False: the scatter drops every row, so warmup
                    # cannot disturb live state (same compiled program)
                    first, self.state = llama.prefill_slots(
                        self.params, tokens, valid, self.state, slot_ids,
                        jnp.zeros((npad,), jnp.bool_), self._next_key(),
                        self.cfg, temperature=self.temperature,
                        top_k=self.top_k, top_p=self.top_p,
                        prefix_k=self._prefix_k if pfx else None,
                        prefix_v=self._prefix_v if pfx else None,
                        rows=self._rows_for(np.zeros(npad, np.int64)))
                    np.asarray(first)
            if self.chunked_prefill and self._ctx_cap() > self.buckets[-1]:
                # long-prompt continuation chunks (always full cw wide;
                # active=False drops every write — same compiled program)
                cw = self.buckets[-1]
                for attn in self.attn_buckets:
                    if attn <= cw:
                        continue
                    for fin in (False, True):
                        first, self.state = llama.prefill_slots_continue(
                            self.params, jnp.zeros((1, cw), jnp.int32),
                            jnp.full((1,), cw, jnp.int32), self.state,
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1,), jnp.bool_),
                            jnp.zeros((1,), jnp.int32), self._next_key(),
                            self.cfg, final=fin,
                            temperature=self.temperature,
                            top_k=self.top_k, top_p=self.top_p,
                            attn_len=attn, rows=self._rows_for([0]))
                        np.asarray(first)
            widths = ((self.first_block, self.block) if self.first_block
                      else (self.block,))
            for attn in self.attn_buckets:
                for rung in self._spec_rungs:
                    for width in widths:
                        if rung > 0:
                            toks, self.state, _ = (
                                llama.decode_block_spec_pooled(
                                    self.params, self.state, inactive,
                                    self.cfg, block=width, k_draft=rung,
                                    attn_len=attn, rng=self._next_key(),
                                    temperature=self.temperature,
                                    top_k=self.top_k, top_p=self.top_p,
                                    rows=self._rows_all()))
                        else:
                            toks, self.state = llama.decode_block_pooled(
                                self.params, self.state, inactive,
                                self._next_key(), self.cfg, block=width,
                                temperature=self.temperature,
                                top_k=self.top_k, top_p=self.top_p,
                                attn_len=attn, rows=self._rows_all())
                        np.asarray(toks)
        if self._spec_ctl is not None and not self._spec_ctl.cost_ms:
            self._spec_ctl.cost_ms = self._calibrate_spec_costs()

    def _calibrate_spec_costs(self, repeats: int = 3) -> Dict[int, float]:
        """Measure each compiled rung's cost on a throwaway state chain
        (the LLM counterpart of DecodePool._calibrate_spec_costs): ms per
        ITERATION for speculative rungs — a batched step pays its
        slowest row, so the divisor is the max per-row iteration count —
        and ms per TOKEN for rung 0.  Runs after warmup so every
        executable is already compiled; the chained dispatches amortize
        the tunnel RTT like the pipelined step loop does."""
        import time
        active = jnp.ones((self.B,), jnp.bool_)
        # one attn bucket covering the whole chained run: pos grows by
        # block per call and the programs for this bucket are warmed above
        attn = self._attn_bucket((repeats + 2) * self.block
                                 + self._spec_margin)
        costs: Dict[int, float] = {}
        for rung in self._spec_rungs:
            st = llama.init_llama_pool_state(self.cfg, self.B,
                                             self.cache_dtype)

            def step(st):
                if rung > 0:
                    return llama.decode_block_spec_pooled(
                        self.params, st, active, self.cfg,
                        block=self.block, k_draft=rung, attn_len=attn,
                        rng=self._next_key(),
                        temperature=self.temperature, top_k=self.top_k,
                        top_p=self.top_p, rows=self._rows_all())
                toks, st = llama.decode_block_pooled(
                    self.params, st, active, self._next_key(), self.cfg,
                    block=self.block, temperature=self.temperature,
                    top_k=self.top_k, top_p=self.top_p, attn_len=attn,
                    rows=self._rows_all())
                return toks, st, None

            # untimed: constructor-layout step, then the steady-state
            # executable the timed chain runs
            toks, st, _ = step(st)
            toks, st, _ = step(st)
            jax.block_until_ready(toks)
            t0 = time.perf_counter()
            iters = None
            for _ in range(repeats):
                toks, st, iters = step(st)
            jax.block_until_ready(toks)
            dt_ms = (time.perf_counter() - t0) * 1000.0 / repeats
            if rung == 0:
                costs[0] = dt_ms / self.block
            else:
                costs[rung] = dt_ms / max(
                    int(np.max(np.asarray(iters))), 1)
        return costs

    def spec_stats(self) -> Optional[Dict]:
        """Speculation state for /stats: None when spec is off."""
        if self._spec_ctl is not None:
            return self._spec_ctl.stats()
        if self.use_spec:
            return {"k": self.spec_k, "ladder": [self.spec_k]}
        return None

    # -- streaming generation -------------------------------------------
    async def generate(self, ids: List[int],
                       max_tokens: int = 512,
                       sampling: Optional[Dict] = None
                       ) -> AsyncIterator[List[int]]:
        """Async generator: acquire a slot, prefill, then yield token
        lists per block ([first], block, block, ...) until the consumer
        stops iterating or the budget/context runs out.  EOS is the
        consumer's business (host-side, like the B=1 path).

        ``sampling``: optional per-request {"temperature", "top_k",
        "top_p"} overrides (pool must be built with
        ``per_request_sampling``; silently ignored otherwise)."""
        self.start()
        idx = await self.acquire()
        if self.per_request:
            self.set_sampling(idx, **(sampling or {}))
        try:
            _, _, cached = self._plan(list(ids))
            first_fut = self.submit_prefill(idx, ids)
            async for toks in self._stream_blocks(idx, cached, first_fut,
                                                  max_tokens):
                yield toks
        finally:
            self.release(idx)

    async def _stream_blocks(self, idx: int, cached: int,
                             first_fut: asyncio.Future, max_tokens: int
                             ) -> AsyncIterator[List[int]]:
        """Shared decode-block loop: yield [first], then block token
        lists, keeping one block in flight ahead of the consumer."""
        n_sub = 0

        # block n+1 writes cache indices up to cached+(n+1)*block-1
        # (+ the verifier's probe rows under speculation), so it fits
        # iff cached + (n+1)*block + spec_margin <= max_seq_len
        def room() -> bool:
            return (cached + (n_sub + 1) * self.block
                    + self._spec_margin <= self.cfg.max_seq_len)

        # first block chains on the device-carried token: submit
        # before the prefill result is known
        if room():
            blk_fut = self.submit_block(idx)
            n_sub += 1
        else:
            blk_fut = None
        first = await first_fut
        yield [first]
        produced = 1
        while blk_fut is not None and produced < max_tokens:
            nxt_fut = None
            if room() and produced + self.block < max_tokens:
                nxt_fut = self.submit_block(idx)   # issue-ahead
                n_sub += 1
            try:
                toks = await blk_fut
            except asyncio.CancelledError:
                break
            produced += len(toks)
            yield toks
            blk_fut = nxt_fut

    async def generate_streaming_prompt(self, parts,
                                        max_tokens: int = 512,
                                        sampling: Optional[Dict] = None
                                        ) -> AsyncIterator[List[int]]:
        """Like :meth:`generate`, for a prompt that is still being
        PRODUCED (VERDICT r3 #3 — the overlapped voice-chat path):
        ``parts`` is an async iterator of token-id lists; each part
        prefills into the slot as it arrives, overlapping prompt
        ingestion (e.g. a streaming ASR transcript's decode blocks) with
        the LLM's prefill work.  Generation begins when the iterator
        ends, needing only the LAST part's prefill instead of the whole
        prompt's.

        Contract: the LAST part must be non-empty (the final chunk
        samples the first token at its last position) — the
        PooledJAXStreamModel adapter enforces this with token hold-back.
        A producer that discovers its earlier ids were wrong raises
        :class:`PromptRestart` with the final ids; recovery is one plain
        fresh prefill (the head's cache rows are simply overwritten), so
        the output law is always exactly ``generate(final_ids)``.
        Streaming prompts past the context cap drop their TAIL (a
        streaming consumer cannot keep the tail without re-prefilling;
        the plain path keeps the tail instead)."""
        self.start()
        idx = await self.acquire()
        if self.per_request:
            self.set_sampling(idx, **(sampling or {}))
        try:
            cap = self._ctx_cap()
            flush_at = max(16, self.buckets[0])
            buf: List[int] = []
            cached = 0
            started = False
            restart: Optional[List[int]] = None
            try:
                async for part in parts:
                    buf.extend(int(t) for t in part)
                    if started and cached + 1 >= cap:
                        continue        # full: keep draining the producer
                    if not started and len(buf) >= 2:
                        head, buf = buf[: cap - 1][:-1], buf[-1:]
                        _, _, cached = self._plan(list(head))
                        self.submit_prefill(idx, head, final=False)
                        started = True
                    elif started and len(buf) > flush_at:
                        head, buf = buf[:-1], buf[-1:]
                        head = head[: cap - 1 - cached]
                        if head:
                            self.submit_prefill_extend(idx, head,
                                                       final=False)
                            cached += len(head)
            except PromptRestart as e:
                restart = list(e.ids)
            if restart is not None:
                self._drop_slot_prefills(idx)   # never two fresh prefills
                _, _, cached = self._plan(restart)   # for one slot per cycle
                first_fut = self.submit_prefill(idx, restart)
            elif not started:
                _, _, cached = self._plan(list(buf))
                first_fut = self.submit_prefill(idx, buf)
            else:
                tail = buf[: max(1, cap - cached)]
                first_fut = self.submit_prefill_extend(idx, tail,
                                                       final=True)
                cached += len(tail)
            async for toks in self._stream_blocks(idx, cached, first_fut,
                                                  max_tokens):
                yield toks
        finally:
            self.release(idx)
