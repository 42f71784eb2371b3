"""Continuous-batching decode pool: N concurrent streams, one decode program.

BASELINE config #5 for the *streaming* path: the dual-replica scheduler
stays per-request, but all replicas of all in-flight requests decode
through one shared, fixed-capacity batched program
(``models.decoder.decode_block_batch``).  Every pool step reads the 30M
decoder weights once for every active stream; idle slots ride along with
``limit=0`` masked steps.

Concurrency design: each slot holds a FIFO of submitted blocks (the
scheduler issues ahead by one, so depth is typically <= 2); each pool step
takes the head of every non-empty queue.  Sentence resets are applied
*lazily on the pool loop* (before the next gather), so a reset can never
interleave with an in-flight batched step's state write.
"""
from __future__ import annotations

import asyncio
import time
from collections import deque
from typing import Deque, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llmvox_tpu.codec.codec import WavCodec
from llmvox_tpu.models import decoder as dec
from llmvox_tpu.utils.config import DecoderConfig, ServeConfig


from functools import partial


@partial(jax.jit, static_argnames=("bucket",))
def _gather_rows(tokens: jnp.ndarray, idx: jnp.ndarray,
                 bucket: int) -> jnp.ndarray:
    """Select fused slots' token rows and shape them for the ragged
    vocoder: (S, bucket) int32, inactive (-1) entries clamped to code 0."""
    rows = jnp.maximum(tokens[idx], 0)
    b = rows.shape[1]
    if bucket <= b:
        return rows[:, :bucket]
    return jnp.pad(rows, ((0, 0), (0, bucket - b)))


@jax.jit
def _masked_reset(states, mask):
    zi = jnp.int32(0)
    return states._replace(
        pos=jnp.where(mask, zi, states.pos),
        prev_token=jnp.where(mask, zi, states.prev_token),
        done=jnp.where(mask, False, states.done))


class _Request:
    __slots__ = ("window", "text_len", "limit", "future", "fused_dump")

    def __init__(self, window, text_len, limit, future, fused_dump=0):
        self.window = window
        self.text_len = text_len
        self.limit = limit
        self.future = future
        self.fused_dump = fused_dump  # >0: vocode the block's first N
                                      # tokens on-device with the decode


class _Slot:
    __slots__ = ("active", "queue", "pending_reset")

    def __init__(self):
        self.active = False
        self.queue: Deque[_Request] = deque()
        self.pending_reset = False

    def clear(self):
        while self.queue:
            req = self.queue.popleft()
            if not req.future.done():
                req.future.cancel()


class DecodePool:
    """Fixed-capacity batched decoder shared by all live streams."""

    def __init__(self, decoder_params: Dict, text_table: np.ndarray,
                 codec: WavCodec, capacity: int = 16,
                 dcfg: Optional[DecoderConfig] = None,
                 scfg: Optional[ServeConfig] = None,
                 device: Optional[jax.Device] = None,
                 cache_dtype=jnp.bfloat16, param_dtype=None,
                 mesh=None):
        self.dcfg = dcfg or DecoderConfig()
        self.scfg = scfg or ServeConfig()
        self.codec = codec
        self.B = capacity
        self.block = (self.scfg.pool_decode_block
                      or self.scfg.decode_block)
        self.cache_dtype = cache_dtype
        # Pallas batched decode attention on real TPUs (the XLA lowering of
        # the batched flash loop measured ~27x the rest of the step)
        if (device is not None and device.platform != "cpu"
                and not self.dcfg.use_pallas_attention):
            import dataclasses
            self.dcfg = dataclasses.replace(self.dcfg,
                                            use_pallas_attention=True)
        if param_dtype is None:
            param_dtype = cache_dtype
        decoder_params = jax.tree.map(
            lambda x: x.astype(param_dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, decoder_params)
        if device is not None:
            decoder_params = jax.device_put(decoder_params, device)
            text_table = jax.device_put(jnp.asarray(text_table), device)
        self.params = decoder_params
        self.text_table = jnp.asarray(text_table)
        self.codebook = codec.params["codebooks"][0]
        self.device = device
        self.mesh = mesh

        # Block merging (the latency/throughput frontier fix, r3):
        # consumers submit ``block``-token requests — a sentence's first
        # chunk only waits one small scan — and the pool fuses each
        # slot's two queued requests into ONE ``2*block``-wide step
        # whenever demand allows, amortizing the ~9 ms fixed step cost
        # (benchmarks/fetch_probe.py: device ms/step = 8.7 + 0.21/token)
        # without giving up the small-block first-chunk latency.
        self.merge = bool(getattr(self.scfg, "pool_merge_blocks", False))
        self.big_block = 2 * self.block if self.merge else self.block
        depth = max(1, int(getattr(self.scfg, "pool_pipeline_depth", 1)))
        # outstanding requests each consumer should keep in flight so
        # every in-flight step can take a merged pair from its slot
        self.issue_ahead = depth * (2 if self.merge else 1)
        self.states = dec.init_decode_state_batch(self.dcfg, self.B,
                                                  cache_dtype)
        self._widths = ((self.block, self.big_block) if self.merge
                       else (self.block,))
        # speculative batched decode: engages like the dedicated engines
        # (serve/engine.py) — only when the checkpoint carries trained
        # draft heads.  Single-device pools only for now: the sharded
        # step's while_loop trip count would sync across the mesh every
        # iteration, a frontier for real multi-chip measurement.
        # Measured at B=8/k=12 with near-perfect accepts
        # (benchmarks/spec_bench.py --pool_batch): against the XLA
        # batched step (CPU tests) spec is 5.3x; against the Pallas
        # greedy baseline (real TPUs force-enable it above) the XLA
        # verify forward made speculation a NET LOSS (0.67x) until the
        # Pallas verify kernel (ops/pallas_attn.py::
        # pallas_verify_attention) — with it, spec wins under Pallas too.
        self._spec = bool(self.scfg.spec_decode and mesh is None
                          and isinstance(self.params, dict)
                          and "draft_heads" in self.params)
        # Adaptive speculation depth (serve/spec_control.py): compile a
        # LADDER of k_draft rungs — always including rung 0, the plain
        # greedy block — and let the controller move between them from
        # the live accept statistics.  Every rung is bit-identical to
        # greedy, so the controller can only cost speed, never output.
        ladder = tuple(int(k) for k in
                       (getattr(self.scfg, "spec_k_ladder", ()) or ()))
        self._adaptive = bool(self._spec and any(k > 0 for k in ladder))
        self._spec_ctl = None
        self._fixed_k = self.scfg.spec_k_draft if self._spec else 0
        if mesh is None:
            def _wrap_greedy(w):
                def f(params, tt, cb, st, win, tl, lim):
                    toks, n, st2 = dec.decode_block_batch(
                        params, tt, cb, st, win, tl, lim,
                        cfg=self.dcfg, block=w)
                    return toks, n, st2, None
                return f

            def _wrap_spec(w, k):
                def f(params, tt, cb, st, win, tl, lim):
                    return dec.decode_block_spec_batch(
                        params, tt, cb, st, win, tl, lim,
                        cfg=self.dcfg, block=w, k_draft=k)
                return f

            if self._adaptive:
                from llmvox_tpu.serve.spec_control import SpecController
                rungs = sorted({k for k in ladder if k >= 0} | {0})
                self._spec_ctl = SpecController(
                    rungs,
                    k0=(self.scfg.spec_k_draft
                        if self.scfg.spec_k_draft in rungs else None))
                self._decode_fns = {
                    (w, k): (_wrap_greedy(w) if k == 0 else _wrap_spec(w, k))
                    for w in self._widths for k in rungs}
            elif self._spec:
                k = self._fixed_k
                self._decode_fns = {(w, k): _wrap_spec(w, k)
                                    for w in self._widths}
            else:
                self._decode_fns = {(w, 0): _wrap_greedy(w)
                                    for w in self._widths}
        else:
            # Multi-chip pooled serving: the slot batch shards over the
            # mesh's dp axis and every pool step runs ONE shard_map'd
            # program across the slice (weights replicated, KV caches
            # sharded on the stream axis, no collectives needed — the
            # TPU answer to "more concurrent dialogues than one chip
            # serves"; see serve/batch.py::make_sharded_decode).
            from jax.sharding import NamedSharding, PartitionSpec as P

            from llmvox_tpu.parallel.mesh import DP_AXIS
            from llmvox_tpu.serve.batch import make_sharded_decode
            dp = mesh.shape[DP_AXIS]
            assert self.B % dp == 0, \
                f"pool capacity {self.B} must divide over dp={dp}"
            rep = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, rep)
            self.text_table = jax.device_put(self.text_table, rep)
            # the codec rides along replicated: the fused first-chunk
            # vocode chains on the dp-sharded decode output
            codec.params = jax.device_put(codec.params, rep)
            self.codebook = codec.params["codebooks"][0]
            sh = dec.DecodeState(
                k_cache=NamedSharding(mesh, P(None, DP_AXIS)),
                v_cache=NamedSharding(mesh, P(None, DP_AXIS)),
                pos=NamedSharding(mesh, P(DP_AXIS)),
                prev_token=NamedSharding(mesh, P(DP_AXIS)),
                done=NamedSharding(mesh, P(DP_AXIS)))
            self.states = jax.device_put(self.states, sh)

            def _wrap_mesh(fn):
                def f(*a):
                    toks, n, st2 = fn(*a)
                    return toks, n, st2, None
                return f

            self._decode_fns = {
                (w, 0): _wrap_mesh(make_sharded_decode(self.dcfg, w, mesh))
                for w in self._widths}
        # fused first chunks vocode at the bucket of the step's largest
        # fused DUMP, not the decode block: dumps are the dump-ladder's
        # small first rungs (10 tokens -> bucket 16), and a block-sized
        # bucket (64 -> 96) was measured to add ~25-35 ms of vocoder
        # time to every sentence's first chunk.  Cap for warmup.
        self._fuse_bucket = codec.bucket_for(min(self.block,
                                                 max(codec.buckets)))
        self.slots = [_Slot() for _ in range(self.B)]
        self._task: Optional[asyncio.Task] = None
        self._wake: Optional[asyncio.Event] = None
        self._inflight = None
        self.steps = 0
        self.merged_steps = 0
        self._synth_q: Deque = deque()
        self._synth_task: Optional[asyncio.Task] = None
        self._synth_wake: Optional[asyncio.Event] = None
        self.synth_calls = 0

    # -- slot lifecycle -------------------------------------------------
    def try_acquire(self) -> Optional[int]:
        for i, s in enumerate(self.slots):
            if not s.active:
                s.active = True
                s.pending_reset = True
                return i
        return None

    def acquire(self) -> int:
        idx = self.try_acquire()
        if idx is None:
            raise RuntimeError("decode pool exhausted")
        return idx

    @property
    def active_count(self) -> int:
        return sum(1 for s in self.slots if s.active)

    def release(self, idx: int) -> None:
        slot = self.slots[idx]
        slot.active = False
        slot.clear()

    def reset_slot(self, idx: int) -> None:
        """Per-sentence reset: drop queued work, re-zero state lazily."""
        slot = self.slots[idx]
        slot.clear()
        slot.pending_reset = True

    # -- stepping -------------------------------------------------------
    def submit(self, idx: int, window: np.ndarray, text_len: int,
               limit: int, fused_dump: int = 0) -> asyncio.Future:
        """Enqueue a block request; resolves with the block's tokens (or,
        with ``fused_dump > 0``, with ``(tokens, first_chunk_bytes|None)``)."""
        loop = asyncio.get_running_loop()
        fut = loop.create_future()
        self.slots[idx].queue.append(
            _Request(np.array(window, np.int32), text_len, limit, fut,
                     fused_dump))
        # Wake the parked step loop only when the arrival can change what
        # it should dispatch RIGHT NOW (ADVICE r4): a fused head may
        # burst-dispatch past ``depth`` mid-wait, and an idle loop (no
        # steps in flight) must start.  A plain issue-ahead request under
        # load needs no wake — the loop picks it up at the next refill —
        # so we skip the per-submit waker-task churn.
        if self._wake is not None and (
                fused_dump > 0 or not getattr(self, "_inflight", None)):
            self._wake.set()
        return fut

    def _apply_resets(self) -> None:
        idxs = [i for i, s in enumerate(self.slots) if s.pending_reset]
        if not idxs:
            return
        # Resetting pos/prev/done suffices: cache rows beyond pos are never
        # attended (mask idx <= pos) and get overwritten before being read.
        # Fixed-shape (B,) mask, NOT a gather over the reset indices: an
        # index-array scatter compiles one program per distinct reset
        # count, which made the first concurrent batch after startup pay
        # up to B tunnel compile/load stalls (~10 s observed).
        mask = np.zeros((self.B,), bool)
        mask[idxs] = True
        self.states = _masked_reset(self.states, jnp.asarray(mask))
        for i in idxs:
            self.slots[i].pending_reset = False

    def _dispatch_step(self) -> Optional[Tuple]:
        """Gather every non-empty slot queue's head — plus, when merging
        is on and a slot has a second full-limit request queued, that
        request too — and dispatch ONE batched decode (plus chained
        fused vocodes) — no host fetch.  Returns the in-flight record,
        or None when no work is queued.  Popping the requests HERE (at
        dispatch, not at resolve) lets the next dispatch see each slot's
        issue-ahead requests.

        Merge correctness: a pair (r1, r2) runs as one ``2*block`` scan
        with window = r1.window ++ r2.window, limit = r1.limit +
        r2.limit, text_len = r2.text_len.  This is exact iff r1.limit ==
        block: active steps are a prefix, so steps 0..block-1 consume
        r1's window at r1's positions and the rest consume r2's (whose
        window was built for position issued+block).  r1.text_len <=
        r2.text_len can differ only while r1's sentence is still
        streaming, in which case r1.limit == block guarantees
        pos < r1.text_len throughout r1's steps — the text_len clamp
        never fires there, so r2's value is safe for the whole row.
        EOA inside r1 freezes the row (done is sticky), exactly like
        two sequential steps.  Fused (sentence-first) requests never
        merge: their first chunk should not wait on a double scan."""
        pad = self.dcfg.pad_token_id
        self._apply_resets()
        picks: List[Tuple[int, List[_Request]]] = []
        for i, s in enumerate(self.slots):
            if s.active and s.queue:
                rs = [s.queue.popleft()]
                if (self.merge and s.queue
                        and rs[0].limit == self.block
                        and rs[0].fused_dump == 0
                        and s.queue[0].fused_dump == 0):
                    rs.append(s.queue.popleft())
                picks.append((i, rs))
        if not picks:
            return None
        merged = any(len(rs) == 2 for _, rs in picks)
        width = self.big_block if merged else self.block
        self.merged_steps += int(merged)
        # heads: (slot, request, token-row offset of this request)
        heads: List[Tuple[int, _Request, int]] = []
        try:
            windows = np.full((self.B, width), pad, np.int32)
            text_lens = np.zeros((self.B,), np.int32)
            limits = np.zeros((self.B,), np.int32)
            for i, rs in picks:
                off = 0
                for req in rs:
                    windows[i, off: off + self.block] = req.window
                    text_lens[i] = req.text_len
                    limits[i] += req.limit
                    heads.append((i, req, off))
                    off += self.block
            rung = (self._spec_ctl.next_k() if self._spec_ctl is not None
                    else self._fixed_k)
            tokens, nprod, self.states, iters = self._decode_fns[
                (width, rung)](
                self.params, self.text_table, self.codebook, self.states,
                jnp.asarray(windows), jnp.asarray(text_lens),
                jnp.asarray(limits))
            # Fused first chunks: vocode each fused slot's first
            # fused_dump tokens in a device call CHAINED on the decode
            # output — the sentence's first audio costs one host round
            # trip, like the dedicated engines' fused path.  More than
            # SYNTH_BATCH fused slots in one step (a >16-slot pool's
            # simultaneous sentence starts) chunk into extra vocode calls
            # rather than silently losing the fused path.
            # fused requests never merge, so their tokens sit at row
            # offset 0 — exactly what _gather_rows reads
            fused = [(i, req) for i, req, off in heads
                     if req.fused_dump > 0]
            wavs = []
            for c0 in range(0, len(fused), self.SYNTH_BATCH):
                part = fused[c0: c0 + self.SYNTH_BATCH]
                fidx = np.zeros((self.SYNTH_BATCH,), np.int32)
                flens = np.ones((self.SYNTH_BATCH,), np.int32)
                for j, (i, req) in enumerate(part):
                    fidx[j] = i
                    flens[j] = req.fused_dump
                # bucket by the group's largest dump, not the block (see
                # _fuse_bucket note); dumps can't exceed the block
                fb = self.codec.bucket_for(
                    min(max(req.fused_dump for _, req in part),
                        self._fuse_bucket))
                rows = _gather_rows(tokens, jnp.asarray(fidx), fb)
                wavs.append(self.codec.decode_codes_device(rows, flens))
                self.synth_calls += 1
        except BaseException as exc:
            # requests were popped at dispatch: fail them now or their
            # waiters hang (the crash handler only sees the queues)
            for _, req, _ in heads:
                if not req.future.done():
                    req.future.set_exception(exc)
            raise
        self.steps += 1
        if self._spec_ctl is None or iters is None:
            feedback = None
        else:
            # accept statistics for the adaptive controller, fetched with
            # the step's single device_get (active slots only — merged
            # picks appear once; padding rows aren't in picks at all)
            feedback = (rung, [i for i, _ in picks], nprod, iters)
        return heads, fused, tokens, wavs, feedback

    async def _resolve_step(self, inflight: Tuple) -> None:
        """Fetch one in-flight step's results and resolve its futures."""
        heads, fused, tokens, wavs, feedback = inflight
        toks, wavs_h, fb_h = await asyncio.to_thread(
            jax.device_get, (tokens, wavs, feedback))
        if fb_h is not None:
            rung, act, nprod, iters = fb_h
            self._spec_ctl.observe(
                rung, float(sum(nprod[i] for i in act)),
                float(sum(iters[i] for i in act)))
        # slot -> (flat synth row, dump): rows follow the FUSED list
        # order, not the heads order (a staggered step mixes fused and
        # non-fused slots)
        fused_slots = {i: (j, req.fused_dump)
                       for j, (i, req) in enumerate(fused)}
        hop = self.codec.cfg.hop_length
        for i, req, off in heads:
            if req.future.done():
                continue
            out = [int(t) for t in toks[i][off: off + self.block] if t >= 0]
            if req.fused_dump > 0:
                audio = None
                if i in fused_slots and len(out) >= req.fused_dump:
                    j, dump = fused_slots[i]
                    row = wavs_h[j // self.SYNTH_BATCH][
                        j % self.SYNTH_BATCH]
                    audio = np.asarray(row[: dump * hop],
                                       dtype="<f4").tobytes()
                req.future.set_result((out, audio))
            else:
                req.future.set_result(out)

    async def _resolve_task(self, inflight: Tuple) -> None:
        """Per-step fetch task: a failed fetch must fail its own step's
        futures (they were popped from the queues at dispatch, so the
        crash handler can no longer see them)."""
        try:
            await self._resolve_step(inflight)
        except BaseException as exc:
            cancelled = isinstance(exc, asyncio.CancelledError)
            for _, req, _ in inflight[0]:
                if not req.future.done():
                    # pool teardown: cancel, don't park an exception on
                    # futures nobody will await
                    if cancelled:
                        req.future.cancel()
                    else:
                        req.future.set_exception(exc)
            raise

    async def _step_loop(self) -> None:
        """Pipelined to ``pool_pipeline_depth`` in-flight steps: each
        dispatched step (chained on the on-device state) starts its own
        concurrent fetch task immediately, and the loop blocks only on
        the OLDEST one.  Fetch round trips overlap on the transport
        (benchmarks/fetch_probe.py: serial fetches pay ~29 ms RTT each,
        concurrent fetches of chained steps cost ~device time), so at
        depth>=2 the loop is decode-bound instead of RTT-bound —
        measured 20.5 -> 14.5 ms/step at block 32, 25 -> 19.6 at
        block 64 (B=16).  The r3 depth-1 history: the serial
        dispatch->fetch cycle cost a full RTT per step, giving 4-way and
        8-way IDENTICAL wall clocks (benchmarks/pool_profile.py).
        Consumers issue ahead one block (scheduler + PooledEngine), so
        two requests per slot are outstanding at steady state — exactly
        what depth 2 needs.

        Fused burst: a FUSED (sentence-first) request arriving while the
        loop is parked on the oldest fetch used to wait for ``depth``
        whole fetch cycles before its own dispatch — at every sentence
        boundary the previous sentence leaves up to ``depth`` issued-
        ahead speculative steps in flight (their queued tail is dropped
        by ``reset_slot``, the dispatched ones can't be), so the next
        sentence's first audio queued behind ~2 dead steps (measured
        119 ms dispatch->fetch vs ~40 ms steady-state at 1-way).  A
        fused head now (a) wakes the parked loop and (b) may dispatch
        ONE step beyond ``depth`` — its device execution chains right
        after the in-flight steps instead of after their fetches.
        Throughput is untouched: the burst only triggers on sentence
        starts, and the pipeline drains back to ``depth`` immediately.
        """
        self._inflight = deque()   # (record, fetch task), oldest first
        depth = max(1, int(getattr(self.scfg, "pool_pipeline_depth", 1)))

        def fused_waiting() -> bool:
            return any(s.active and s.queue and s.queue[0].fused_dump > 0
                       for s in self.slots)

        while True:
            while len(self._inflight) < depth + int(fused_waiting()):
                nxt = self._dispatch_step()
                if nxt is None:
                    break
                self._inflight.append(
                    (nxt, asyncio.create_task(self._resolve_task(nxt))))
            if self._inflight:
                _, task = self._inflight[0]
                if not task.done():
                    # wait for the oldest fetch OR a new arrival (a fused
                    # head must be able to burst-dispatch mid-wait)
                    self._wake.clear()
                    waker = asyncio.create_task(self._wake.wait())
                    await asyncio.wait({task, waker},
                                       return_when=asyncio.FIRST_COMPLETED)
                    if not waker.done():
                        waker.cancel()
                if task.done():
                    self._inflight.popleft()
                    await task
                    # yield so consumers see results and enqueue
                    # follow-ups before the next gather
                    await asyncio.sleep(0)
                # else: woken by a submit — refill (fused burst) first
            elif not any(s.active and s.queue for s in self.slots):
                await self._wake.wait()
                self._wake.clear()

    # -- batched synthesis ------------------------------------------------
    # Concurrent requests' chunks are grouped per bucket and vocoded in ONE
    # ragged batched codec call (decode_codes_ragged): under N-way request
    # concurrency the per-chunk device round trip is paid once per group
    # instead of once per stream.  The batch dim is padded to ONE fixed
    # size so there is exactly one compiled program per chunk bucket
    # (padding rows cost a valid_len-1 masked decode — trivial), and
    # ``warmup()`` compiles them all before traffic.
    SYNTH_BATCH = 8

    def submit_synth(self, codes: Sequence[int]) -> asyncio.Future:
        loop = asyncio.get_running_loop()
        fut = loop.create_future()
        self._synth_q.append((list(codes), fut))
        if self._synth_wake is not None:
            self._synth_wake.set()
        return fut

    def _synth_batch(self, reqs):
        hop = self.codec.cfg.hop_length
        bucket = self.codec.bucket_for(max(max(len(c) for c, _ in reqs), 1))
        bpad = self.SYNTH_BATCH
        codes = np.zeros((bpad, bucket), np.int32)
        lengths = np.ones((bpad,), np.int32)
        for i, (c, _) in enumerate(reqs):
            codes[i, : len(c)] = c
            lengths[i] = max(len(c), 1)
        wavs = self.codec.decode_codes_ragged(codes, lengths)
        self.synth_calls += 1
        out = []
        for i, (c, _) in enumerate(reqs):
            n = len(c) * hop
            out.append(np.asarray(wavs[i][:n], dtype="<f4").tobytes())
        return out

    async def _synth_loop(self) -> None:
        while True:
            await self._synth_wake.wait()
            self._synth_wake.clear()
            while self._synth_q:
                batch = []
                while self._synth_q:
                    batch.append(self._synth_q.popleft())
                groups: Dict[int, list] = {}
                for codes, fut in batch:
                    b = self.codec.bucket_for(max(len(codes), 1))
                    groups.setdefault(b, []).append((codes, fut))
                for reqs in groups.values():
                    for i in range(0, len(reqs), self.SYNTH_BATCH):
                        part = reqs[i: i + self.SYNTH_BATCH]
                        try:
                            chunks = await asyncio.to_thread(
                                self._synth_batch, part)
                        except Exception as e:
                            for _, fut in part:
                                if not fut.done():
                                    fut.set_exception(e)
                            continue
                        for (_, fut), chunk in zip(part, chunks):
                            if not fut.done():
                                fut.set_result(chunk)
                await asyncio.sleep(0)

    def warmup(self) -> None:
        """Compile the batched decode block and every bucket's batched
        synth program before traffic (compiles are the only source of
        multi-second latency; everything after is steady-state)."""
        pad = self.dcfg.pad_token_id
        # Run each width's step TWICE: the first call takes the
        # constructor-made states (default layouts) and returns
        # jit-output states whose TPU layouts can differ, so the
        # steady-state program — the one every traffic step runs — is a
        # SECOND executable.  Without the second call the first wave
        # pays its compile/cache-load (measured +1.4 s on the first
        # concurrent wave's first chunk).  With merging on, traffic
        # interleaves widths on the same chained state, so both widths
        # warm in the chain.
        for _ in range(2):
            for (w, _k) in sorted(self._decode_fns):
                windows = np.full((self.B, w), pad, np.int32)
                tokens, _, self.states, _it = self._decode_fns[(w, _k)](
                    self.params, self.text_table, self.codebook,
                    self.states, jnp.asarray(windows),
                    np.ones((self.B,), np.int32),
                    np.ones((self.B,), np.int32))
                np.asarray(tokens)
        # fused first-chunk path: gather + chained ragged vocode, one
        # program per dump bucket <= the block-capped cap (traffic picks
        # the bucket of each step's largest fused dump)
        for fb in [b for b in self.codec.buckets if b <= self._fuse_bucket]:
            rows = _gather_rows(tokens,
                                jnp.zeros((self.SYNTH_BATCH,), jnp.int32), fb)
            np.asarray(self.codec.decode_codes_device(
                rows, np.ones((self.SYNTH_BATCH,), np.int32)))
        # cover the full traffic cycle step -> masked reset -> step: the
        # reset program and the step-after-reset can each see a new input
        # layout, i.e. a new executable
        for i, s in enumerate(self.slots):
            s.pending_reset = True
        self._apply_resets()
        for (w, _k) in sorted(self._decode_fns):
            windows = np.full((self.B, w), pad, np.int32)
            tokens, _, self.states, _it = self._decode_fns[(w, _k)](
                self.params, self.text_table, self.codebook, self.states,
                jnp.asarray(windows), np.ones((self.B,), np.int32),
                np.ones((self.B,), np.int32))
            np.asarray(tokens)
        for i, s in enumerate(self.slots):
            s.pending_reset = True
        self._apply_resets()
        if self._spec_ctl is not None and not self._spec_ctl.cost_ms:
            self._spec_ctl.cost_ms = self._calibrate_spec_costs()
        for bucket in self.codec.buckets:
            codes = np.zeros((self.SYNTH_BATCH, bucket), np.int32)
            # lengths must REACH the bucket: decode_codes_ragged re-pads
            # to bucket_for(lengths.max()), so all-ones lengths would
            # truncate every iteration to the smallest bucket and compile
            # ONE program 9 times — the real buckets then compiled
            # in-request (measured 55 s of synth on a cold cache)
            lengths = np.full((self.SYNTH_BATCH,), bucket, np.int32)
            self.codec.decode_codes_ragged(codes, lengths)

    def _calibrate_spec_costs(self, repeats: int = 3) -> Dict[int, float]:
        """Measure each compiled rung's cost on a throwaway state chain:
        ms per ITERATION for speculative rungs (the spec kernels return
        per-row iteration counts), ms per TOKEN for rung 0 (a greedy
        "iteration" commits exactly one token).  Runs after warmup, so
        every executable — including the steady-state layouts — is
        already compiled; one untimed reset+step cycle per rung covers
        the reset program's own layout before the clock starts.  The
        chained dispatches amortize the tunnel RTT the same way the
        pipelined step loop does."""
        pad = self.dcfg.pad_token_id
        rungs = sorted({k for (_w, k) in self._decode_fns})
        windows = jnp.asarray(np.full((self.B, self.block), pad, np.int32))
        tl = jnp.asarray(np.zeros((self.B,), np.int32))
        lim = jnp.asarray(np.full((self.B,), self.block, np.int32))
        all_live = jnp.ones((self.B,), jnp.bool_)
        costs: Dict[int, float] = {}
        for k in rungs:
            fn = self._decode_fns[(self.block, k)]
            st = dec.init_decode_state_batch(self.dcfg, self.B,
                                             self.cache_dtype)
            if self.device is not None:
                st = jax.device_put(st, self.device)
            # untimed: constructor-layout step, reset, steady-state step
            toks, _, st, _it = fn(self.params, self.text_table,
                                  self.codebook, st, windows, tl, lim)
            st = _masked_reset(st, all_live)
            toks, _, st, _it = fn(self.params, self.text_table,
                                  self.codebook, st, windows, tl, lim)
            jax.block_until_ready((toks, st))
            t0 = time.perf_counter()
            last = None
            for _ in range(repeats):
                st = _masked_reset(st, all_live)
                toks, _, st, iters = fn(self.params, self.text_table,
                                        self.codebook, st, windows, tl, lim)
                last = (toks, iters)
            jax.block_until_ready(last)
            dt_ms = (time.perf_counter() - t0) * 1000.0 / repeats
            if k == 0:
                costs[0] = dt_ms / self.block
            else:
                costs[k] = dt_ms / max(int(np.max(np.asarray(last[1]))), 1)
        return costs

    def spec_stats(self) -> Optional[Dict]:
        """Speculation state for /stats: None when spec is off."""
        if self._spec_ctl is not None:
            return self._spec_ctl.stats()
        if self._spec:
            return {"k": self._fixed_k, "ladder": [self._fixed_k]}
        return None

    def stats(self) -> Dict:
        """Operational counters for GET /stats (serve/server.py)."""
        out = {
            "capacity": self.B,
            "active": self.active_count,
            "steps": self.steps,
            "merged_steps": self.merged_steps,
            "synth_calls": self.synth_calls,
            "block": self.block,
        }
        spec = self.spec_stats()
        if spec is not None:
            out["spec"] = spec
        return out

    def start(self) -> None:
        if self._synth_task is None:
            self._synth_wake = asyncio.Event()
            self._synth_task = asyncio.create_task(self._synth_loop())
        if self._task is None:
            self._wake = asyncio.Event()
            self._task = asyncio.create_task(self._step_loop())

            def _report(task):
                if task.cancelled():
                    return
                exc = task.exception()
                if exc is not None:
                    import traceback
                    print("DecodePool step loop crashed:",
                          "".join(traceback.format_exception(exc)),
                          flush=True)
                    # fail all queued waiters so streams error instead of
                    # hanging.  In-flight steps need no help: their fetch
                    # tasks run independently and _resolve_task fails its
                    # own step's futures on a fetch error.
                    self._inflight = None
                    for s in self.slots:
                        while s.queue:
                            req = s.queue.popleft()
                            if not req.future.done():
                                req.future.set_exception(exc)
                    self._task = None

            self._task.add_done_callback(_report)

    def stop(self) -> None:
        if self._task is not None:
            self._task.cancel()
            self._task = None
        if self._synth_task is not None:
            self._synth_task.cancel()
            self._synth_task = None
        # a restart (new event loop) must not resolve stale in-flight
        # records from the cancelled loop
        if self._inflight:
            for rec, task in self._inflight:
                task.cancel()
                for _, req, _ in rec[0]:
                    if not req.future.done():
                        req.future.cancel()
        self._inflight = None


class PoolLadder:
    """Occupancy-adaptive set of DecodePools (small -> large capacity).

    The measured trade this solves (STATUS r3): a batched pool's step
    cost scales with its CAPACITY, not its occupancy — inactive slots
    ride along in every decode.  A 16-slot pool serves 8 concurrent
    requests at 117x aggregate but queues 16 (each request holds two
    replica slots); a 32-slot pool serves 16-way at 160x but halves
    8-way.  The ladder keeps BOTH compiled programs and routes engines
    to the smallest pool covering current demand; engines migrate at
    sentence boundaries (``PooledEngine.new_state``), where the slot
    state is reset anyway, so migration copies nothing.  In steady
    state only one pool's program is stepping; both run only during the
    few-second drift after a load shift.

    Duck-types the DecodePool surface the server uses (``B`` for
    admission sizing, ``warmup``, ``stop``) so ``build_server`` /
    ``TTSServer`` take it as the ``pool`` argument unchanged.
    """

    def __init__(self, pools: Sequence[DecodePool], decay_s: float = 10.0):
        assert pools, "ladder needs at least one pool"
        caps = [p.B for p in pools]
        assert caps == sorted(caps), "order pools small -> large"
        blocks = {(p.block, p.big_block, p.issue_ahead) for p in pools}
        assert len(blocks) == 1, \
            "ladder pools must share block config (scheduler sees one)"
        self.pools = list(pools)
        # Demand = a DECAYING HIGH-WATER MARK of active slots, not the
        # instantaneous count: closed-loop bursts of single-sentence
        # requests otherwise split across rungs at every wave start (the
        # first arrivals see low occupancy, route small, and — with no
        # later sentence boundary — can never migrate out), leaving BOTH
        # programs stepping for the whole wave.  Holding the peak for
        # ``decay_s`` routes waves 2+ of a sustained burst straight to
        # the big rung; after ``decay_s`` of lower demand the target
        # drifts back down.
        self.decay_s = float(decay_s)
        self._peak = 0
        self._peak_t = time.monotonic()

    def _demand(self, extra: int = 0) -> int:
        now = time.monotonic()
        a = self.active_total + extra
        if a >= self._peak or now - self._peak_t >= self.decay_s:
            self._peak = a
            self._peak_t = now
        return self._peak

    # -- DecodePool surface used by the server --------------------------
    @property
    def B(self) -> int:
        return self.pools[-1].B        # admission gates on the largest

    def warmup(self) -> None:
        for p in self.pools:
            p.warmup()

    def stop(self) -> None:
        for p in self.pools:
            p.stop()

    def stats(self) -> Dict:
        return {"ladder": [p.stats() for p in self.pools],
                "demand": self._peak}

    # -- routing --------------------------------------------------------
    @property
    def active_total(self) -> int:
        return sum(p.active_count for p in self.pools)

    def target(self, extra: int = 0) -> DecodePool:
        """Smallest pool whose capacity covers current demand (+extra
        slots about to be acquired); demand holds its recent peak for
        ``decay_s`` (see __init__)."""
        need = self._demand(extra)
        for p in self.pools:
            if need <= p.B:
                return p
        return self.pools[-1]

    def acquire(self) -> Tuple[DecodePool, int]:
        for p in self.pools[self.pools.index(self.target(extra=1)):]:
            idx = p.try_acquire()
            if idx is not None:
                p.start()
                return p, idx
        raise RuntimeError("decode pool ladder exhausted")


class PooledEngine:
    """TTSEngine-compatible facade over one DecodePool slot.

    The StreamingScheduler drives engines through ``new_state`` /
    ``decode_block_async`` / ``synthesize``; here decode goes through the
    shared pool (state lives in the pool, so ``new_state`` resets the
    slot) and synthesis through the shared codec.  Constructed over a
    :class:`PoolLadder`, the engine re-routes to the ladder's target
    pool at each sentence boundary (see PoolLadder docstring).
    """

    class _Pending:
        __slots__ = ("_fut",)

        def __init__(self, fut: asyncio.Future):
            self._fut = fut

        async def afetch(self) -> List[int]:
            # awaiting the loop-owned future directly: no executor thread.
            # (A thread-blocking fetch() would deadlock — N busy-waiting
            # consumers can exhaust the default executor and starve the
            # pool's own to_thread device fetch.)
            try:
                return await self._fut
            except asyncio.CancelledError:
                return []

    def __init__(self, pool, scfg: Optional[ServeConfig] = None):
        self.ladder = pool if isinstance(pool, PoolLadder) else None
        if self.ladder is not None:
            self.pool, self.slot = self.ladder.acquire()
        else:
            self.pool = pool
            self.slot = pool.acquire()
            pool.start()
        self.dcfg = self.pool.dcfg
        self.scfg = scfg or self.pool.scfg
        self.codec = self.pool.codec
        self.block = self.pool.block
        # deep enough that every in-flight pool step can take a merged
        # pair from this slot (scheduler reads this to size its
        # issue-ahead pipeline)
        self.issue_ahead = self.pool.issue_ahead

    # the pool batches every slot into one fixed-block decode program, so
    # per-request block growth / fused first chunks don't apply here
    fixed_block = True

    def new_state(self):
        if self.ladder is not None:
            # sentence boundary: the slot state resets anyway, so moving
            # to the ladder's current target pool copies nothing
            tgt = self.ladder.target()
            if tgt is not self.pool:
                idx = tgt.try_acquire()
                if idx is not None:
                    self.pool.release(self.slot)
                    self.pool, self.slot = tgt, idx
                    self.codec = tgt.codec
                    tgt.start()
        self.pool.reset_slot(self.slot)
        return None  # state lives in the pool

    def decode_block_async(self, state, window: np.ndarray, text_len: int,
                           limit: int, block: Optional[int] = None):
        assert block is None or block == self.block, \
            "pool slots decode at the pool's fixed block size"
        fut = self.pool.submit(self.slot, window, text_len, limit)
        return PooledEngine._Pending(fut), None

    def decode_block_fused_async(self, state, window: np.ndarray,
                                 text_len: int, limit: int, dump: int,
                                 block: Optional[int] = None):
        """Decode + on-device vocode of the block's first ``dump`` tokens:
        the pool chains the ragged synth on the batched decode output, so
        the sentence's first chunk costs one host round trip (the pooled
        counterpart of TTSEngine.decode_block_fused_async)."""
        assert block is None or block == self.block
        assert dump <= self.block
        fut = self.pool.submit(self.slot, window, text_len, limit,
                               fused_dump=dump)
        return PooledEngine._Pending(fut), None

    def synthesize(self, codes: Sequence[int]) -> bytes:
        arr = np.asarray(codes, np.int32)[None]
        wav = self.codec.decode_codes(arr)[0]
        return np.asarray(wav, dtype="<f4").tobytes()

    async def synthesize_async(self, codes: Sequence[int]) -> bytes:
        """Route through the pool's batching synth queue: chunks from
        concurrent requests vocode in one ragged batched codec call."""
        return await self.pool.submit_synth(codes)

    def close(self) -> None:
        self.pool.release(self.slot)
