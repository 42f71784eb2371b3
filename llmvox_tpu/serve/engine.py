"""TTSEngine: one TTS replica — decoder decode loop + codec — on one device.

The counterpart of the reference ``ModelHandler`` + per-token consumer math
(inference/model_handler.py:45-166, streaming_server.py:323-370), re-cut
for TPU: the per-token pipeline (byte-embedding, codebook feature, concat,
normalize, transformer step, argmax) is one compiled program generating
``decode_block`` tokens per device call, and chunk synthesis runs at a few
static bucket shapes with valid-length masking.  The reference instead did
4 host<->device round trips *per token* and recompiled nothing because
eager torch has no shapes to lock.

Latency design: JAX dispatch is asynchronous, so ``decode_block_async``
returns un-materialized device arrays — the scheduler issues the next
block (chained on the on-device state) *before* fetching the previous
block's tokens, hiding the host<->device round trip entirely (tens of ms
on tunneled TPUs).  Serving casts decoder params to bf16 (halving HBM
traffic per decode step); the final argmax still accumulates in f32.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llmvox_tpu.codec import codec as codec_mod
from llmvox_tpu.codec.codec import WavCodec
from llmvox_tpu.models import decoder as dec
from llmvox_tpu.utils.config import CodecConfig, DecoderConfig, ServeConfig


class PendingTokens:
    """Handle to an in-flight decode block (device arrays, not fetched)."""

    __slots__ = ("tokens", "issued_at")

    def __init__(self, tokens: jnp.ndarray):
        self.tokens = tokens
        self.issued_at = time.perf_counter()

    def fetch(self) -> List[int]:
        toks = np.asarray(self.tokens)
        return [int(t) for t in toks if t >= 0]

    async def afetch(self) -> List[int]:
        import asyncio
        return await asyncio.to_thread(self.fetch)


class PendingFused:
    """In-flight fused (decode block + first-chunk synthesis) call.

    The device call returns ONE packed float32 vector — waveform samples
    followed by the block's tokens — so the result costs a single
    device->host transfer instead of two (each transfer pays a full
    round-trip over a remote chip).
    """

    __slots__ = ("packed", "n_wav")

    def __init__(self, packed: jnp.ndarray, n_wav: int):
        self.packed = packed
        self.n_wav = n_wav

    def fetch(self) -> Tuple[List[int], bytes]:
        arr = np.asarray(self.packed)
        wav = arr[: self.n_wav]
        toks = np.rint(arr[self.n_wav:]).astype(np.int32)
        return ([int(t) for t in toks if t >= 0],
                np.asarray(wav, dtype="<f4").tobytes())

    async def afetch(self) -> Tuple[List[int], bytes]:
        import asyncio
        return await asyncio.to_thread(self.fetch)


@partial(jax.jit, static_argnames=("dcfg", "ccfg", "block", "dump", "bucket"))
def _fused_first_block(params: Dict, codec_params: Dict,
                       text_table: jnp.ndarray, codebook: jnp.ndarray,
                       state: dec.DecodeState, window: jnp.ndarray,
                       text_len: jnp.ndarray, limit: jnp.ndarray,
                       dcfg: DecoderConfig, ccfg: CodecConfig,
                       block: int, dump: int, bucket: int):
    """Decode one block AND synthesize its first ``dump`` tokens in a
    single device program.

    The sentence's first audio chunk otherwise costs two dispatch+fetch
    round trips (decode, then synth); fused, it costs one.  The codec
    subgraph is the same bucket program ``WavCodec.decode_codes`` runs
    (same padding, same valid_len masking).
    """
    tokens, _, state = dec.decode_block(
        params, text_table, codebook, state, window, text_len, limit,
        dcfg, block=block)
    codes = jnp.clip(tokens[:dump], 0, dcfg.vocab_size - 1)[None]
    codes = jnp.pad(codes, ((0, 0), (0, bucket - dump)))
    wav = codec_mod._decode_codes(codec_params, codes, jnp.int32(0),
                                  jnp.int32(dump), ccfg)
    wav = wav[0, : dump * ccfg.hop_length]
    # pack waveform + tokens into one array = one host fetch; token ids
    # (< 4096) and the -1 inactive mask are exact in float32
    packed = jnp.concatenate([wav.astype(jnp.float32),
                              tokens.astype(jnp.float32)])
    return packed, state


class TTSEngine:
    """Decoder params + text table + codec, pinned to one device."""

    def __init__(self, decoder_params: Dict, text_table: np.ndarray,
                 codec: WavCodec, dcfg: Optional[DecoderConfig] = None,
                 scfg: Optional[ServeConfig] = None,
                 device: Optional[jax.Device] = None,
                 cache_dtype=jnp.bfloat16,
                 param_dtype=None):
        self.dcfg = dcfg or DecoderConfig()
        self.scfg = scfg or ServeConfig()
        self.codec = codec
        self.cache_dtype = cache_dtype
        self.block = self.scfg.decode_block
        # Pallas decode attention on real TPUs: with the full-cache kernel
        # (no per-launch operand copies) a 32-token block drops from 17.3ms
        # to 6.5ms at deep positions even at B=1.
        if (device is not None and device.platform != "cpu"
                and not self.dcfg.use_pallas_attention):
            import dataclasses
            self.dcfg = dataclasses.replace(self.dcfg,
                                            use_pallas_attention=True)
        if param_dtype is None:
            param_dtype = cache_dtype
        if param_dtype is not None:
            decoder_params = jax.tree.map(
                lambda x: x.astype(param_dtype)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x, decoder_params)
        if device is not None:
            decoder_params = jax.device_put(decoder_params, device)
            text_table = jax.device_put(jnp.asarray(text_table), device)
        self.params = decoder_params
        self.text_table = jnp.asarray(text_table)
        self.device = device
        # the decoder consumes the first codebook level (n_q=1 deployed)
        self.codebook = codec.params["codebooks"][0]
        # speculative decode only engages when the checkpoint actually
        # carries trained draft heads (models/decoder.py::decode_block_spec)
        self._spec = bool(self.scfg.spec_decode
                          and "draft_heads" in decoder_params)

    # -- decode --------------------------------------------------------
    def new_state(self) -> dec.DecodeState:
        state = dec.init_decode_state(self.dcfg, dtype=self.cache_dtype)
        if self.device is not None:
            state = jax.device_put(state, self.device)
        return state

    def decode_block_async(self, state: dec.DecodeState,
                           text_window: np.ndarray, text_len: int,
                           limit: int, block: Optional[int] = None
                           ) -> Tuple[PendingTokens, dec.DecodeState]:
        """Dispatch one block without waiting; state chains on device.

        ``block`` overrides the compiled block length (the scheduler grows
        it mid-sentence to amortize host round-trips).
        """
        if self._spec:
            # speculative decode: drafts from the trained MTP heads,
            # verified in one parallel forward — bit-identical tokens,
            # fewer sequential steps per block when the heads are good
            tokens, _, state, _ = dec.decode_block_spec(
                self.params, self.text_table, self.codebook, state,
                jnp.asarray(text_window, jnp.int32), jnp.int32(text_len),
                jnp.int32(limit), self.dcfg, block=block or self.block,
                k_draft=self.scfg.spec_k_draft)
        else:
            tokens, _, state = dec.decode_block(
                self.params, self.text_table, self.codebook, state,
                jnp.asarray(text_window, jnp.int32), jnp.int32(text_len),
                jnp.int32(limit), self.dcfg, block=block or self.block)
        return PendingTokens(tokens), state

    def decode_block_fused_async(self, state: dec.DecodeState,
                                 text_window: np.ndarray, text_len: int,
                                 limit: int, dump: int,
                                 block: Optional[int] = None
                                 ) -> Tuple[PendingFused, dec.DecodeState]:
        """Dispatch decode + synthesis of the block's first ``dump``
        tokens as one device call (one round trip for the sentence's
        first audio chunk).  ``block`` overrides the block length (the
        scheduler uses a short first block: the first chunk needs only
        ``dump`` tokens)."""
        bucket = self.codec.bucket_for(dump)
        packed, state = _fused_first_block(
            self.params, self.codec.params, self.text_table, self.codebook,
            state, jnp.asarray(text_window, jnp.int32), jnp.int32(text_len),
            jnp.int32(limit), self.dcfg, self.codec.cfg,
            block or self.block, dump, bucket)
        return PendingFused(packed, dump * self.codec.cfg.hop_length), state

    def decode_block(self, state: dec.DecodeState, text_window: np.ndarray,
                     text_len: int, limit: int
                     ) -> Tuple[List[int], dec.DecodeState]:
        """Generate up to ``limit`` (<= block) tokens; returns host tokens."""
        pending, state = self.decode_block_async(state, text_window,
                                                 text_len, limit)
        return pending.fetch(), state

    # -- synthesis -----------------------------------------------------
    def synthesize(self, codes: Sequence[int]) -> bytes:
        """Speech tokens -> raw float32 little-endian PCM bytes @24 kHz."""
        arr = np.asarray(codes, np.int32)[None]
        wav = self.codec.decode_codes(arr)[0]
        return np.asarray(wav, dtype="<f4").tobytes()

    def warmup(self) -> None:
        """Compile decode + all codec buckets before serving traffic."""
        state = self.new_state()
        window = np.full(self.block, self.dcfg.pad_token_id, np.int32)
        # each block program twice: the first call takes the host-made
        # state (default layouts), the second takes the jit-output state
        # whose TPU layouts can differ — i.e. the SECOND executable, the
        # one every mid-sentence follow-up block actually runs.  Without
        # it, the first sentence's second block pays a compile/cache-load
        # (~1.4 s measured on the pool's counterpart program).
        _, state = self.decode_block(state, window, 1, 1)
        self.decode_block(state, window, 1, 1)
        big = self.scfg.decode_block_large
        if big and big != self.block:
            state = self.new_state()
            window = np.full(big, self.dcfg.pad_token_id, np.int32)
            p, state = self.decode_block_async(state, window, 1, 1,
                                               block=big)
            p.fetch()
            p, _ = self.decode_block_async(state, window, 1, 1, block=big)
            p.fetch()
        first = self.scfg.first_decode_block
        if first >= self.block:
            first = 0  # the scheduler only ever shrinks the first call
        if first:
            state = self.new_state()
            window = np.full(first, self.dcfg.pad_token_id, np.int32)
            p, _ = self.decode_block_async(state, window, 1, 1, block=first)
            p.fetch()
        if self.scfg.fused_first_chunk:
            # the dump-ladder sizes a sentence can start with that fit in
            # one decode block all get a compiled fused program, at both
            # first-block lengths the scheduler can pick
            blocks = {self.block}
            if first:
                blocks.add(first)
            fstate = None
            for blk in sorted(blocks):
                d = self.scfg.initial_dump_size_1
                while d <= blk:
                    if first and blk != first and d <= first:
                        # the scheduler routes dumps that fit the short
                        # first block there, never here — don't compile
                        # the unreachable (blk, d) variant
                        d *= self.scfg.dump_growth_factor
                        continue
                    state = self.new_state()
                    window = np.full(blk, self.dcfg.pad_token_id, np.int32)
                    p, fstate = self.decode_block_fused_async(
                        state, window, 1, blk, d, block=blk)
                    p.fetch()
                    d *= self.scfg.dump_growth_factor
            if fstate is not None:
                # a sentence's follow-up block chains on the FUSED
                # program's output state — warm that transition too
                window = np.full(self.block, self.dcfg.pad_token_id,
                                 np.int32)
                p, _ = self.decode_block_async(fstate, window, 1, 1)
                p.fetch()
        self.codec.warmup()

    # -- offline TTS ---------------------------------------------------
    def tts(self, text: str, max_tokens: Optional[int] = None
            ) -> Tuple[np.ndarray, List[int]]:
        """Non-streaming text -> (waveform float32, speech tokens).

        The minimal end-to-end slice (BASELINE config #1): tokenize bytes,
        run the decode loop until EOA or the cap, synthesize in one shot.
        Decode blocks are double-buffered: block i+1 is dispatched before
        block i's tokens are fetched.
        """
        from llmvox_tpu.text.byt5 import ByT5Tokenizer
        cap = max_tokens or self.scfg.max_audio_length
        tok = ByT5Tokenizer()
        ids = tok.encode(text.strip()) + [self.dcfg.text_eos_id]
        text_len = len(ids)
        buf = np.full(text_len + cap + 2 * self.block,
                      self.dcfg.pad_token_id, np.int32)
        buf[:text_len] = ids

        state = self.new_state()
        tokens: List[int] = []
        issued = 0
        pending = None
        while True:
            if issued < cap:
                limit = min(self.block, cap - issued)
                nxt, state = self.decode_block_async(
                    state, buf[issued:issued + self.block], text_len, limit)
                issued += self.block
            else:
                nxt = None
            if pending is not None:
                got = pending.fetch()
                tokens.extend(got)
                if (got and got[-1] == self.dcfg.eoa_token_id) or not got:
                    break
                if len(tokens) >= cap:
                    break
            if nxt is None and pending is None:
                break
            pending = nxt

        if tokens and tokens[-1] == self.dcfg.eoa_token_id:
            synth = tokens[:-1]
        else:
            synth = tokens[:cap]
        if not synth:
            return np.zeros(0, np.float32), tokens
        wav = self.codec.decode_codes(np.asarray(synth, np.int32)[None])[0]
        return wav, tokens
