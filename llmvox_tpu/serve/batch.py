"""Multi-stream batched TTS: N concurrent dialogues in one decode program.

BASELINE config #5.  The reference parallelizes by pinning one replica per
GPU (streaming_server.py:163-169); on TPU the winning layout is a single
batched program: every decode step reads the 30M decoder weights once for
all streams (per-stream HBM cost collapses by ~B), KV caches are batched,
and ragged chunk synthesis shares one compiled bucket program via
per-batch valid-length masking.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llmvox_tpu.codec.codec import WavCodec
from llmvox_tpu.models import decoder as dec
from llmvox_tpu.text.byt5 import ByT5Tokenizer
from llmvox_tpu.utils.config import DecoderConfig, ServeConfig


def make_sharded_decode(cfg: DecoderConfig, block: int, mesh):
    """Multi-chip batched decode: streams shard over the mesh's dp axis.

    ``shard_map`` runs the full per-shard decode program (including the
    Pallas attention kernels, which custom-call GSPMD cannot partition on
    its own) on each chip's slice of the stream batch; weights replicate,
    KV caches shard on the stream axis, and no collectives are needed —
    streams are independent.  This is the TPU answer to "more concurrent
    dialogues": one program over an ICI mesh instead of the reference's
    one-replica-per-GPU processes (streaming_server.py:163-169).
    """
    import functools
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P
    from llmvox_tpu.parallel.mesh import DP_AXIS

    rep = P()
    bsh = P(DP_AXIS)
    state_specs = dec.DecodeState(
        k_cache=P(None, DP_AXIS, None, None),
        v_cache=P(None, DP_AXIS, None, None),
        pos=bsh, prev_token=bsh, done=bsh)

    fn = functools.partial(dec.decode_block_batch, cfg=cfg, block=block)

    def wrapped(params, table, codebook, states, windows, text_lens, limits):
        return fn(params, table, codebook, states, windows, text_lens,
                  limits)

    kwargs = dict(mesh=mesh,
                  in_specs=(rep, rep, rep, state_specs, P(DP_AXIS, None),
                            bsh, bsh),
                  out_specs=(P(DP_AXIS, None), bsh, state_specs))
    # the per-shard program mixes shard-varying carries with replicated
    # constants (and pallas custom calls), so the replication/vma checker
    # must be off — flag name depends on the jax version
    try:
        return jax.jit(shard_map(wrapped, check_vma=False, **kwargs))
    except TypeError:
        return jax.jit(shard_map(wrapped, check_rep=False, **kwargs))


class BatchTTS:
    """Fixed-capacity batched decoder + codec for multi-stream synthesis."""

    def __init__(self, decoder_params: Dict, text_table: np.ndarray,
                 codec: WavCodec, max_streams: int = 8,
                 dcfg: Optional[DecoderConfig] = None,
                 scfg: Optional[ServeConfig] = None,
                 device: Optional[jax.Device] = None,
                 cache_dtype=jnp.bfloat16, param_dtype=None,
                 block: Optional[int] = None, mesh=None):
        self.dcfg = dcfg or DecoderConfig()
        self.scfg = scfg or ServeConfig()
        self.codec = codec
        self.B = max_streams
        # Offline batch synthesis favors throughput over EOA-detection
        # granularity: larger blocks amortize the per-call host round-trip
        # (block 32 -> 128 measured 0.65s -> 0.28s for 8x512 tokens over a
        # tunneled chip).  Streaming paths keep scfg.decode_block.
        self.block = block if block is not None else self.scfg.decode_block
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
        self.tokenizer = ByT5Tokenizer()
        self.mesh = mesh
        self._sharded = None
        if mesh is not None:
            dp = mesh.shape[next(iter(mesh.axis_names))]
            assert self.B % dp == 0, (
                f"{self.B} streams not divisible over {dp}-way dp mesh")
            self._sharded = make_sharded_decode(self.dcfg, self.block, mesh)

    def decode_batch(self, states: dec.DecodeState, windows: np.ndarray,
                     text_lens: np.ndarray, limits: np.ndarray
                     ) -> Tuple[np.ndarray, dec.DecodeState]:
        if self._sharded is not None:
            tokens, _, states = self._sharded(
                self.params, self.text_table, self.codebook, states,
                jnp.asarray(windows, jnp.int32),
                jnp.asarray(text_lens, jnp.int32),
                jnp.asarray(limits, jnp.int32))
            return tokens, states
        tokens, _, states = dec.decode_block_batch(
            self.params, self.text_table, self.codebook, states,
            jnp.asarray(windows, jnp.int32), jnp.asarray(text_lens, jnp.int32),
            jnp.asarray(limits, jnp.int32), self.dcfg, block=self.block)
        return tokens, states

    def tts_batch(self, texts: List[str],
                  max_tokens: Optional[int] = None,
                  pipeline_depth: int = 4) -> List[np.ndarray]:
        """Synthesize up to ``max_streams`` texts concurrently.

        Per stream, semantics match TTSEngine.tts: byte-tokenize + 385,
        greedy decode until EOA or cap, then one ragged batched codec
        decode for all streams.

        ``pipeline_depth`` decode blocks are kept in flight before each
        host fetch: blocks chain state on-device, so dispatch never waits
        on a result, and the per-block host round-trip (~30 ms over a
        tunneled chip — 2x the block's device time) is paid once per
        ``depth`` blocks instead of once per block.  The only cost is up
        to ``depth - 1`` speculative blocks decoded after every stream
        has already emitted EOA.
        """
        assert len(texts) <= self.B
        cap = max_tokens or self.scfg.max_audio_length
        b = len(texts)
        ids = [self.tokenizer.encode(t.strip()) + [self.dcfg.text_eos_id]
               for t in texts]
        text_lens = np.asarray([len(i) for i in ids], np.int32)
        buflen = int(text_lens.max()) + cap + 2 * self.block
        buf = np.full((b, buflen), self.dcfg.pad_token_id, np.int32)
        for i, seq in enumerate(ids):
            buf[i, : len(seq)] = seq

        from collections import deque
        states = dec.init_decode_state_batch(self.dcfg, b, self.cache_dtype)
        tokens_out: List[List[int]] = [[] for _ in range(b)]
        issued = 0
        pending: deque = deque()
        while True:
            while issued < cap and len(pending) < max(1, pipeline_depth):
                windows = buf[:, issued: issued + self.block]
                limits = np.full((b,), min(self.block, cap - issued),
                                 np.int32)
                tok_dev, states = self.decode_batch(states, windows,
                                                    text_lens, limits)
                issued += self.block
                pending.append(tok_dev)
            if not pending:
                break
            toks = np.asarray(pending.popleft())
            done_all = True
            for i in range(b):
                row = [int(t) for t in toks[i] if t >= 0]
                if row and (not tokens_out[i]
                            or tokens_out[i][-1] != self.dcfg.eoa_token_id):
                    tokens_out[i].extend(row)
                if not (tokens_out[i]
                        and tokens_out[i][-1] == self.dcfg.eoa_token_id):
                    done_all = False
            if done_all:
                break

        synth = []
        for seq in tokens_out:
            if seq and seq[-1] == self.dcfg.eoa_token_id:
                seq = seq[:-1]
            synth.append(seq[:cap])
        lengths = np.asarray([max(len(s), 1) for s in synth], np.int32)
        lmax = int(lengths.max())
        codes = np.zeros((b, lmax), np.int32)
        for i, seq in enumerate(synth):
            codes[i, : len(seq)] = seq
        wavs = self.codec.decode_codes_ragged(codes, lengths)
        return [w if synth[i] else np.zeros(0, np.float32)
                for i, w in enumerate(wavs)]
