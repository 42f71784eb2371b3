"""Shared tiny end-to-end stack (random weights) for scheduler/server/e2e
tests: a 2-layer decoder + small codec wired into TTSEngine replicas."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from llmvox_tpu.codec.codec import WavCodec, init_codec_params
from llmvox_tpu.models import decoder as dec
from llmvox_tpu.serve.engine import TTSEngine
from llmvox_tpu.utils.config import CodecConfig, DecoderConfig, ServeConfig

DEC_CFG = DecoderConfig(
    n_layer=2, n_head=2, n_embd=32, block_size=256, vocab_size=16,
    bias=False, text_embed_dim=12, speech_embed_dim=20,
    text_vocab_size=386, pad_token_id=384, text_eos_id=385,
    eoa_token_id=999)  # EOA outside vocab: sentences end via the length cap

CODEC_CFG = CodecConfig(
    vq_bins=16, vq_dim=20, backbone_input_channels=20, backbone_dim=64,
    backbone_intermediate_dim=192, backbone_num_layers=2,
    n_fft=128, hop_length=32)

# Tiny engines use random weights whose EOA (999) is outside the vocab, so
# sentences terminate via the length cap (with a trained model EOA fires
# first, like the reference).  max_audio_length < max_dump_size keeps the
# cap reachable after the first dumps (dumping resets the buffer), so test
# sentences stay ~15 tokens.
SERVE_CFG = ServeConfig(
    initial_dump_size_1=4, initial_dump_size_2=8, max_dump_size=16,
    max_audio_length=10, decode_block=8,
    chunk_buckets=(4, 8, 16, 32))


def make_engines(seed: int = 0, scfg: ServeConfig = SERVE_CFG, n: int = 2):
    rng = np.random.default_rng(seed)
    params = jax.device_get(
        dec.init_decoder_params(jax.random.PRNGKey(seed), DEC_CFG))
    params = jax.tree.map(
        lambda x: x + 0.05 * rng.standard_normal(x.shape).astype(np.float32),
        params)
    text_table = rng.standard_normal(
        (DEC_CFG.text_vocab_size, DEC_CFG.text_embed_dim)).astype(np.float32)
    codec_params = init_codec_params(jax.random.PRNGKey(seed + 1), CODEC_CFG)
    engines = []
    for _ in range(n):
        codec = WavCodec(codec_params, CODEC_CFG, buckets=scfg.chunk_buckets)
        engines.append(TTSEngine(params, text_table, codec, DEC_CFG, scfg,
                                 cache_dtype=jnp.float32))
    return engines
