"""Golden regression anchors (SURVEY §4 item b): fixed seeds + fixed
inputs must keep producing the same waveform/logit values across code
changes.  The values were captured from the CPU build on 2026-08-16; a
legitimate numerical change (e.g. a jax upgrade) may require
regenerating them — an UNINTENDED change to decode math must not slip
through silently.
"""
import numpy as np
import jax
import jax.numpy as jnp

from llmvox_tpu.codec.codec import WavCodec, init_codec_params
from llmvox_tpu.models import decoder as dec

from tests.tiny_stack import CODEC_CFG, DEC_CFG

GOLD_WAV_64_72 = np.array(
    [-0.00071269, -0.00138509, 0.00525481, 0.01789602, 0.01238939,
     -0.00470402, -0.00181157, -0.00708952], np.float32)
# regenerated 2026-08-16: the ConvNeXt stack init decorrelation (fold_in
# of the group index) legitimately changed seed-7 init values
GOLD_LOGITS_LAST6 = np.array(
    [-0.16990805, 0.10210532, 0.08495979, 0.04162084, -0.08015186,
     0.1314225], np.float32)


def test_golden_codec_waveform():
    codec = WavCodec(init_codec_params(jax.random.PRNGKey(7), CODEC_CFG),
                     CODEC_CFG, buckets=(8,))
    codes = np.arange(8, dtype=np.int32)[None] % CODEC_CFG.vq_bins
    wav = codec.decode_codes(codes, pad_to_bucket=False)
    assert wav.shape == (1, 8 * CODEC_CFG.hop_length)
    np.testing.assert_allclose(wav[0, 64:72], GOLD_WAV_64_72,
                               atol=1e-6, rtol=1e-5)


def test_golden_decoder_logits():
    params = dec.init_decoder_params(jax.random.PRNGKey(7), DEC_CFG)
    emb = jnp.asarray(np.linspace(-1, 1, 2 * 6 * DEC_CFG.n_embd,
                                  dtype=np.float32).reshape(2, 6, -1))
    logits = np.asarray(dec.apply_decoder(params, emb, DEC_CFG))
    np.testing.assert_allclose(logits[1, -1, :6], GOLD_LOGITS_LAST6,
                               atol=1e-6, rtol=1e-5)
