"""Multi-stream batched decode tests: batched == per-stream results."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from llmvox_tpu.codec.codec import WavCodec
from llmvox_tpu.models import decoder as dec
from llmvox_tpu.serve.batch import BatchTTS

from tests.tiny_stack import CODEC_CFG, DEC_CFG, SERVE_CFG, make_engines


@pytest.mark.slow
def test_decode_block_batch_matches_single():
    eng = make_engines(0, SERVE_CFG, n=1)[0]
    rng = np.random.default_rng(1)
    b = 3
    windows = rng.integers(0, 30, (b, eng.block)).astype(np.int32)
    text_lens = np.asarray([4, 8, 2], np.int32)
    limits = np.asarray([8, 5, 8], np.int32)

    states = dec.init_decode_state_batch(DEC_CFG, b, jnp.float32)
    toks_b, _, _ = dec.decode_block_batch(
        eng.params, eng.text_table, eng.codebook, states,
        jnp.asarray(windows), jnp.asarray(text_lens), jnp.asarray(limits),
        DEC_CFG, block=eng.block)
    toks_b = np.asarray(toks_b)

    for i in range(b):
        st = dec.init_decode_state(DEC_CFG, jnp.float32)
        toks, _, _ = dec.decode_block(
            eng.params, eng.text_table, eng.codebook, st,
            jnp.asarray(windows[i]), jnp.int32(text_lens[i]),
            jnp.int32(limits[i]), DEC_CFG, block=eng.block)
        np.testing.assert_array_equal(toks_b[i], np.asarray(toks))


@pytest.mark.slow
def test_ragged_batched_codec_decode_matches_exact():
    eng = make_engines(0, SERVE_CFG, n=1)[0]
    codec: WavCodec = eng.codec
    rng = np.random.default_rng(2)
    lengths = np.asarray([5, 11, 3], np.int32)
    codes = np.zeros((3, 11), np.int32)
    for i, n in enumerate(lengths):
        codes[i, :n] = rng.integers(0, CODEC_CFG.vq_bins, n)
    wavs = codec.decode_codes_ragged(codes, lengths)
    for i, n in enumerate(lengths):
        exact = codec.decode_codes(codes[i: i + 1, :n], pad_to_bucket=False)
        assert wavs[i].shape == (n * CODEC_CFG.hop_length,)
        np.testing.assert_allclose(wavs[i], exact[0], atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_tts_batch_matches_single_stream_tts():
    eng = make_engines(0, SERVE_CFG, n=1)[0]
    batch = BatchTTS(eng.params, np.asarray(eng.text_table), eng.codec,
                     max_streams=4, dcfg=DEC_CFG, scfg=SERVE_CFG,
                     cache_dtype=jnp.float32)
    texts = ["Hello there.", "A different longer sentence here.", "Hi."]
    wavs = batch.tts_batch(texts, max_tokens=24)
    singles = [eng.tts(t, max_tokens=24) for t in texts]
    for i, (wav, (swav, stoks)) in enumerate(zip(wavs, singles)):
        assert wav.shape == swav.shape, f"stream {i}"
        np.testing.assert_allclose(wav, swav, atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_sharded_batch_matches_unsharded():
    """Streams sharded over a dp mesh decode identically to one chip."""
    from llmvox_tpu.parallel import create_mesh
    eng = make_engines(0, SERVE_CFG, n=1)[0]
    texts = [f"stream number {i} says something." for i in range(8)]

    def make(mesh=None):
        return BatchTTS(eng.params, np.asarray(eng.text_table), eng.codec,
                        max_streams=8, dcfg=DEC_CFG, scfg=SERVE_CFG,
                        cache_dtype=jnp.float32, mesh=mesh)

    ref = make().tts_batch(texts, max_tokens=12)
    got = make(create_mesh(dp_size=4, tp_size=1)).tts_batch(
        texts, max_tokens=12)
    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)
