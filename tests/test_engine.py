"""Offline TTS engine tests (BASELINE config #1 semantics)."""
import numpy as np
import jax.numpy as jnp

from tests.tiny_stack import CODEC_CFG, DEC_CFG, SERVE_CFG, make_engines


def test_tts_offline_end_to_end_deterministic():
    eng = make_engines(0, SERVE_CFG, n=1)[0]
    wav1, toks1 = eng.tts("Hello world.", max_tokens=24)
    wav2, toks2 = eng.tts("Hello world.", max_tokens=24)
    assert toks1 == toks2
    np.testing.assert_array_equal(wav1, wav2)
    # cap respected; audio length = tokens * hop
    n_synth = len(toks1) - (1 if toks1 and toks1[-1] == DEC_CFG.eoa_token_id
                            else 0)
    assert len(wav1) == min(n_synth, 24) * CODEC_CFG.hop_length
    assert np.isfinite(wav1).all()


def test_tts_pipelining_matches_blockwise_reference():
    """The double-buffered tts() must produce the same tokens as a naive
    sequential decode loop."""
    eng = make_engines(1, SERVE_CFG, n=1)[0]
    text = "Sequential check."
    _, toks = eng.tts(text, max_tokens=20)

    # naive loop
    from llmvox_tpu.text.byt5 import ByT5Tokenizer
    ids = ByT5Tokenizer().encode(text.strip()) + [DEC_CFG.text_eos_id]
    buf = np.full(200, DEC_CFG.pad_token_id, np.int32)
    buf[:len(ids)] = ids
    state = eng.new_state()
    ref = []
    while len(ref) < 20:
        pos = int(state.pos)
        got, state = eng.decode_block(state, buf[pos:pos + eng.block],
                                      len(ids), min(eng.block, 20 - len(ref)))
        ref.extend(got)
        if not got or (got and got[-1] == DEC_CFG.eoa_token_id):
            break
    assert toks == ref


def test_warmup_handles_first_block_smaller_than_initial_dump():
    """first_decode_block < initial_dump_size_1 leaves the short block's
    fused ladder empty; warmup must not crash (engine.py warmup)."""
    import dataclasses
    from tests.tiny_stack import SERVE_CFG, make_engines
    scfg = dataclasses.replace(SERVE_CFG, first_decode_block=2)
    assert scfg.initial_dump_size_1 > 2
    eng = make_engines(scfg=scfg, n=1)[0]
    eng.warmup()
    wav, toks = eng.tts("hi")
    assert len(toks) > 0 and wav.size > 0
