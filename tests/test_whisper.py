"""JAX Whisper ASR (models/whisper.py) — HF-oracle parity, KV-cache block
decode, the log-mel frontend, and the TPU-hosted ASR adapter.

The reference transcribes voice-chat audio with an HF Whisper pipeline on
CUDA (inference/asr.py:14-168); here the same model family runs on the
TPU behind the identical ``run_asr`` interface, making the voice-chat
stack (ASR + LLM + TTS) single-chip.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from llmvox_tpu.models import whisper as W
from llmvox_tpu.tools.convert import convert_whisper_state_dict

CFG = W.WhisperConfig(vocab_size=100, n_mels=16, d_model=32, enc_layers=2,
                      dec_layers=2, enc_heads=2, dec_heads=2, enc_ffn=64,
                      dec_ffn=64, max_source_positions=30,
                      max_target_positions=32, decoder_start_token_id=98,
                      eos_token_id=99)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import (WhisperConfig as HFConfig,
                              WhisperForConditionalGeneration)
    hf_cfg = HFConfig(
        vocab_size=CFG.vocab_size, num_mel_bins=CFG.n_mels,
        d_model=CFG.d_model, encoder_layers=CFG.enc_layers,
        decoder_layers=CFG.dec_layers,
        encoder_attention_heads=CFG.enc_heads,
        decoder_attention_heads=CFG.dec_heads,
        encoder_ffn_dim=CFG.enc_ffn, decoder_ffn_dim=CFG.dec_ffn,
        max_source_positions=CFG.max_source_positions,
        max_target_positions=CFG.max_target_positions,
        decoder_start_token_id=CFG.decoder_start_token_id,
        eos_token_id=CFG.eos_token_id, pad_token_id=CFG.eos_token_id,
        bos_token_id=CFG.eos_token_id)
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    params = jax.tree.map(jnp.asarray, convert_whisper_state_dict(
        hf.state_dict(), CFG.enc_layers, CFG.dec_layers))
    feat = np.random.default_rng(0).normal(
        size=(2, CFG.n_mels, CFG.n_audio_frames)).astype(np.float32)
    return hf, params, feat


def test_encoder_matches_hf(hf_pair):
    hf, params, feat = hf_pair
    with torch.no_grad():
        want = hf.model.encoder(
            torch.as_tensor(feat)).last_hidden_state.numpy()
    got = np.asarray(W.encode(params, jnp.asarray(feat.transpose(0, 2, 1)),
                              CFG))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_decoder_logits_match_hf(hf_pair):
    """prefill returns logits at EVERY forced-prompt position == the HF
    full forward (cross-KV precompute + self-attn cache write path)."""
    hf, params, feat = hf_pair
    ids = np.random.default_rng(1).integers(0, CFG.vocab_size, (2, 5))
    with torch.no_grad():
        want = hf(torch.as_tensor(feat),
                  decoder_input_ids=torch.as_tensor(ids)).logits.numpy()
    enc = W.encode(params, jnp.asarray(feat.transpose(0, 2, 1)), CFG)
    cross = W.make_cross_kv(params, enc, CFG)
    st = W.init_whisper_decode_state(CFG, 2)
    lg, st = W.prefill(params, jnp.asarray(ids, jnp.int32), st, cross, CFG)
    np.testing.assert_allclose(np.asarray(lg), want, atol=2e-5)
    assert int(st.pos) == 5


def test_greedy_block_decode_matches_hf_loop(hf_pair):
    """decode_block chained on the prefill cache == the torch full-forward
    greedy loop, token for token."""
    hf, params, feat = hf_pair
    ids = np.random.default_rng(2).integers(0, CFG.vocab_size, (2, 4))
    enc = W.encode(params, jnp.asarray(feat.transpose(0, 2, 1)), CFG)
    cross = W.make_cross_kv(params, enc, CFG)
    st = W.init_whisper_decode_state(CFG, 2)
    lg, st = W.prefill(params, jnp.asarray(ids, jnp.int32), st, cross, CFG)
    tok = np.argmax(np.asarray(lg[:, -1]), -1).astype(np.int32)

    tids = np.concatenate([ids, tok[:, None]], 1)
    want = []
    with torch.no_grad():
        for _ in range(6):
            logits = hf(torch.as_tensor(feat),
                        decoder_input_ids=torch.as_tensor(tids)
                        ).logits[:, -1].numpy()
            nxt = np.argmax(logits, -1)
            want.append(nxt)
            tids = np.concatenate([tids, nxt[:, None]], 1)
    toks, _ = W.decode_block(params, jnp.asarray(tok), st, cross, CFG,
                             block=6)
    np.testing.assert_array_equal(np.asarray(toks), np.stack(want, 1))


def test_decode_block_chains_and_freezes_eos(hf_pair):
    """Two chained 3-blocks == one 6-block; and a row whose next token is
    forced to EOS (via suppress of everything else) stays frozen at EOS."""
    hf, params, feat = hf_pair
    ids = np.random.default_rng(3).integers(0, CFG.vocab_size, (2, 3))
    enc = W.encode(params, jnp.asarray(feat.transpose(0, 2, 1)), CFG)
    cross = W.make_cross_kv(params, enc, CFG)

    def run(blocks):
        st = W.init_whisper_decode_state(CFG, 2)
        lg, st = W.prefill(params, jnp.asarray(ids, jnp.int32), st, cross,
                           CFG)
        tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
        out = []
        for b in blocks:
            toks, st = W.decode_block(params, tok, st, cross, CFG, block=b)
            out.append(np.asarray(toks))
            tok = toks[:, -1]
        return np.concatenate(out, 1)

    np.testing.assert_array_equal(run([6]), run([3, 3]))

    # suppress every id except EOS -> first decode step emits EOS, and the
    # row stays EOS for the whole block (sticky done)
    st = W.init_whisper_decode_state(CFG, 2)
    lg, st = W.prefill(params, jnp.asarray(ids, jnp.int32), st, cross, CFG)
    tok = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
    suppress = tuple(i for i in range(CFG.vocab_size)
                     if i != CFG.eos_token_id)
    toks, st = W.decode_block(params, tok, st, cross, CFG, block=4,
                              suppress=suppress)
    assert (np.asarray(toks) == CFG.eos_token_id).all()
    assert np.asarray(st.done).all()
    # frozen rows keep emitting EOS even without suppression
    toks, _ = W.decode_block(params, toks[:, -1], st, cross, CFG, block=2)
    assert (np.asarray(toks) == CFG.eos_token_id).all()


def test_log_mel_matches_hf_feature_extractor():
    """JAX log-mel == the HF WhisperFeatureExtractor numpy path (hann
    STFT, slaney mel bank, the max-8dB clamp), on the real 80-mel/30 s
    geometry."""
    from transformers import WhisperFeatureExtractor
    fe = WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(0)
    audio = (0.5 * np.sin(2 * np.pi * 440 *
                          np.arange(16000 * 2) / 16000)
             + 0.05 * rng.normal(size=16000 * 2)).astype(np.float32)
    want = fe(audio, sampling_rate=16000,
              return_tensors="np").input_features[0]       # (80, 3000)
    cfg = W.WhisperConfig()
    got = np.asarray(W.log_mel(jnp.asarray(W.pad_or_trim(audio, cfg)),
                               cfg))[0]                    # (3000, 80)
    np.testing.assert_allclose(got.T, want, atol=2e-4)


def test_converter_cli_roundtrip(hf_pair, tmp_path):
    """convert_ckpt whisper on a saved HF dir -> npz -> load -> same
    logits as the in-memory conversion."""
    from llmvox_tpu.tools.convert_ckpt import main as convert_main
    from llmvox_tpu.train.checkpoint import load_meta, load_params_npz
    hf, params, feat = hf_pair
    src = tmp_path / "hf"
    hf.save_pretrained(src)
    dst = tmp_path / "whisper.npz"
    convert_main(["whisper", str(src), str(dst)])
    loaded = load_params_npz(str(dst))
    assert load_meta(str(dst))["model_args"]["d_model"] == CFG.d_model
    a = jax.tree.leaves(jax.tree.map(np.asarray, loaded))
    b = jax.tree.leaves(jax.tree.map(np.asarray, params))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


@pytest.fixture(scope="module")
def tiny_whisper_dir(tmp_path_factory):
    from tests.tiny_hf import build_tiny_whisper
    return build_tiny_whisper(str(tmp_path_factory.mktemp("tiny_whisper")))


def _speechish(seed: int, seconds: float = 1.0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    t = np.arange(n) / 16000
    return (0.3 * np.sin(2 * np.pi * 220 * t)
            + 0.2 * np.sin(2 * np.pi * 660 * t)
            + 0.1 * rng.normal(size=n)).astype(np.float32)


def test_jax_asr_matches_hf_pipeline(tiny_whisper_dir):
    """End to end vs the real HF ASR pipeline on the tiny checkpoint:
    auto language detection + transcribe, token-for-token equal text."""
    from transformers import pipeline
    from llmvox_tpu.streams.asr import JAXWhisperASR
    from llmvox_tpu.utils.config import ServeConfig

    audio = _speechish(0)
    pipe = pipeline("automatic-speech-recognition", model=tiny_whisper_dir,
                    device="cpu")
    # num_beams=1: the JAX backend implements greedy decoding (the tiny
    # checkpoint's generation config defaults to beam 5)
    want = pipe({"array": audio, "sampling_rate": 16000},
                generate_kwargs={"task": "transcribe",
                                 "num_beams": 1})["text"]

    asr = JAXWhisperASR(ServeConfig(asr_model=tiny_whisper_dir,
                                    asr_backend="jax"))
    asr.load()
    got = asr.transcribe(audio, task="transcribe", language=None)
    assert got == want


def test_jax_asr_run_asr_translate_routing(tiny_whisper_dir):
    """run_asr: base64 int16 request, task=translate iff source != target
    (the reference's routing), vs the HF pipeline given the same forced
    language + task."""
    import base64
    from transformers import pipeline
    from llmvox_tpu.streams.asr import JAXWhisperASR
    from llmvox_tpu.utils.config import ServeConfig

    audio = _speechish(1)
    pcm = (audio * 32768.0).astype(np.int16)
    b64 = base64.b64encode(pcm.tobytes()).decode()

    # the request path peak-normalizes (reference transcribe_raw gain) and
    # forwards the source language — feed the pipeline the same signal
    y = pcm.astype(np.float32)
    y /= np.max(np.abs(y))
    pipe = pipeline("automatic-speech-recognition", model=tiny_whisper_dir,
                    device="cpu")
    want = pipe({"array": y, "sampling_rate": 16000},
                generate_kwargs={"task": "translate", "language": "en",
                                 "num_beams": 1})["text"].strip()

    asr = JAXWhisperASR(ServeConfig(asr_model=tiny_whisper_dir,
                                    asr_backend="jax",
                                    asr_default_language="english"))
    got = asr.run_asr({"audio_base64": b64, "source_language": "english",
                       "target_language": "german"})
    assert got == want


def test_transcribe_file_loads_resamples_normalizes(tiny_whisper_dir,
                                                    tmp_path):
    """File-path transcription (reference ASR.transcribe,
    inference/asr.py:88-111): WAV load, resample to the ASR rate,
    peak-normalize, same text as transcribing the loaded audio."""
    from llmvox_tpu.streams.asr import JAXWhisperASR, load_asr_audio
    from llmvox_tpu.utils.audio import write_wav
    from llmvox_tpu.utils.config import ServeConfig

    audio24 = _speechish(5)          # pretend it's 24 kHz material
    path = str(tmp_path / "clip.wav")
    write_wav(path, 0.5 * audio24, 24000)
    y = load_asr_audio(path, 16000)
    assert abs(len(y) - len(audio24) * 16000 // 24000) <= 2
    assert abs(float(np.max(np.abs(y))) - 1.0) < 1e-6   # peak-normalized

    asr = JAXWhisperASR(ServeConfig(asr_model=tiny_whisper_dir,
                                    asr_backend="jax"))
    asr.load()
    assert (asr.transcribe_file(path, language="en")
            == asr.transcribe(y, task="transcribe", language="en"))


def test_transcribe_batch_matches_sequential(tiny_whisper_dir):
    """Batched N-utterance transcription (one program chain, per-row
    language detection + EOS freeze) == per-utterance transcribe."""
    from llmvox_tpu.streams.asr import JAXWhisperASR
    from llmvox_tpu.utils.config import ServeConfig
    asr = JAXWhisperASR(ServeConfig(asr_model=tiny_whisper_dir,
                                    asr_backend="jax"))
    asr.load()
    audios = [_speechish(0), _speechish(3, 0.5), _speechish(4, 1.5)]
    want = [asr.transcribe(a, task="transcribe", language=None)
            for a in audios]
    got = asr.transcribe_batch(audios, task="transcribe", language=None)
    assert got == want


def test_voicechat_endpoint_with_jax_asr(tiny_whisper_dir):
    """The TPU-hosted ASR behind the real HTTP /voicechat endpoint: POST
    base64 PCM -> JAX Whisper transcription -> scripted LLM -> streamed
    audio (the full-TPU voice-chat wiring through serve/server.py)."""
    import asyncio
    import base64
    import dataclasses
    import socket
    import threading
    import time

    from llmvox_tpu.serve.client import collect_audio, stream_request
    from llmvox_tpu.serve.scheduler import StreamingScheduler
    from llmvox_tpu.serve.server import TTSServer
    from llmvox_tpu.streams.asr import JAXWhisperASR
    from llmvox_tpu.streams.scripted import ScriptedStream
    from tests.test_server import _free_port
    from tests.tiny_stack import SERVE_CFG, make_engines

    port = _free_port()
    cfg = dataclasses.replace(SERVE_CFG, api_host="127.0.0.1", api_port=port,
                              asr_model=tiny_whisper_dir, asr_backend="jax")
    engines = make_engines(0, cfg)
    scheduler = StreamingScheduler(engines, cfg)
    stream_model = ScriptedStream(["A reply to the voice query."],
                                  eos_token=cfg.eos_token)
    asr = JAXWhisperASR(cfg)
    asr.load()
    srv = TTSServer(scheduler, cfg, stream_model=stream_model,
                    asr_model=asr)
    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(srv.serve())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    try:
        for _ in range(100):
            try:
                with socket.create_connection(("127.0.0.1", port),
                                              timeout=0.2):
                    break
            except OSError:
                time.sleep(0.1)
        pcm = (_speechish(2) * 32768.0).astype(np.int16)
        wav, _ = collect_audio(stream_request(
            "127.0.0.1", port, "/voicechat",
            {"audio_base64": base64.b64encode(pcm.tobytes()).decode(),
             "source_language": "english", "target_language": "english"},
            timeout=300))
        assert len(wav) > 0 and np.isfinite(wav).all()
    finally:
        srv.shutdown()
        t.join(timeout=10)
        loop.close()


def test_transcribe_long_windows_beyond_30s(tiny_whisper_dir):
    """Long-form (>30 s) audio transcribes ALL windows through one
    batched chain and joins texts — where the reference pipeline
    silently truncates at the 30 s model window."""
    from llmvox_tpu.streams.asr import JAXWhisperASR
    from llmvox_tpu.utils.config import ServeConfig
    asr = JAXWhisperASR(ServeConfig(asr_model=tiny_whisper_dir,
                                    asr_backend="jax"))
    asr.load()
    win = asr.cfg.n_audio_frames * asr.cfg.hop_length
    audio = np.concatenate([_speechish(9, 31.0)])   # ~31 s -> 2 windows
    want = [asr.transcribe(audio[:win], language="en"),
            asr.transcribe(audio[win:], language="en")]
    got = asr.transcribe_long(audio, language="en")
    assert got == " ".join(t.strip() for t in want if t.strip())
    # the cap truncates before windowing (run_asr semantics)
    capped = asr.transcribe_long(audio, language="en", max_seconds=20.0)
    assert capped == asr.transcribe(audio[: 16000 * 20], language="en")


def test_jax_asr_serves_from_converted_npz(tiny_whisper_dir, tmp_path):
    """convert_ckpt whisper -> .npz is a first-class serving artifact:
    JAXWhisperASR loads it (weights + generation metadata, tokenizer via
    the recorded source) and transcribes identically to the HF-dir
    load path."""
    from llmvox_tpu.streams.asr import JAXWhisperASR
    from llmvox_tpu.tools.convert_ckpt import main as convert_main
    from llmvox_tpu.utils.config import ServeConfig

    npz = str(tmp_path / "w.npz")
    convert_main(["whisper", tiny_whisper_dir, npz])
    audio = _speechish(6)
    a_dir = JAXWhisperASR(ServeConfig(asr_model=tiny_whisper_dir,
                                      asr_backend="jax"))
    a_npz = JAXWhisperASR(ServeConfig(asr_model=npz, asr_backend="jax"))
    a_dir.load()
    a_npz.load()
    assert a_npz.suppress == a_dir.suppress
    assert a_npz.lang_to_id == a_dir.lang_to_id
    assert (a_npz.transcribe(audio, language="en")
            == a_dir.transcribe(audio, language="en"))


def test_suppress_tokens_dont_crash_and_mask(tiny_whisper_dir):
    """Real checkpoints ship suppress_tokens; masking them must not
    mutate a read-only device-array view (regression), and a suppressed
    id must never be emitted."""
    from llmvox_tpu.streams.asr import JAXWhisperASR
    from llmvox_tpu.utils.config import ServeConfig
    asr = JAXWhisperASR(ServeConfig(asr_model=tiny_whisper_dir,
                                    asr_backend="jax"))
    asr.load()
    audio = _speechish(7)
    base = asr.transcribe(audio, language="en")
    # token 40 ('I') dominates this tiny model's greedy output
    forty = asr.tokenizer.convert_tokens_to_ids("I")
    asr.suppress = (forty,)
    asr.begin_suppress = (forty,)
    got = asr.transcribe(audio, language="en")
    assert "I" not in got and got != base
    batch = asr.transcribe_batch([audio, _speechish(8)], language="en")
    assert all("I" not in t for t in batch)


def test_build_asr_backend_selection():
    from llmvox_tpu.streams.asr import JAXWhisperASR, WhisperASR, build_asr
    from llmvox_tpu.utils.config import ServeConfig
    assert isinstance(build_asr(ServeConfig()), WhisperASR)
    assert isinstance(build_asr(ServeConfig(asr_backend="jax")),
                      JAXWhisperASR)


def test_transcribe_stream_matches_batch_path(tiny_whisper_dir):
    """Streaming transcription (VERDICT r3 #3): the pipelined
    block-by-block generator ends with done=True and its final text
    equals the INDEPENDENT batched path's for the same audio (greedy
    decode — every yielded prefix is final)."""
    from llmvox_tpu.streams.asr import JAXWhisperASR
    from llmvox_tpu.utils.config import ServeConfig

    asr = JAXWhisperASR(ServeConfig(asr_model=tiny_whisper_dir,
                                    asr_backend="jax"))
    asr.load()
    audio = _speechish(5)
    updates = list(asr.transcribe_stream(audio, language="english"))
    assert len(updates) >= 1
    texts, dones = zip(*updates)
    assert dones[-1] is True and not any(dones[:-1])
    want = asr.transcribe_batch([audio], language="english")[0]
    assert texts[-1] == want
    assert asr.stream_supported(audio)
    assert not asr.stream_supported(np.zeros(16000 * 31, np.float32))


def test_transcribe_stream_async_bridge(tiny_whisper_dir):
    """The asyncio bridge yields the same updates as the sync generator
    without blocking the loop."""
    import asyncio

    from llmvox_tpu.streams.asr import JAXWhisperASR
    from llmvox_tpu.utils.config import ServeConfig

    asr = JAXWhisperASR(ServeConfig(asr_model=tiny_whisper_dir,
                                    asr_backend="jax"))
    asr.load()
    audio = _speechish(6)
    want = list(asr.transcribe_stream(audio, language="english"))

    async def go():
        out = []
        ticks = 0

        async def ticker():
            nonlocal ticks
            while True:
                ticks += 1
                await asyncio.sleep(0.001)

        t = asyncio.ensure_future(ticker())
        async for item in asr.transcribe_stream_async(audio,
                                                      language="english"):
            out.append(item)
        t.cancel()
        return out, ticks

    got, ticks = asyncio.run(asyncio.wait_for(go(), timeout=300))
    assert got == want
    assert ticks > 0          # the loop stayed live during device work


def test_voicechat_overlapped_matches_serial(tiny_whisper_dir):
    """/voicechat through the OVERLAPPED path (JAX ASR partial
    transcripts streaming into the pooled LLM's prefill) returns
    byte-identical audio to the serial path — overlap changes timing,
    never results."""
    import asyncio
    import base64
    import dataclasses
    import socket
    import threading
    import time

    import jax

    from llmvox_tpu.models import llama
    from llmvox_tpu.serve.client import collect_audio, stream_request
    from llmvox_tpu.serve.llm_pool import LLMPool
    from llmvox_tpu.serve.scheduler import StreamingScheduler
    from llmvox_tpu.serve.server import TTSServer
    from llmvox_tpu.streams.asr import JAXWhisperASR
    from llmvox_tpu.streams.jax_llm import PooledJAXStreamModel
    from tests.test_llama import _ToyTokenizer
    from tests.test_server import _free_port
    from tests.tiny_stack import SERVE_CFG, make_engines

    # max_seq_len 384: SERVE_CFG's ~150-token system prompt + transcript
    # must FIT the context cap so this exercises the true overlap path
    # (over-cap prompts degrade to the plain path by design — that
    # fallback is unit-tested at the adapter level)
    lcfg = llama.LlamaConfig(vocab_size=128, n_layer=2, n_head=4,
                             n_kv_head=2, n_embd=32, intermediate_size=64,
                             max_seq_len=384)
    lparams = llama.init_llama_params(jax.random.PRNGKey(0), lcfg)
    pcm = (_speechish(7) * 32768.0).astype(np.int16)
    body = {"audio_base64": base64.b64encode(pcm.tobytes()).decode(),
            "source_language": "english", "target_language": "english"}

    def run_server(overlap: bool) -> np.ndarray:
        port = _free_port()
        cfg = dataclasses.replace(
            SERVE_CFG, api_host="127.0.0.1", api_port=port,
            asr_model=tiny_whisper_dir, asr_backend="jax",
            s2s_overlap=overlap)
        engines = make_engines(0, cfg)
        scheduler = StreamingScheduler(engines, cfg)
        pool = LLMPool(lparams, lcfg, capacity=2, block=4,
                       prefill_buckets=(8, 16, 32))
        stream_model = PooledJAXStreamModel(pool, _ToyTokenizer(),
                                            max_tokens=10,
                                            eos_text=cfg.eos_token)
        asr = JAXWhisperASR(cfg)
        asr.load()
        srv = TTSServer(scheduler, cfg, stream_model=stream_model,
                        asr_model=asr)
        loop = asyncio.new_event_loop()

        def run():
            asyncio.set_event_loop(loop)
            loop.run_until_complete(srv.serve())

        t = threading.Thread(target=run, daemon=True)
        t.start()
        try:
            for _ in range(100):
                try:
                    with socket.create_connection(("127.0.0.1", port),
                                                  timeout=0.2):
                        break
                except OSError:
                    time.sleep(0.1)
            wav, _ = collect_audio(stream_request(
                "127.0.0.1", port, "/voicechat", body, timeout=300))
            return wav
        finally:
            loop.call_soon_threadsafe(pool.stop)
            srv.shutdown()
            t.join(timeout=10)
            loop.close()

    wav_overlap = run_server(True)
    wav_serial = run_server(False)
    assert len(wav_overlap) > 0 and np.isfinite(wav_overlap).all()
    np.testing.assert_array_equal(wav_overlap, wav_serial)


def test_ctx_bucket_stream_matches_full_window(tiny_whisper_dir):
    """Encoder-context bucketing (whisper.cpp audio_ctx trick, VERDICT
    r4 #3): a short utterance transcribed in its small bucket yields the
    same text as the full 30 s window on the tiny model, and the bucket
    chooser picks the smallest rung that holds the utterance."""
    from llmvox_tpu.streams.asr import JAXWhisperASR
    from llmvox_tpu.utils.config import ServeConfig

    audio = _speechish(7, seconds=2.0)

    full = JAXWhisperASR(ServeConfig(asr_model=tiny_whisper_dir,
                                     asr_backend="jax",
                                     asr_ctx_buckets=()))
    full.load()
    want = full.transcribe(audio)

    buck = JAXWhisperASR(ServeConfig(asr_model=tiny_whisper_dir,
                                     asr_backend="jax",
                                     asr_ctx_buckets=(600, 1200, 3000)))
    buck.load()
    # 2 s utterance = 200 mel frames + 50 slack -> bucket 600
    assert buck._pick_ctx(len(audio)) == 600
    # 11 s -> 1100 frames + 50 -> bucket 1200; 29 s -> full window (None)
    assert buck._pick_ctx(11 * 16000) == 1200
    assert buck._pick_ctx(29 * 16000) is None
    got = buck.transcribe(audio)
    assert got == want

    # streaming emits monotonic prefixes and the same final text
    texts = list(buck.transcribe_stream(audio))
    assert texts[-1][1] is True
    assert texts[-1][0] == want


def test_ctx_bucket_verify_reruns_full_window(tiny_whisper_dir):
    """asr_ctx_verify: the final yield re-transcribes at the full window
    (PromptRestart-style degrade) — equal text in the stable case, and
    the bucket ladder is restored afterwards."""
    from llmvox_tpu.streams.asr import JAXWhisperASR
    from llmvox_tpu.utils.config import ServeConfig

    audio = _speechish(9, seconds=1.5)
    asr = JAXWhisperASR(ServeConfig(asr_model=tiny_whisper_dir,
                                    asr_backend="jax",
                                    asr_ctx_buckets=(600, 3000),
                                    asr_ctx_verify=True))
    asr.load()
    final = [t for t, _ in asr.transcribe_stream(audio)][-1]
    assert asr.ctx_buckets == (600, 3000)    # restored after verify

    ref = JAXWhisperASR(ServeConfig(asr_model=tiny_whisper_dir,
                                    asr_backend="jax",
                                    asr_ctx_buckets=()))
    ref.load()
    assert final == ref.transcribe(audio)


def test_asr_warmup_compiles_every_bucket(tiny_whisper_dir):
    """warmup() must REACH each bucket (an unwarmed bucket pays compile
    on the first live utterance of that length)."""
    from llmvox_tpu.streams.asr import JAXWhisperASR
    from llmvox_tpu.utils.config import ServeConfig

    asr = JAXWhisperASR(ServeConfig(asr_model=tiny_whisper_dir,
                                    asr_backend="jax",
                                    asr_ctx_buckets=(600, 1200)))
    asr.load()
    picked = []
    orig = asr._pick_ctx
    asr._pick_ctx = lambda n: picked.append(orig(n)) or orig(n)
    asr.warmup()
    # ladder = (600, 1200, 3000-full); full rung reports as None
    assert picked == [600, 1200, None]
