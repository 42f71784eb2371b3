"""End-to-end HTTP test: server + scheduler + engines + streaming client."""
import asyncio
import socket
import threading
import time

import numpy as np
import pytest

from llmvox_tpu.serve.client import collect_audio, stream_request
from llmvox_tpu.serve.scheduler import StreamingScheduler
from llmvox_tpu.serve.server import TTSServer
from llmvox_tpu.streams.scripted import ScriptedStream
import dataclasses

from tests.tiny_stack import SERVE_CFG, make_engines


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def server():
    port = _free_port()
    cfg = dataclasses.replace(SERVE_CFG, api_host="127.0.0.1", api_port=port)
    engines = make_engines(0, cfg)
    scheduler = StreamingScheduler(engines, cfg)
    stream_model = ScriptedStream(["Answer sentence one.", "And two."],
                                  eos_token=cfg.eos_token)
    srv = TTSServer(scheduler, cfg, stream_model=stream_model)

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(srv.serve())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(100):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.2):
                break
        except OSError:
            time.sleep(0.1)
    yield ("127.0.0.1", port)
    srv.shutdown()
    t.join(timeout=10)
    loop.close()


def test_root_endpoint(server):
    import http.client
    import json
    host, port = server
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request("GET", "/")
    resp = conn.getresponse()
    assert resp.status == 200
    info = json.loads(resp.read())
    assert "Streaming TTS" in info["message"]


def test_demo_page_served(server):
    """GET /demo returns the browser demo UI (streaming fetch + WebAudio
    — the web counterpart of the reference's Qt demo)."""
    import http.client
    host, port = server
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request("GET", "/demo")
    resp = conn.getresponse()
    assert resp.status == 200
    assert "text/html" in resp.getheader("Content-Type", "")
    page = resp.read().decode()
    assert "<html" in page and "AudioContext" in page and "/tts" in page


def test_tts_endpoint_streams_float32_audio(server):
    host, port = server
    wav, stamps = collect_audio(
        stream_request(host, port, "/tts", {"text": "hi"}, timeout=300))
    assert len(wav) > 0
    assert np.isfinite(wav).all()
    # both scheduler chunks arrived (4 + 8 tokens x 32-sample hop); the
    # network layer may coalesce them into one read
    assert len(wav) == 12 * 32


def test_stats_endpoint_reports_traces(server):
    import http.client
    import json
    host, port = server
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request("GET", "/stats")
    resp = conn.getresponse()
    stats = json.loads(resp.read())
    assert len(stats["requests"]) >= 1
    assert "first_audio" in stats["requests"][-1]


def test_unknown_path_404(server):
    import http.client
    host, port = server
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request("GET", "/nope")
    assert conn.getresponse().status == 404


class _FakeASR:
    """run_asr counterpart of streams/asr.py (reference inference/asr.py):
    decodes the base64 request body and returns a transcript."""

    def __init__(self):
        self.seen = None

    def run_asr(self, body):
        import base64
        self.seen = base64.b64decode(body["audio_base64"])
        return "what the user said."


@pytest.fixture(scope="module")
def voice_server():
    import dataclasses
    from llmvox_tpu.serve.server import TTSServer
    port = _free_port()
    cfg = dataclasses.replace(SERVE_CFG, api_host="127.0.0.1", api_port=port)
    engines = make_engines(0, cfg)
    scheduler = StreamingScheduler(engines, cfg)
    stream_model = ScriptedStream(["A reply to the voice query."],
                                  eos_token=cfg.eos_token)
    asr = _FakeASR()
    srv = TTSServer(scheduler, cfg, stream_model=stream_model, asr_model=asr)

    loop = asyncio.new_event_loop()

    def run():
        asyncio.set_event_loop(loop)
        loop.run_until_complete(srv.serve())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    for _ in range(100):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.2):
                break
        except OSError:
            time.sleep(0.1)
    yield ("127.0.0.1", port, asr)
    srv.shutdown()
    t.join(timeout=10)
    loop.close()


def test_voicechat_endpoint_runs_asr_then_streams(voice_server):
    import base64
    host, port, asr = voice_server
    pcm = (np.sin(np.linspace(0, 40, 1600)) * 20000).astype(np.int16)
    wav, _ = collect_audio(stream_request(
        host, port, "/voicechat",
        {"audio_base64": base64.b64encode(pcm.tobytes()).decode(),
         "source_language": "english", "target_language": "english"},
        timeout=300))
    assert asr.seen == pcm.tobytes()
    assert len(wav) > 0 and np.isfinite(wav).all()


def test_vlmschat_and_multimodal_endpoints(voice_server):
    import base64
    host, port, asr = voice_server
    pcm = (np.zeros(800)).astype(np.int16)
    b64 = base64.b64encode(pcm.tobytes()).decode()
    wav, _ = collect_audio(stream_request(
        host, port, "/vlmschat",
        {"audio_base64": b64, "image_base64": "aW1n",
         "source_language": "english", "target_language": "english"},
        timeout=300))
    assert len(wav) > 0
    wav, _ = collect_audio(stream_request(
        host, port, "/multimodalchat",
        {"audio_base64": b64, "image_list": ["aW1n"]}, timeout=300))
    assert len(wav) > 0


@pytest.mark.slow
def test_native_loadgen_against_server(server):
    """The C++ load generator (csrc/llmvox_loadgen) streams real audio
    from the tiny server and reports sane stats."""
    import json as jsonlib
    import subprocess
    import pathlib
    exe = pathlib.Path(__file__).resolve().parents[1] / "csrc" / "llmvox_loadgen"
    if not exe.exists():
        pytest.skip("loadgen not built (make -C csrc)")
    host, port = server
    out = subprocess.run(
        [str(exe), host, str(port), "2", "4", "a short load test."],
        capture_output=True, text=True, timeout=300)
    stats = jsonlib.loads(out.stdout.strip())
    assert stats["failed"] == 0 and stats["completed"] == 4
    assert stats["audio_s"] > 0 and stats["mean_first_chunk_ms"] > 0


@pytest.mark.slow
def test_warmup_cache_cli(tmp_path, monkeypatch):
    """The AOT warmup CLI compiles every serving program (tiny shapes)."""
    monkeypatch.setenv("LLMVOX_COMPILE_CACHE", str(tmp_path / "cache"))
    from llmvox_tpu.tools import warmup_cache
    warmup_cache.main([
        "--decode_block", "8", "--decode_block_large", "0",
        "--initial_dump_size_1", "4", "--initial_dump_size_2", "8",
        "--max_dump_size", "16", "--max_audio_length", "10",
        "--chunk_buckets", "[4, 8]",
        "--pool_capacity", "4", "--batch_streams", "2",
        "--n_layer", "2", "--n_head", "2", "--n_embd", "32",
        "--block_size", "64", "--vocab_size", "16",
        "--text_embed_dim", "12", "--speech_embed_dim", "20",
        "--eoa_token_id", "15",
        "--vq_bins", "16", "--vq_dim", "20",
        "--backbone_input_channels", "20", "--backbone_dim", "32",
        "--backbone_intermediate_dim", "96", "--backbone_num_layers", "1",
        "--n_fft", "16", "--hop_length", "4",
    ])


def test_client_disconnect_mid_stream_recovers(server):
    """Dropping the connection mid-stream must not wedge the server."""
    import http.client
    host, port = server
    conn = http.client.HTTPConnection(host, port, timeout=30)
    body = '{"text": "a request that will be abandoned"}'
    conn.request("POST", "/tts", body,
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    resp.read(8)          # take a few bytes of the stream...
    conn.close()          # ...then hang up
    time.sleep(0.5)
    # the server must still serve a full request afterwards
    wav, _ = collect_audio(
        stream_request(host, port, "/tts", {"text": "still alive"},
                       timeout=300))
    assert len(wav) > 0


@pytest.mark.slow
def test_serve_cli_smoke(tmp_path):
    """python -m llmvox_tpu.serve end-to-end: converted-npz checkpoints
    in, HTTP audio stream out (scripted_reply mode, no LLM)."""
    import jax
    from llmvox_tpu.codec.codec import init_codec_params
    from llmvox_tpu.models import decoder as dec
    from llmvox_tpu.serve import __main__ as serve_main
    from llmvox_tpu.train.checkpoint import save_params_npz
    from tests.tiny_stack import CODEC_CFG, DEC_CFG

    dp = tmp_path / "dec.npz"
    margs = {k: getattr(DEC_CFG, k) for k in (
        "n_layer", "n_head", "n_embd", "block_size", "vocab_size", "bias",
        "text_embed_dim", "speech_embed_dim", "text_vocab_size",
        "pad_token_id", "text_eos_id", "eoa_token_id")}
    save_params_npz(str(dp),
                    jax.device_get(dec.init_decoder_params(
                        jax.random.PRNGKey(0), DEC_CFG)),
                    meta={"model_args": margs})
    cp = tmp_path / "codec.npz"
    save_params_npz(str(cp), jax.device_get(
        init_codec_params(jax.random.PRNGKey(1), CODEC_CFG)))
    bt = tmp_path / "byt5.npz"
    np.savez(str(bt), table=np.random.default_rng(0).standard_normal(
        (DEC_CFG.text_vocab_size, DEC_CFG.text_embed_dim)).astype(np.float32))

    port = _free_port()
    argv = ["--api_host", "127.0.0.1", "--api_port", str(port),
            "--llmvox_checkpoint_path", str(dp),
            "--wav_model_path", str(cp), "--byt5_table", str(bt),
            "--scripted_reply", "A short scripted answer.",
            "--compute_dtype", "float32",
            "--initial_dump_size_1", "4", "--initial_dump_size_2", "8",
            "--max_dump_size", "16", "--max_audio_length", "10",
            "--decode_block", "8", "--decode_block_large", "0",
            "--chunk_buckets", "[4, 8, 16]",
            # tiny codec config
            "--vq_bins", "16", "--vq_dim", "20",
            "--backbone_input_channels", "20", "--backbone_dim", "64",
            "--backbone_intermediate_dim", "192",
            "--backbone_num_layers", "2",
            "--n_fft", "128", "--hop_length", "32"]
    t = threading.Thread(target=serve_main.main, args=(argv,), daemon=True)
    t.start()
    for _ in range(300):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.2):
                break
        except OSError:
            time.sleep(0.2)
    wav, _ = collect_audio(stream_request(
        "127.0.0.1", port, "/tts", {"text": "hello"}, timeout=300))
    assert len(wav) > 0 and np.isfinite(wav).all()


def test_terminal_demo_against_server(server, tmp_path, monkeypatch):
    """TerminalDemo drives one round trip against the live server
    (reference run_ui.py counterpart, headless path: no PyAudio)."""
    import builtins
    from llmvox_tpu.serve.ui import TerminalDemo
    host, port = server
    prompts = iter(["say something short", "exit"])
    monkeypatch.setattr(builtins, "input", lambda *_: next(prompts))
    demo = TerminalDemo(host, port, save_dir=str(tmp_path))
    demo.chat()
    saved = list(tmp_path.glob("reply_*.wav"))
    assert len(saved) == 1
    from llmvox_tpu.utils.audio import read_wav
    wav, sr = read_wav(str(saved[0]))
    assert sr == 24000 and len(wav) > 0


def test_missing_text_key_yields_clean_json_error(server):
    """ADVICE r1: the body must be validated BEFORE the 200 chunked header
    goes out, so a bad request gets one well-formed JSON error response —
    not a raw status line spliced into an open chunked body."""
    import http.client
    import json
    host, port = server
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request("POST", "/tts", json.dumps({}),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 500
    err = json.loads(resp.read())
    assert "error" in err


def test_traces_are_bounded(server):
    """ADVICE r1: per-request traces must not grow without bound."""
    from llmvox_tpu.serve.server import TTSServer
    from tests.tiny_stack import SERVE_CFG
    srv = TTSServer(None, SERVE_CFG)
    assert srv.traces.maxlen == 50


@pytest.mark.slow
def test_serve_cli_pooled_smoke(tmp_path):
    """python -m llmvox_tpu.serve --pool_capacity: the CLI builds AND
    warms the continuous-batching pool; concurrent HTTP requests stream
    audio through it (regression for the unwarmed-pool 55 s first wave)."""
    import jax
    from llmvox_tpu.codec.codec import init_codec_params
    from llmvox_tpu.models import decoder as dec
    from llmvox_tpu.serve import __main__ as serve_main
    from llmvox_tpu.train.checkpoint import save_params_npz
    from tests.tiny_stack import CODEC_CFG, DEC_CFG

    dp = tmp_path / "dec.npz"
    margs = {k: getattr(DEC_CFG, k) for k in (
        "n_layer", "n_head", "n_embd", "block_size", "vocab_size", "bias",
        "text_embed_dim", "speech_embed_dim", "text_vocab_size",
        "pad_token_id", "text_eos_id", "eoa_token_id")}
    save_params_npz(str(dp),
                    jax.device_get(dec.init_decoder_params(
                        jax.random.PRNGKey(0), DEC_CFG)),
                    meta={"model_args": margs})
    cp = tmp_path / "codec.npz"
    save_params_npz(str(cp), jax.device_get(
        init_codec_params(jax.random.PRNGKey(1), CODEC_CFG)))
    bt = tmp_path / "byt5.npz"
    np.savez(str(bt), table=np.random.default_rng(0).standard_normal(
        (DEC_CFG.text_vocab_size, DEC_CFG.text_embed_dim)).astype(np.float32))

    port = _free_port()
    argv = ["--api_host", "127.0.0.1", "--api_port", str(port),
            "--llmvox_checkpoint_path", str(dp),
            "--wav_model_path", str(cp), "--byt5_table", str(bt),
            "--scripted_reply", "A short scripted answer.",
            "--compute_dtype", "float32",
            "--pool_capacity", "4",
            # dp=2 over the suite's virtual 8-CPU mesh: the CLI path that
            # shards pooled serving across a real slice
            "--pool_mesh_dp", "2",
            "--initial_dump_size_1", "4", "--initial_dump_size_2", "8",
            "--max_dump_size", "16", "--max_audio_length", "10",
            "--decode_block", "8", "--decode_block_large", "0",
            "--chunk_buckets", "[4, 8, 16]",
            "--vq_bins", "16", "--vq_dim", "20",
            "--backbone_input_channels", "20", "--backbone_dim", "64",
            "--backbone_intermediate_dim", "192",
            "--backbone_num_layers", "2",
            "--n_fft", "128", "--hop_length", "32"]
    t = threading.Thread(target=serve_main.main, args=(argv,), daemon=True)
    t.start()
    for _ in range(300):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=0.2):
                break
        except OSError:
            time.sleep(0.2)

    outs = [None, None]

    def one(i):
        wav, _ = collect_audio(stream_request(
            "127.0.0.1", port, "/tts", {"text": f"hello {i}"}, timeout=300))
        outs[i] = wav

    threads = [threading.Thread(target=one, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    for wav in outs:
        assert wav is not None and len(wav) > 0 and np.isfinite(wav).all()
