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
