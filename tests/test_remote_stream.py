"""RemoteStream against a fake OpenAI-compatible SSE endpoint."""
import json
import socket
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from llmvox_tpu.streams.remote import RemoteStream
from llmvox_tpu.utils.config import ServeConfig


class _FakeLLM(BaseHTTPRequestHandler):
    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n))
        assert body["stream"] is True
        assert body["messages"][0]["role"] == "system"
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()
        for delta in ["Hello", " there", "."]:
            chunk = {"choices": [{"delta": {"content": delta}}]}
            self.wfile.write(f"data: {json.dumps(chunk)}\n\n".encode())
        self.wfile.write(b"data: [DONE]\n\n")

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def fake_llm():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = HTTPServer(("127.0.0.1", port), _FakeLLM)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    time.sleep(0.1)
    yield port
    srv.shutdown()


def test_remote_stream_yields_deltas_and_eos(fake_llm):
    cfg = ServeConfig(eos_token="<|eot_id|>")
    stream = RemoteStream(cfg, base_host="127.0.0.1", base_port=fake_llm)
    stream.load()
    out = list(stream.predict({"system": "sys", "prompt": "hi"}))
    assert out == ["Hello", " there", ".", "<|eot_id|>"]


def test_remote_stream_error_on_bad_endpoint():
    cfg = ServeConfig()
    stream = RemoteStream(cfg, base_host="127.0.0.1", base_port=1)
    with pytest.raises(Exception):
        list(stream.predict({"system": "s", "prompt": "p"}))
