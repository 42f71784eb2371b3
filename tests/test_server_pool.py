"""Pooled-server test: concurrent HTTP requests batch through one pool."""
import asyncio
import dataclasses
import socket
import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax.numpy as jnp
import pytest

from llmvox_tpu.serve.client import collect_audio, stream_request
from llmvox_tpu.serve.server import TTSServer
from llmvox_tpu.streams.scripted import ScriptedStream

from tests.tiny_stack import SERVE_CFG, make_engines


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def pooled_server():
    from llmvox_tpu.serve.pool import DecodePool
    port = _free_port()
    cfg = dataclasses.replace(SERVE_CFG, api_host="127.0.0.1", api_port=port,
                              pool_capacity=8)
    eng = make_engines(0, cfg, n=1)[0]
    stream_model = ScriptedStream(["Pooled answer one.", "And two."],
                                  eos_token=cfg.eos_token)

    loop = asyncio.new_event_loop()
    srv_holder = {}

    def run():
        asyncio.set_event_loop(loop)
        pool = DecodePool(eng.params, np.asarray(eng.text_table), eng.codec,
                          capacity=8, dcfg=eng.dcfg, scfg=cfg,
                          cache_dtype=jnp.float32, param_dtype=jnp.float32)
        srv = TTSServer(None, cfg, stream_model=stream_model, pool=pool)
        srv_holder["srv"] = srv
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
    srv_holder["srv"].shutdown()
    t.join(timeout=10)
    loop.close()


def test_concurrent_requests_through_pool(pooled_server):
    host, port = pooled_server

    def one(i):
        wav, stamps = collect_audio(stream_request(
            host, port, "/tts", {"text": f"request {i}"}, timeout=400))
        return wav

    with ThreadPoolExecutor(max_workers=3) as ex:
        wavs = list(ex.map(one, range(3)))
    for wav in wavs:
        assert len(wav) > 0
        assert np.isfinite(wav).all()
    # deterministic stack + same scripted stream: all replies identical
    for wav in wavs[1:]:
        np.testing.assert_array_equal(wav, wavs[0])
