"""Streaming TTS HTTP server.

API-compatible with the reference FastAPI app (streaming_server.py:471-690):

- ``POST /tts``            {"text": ...}
- ``POST /voicechat``      {"source_language", "target_language", "audio_base64"}
- ``POST /multimodalchat`` {"audio_base64", "image_list"}
- ``POST /vlmschat``       {"source_language", "target_language",
                            "audio_base64", "image_base64"}
- ``GET  /``               service info
- ``GET  /stats``          per-request latency traces (new)

Responses stream ``application/octet-stream`` chunked bodies of raw
float32 little-endian 24 kHz PCM, exactly the reference wire format
(client/endpoints.py:9).

Implementation is stdlib asyncio HTTP/1.1 — no FastAPI/uvicorn dependency;
the event loop that parses requests is the same one scheduling the TPU
decode tasks, so there is no thread hand-off on the audio path (the
reference crosses 3 thread boundaries per chunk, streaming_server.py:513-534).
"""
from __future__ import annotations

import asyncio
import collections
import json
from typing import Dict, Optional

from llmvox_tpu.serve.scheduler import StreamingScheduler
from llmvox_tpu.streams.protocol import aiter_stream
from llmvox_tpu.utils.config import ServeConfig
from llmvox_tpu.utils.trace import Trace

_MAX_BODY = 64 * 1024 * 1024


class TTSServer:
    """Two serving modes:

    - **dedicated** (default): one dual-replica scheduler; requests are
      serialized (the reference silently corrupts shared state on
      concurrent requests — SURVEY §2.7; here they queue instead).
    - **pooled**: pass ``pool`` (serve.pool.DecodePool) — each request gets
      two PooledEngine slots and runs concurrently; all in-flight requests
      batch into one decode program.
    """

    def __init__(self, scheduler: Optional[StreamingScheduler],
                 cfg: Optional[ServeConfig] = None,
                 stream_model=None, asr_model=None, pool=None):
        self.scheduler = scheduler
        self.cfg = cfg or ServeConfig()
        self.stream_model = stream_model
        self.asr_model = asr_model
        self.pool = pool
        if pool is not None:
            self._busy = asyncio.Semaphore(max(pool.B // 2, 1))
        else:
            self._busy = asyncio.Lock()
        self.traces = collections.deque(maxlen=50)

    # -- request -> text stream ---------------------------------------
    def _make_text_stream(self, path: str, body: Dict):
        cfg = self.cfg
        system = cfg.system_prompt
        # per-request LLM sampling knobs ride along in the request dict
        # (honored by the pooled JAX backend when
        # --llm_per_request_sampling is on; other backends ignore them)
        knobs = {k: body[k]
                 for k in ("temperature", "top_p", "top_k", "max_tokens")
                 if k in body}
        if path == "/tts":
            prompt = body["text"]
            return self.stream_model.predict(
                {"system": system, "prompt": prompt, **knobs})
        if path == "/voicechat":
            # Overlapped s2s (VERDICT r3 #3): stream stable partial
            # transcripts into the LLM pool's prefill while the ASR
            # decode finishes, instead of the reference's serial chain
            # (streaming_server.py:543-583).  Requires the JAX Whisper
            # backend + the pooled JAX LLM; single-window audio only.
            if (getattr(cfg, "s2s_overlap", True)
                    and hasattr(self.asr_model, "transcribe_stream_async")
                    and hasattr(self.stream_model, "predict_streaming")):
                audio = self.asr_model.decode_base64_audio(
                    body["audio_base64"])
                if self.asr_model.stream_supported(audio):
                    source = body.get("source_language",
                                      cfg.asr_default_language)
                    target = body.get("target_language", source)
                    task = ("translate" if source != target
                            else "transcribe")
                    texts = self.asr_model.transcribe_stream_async(
                        audio, task=task, language=source)

                    async def stripped(src):
                        # run_asr strips the final transcript; partial
                        # prompts must match its final text exactly
                        async for txt, done in src:
                            yield txt.strip(), done

                    return self.stream_model.predict_streaming(
                        {"system": system, **knobs}, stripped(texts))
            prompt = self.asr_model.run_asr(body)
            return self.stream_model.predict(
                {"system": system, "prompt": prompt, **knobs})
        if path == "/multimodalchat":
            return self.stream_model.predict(
                {"system": system, "audio_data": body["audio_base64"],
                 "images_data": body.get("image_list", [])})
        if path == "/vlmschat":
            prompt = self.asr_model.run_asr(body)
            return self.stream_model.predict(
                {"system": system, "prompt": prompt,
                 "image_base64": body["image_base64"]})
        raise KeyError(path)

    # -- HTTP plumbing --------------------------------------------------
    async def _handle(self, reader: asyncio.StreamReader,
                      writer: asyncio.StreamWriter) -> None:
        try:
            request_line = await reader.readline()
            if not request_line:
                return
            method, path, _ = request_line.decode().split(" ", 2)
            headers = {}
            while True:
                line = await reader.readline()
                if line in (b"\r\n", b"\n", b""):
                    break
                k, _, v = line.decode().partition(":")
                headers[k.strip().lower()] = v.strip()
            length = int(headers.get("content-length", 0))
            body = b""
            if length:
                if length > _MAX_BODY:
                    await self._plain(writer, 413, {"error": "body too large"})
                    return
                body = await reader.readexactly(length)

            if method == "GET" and path == "/":
                await self._plain(writer, 200, {
                    "message": "Streaming TTS API (LLMVoX-TPU)",
                    "usage": 'POST /tts with {"text": "..."}',
                    "demo": "GET /demo",
                    "version": "1.0.0",
                })
            elif method == "GET" and path == "/demo":
                # browser demo: streaming fetch + WebAudio playback (the
                # web-native counterpart of the reference's Qt demo)
                from llmvox_tpu.serve.demo_page import DEMO_HTML
                await self._html(writer, DEMO_HTML)
            elif method == "GET" and path == "/stats":
                obj = {"requests": list(self.traces)}
                if self.pool is not None and hasattr(self.pool, "stats"):
                    obj["pool"] = self.pool.stats()
                llm_pool = getattr(self.stream_model, "pool", None)
                if llm_pool is not None and hasattr(llm_pool, "stats"):
                    obj["llm_pool"] = llm_pool.stats()
                await self._plain(writer, 200, obj)
            elif method == "POST" and path in (
                    "/tts", "/voicechat", "/multimodalchat", "/vlmschat"):
                await self._stream_response(writer, path,
                                            json.loads(body or b"{}"))
            else:
                await self._plain(writer, 404, {"error": "not found"})
        except (asyncio.IncompleteReadError, ConnectionResetError):
            pass
        except Exception as e:  # noqa: BLE001 — report, don't crash the server
            try:
                await self._plain(writer, 500, {"error": str(e)})
            except Exception:
                pass
        finally:
            try:
                writer.close()
                await writer.wait_closed()
            except Exception:
                pass

    async def _html(self, writer, html: str) -> None:
        payload = html.encode()
        writer.write(
            "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "Connection: close\r\n\r\n".encode() + payload)
        await writer.drain()

    async def _plain(self, writer, status: int, obj: Dict) -> None:
        payload = json.dumps(obj).encode()
        writer.write(
            f"HTTP/1.1 {status} X\r\nContent-Type: application/json\r\n"
            f"Content-Length: {len(payload)}\r\n"
            f"Access-Control-Allow-Origin: *\r\nConnection: close\r\n\r\n"
            .encode() + payload)
        await writer.drain()

    async def _stream_response(self, writer, path: str, body: Dict) -> None:
        # Validate the body and construct the text stream BEFORE the 200
        # header: a bad request (missing "text", ASR failure, ...) must
        # surface as a clean JSON error response, not a raw status line
        # spliced into an already-open chunked body.
        text_stream = aiter_stream(self._make_text_stream(path, body))
        writer.write(
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: application/octet-stream\r\n"
            b"Transfer-Encoding: chunked\r\n"
            b"Access-Control-Allow-Origin: *\r\nConnection: close\r\n\r\n")
        await writer.drain()
        try:
            async with self._busy:
                trace = Trace(path)
                if self.pool is not None:
                    from llmvox_tpu.serve.pool import PooledEngine
                    engines = [PooledEngine(self.pool, self.cfg),
                               PooledEngine(self.pool, self.cfg)]
                    scheduler = StreamingScheduler(engines, self.cfg)
                else:
                    engines = None
                    scheduler = self.scheduler
                try:
                    async for chunk in scheduler.run(text_stream,
                                                     trace=trace):
                        writer.write(f"{len(chunk):x}\r\n".encode() + chunk
                                     + b"\r\n")
                        await writer.drain()
                finally:
                    if engines is not None:
                        for e in engines:
                            e.close()
                self.traces.append(trace.summary())
        except (asyncio.IncompleteReadError, ConnectionResetError,
                BrokenPipeError):
            raise
        except Exception as e:  # noqa: BLE001 — streaming already began
            # The 200 header is on the wire; a second status line would be
            # malformed HTTP.  Terminate the chunked body instead so the
            # client sees a short (truncated-audio) but valid response.
            print(f"[server] error mid-stream on {path}: {e!r}")
        writer.write(b"0\r\n\r\n")
        await writer.drain()

    # -- lifecycle -------------------------------------------------------
    async def serve(self) -> None:
        self._loop = asyncio.get_running_loop()
        self._shutdown = asyncio.Event()
        server = await asyncio.start_server(
            self._handle, self.cfg.api_host, self.cfg.api_port)
        addrs = ", ".join(str(s.getsockname()) for s in server.sockets)
        print(f"LLMVoX-TPU serving on {addrs}")
        async with server:
            forever = asyncio.create_task(server.serve_forever())
            stop = asyncio.create_task(self._shutdown.wait())
            await asyncio.wait([forever, stop],
                               return_when=asyncio.FIRST_COMPLETED)
            forever.cancel()
            try:
                await forever
            except asyncio.CancelledError:
                pass
            if self.pool is not None:
                self.pool.stop()

    def shutdown(self) -> None:
        """Thread-safe graceful stop: ``serve()`` returns and the listening
        socket closes.  Callable from any thread once ``serve()`` is up."""
        if getattr(self, "_loop", None) is not None:
            self._loop.call_soon_threadsafe(self._shutdown.set)

    def run(self) -> None:
        asyncio.run(self.serve())


def build_server(cfg: ServeConfig, engines, stream_model=None,
                 asr_model=None, pool=None) -> TTSServer:
    """Wire up scheduler + text-stream sources per chat_type
    (streaming_server.py:157-181).  With ``pool`` (or engines=None +
    pool), requests run concurrently through the continuous-batching
    pool instead of the dedicated dual replicas."""
    scheduler = StreamingScheduler(engines, cfg) if engines else None
    if stream_model is None and cfg.scripted_reply:
        from llmvox_tpu.streams.scripted import ScriptedStream
        stream_model = ScriptedStream([cfg.scripted_reply],
                                      eos_token=cfg.eos_token)
    if stream_model is None:
        if cfg.chat_type in ("voice", "text"):
            if cfg.llm_backend == "jax":
                # TPU-hosted Llama (models/llama.py) behind the same
                # stream protocol — SURVEY §7 "LLM hosting" option (b)
                from llmvox_tpu.streams.jax_llm import build_jax_stream
                stream_model = build_jax_stream(cfg)
            else:
                from llmvox_tpu.streams.hf_llm import HFStreamModel
                stream_model = HFStreamModel(cfg)
        elif cfg.chat_type == "multimodal":
            from llmvox_tpu.streams.hf_multimodal import HFStreamMultimodal
            stream_model = HFStreamMultimodal(cfg)
        elif cfg.chat_type == "visual_speech":
            from llmvox_tpu.streams.hf_vlm import HFStreamVLM
            stream_model = HFStreamVLM(cfg)
        stream_model.load()
    if asr_model is None and cfg.chat_type in ("voice", "visual_speech"):
        from llmvox_tpu.streams.asr import build_asr
        asr_model = build_asr(cfg)
        asr_model.load()
    if pool is not None:
        pool.warmup()
    if hasattr(stream_model, "warmup"):
        # pooled TPU-hosted LLM: compile prefill buckets + the batched
        # decode block before traffic
        stream_model.warmup()
    if hasattr(asr_model, "warmup"):
        # TPU-hosted Whisper: compile every encoder-context bucket
        asr_model.warmup()
    return TTSServer(scheduler, cfg, stream_model, asr_model, pool=pool)
