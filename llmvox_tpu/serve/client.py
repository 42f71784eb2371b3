"""Streaming HTTP client for the TTS server.

Counterpart of the reference client (client/endpoints.py:9-199): POST a
JSON request, iterate the chunked body of raw float32 24 kHz PCM.  PyAudio
playback is optional (absent in headless environments); ``save_wav``
writes PCM16 like the reference's file path.
"""
from __future__ import annotations

import base64
import http.client
import json
import time
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np

from llmvox_tpu.utils.audio import write_wav

SAMPLE_RATE = 24000


def stream_request(host: str, port: int, path: str, payload: Dict,
                   timeout: float = 600.0) -> Iterator[bytes]:
    """POST and yield audio chunks as they arrive."""
    conn = http.client.HTTPConnection(host, port, timeout=timeout)
    try:
        body = json.dumps(payload)
        conn.request("POST", path, body=body,
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        if resp.status != 200:
            raise RuntimeError(f"HTTP {resp.status}: {resp.read()[:200]!r}")
        while True:
            chunk = resp.read(65536)
            if not chunk:
                break
            yield chunk
    finally:
        conn.close()


def collect_audio(chunks: Iterator[bytes]) -> Tuple[np.ndarray, List[float]]:
    """Drain a chunk stream -> (waveform, per-chunk arrival offsets in s)."""
    t0 = time.perf_counter()
    buf, stamps = bytearray(), []
    for chunk in chunks:
        stamps.append(time.perf_counter() - t0)
        buf.extend(chunk)
    wav = np.frombuffer(bytes(buf), dtype="<f4")
    return wav, stamps


def tts_stream(text: str, host: str = "127.0.0.1", port: int = 5003,
               save_path: Optional[str] = None) -> np.ndarray:
    wav, stamps = collect_audio(stream_request(host, port, "/tts",
                                               {"text": text}))
    if stamps:
        print(f"first chunk at {stamps[0] * 1000:.0f} ms, "
              f"{len(wav) / SAMPLE_RATE:.2f}s audio in {len(stamps)} chunks")
    if save_path:
        write_wav(save_path, wav, SAMPLE_RATE)
    return wav


def voicechat(audio: np.ndarray, source_language: str = "english",
              target_language: str = "english", host: str = "127.0.0.1",
              port: int = 5003) -> np.ndarray:
    pcm16 = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    payload = {
        "source_language": source_language,
        "target_language": target_language,
        "audio_base64": base64.b64encode(pcm16).decode(),
    }
    wav, _ = collect_audio(stream_request(host, port, "/voicechat", payload))
    return wav


def vlmschat(audio: np.ndarray, image_b64: str, host: str = "127.0.0.1",
             port: int = 5003, source_language: str = "english",
             target_language: str = "english") -> np.ndarray:
    pcm16 = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    payload = {
        "source_language": source_language,
        "target_language": target_language,
        "audio_base64": base64.b64encode(pcm16).decode(),
        "image_base64": image_b64,
    }
    wav, _ = collect_audio(stream_request(host, port, "/vlmschat", payload))
    return wav


def multimodalchat(audio: np.ndarray, image_list: Optional[List[str]] = None,
                   host: str = "127.0.0.1", port: int = 5003) -> np.ndarray:
    pcm16 = (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
    payload = {
        "audio_base64": base64.b64encode(pcm16).decode(),
        "image_list": image_list or [],
    }
    wav, _ = collect_audio(stream_request(host, port, "/multimodalchat",
                                          payload))
    return wav
