"""Whisper ASR adapter (voice-chat input transcription).

Counterpart of the reference ASR class (inference/asr.py:14-168): an HF
``automatic-speech-recognition`` pipeline over ``openai/whisper-<variant>``;
base64-encoded int16 PCM is normalized to float and transcribed
(task=translate iff source != target language).
"""
from __future__ import annotations

import base64
from typing import Dict, Optional

import numpy as np

from llmvox_tpu.utils.config import ServeConfig


class WhisperASR:
    def __init__(self, config: Optional[ServeConfig] = None):
        self.config = config or ServeConfig()
        self.transcriber = None

    def load(self) -> None:
        import os

        from transformers import pipeline
        # A bare variant name ("small", "large-v3") maps to the openai hub
        # repo like the reference (inference/asr.py:31); a path or an
        # org-qualified id is used verbatim so local models work.
        name = self.config.asr_model
        if not (os.path.sep in name or "/" in name or os.path.isdir(name)):
            name = f"openai/whisper-{name}"
        self.transcriber = pipeline(
            "automatic-speech-recognition", model=name,
            device=self.config.asr_device)

    def decode_base64_audio(self, audio_base64: str) -> np.ndarray:
        """base64 int16 PCM -> float32 in [-1, 1] (inference/asr.py semantics)."""
        raw = base64.b64decode(audio_base64)
        pcm = np.frombuffer(raw, dtype=np.int16)
        return pcm.astype(np.float32) / 32768.0

    def run_asr(self, request: Dict) -> str:
        """Transcribe a request with audio_base64 (+ source/target_language)."""
        if self.transcriber is None:
            self.load()
        audio = self.decode_base64_audio(request["audio_base64"])
        source = request.get("source_language",
                             self.config.asr_default_language)
        target = request.get("target_language", source)
        task = "translate" if source != target else "transcribe"
        out = self.transcriber(
            {"array": audio, "sampling_rate": int(self.config.asr_sample_rate)},
            generate_kwargs={"task": task},
        )
        return out["text"].strip()
