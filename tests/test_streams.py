"""HF LLM stream adapter exercised with a local tiny model (no downloads):
a randomly initialized GPT-2 generates through the real
TextIteratorStreamer thread machinery; only the tokenizer is faked."""
import dataclasses

import numpy as np
import pytest

from llmvox_tpu.streams.hf_llm import HFStreamModel
from llmvox_tpu.utils.config import ServeConfig


class _Batch(dict):
    def to(self, device):
        return self


class _FakeTokenizer:
    """Just enough tokenizer API for apply_chat_template +
    TextIteratorStreamer.decode."""

    eos_token_id = 0
    eos_token = "<eos>"

    def apply_chat_template(self, messages, tokenize=True,
                            add_generation_prompt=True, return_tensors="pt",
                            return_dict=True):
        import torch
        text = " ".join(m["content"] for m in messages)
        ids = [1 + (ord(c) % 40) for c in text[:16]]
        return _Batch(input_ids=torch.tensor([ids], dtype=torch.long))

    def decode(self, ids, **kw):
        return "".join(" " if i % 7 == 0 else chr(97 + int(i) % 24)
                       for i in np.atleast_1d(np.asarray(ids)))


def test_hf_llm_adapter_streams_deltas():
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel

    cfg = dataclasses.replace(ServeConfig(), llm_device="cpu",
                              llm_max_tokens=12)
    sm = HFStreamModel(cfg)
    sm.tokenizer = _FakeTokenizer()
    torch.manual_seed(0)
    sm.model = GPT2LMHeadModel(GPT2Config(
        n_layer=1, n_head=2, n_embd=16, vocab_size=48, n_positions=64,
        bos_token_id=1, eos_token_id=0)).eval()

    deltas = list(sm.predict({"system": "be brief", "prompt": "hello"}))
    assert deltas, "streamer produced no deltas"
    assert all(isinstance(d, str) and d.strip() for d in deltas)


def test_asr_base64_decode():
    """base64 int16 PCM -> float32 [-1, 1] (inference/asr.py semantics)."""
    import base64
    from llmvox_tpu.streams.asr import WhisperASR
    pcm = np.array([0, 16384, -32768, 32767], np.int16)
    out = WhisperASR().decode_base64_audio(
        base64.b64encode(pcm.tobytes()).decode())
    np.testing.assert_allclose(
        out, [0.0, 0.5, -1.0, 32767 / 32768.0], atol=1e-6)
    assert out.dtype == np.float32


def test_multimodal_decode_helpers():
    """base64 audio/image decoding (multimodal_streaming.py semantics:
    int16 -> [-1,1] float; base64 -> RGB PIL)."""
    import base64
    import io
    pytest.importorskip("PIL")
    from PIL import Image
    from llmvox_tpu.streams.hf_multimodal import HFStreamMultimodal
    from llmvox_tpu.streams.hf_vlm import HFStreamVLM

    pcm = np.array([-32768, 0, 32767], np.int16)
    wav, sr = HFStreamMultimodal.decode_audio(
        base64.b64encode(pcm.tobytes()).decode())
    assert sr == 16000
    np.testing.assert_allclose(wav, [-1.0, 0.0, 32767 / 32768.0], atol=1e-6)

    buf = io.BytesIO()
    Image.new("L", (4, 3), 128).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    imgs = HFStreamMultimodal.decode_images([b64])
    assert len(imgs) == 1 and imgs[0].mode == "RGB" and imgs[0].size == (4, 3)
    img = HFStreamVLM.decode_image(b64)
    assert img.mode == "RGB" and img.size == (4, 3)
