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
    """base64 int16 PCM -> float32 PEAK-normalized to [-1, 1] — the
    reference's transcribe_raw gain (inference/asr.py:126-127
    ``y /= max(|y|)``), which differs from a fixed /32768 whenever the
    clip doesn't hit full scale."""
    import base64
    from llmvox_tpu.streams.asr import WhisperASR
    pcm = np.array([0, 16384, -32768, 32767], np.int16)
    out = WhisperASR().decode_base64_audio(
        base64.b64encode(pcm.tobytes()).decode())
    np.testing.assert_allclose(
        out, [0.0, 0.5, -1.0, 32767 / 32768.0], atol=1e-6)
    assert out.dtype == np.float32
    # a quiet clip normalizes by its own peak, not full scale
    quiet = np.array([0, 100, -200], np.int16)
    out = WhisperASR().decode_base64_audio(
        base64.b64encode(quiet.tobytes()).decode())
    np.testing.assert_allclose(out, [0.0, 0.5, -1.0], atol=1e-6)
    # silence must not divide by zero
    out = WhisperASR().decode_base64_audio(
        base64.b64encode(np.zeros(4, np.int16).tobytes()).decode())
    np.testing.assert_allclose(out, np.zeros(4), atol=1e-9)


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


def _b64_pcm(n=16000, seed=0):
    import base64
    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal(n) * 3000).astype(np.int16)
    return base64.b64encode(pcm.tobytes()).decode()


def _b64_png(w=56, h=56, seed=0):
    import base64
    import io
    from PIL import Image
    rng = np.random.default_rng(seed)
    img = Image.fromarray((rng.random((h, w, 3)) * 255).astype("uint8"))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_whisper_asr_adapter_end_to_end(tmp_path):
    """WhisperASR.load()/run_asr() through the real HF ASR pipeline with a
    tiny local Whisper model (reference inference/asr.py:14-168): base64
    decode, task routing (transcribe when source==target, translate
    otherwise), transcription text out."""
    pytest.importorskip("torch")
    from tests.tiny_hf import build_tiny_whisper
    from llmvox_tpu.streams.asr import WhisperASR

    model_dir = build_tiny_whisper(str(tmp_path / "whisper"))
    cfg = dataclasses.replace(ServeConfig(), asr_model=model_dir,
                              asr_device="cpu")
    asr = WhisperASR(cfg)
    out = asr.run_asr({"audio_base64": _b64_pcm(),
                       "source_language": "en", "target_language": "en"})
    assert isinstance(out, str)
    assert asr.transcriber is not None  # load() really ran
    # translate branch (source != target)
    out2 = asr.run_asr({"audio_base64": _b64_pcm(seed=1),
                        "source_language": "zh", "target_language": "en"})
    assert isinstance(out2, str)


def test_hf_vlm_adapter_streams_deltas(tmp_path):
    """HFStreamVLM.predict() with a real tiny Qwen2.5-VL (real vision tower,
    mrope text stack, TextIteratorStreamer thread) — only the thin processor
    composition is substituted because torchvision is absent from the image
    (tests/tiny_hf.py::TinyQwenVLProcessor keeps the real image processor,
    tokenizer, and token-expansion semantics).  Reference:
    inference/vlm_streaming.py:49-211."""
    pytest.importorskip("torch")
    pytest.importorskip("PIL")
    from tests.tiny_hf import build_tiny_qwen_vl
    from llmvox_tpu.streams.hf_vlm import HFStreamVLM

    cfg = dataclasses.replace(ServeConfig(), llm_max_tokens=8,
                              llm_temperature=1.0, llm_top_p=0.9,
                              llm_top_k=40)
    vlm = HFStreamVLM(cfg)
    vlm.model, vlm.processor = build_tiny_qwen_vl(str(tmp_path / "qwen"))
    deltas = list(vlm.predict({"system": "be brief", "prompt": "what is it?",
                               "image_base64": _b64_png()}))
    assert deltas, "VLM streamer produced no deltas"
    assert all(isinstance(d, str) for d in deltas)
    assert not any(d.startswith("Error during generation") for d in deltas)


def test_hf_multimodal_adapter_streams_deltas():
    """HFStreamMultimodal.predict() drives the real prompt build
    (<|system|>...<|image_1|><|audio_1|>... multimodal_streaming.py:19-167),
    base64 audio/image decode, generation thread, and streamer loop; the
    Phi-4 processor is substituted (trust_remote_code model cannot exist in
    a no-egress image) with one that records the prompt and feeds a tiny
    local GPT-2."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("PIL")
    from transformers import GPT2Config, GPT2LMHeadModel
    from llmvox_tpu.streams.hf_multimodal import HFStreamMultimodal

    seen = {}

    class _AllLettersTokenizer(_FakeTokenizer):
        # every id decodes to a letter so no delta is space-only (greedy
        # tiny-model output can repeat one id; spaces would be filtered)
        def decode(self, ids, **kw):
            return "".join(chr(97 + int(i) % 24)
                           for i in np.atleast_1d(np.asarray(ids)))

    class _Proc:
        tokenizer = _AllLettersTokenizer()

        def __call__(self, text, audios, images, return_tensors):
            from transformers.feature_extraction_utils import BatchFeature
            seen["prompt"] = text
            seen["n_audio"] = len(audios)
            seen["n_images"] = len(images or [])
            ids = [1 + (ord(c) % 40) for c in text[:16]]
            return BatchFeature(
                {"input_ids": torch.tensor([ids], dtype=torch.long)})

    cfg = dataclasses.replace(ServeConfig(), llm_device="cpu",
                              llm_max_tokens=8)
    mm = HFStreamMultimodal(cfg)
    torch.manual_seed(0)
    mm.model = GPT2LMHeadModel(GPT2Config(
        n_layer=1, n_head=2, n_embd=16, vocab_size=48, n_positions=64,
        bos_token_id=1, eos_token_id=47, pad_token_id=47)).eval()
    # random tiny weights can emit eos as the first greedy token; disable
    # early stop so the streamer always has deltas to yield
    mm.model.generation_config.eos_token_id = None
    mm.processor = _Proc()

    deltas = list(mm.predict({"system": "sys prompt",
                              "audio_data": _b64_pcm(4000),
                              "images_data": [_b64_png(28, 28)]}))
    assert deltas, "multimodal streamer produced no deltas"
    assert seen["prompt"].startswith("<|system|>sys prompt<|end|>")
    assert "<|image_1|>" in seen["prompt"] and "<|audio_1|>" in seen["prompt"]
    assert seen["n_audio"] == 1 and seen["n_images"] == 1
