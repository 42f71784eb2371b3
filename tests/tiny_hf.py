"""Tiny, locally-constructed HF models (no downloads) for exercising the
text-stream adapters end to end: a Whisper ASR model + processor, and a
Qwen2.5-VL vision-language model.

Both use a from-scratch byte-level BPE vocabulary (the 256 byte symbols +
the architecture's special tokens, zero merges), which is a complete,
well-formed tokenizer — every string tokenizes to its bytes.
"""
from __future__ import annotations

import json
import os

SPECIALS_WHISPER = [
    "<|endoftext|>", "<|startoftranscript|>", "<|en|>", "<|zh|>",
    "<|transcribe|>", "<|translate|>", "<|notimestamps|>", "<|nospeech|>",
]
SPECIALS_QWEN = [
    "<|endoftext|>", "<|im_start|>", "<|im_end|>",
    "<|vision_start|>", "<|vision_end|>", "<|image_pad|>", "<|video_pad|>",
]

QWEN_CHAT_TEMPLATE = (
    "{% for message in messages %}<|im_start|>{{ message['role'] }}\n"
    "{% if message['content'] is string %}{{ message['content'] }}"
    "{% else %}{% for item in message['content'] %}"
    "{% if item['type'] == 'image' %}<|vision_start|><|image_pad|><|vision_end|>"
    "{% elif item['type'] == 'text' %}{{ item['text'] }}{% endif %}"
    "{% endfor %}{% endif %}<|im_end|>\n{% endfor %}"
    "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}")


def write_byte_bpe(dirpath: str, specials) -> None:
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode
    os.makedirs(dirpath, exist_ok=True)
    vocab = {ch: i for i, ch in enumerate(bytes_to_unicode().values())}
    for s in specials:
        vocab[s] = len(vocab)
    with open(os.path.join(dirpath, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(dirpath, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")


def build_tiny_whisper(dirpath: str) -> str:
    """Save a tiny random WhisperForConditionalGeneration + processor that
    the real HF ``automatic-speech-recognition`` pipeline can load and run
    (incl. multilingual task routing: transcribe vs translate)."""
    import torch
    from transformers import (WhisperConfig, WhisperFeatureExtractor,
                              WhisperForConditionalGeneration,
                              WhisperTokenizer)

    write_byte_bpe(dirpath, SPECIALS_WHISPER)
    tok = WhisperTokenizer(
        os.path.join(dirpath, "vocab.json"),
        os.path.join(dirpath, "merges.txt"),
        unk_token="<|endoftext|>", bos_token="<|endoftext|>",
        eos_token="<|endoftext|>", pad_token="<|endoftext|>")
    tok.add_special_tokens({"additional_special_tokens": SPECIALS_WHISPER})
    tid = tok.convert_tokens_to_ids
    cfg = WhisperConfig(
        vocab_size=len(tok), num_mel_bins=80, d_model=32,
        encoder_layers=1, decoder_layers=1, encoder_attention_heads=2,
        decoder_attention_heads=2, encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=1500, max_target_positions=64,
        decoder_start_token_id=tid("<|startoftranscript|>"),
        eos_token_id=tid("<|endoftext|>"), pad_token_id=tid("<|endoftext|>"),
        bos_token_id=tid("<|endoftext|>"))
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(cfg).eval()
    gc = model.generation_config
    gc.decoder_start_token_id = tid("<|startoftranscript|>")
    gc.lang_to_id = {"<|en|>": tid("<|en|>"), "<|zh|>": tid("<|zh|>")}
    gc.task_to_id = {"transcribe": tid("<|transcribe|>"),
                     "translate": tid("<|translate|>")}
    gc.no_timestamps_token_id = tid("<|notimestamps|>")
    gc.is_multilingual = True
    gc.max_length = 16
    gc.forced_decoder_ids = None
    gc.begin_suppress_tokens = None
    gc.suppress_tokens = None
    # without this the pipeline re-derives the generation config from the
    # model config at load and drops lang_to_id/task_to_id
    gc._from_model_config = False
    model.save_pretrained(dirpath)
    tok.save_pretrained(dirpath)
    WhisperFeatureExtractor(feature_size=80).save_pretrained(dirpath)
    return dirpath


class TinyQwenVLProcessor:
    """Minimal stand-in for ``Qwen2_5_VLProcessor`` composing the REAL
    ``Qwen2VLImageProcessor`` and REAL ``Qwen2TokenizerFast``, with the real
    per-image token-expansion semantics (processing_qwen2_5_vl.py).  The
    genuine processor class cannot be constructed in this image: it demands
    a video processor whose import requires torchvision, which is absent.
    """

    def __init__(self, dirpath: str):
        from transformers import Qwen2TokenizerFast, Qwen2VLImageProcessor
        self.tokenizer = Qwen2TokenizerFast(
            vocab_file=os.path.join(dirpath, "vocab.json"),
            merges_file=os.path.join(dirpath, "merges.txt"),
            unk_token="<|endoftext|>", eos_token="<|im_end|>",
            pad_token="<|endoftext|>")
        self.tokenizer.add_special_tokens(
            {"additional_special_tokens": SPECIALS_QWEN})
        self.tokenizer.chat_template = QWEN_CHAT_TEMPLATE
        self.image_processor = Qwen2VLImageProcessor(
            min_pixels=28 * 28, max_pixels=56 * 56,
            patch_size=14, temporal_patch_size=2, merge_size=2)

    def apply_chat_template(self, messages, tokenize=False,
                            add_generation_prompt=True):
        return self.tokenizer.apply_chat_template(
            messages, tokenize=tokenize,
            add_generation_prompt=add_generation_prompt)

    def __call__(self, text, images, return_tensors="pt"):
        from transformers.feature_extraction_utils import BatchFeature
        image_inputs = self.image_processor(images=images,
                                            return_tensors=return_tensors)
        grids = image_inputs["image_grid_thw"]
        merge = self.image_processor.merge_size ** 2
        out_texts = []
        for t in text:
            i = 0
            while "<|image_pad|>" in t:
                n = int(grids[i].prod()) // merge
                t = t.replace("<|image_pad|>", "<|ph|>" * n, 1)
                i += 1
            out_texts.append(t.replace("<|ph|>", "<|image_pad|>"))
        text_inputs = self.tokenizer(out_texts, return_tensors=return_tensors,
                                     padding=True)
        return BatchFeature({**text_inputs, **image_inputs})


def build_tiny_qwen_vl(dirpath: str):
    """Tiny random Qwen2_5_VLForConditionalGeneration (real vision tower,
    real mrope text stack) + the processor above.  Returns (model, proc)."""
    import torch
    from transformers import (Qwen2_5_VLConfig,
                              Qwen2_5_VLForConditionalGeneration)

    write_byte_bpe(dirpath, SPECIALS_QWEN)
    proc = TinyQwenVLProcessor(dirpath)
    tid = proc.tokenizer.convert_tokens_to_ids
    vision = dict(depth=2, hidden_size=32, intermediate_size=64, num_heads=2,
                  in_channels=3, patch_size=14, spatial_merge_size=2,
                  temporal_patch_size=2, out_hidden_size=32, window_size=28,
                  fullatt_block_indexes=[1], tokens_per_second=4)
    text = dict(vocab_size=len(proc.tokenizer), hidden_size=32,
                intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                max_position_embeddings=512,
                rope_scaling={"type": "mrope", "mrope_section": [1, 1, 2]})
    cfg = Qwen2_5_VLConfig(text_config=text, vision_config=vision,
                           image_token_id=tid("<|image_pad|>"),
                           video_token_id=tid("<|video_pad|>"),
                           vision_start_token_id=tid("<|vision_start|>"),
                           vision_end_token_id=tid("<|vision_end|>"))
    torch.manual_seed(0)
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    model.generation_config.eos_token_id = tid("<|im_end|>")
    model.generation_config.pad_token_id = tid("<|endoftext|>")
    return model, proc
