"""Training data pipeline for the speech decoder.

Reference semantics (src/data.py): a JSON manifest of
``{"id", "answer_text", ...}`` where ``{id}.wav`` holds the spoken answer.
Per sample: the audio is codec-encoded to discrete codes (naturally
occurring EOA codes 453 are stripped, then a terminal EOA is appended);
text is tokenized per word (each word keeps its ByT5 </s>) + 385; inputs
are concat(text byte-embedding, previous-token codebook feature),
L2-normalized; targets are the codes padded with -1000.

TPU-first differences:
- audio -> codes runs **offline once** (tools/prepare_data.py) instead of
  inside dataloader workers per sample per epoch (src/data.py:94-96);
  the dataset here consumes precomputed codes.
- batches are padded to *bucketed* sequence lengths (multiples of
  ``bucket``) so XLA compiles a handful of programs, not one per shape.
  Padding is loss-neutral: targets use ignore_index and causal attention
  keeps padding from affecting valid positions.
- input-embedding construction (codebook/byte-table lookups + concat +
  normalize) happens **inside the jitted train step** from integer ids —
  the host ships two int32 arrays per batch, not float embeddings.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from llmvox_tpu.ops import nn
from llmvox_tpu.text.byt5 import ByT5Tokenizer
from llmvox_tpu.utils.config import DecoderConfig


@dataclass
class Sample:
    text_ids: np.ndarray    # (n_text,) int32, per-word ByT5 + terminal 385
    codes: np.ndarray       # (n_codes,) int32, EOA-stripped codec codes


class SpeechDataset:
    """Manifest of (text, codes) pairs.

    Accepts either a prepared ``.npz`` (from tools/prepare_data.py) holding
    ``text_{i}`` / ``codes_{i}`` arrays, or the reference-style JSON with a
    ``codes`` field per item.
    """

    def __init__(self, path: str, tokenizer: Optional[ByT5Tokenizer] = None):
        self.tokenizer = tokenizer or ByT5Tokenizer()
        self.samples: List[Sample] = []
        if path.endswith(".npz"):
            data = np.load(path)
            n = int(data["num_samples"])
            for i in range(n):
                self.samples.append(Sample(
                    text_ids=data[f"text_{i}"].astype(np.int32),
                    codes=data[f"codes_{i}"].astype(np.int32)))
        else:
            items = json.load(open(path))
            for item in items:
                text_ids = np.asarray(
                    self.tokenizer.encode_words(item["answer_text"]), np.int32)
                codes = np.asarray(item["codes"], np.int32)
                codes = codes[codes != 453]  # strip natural EOA (src/data.py:99)
                self.samples.append(Sample(text_ids, codes))

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, i: int) -> Sample:
        return self.samples[i]


def save_prepared(path: str, samples: Sequence[Sample]) -> None:
    arrays = {"num_samples": np.asarray(len(samples))}
    for i, s in enumerate(samples):
        arrays[f"text_{i}"] = s.text_ids
        arrays[f"codes_{i}"] = s.codes
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def collate(samples: Sequence[Sample], cfg: DecoderConfig, *,
            bucket: int = 256, max_len: Optional[int] = None
            ) -> Tuple[np.ndarray, np.ndarray]:
    """Batch -> (text_ids (B, T), targets (B, T)) int32.

    T = sequence length = n_codes + 1 (terminal EOA appended,
    src/data.py:104-109), rounded up to a bucket multiple.  Text is padded
    with 384 / cropped to T (src/data.py:261-271); targets padded with
    ignore_index (src/data.py:230-233).
    """
    max_len = max_len or cfg.block_size
    seq_lens = [min(len(s.codes) + 1, max_len) for s in samples]
    t = min(-(-max(seq_lens) // bucket) * bucket, max_len)
    b = len(samples)
    text = np.full((b, t), cfg.pad_token_id, np.int32)
    targets = np.full((b, t), cfg.ignore_index, np.int32)
    for i, s in enumerate(samples):
        n = seq_lens[i]
        targets[i, : n - 1] = s.codes[: n - 1]
        targets[i, n - 1] = cfg.eoa_token_id
        nt = min(len(s.text_ids), t)
        text[i, :nt] = s.text_ids[:nt]
    return text, targets


def build_decoder_inputs(text_table: jnp.ndarray, codebook: jnp.ndarray,
                         text_ids: jnp.ndarray, targets: jnp.ndarray,
                         cfg: DecoderConfig) -> jnp.ndarray:
    """Device-side input construction (reference src/data.py:239-288).

    Position t sees the byte embedding of text_ids[t] concatenated with the
    codebook feature of the *previous* target code (zeros at t=0; padded
    region uses the EOA feature, matching the reference collator's
    pad-by-EOA-feature, src/data.py:209-221), L2-normalized.
    """
    input_codes = jnp.where(targets == cfg.ignore_index,
                            cfg.eoa_token_id, targets)
    prev = jnp.concatenate(
        [jnp.zeros_like(input_codes[:, :1]), input_codes[:, :-1]], axis=1)
    feats = codebook[prev]                                    # (B, T, 512)
    feats = feats.at[:, 0, :].set(0.0)                        # zero first step
    temb = text_table[text_ids]                               # (B, T, 256)
    emb = jnp.concatenate([temb, feats], axis=-1)
    return nn.l2_normalize(emb)


class BatchIterator:
    """Infinite shuffled batches (the reference resamples a fresh shuffled
    iterator every step, src/data.py:291-325 — i.e. sampling with
    replacement at batch granularity; we reshuffle per epoch)."""

    def __init__(self, dataset: SpeechDataset, cfg: DecoderConfig,
                 batch_size: int, *, bucket: int = 256, seed: int = 0,
                 shard_count: int = 1, shard_index: int = 0):
        self.ds = dataset
        self.cfg = cfg
        self.bs = batch_size
        self.bucket = bucket
        self.rng = np.random.default_rng(seed)
        self.shard_count = shard_count
        self.shard_index = shard_index

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        while True:
            order = self.rng.permutation(len(self.ds))
            order = order[self.shard_index::self.shard_count]
            for i in range(0, len(order) - self.bs + 1, self.bs):
                batch = [self.ds[j] for j in order[i:i + self.bs]]
                yield collate(batch, self.cfg, bucket=self.bucket)
