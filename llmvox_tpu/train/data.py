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


def collate_packed(samples: Sequence[Sample], cfg: DecoderConfig, *,
                   rows: int, seq_len: int
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                              np.ndarray, List[Sample]]:
    """Pack MULTIPLE sentences per row (VERDICT r3 #2): the bucketed
    :func:`collate` pads every row of a short-sentence batch to the
    bucket multiple, and those dead pad positions ride through the whole
    train step as wasted FLOPs.  Here each of ``rows`` rows is greedily
    filled with whole sentences up to ``seq_len`` (first-fit in arrival
    order), so a realistic mix of short sentences trains at near-full
    MXU occupancy from ONE compiled shape.

    Returns ``(text, targets, seg_ids, pos_ids, leftover)``:
    - ``seg_ids`` (B, T) int32 — 1..n per sentence, 0 on padding; the
      attention mask becomes block-diagonal-causal (a query attends only
      keys of its own sentence) via ops/attention.py's ``segments=``.
    - ``pos_ids`` (B, T) int32 — position WITHIN the sentence, so the
      learned absolute positional embedding (and the prev-code input
      feature reset) see exactly what unpacked training sees.
    - ``leftover`` — samples that didn't fit this batch (the iterator
      carries them into the next one).  Sentences longer than seq_len
      are cropped to it, like :func:`collate`'s max_len crop.
    """
    text = np.full((rows, seq_len), cfg.pad_token_id, np.int32)
    targets = np.full((rows, seq_len), cfg.ignore_index, np.int32)
    seg = np.zeros((rows, seq_len), np.int32)
    pos = np.zeros((rows, seq_len), np.int32)
    fill = [0] * rows
    nseg = [0] * rows
    leftover: List[Sample] = []
    for s in samples:
        n = min(len(s.codes) + 1, seq_len)
        row = next((r for r in range(rows) if fill[r] + n <= seq_len),
                   None)
        if row is None:
            leftover.append(s)
            continue
        o = fill[row]
        nseg[row] += 1
        targets[row, o: o + n - 1] = s.codes[: n - 1]
        targets[row, o + n - 1] = cfg.eoa_token_id
        nt = min(len(s.text_ids), n)
        text[row, o: o + nt] = s.text_ids[:nt]
        seg[row, o: o + n] = nseg[row]
        pos[row, o: o + n] = np.arange(n)
        fill[row] = o + n
    return text, targets, seg, pos, leftover


def build_decoder_inputs(text_table: jnp.ndarray, codebook: jnp.ndarray,
                         text_ids: jnp.ndarray, targets: jnp.ndarray,
                         cfg: DecoderConfig,
                         pos_ids: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
    """Device-side input construction (reference src/data.py:239-288).

    Position t sees the byte embedding of text_ids[t] concatenated with the
    codebook feature of the *previous* target code (zeros at t=0; padded
    region uses the EOA feature, matching the reference collator's
    pad-by-EOA-feature, src/data.py:209-221), L2-normalized.

    ``pos_ids`` (packed batches): the prev-code feature zeroes wherever
    ``pos_ids == 0`` — every SENTENCE start, not just t=0 — so a packed
    sentence's first step matches its unpacked first step exactly.
    """
    input_codes = jnp.where(targets == cfg.ignore_index,
                            cfg.eoa_token_id, targets)
    prev = jnp.concatenate(
        [jnp.zeros_like(input_codes[:, :1]), input_codes[:, :-1]], axis=1)
    feats = codebook[prev]                                    # (B, T, 512)
    if pos_ids is None:
        feats = feats.at[:, 0, :].set(0.0)                    # zero first step
    else:
        feats = jnp.where((pos_ids == 0)[..., None], 0.0, feats)
    temb = text_table[text_ids]                               # (B, T, 256)
    emb = jnp.concatenate([temb, feats], axis=-1)
    return nn.l2_normalize(emb)


class PackedBatchIterator:
    """Infinite shuffled PACKED batches: (text, targets, seg_ids, pos_ids)
    with multiple sentences per row (see :func:`collate_packed`) at ONE
    fixed (rows, seq_len) shape — a single compiled train step at
    near-full token occupancy, vs the bucketed iterator's pad-heavy
    short-sentence batches.  Samples that don't fit a batch carry over
    to the next (nothing is dropped within an epoch)."""

    def __init__(self, dataset: SpeechDataset, cfg: DecoderConfig,
                 rows: int, seq_len: int, *, samples_per_batch: int = 0,
                 seed: int = 0, shard_count: int = 1, shard_index: int = 0):
        self.ds = dataset
        self.cfg = cfg
        self.rows = rows
        self.seq_len = seq_len
        # how many new samples to OFFER per batch: default enough to
        # plausibly fill rows*seq_len given the dataset's mean length
        if samples_per_batch <= 0:
            mean = max(float(np.mean([len(s.codes) + 1
                                      for s in dataset.samples])), 1.0)
            samples_per_batch = max(rows, int(rows * seq_len / mean) + rows)
        self.spb = samples_per_batch
        self.rng = np.random.default_rng(seed)
        self.shard_count = shard_count
        self.shard_index = shard_index

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray,
                                         np.ndarray, np.ndarray]]:
        carry: List[Sample] = []
        while True:
            order = self.rng.permutation(len(self.ds))
            order = order[self.shard_index::self.shard_count]
            queue = [self.ds[j] for j in order]
            while queue or carry:
                take = max(0, self.spb - len(carry))
                offer = carry + queue[:take]
                queue = queue[take:]
                if not queue and len(offer) < self.rows:
                    carry = offer       # tail too thin: next epoch tops up
                    break
                text, targets, seg, pos, carry = collate_packed(
                    offer, self.cfg, rows=self.rows, seq_len=self.seq_len)
                yield text, targets, seg, pos


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
