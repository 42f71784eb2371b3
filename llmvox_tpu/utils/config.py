"""Typed configuration system for LLMVoX-TPU.

One dataclass-based config serves training and serving, replacing the
reference's plain dicts merged with argparse (reference:
configs/inference_config.py:4-54, configs/train_config.py:10-69,
train.py:139-147).  Every reference knob has a counterpart here, and CLI
overrides follow the same rule: only flags the user actually passed
override the defaults.  The reference's `type=bool` argparse bug (any
non-empty string is truthy) is fixed with a real str2bool.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple


def _str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("1", "true", "t", "yes", "y", "on"):
        return True
    if s in ("0", "false", "f", "no", "n", "off"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


@dataclass(frozen=True)
class DecoderConfig:
    """Architecture of the GPT-style speech-token decoder.

    Deployed values mirror the reference (configs/train_config.py:17-22,
    src/model.py:135-147): 4 layers, 8 heads, width 768, block 8192,
    no biases, 4096 speech codes.
    """

    n_layer: int = 4
    n_head: int = 8
    n_embd: int = 768
    block_size: int = 8192
    vocab_size: int = 4096
    dropout: float = 0.0
    bias: bool = False

    # Input-embedding scheme: concat(text byte-embedding, speech feature)
    # then L2-normalize (reference src/data.py:281-287).
    text_embed_dim: int = 256
    speech_embed_dim: int = 512

    # Special token-id conventions (reference src/data.py:24-26,
    # configs/inference_config.py:40-41).
    text_vocab_size: int = 386   # 384 byte/special ids + [PAD]=384 + EOS=385
    pad_token_id: int = 384
    text_eos_id: int = 385
    eoa_token_id: int = 453
    ignore_index: int = -1000

    ln_eps: float = 1e-5

    # Speculative decoding (beyond-reference, VERDICT r2 #7): extra
    # prediction heads trained to guess tokens t+2..t+1+n from position
    # t's hidden state (Medusa/MTP style).  0 = off (deployed parity).
    # Decode-time use: models/decoder.py::decode_block_spec verifies the
    # drafts in one parallel forward and accepts the matching prefix —
    # output is bit-identical to greedy decode_block regardless of draft
    # quality; trained heads only change how many steps it takes.
    n_draft_heads: int = 0

    # TPU runtime knobs (no reference counterpart)
    unroll_layers: bool = False   # unroll the decode layer loop (compile
                                  # time vs marginal step speed)
    use_pallas_attention: bool = False  # Pallas fused decode attention
    remat_layers: bool = False    # jax.checkpoint each transformer block
                                  # in training (needed for bs >= 8 at
                                  # T=8192 on one 16 GB chip)

    @property
    def head_dim(self) -> int:
        assert self.n_embd % self.n_head == 0
        return self.n_embd // self.n_head


@dataclass(frozen=True)
class CodecConfig:
    """WavTokenizer codec architecture (deployed: large-speech-320-24k).

    Mirrors WavTokenizer/configs/wavtokenizer_smalldata_frame75_...yaml:39-65
    and decoder/feature_extractors.py:54-95.
    """

    sample_rate: int = 24000
    # SEANet encoder
    downsamples: Tuple[int, ...] = (8, 5, 4, 2)   # 320x total -> 75 frames/s
    n_filters: int = 32
    seanet_dimension: int = 512
    seanet_kernel_size: int = 7
    seanet_last_kernel_size: int = 7
    seanet_residual_kernel_size: int = 3
    seanet_dilation_base: int = 2
    seanet_n_residual_layers: int = 1
    seanet_lstm_layers: int = 2
    seanet_compress: int = 2
    # Vector quantizer
    vq_bins: int = 4096
    vq_dim: int = 512
    num_quantizers: int = 1
    vq_kmeans_iters: int = 200
    vq_decay: float = 0.99
    # ConvNeXt backbone
    backbone_input_channels: int = 512
    backbone_dim: int = 768
    backbone_intermediate_dim: int = 2304
    backbone_num_layers: int = 12
    adanorm_num_embeddings: int = 4
    # ISTFT head
    n_fft: int = 1280
    hop_length: int = 320
    padding: str = "same"

    ln_eps: float = 1e-6
    groupnorm_groups: int = 32
    groupnorm_eps: float = 1e-6

    @property
    def total_downsample(self) -> int:
        out = 1
        for r in self.downsamples:
            out *= r
        return out

    @property
    def samples_per_token(self) -> int:
        # 24000/320 = 75 tokens/s; 320 samples per token at hop 320.
        return self.hop_length


@dataclass(frozen=True)
class ServeConfig:
    """Serving/runtime knobs, mirroring configs/inference_config.py:4-54."""

    chat_type: str = "text"  # ['text','voice','multimodal','visual_speech']

    # Model/checkpoint paths (converted .npz / orbax; see tools/convert)
    wav_config_path: str = ""
    wav_model_path: str = ""
    encoder_model_path: str = "charsiu/g2p_multilingual_byT5_tiny_16_layers_100"
    tokenizer_path: str = "google/byt5-small"
    llmvox_checkpoint_path: str = ""

    # Text-stream source: when ``scripted_reply`` is non-empty the server
    # answers every request with this fixed text through a ScriptedStream
    # (demo/smoke-test mode, no LLM needed); otherwise the chat_type-
    # appropriate HF streamer is loaded.
    scripted_reply: str = ""

    # LLM settings (external text-stream source)
    llm_checkpoint: str = "meta-llama/Llama-3.1-8B-Instruct"
    llm_device: str = "cpu"
    llm_max_tokens: int = 1000
    llm_temperature: float = 0.7
    llm_top_p: float = 0.95
    llm_top_k: int = 40
    # "hf" = torch AutoModelForCausalLM host (reference-style); "jax" =
    # the TPU-hosted models/llama.py behind the same stream protocol
    # (llm_jax_params: converted npz from tools/convert_ckpt llama;
    # llm_checkpoint still names the tokenizer)
    llm_backend: str = "hf"
    llm_jax_params: str = ""
    # tokens per LLM device dispatch; over a tunneled chip each block
    # costs ~1 RTT, so 32 halves the text-side step count vs 16 (the
    # reply still streams to TTS in sub-25 ms lumps at 1.4k+ tok/s)
    llm_block: int = 32
    # Smaller FIRST decode block for a fresh pooled request (the TTS
    # engines' first_decode_block pattern applied to the LLM pool,
    # VERDICT r3 #1): the voice pipeline can't synthesize its first
    # audio chunk until ~initial_dump_size_1 characters of reply text
    # exist, and those arrive with the request's first decode block — a
    # short first block brings them forward.  Applied only to steps
    # whose every row is on its first block, so established streams are
    # never slowed.  0 disables.
    llm_first_block: int = 16
    # > 0: serve the jax backend through the continuous-batching LLM pool
    # (serve/llm_pool.py) — concurrent requests share ONE batched decode
    # program instead of serializing private B=1 generate loops
    llm_pool_capacity: int = 0
    # prompt-prefill bucket ladder for the pooled path (right-padded;
    # prompts beyond the top bucket chunk-prefill, or keep their tail
    # when llm_chunked_prefill is off)
    llm_prefill_buckets: tuple = (32, 64, 128, 256, 512)
    # Prefill prompts longer than the top bucket in bucket-width chunks
    # (models/llama.py::prefill_slots_continue) up to the model context,
    # matching the reference HF path's full-history prompts; off =
    # left-truncate at the top bucket (pre-r3.6).
    llm_chunked_prefill: bool = True
    # Merge burst arrivals' prefills across buckets into full
    # PREFILL_BATCH chunks (fewer programs per burst; see
    # serve/llm_pool.py::_run_prefills).  Disable for FLOPs-bound
    # big-model shapes where per-bucket grouping's tighter padding wins.
    llm_prefill_merge: bool = True
    # > 0: speculative decode in the LLM pool with this many draft
    # positions per step (models/llama.py::decode_block_spec_pooled).
    # Requires draft heads in the converted checkpoint
    # (cfg.n_draft_heads > 0); falls back to the normal pooled block
    # otherwise.  Greedy (llm_temperature 0) commits the verifier's
    # argmax chain (token-identical); sampled mode uses rejection
    # sampling (distribution-exact under the same temperature/top-k/
    # top-p filtering).  Either way the output law is unchanged — this
    # only reduces sequential forwards per block.
    llm_spec_k: int = 0
    # Adaptive speculation depth for the LLM pool (the llm counterpart
    # of spec_k_ladder): a ladder of k_draft rungs compiled side by side
    # and switched between at step boundaries from the live accept rate
    # (serve/spec_control.py).  Rung 0 = the plain pooled block is
    # always included, so a served checkpoint whose draft heads
    # misbehave degrades to greedy speed, never below (VERDICT r3 #4).
    # Empty = fixed llm_spec_k.
    llm_spec_ladder: Tuple[int, ...] = ()
    # Per-request sampling in the LLM pool: every pooled program takes
    # per-row (temperature, top_k, top_p) vectors, so each request can
    # carry its own knobs in the POST body (greedy rows exact, sampled
    # rows distribution-exact, no recompile per config).  Opt-in: the
    # row filter costs a per-step sort even when all rows are greedy.
    llm_per_request_sampling: bool = False
    # Pin the system prompt's KV in the LLM pool (LLMPool.set_prefix):
    # every voice-chat request repeats the same preamble, so its prefill
    # is computed once and scattered into each slot; requests that don't
    # start with it fall back to the plain prefill path silently.
    llm_prefix_cache: bool = True

    # TTS replica placement: indices into jax.devices()
    tts_device_1: int = 0
    tts_device_2: int = 0

    # Streaming scheduler knobs (configs/inference_config.py:29-33)
    system_prompt: str = (
        "You are a friendly voicebot that answers questions in a concise way "
        "and do not use abbreviation.Give short responses"
    )
    initial_dump_size_1: int = 10
    initial_dump_size_2: int = 160
    max_dump_size: int = 1280
    max_audio_length: int = 8000
    dump_growth_factor: int = 3

    # Special tokens
    eos_token: str = "<|eot_id|>"
    pad_token_id: int = 384
    eoa_token_id: int = 453

    # API settings
    api_host: str = "0.0.0.0"
    api_port: int = 5003

    # ASR settings
    asr_model: str = "small"
    asr_device: str = "cpu"
    # "hf": host HF pipeline (reference parity, inference/asr.py);
    # "jax": TPU-hosted models/whisper.py behind the same interface
    asr_backend: str = "hf"
    asr_sample_rate: float = 16000.0
    asr_max_audio_length: int = 60
    asr_default_language: str = "english"
    asr_enable_translation: bool = False
    # Overlap the voice-chat ASR leg with LLM prefill (VERDICT r3 #3):
    # with the JAX Whisper backend + the pooled JAX LLM, stable partial
    # transcripts (greedy decode — emitted tokens are final) prefill into
    # the LLM pool while the utterance's tail still decodes, instead of
    # the reference's strictly serial ASR -> LLM chain
    # (streaming_server.py:543-583).  Falls back to the serial path for
    # other backends or multi-window audio.
    s2s_overlap: bool = True
    # Encoder-context bucket ladder in mel frames (whisper.cpp
    # "audio_ctx" trick; VERDICT r4 #3): a short utterance is padded to
    # the smallest bucket instead of the full 30 s window, and the
    # encoder slices its positional table — a 5 s utterance runs the
    # encoder + cross-attention at 1/5 the positions.  Each bucket is a
    # separately compiled program chain (warm them all).  Empty tuple
    # disables (full-window parity behavior).  The last decode of the
    # stream can re-verify at the full window (asr_ctx_verify) and
    # yield a corrected final transcript — the overlapped voice-chat
    # consumer already revises via PromptRestart.
    asr_ctx_buckets: tuple = (600, 1200, 3000)
    asr_ctx_verify: bool = False

    # TPU runtime knobs (new; no reference counterpart)
    decode_block: int = 32        # tokens generated per device call
    # Adaptive block growth: once a sentence has generated
    # ``decode_block_switch`` tokens (the dump ladder is past its small
    # first chunks), decode in ``decode_block_large``-token calls — fewer
    # host round-trips per second of audio at the cost of coarser EOA
    # detection.  Set decode_block_large=0 to disable.
    decode_block_large: int = 128
    decode_block_switch: int = 192
    # Smaller FIRST block for the sentence's first device call (dedicated
    # engines only): the first chunk needs just ``initial_dump_size_1``
    # tokens, so decoding a short block shaves the extra steps off the
    # first-audio latency.  0 disables (first block = decode_block).
    first_decode_block: int = 16
    # Fuse the sentence's first decode block with synthesis of its first
    # dump-size chunk into one device program: the first audio chunk costs
    # one host round-trip instead of two.
    fused_first_chunk: bool = True
    compute_dtype: str = "bfloat16"
    chunk_buckets: Tuple[int, ...] = (16, 32, 96, 288, 512, 896, 1280)
    # Speculative decode in the dedicated engines: requires a checkpoint
    # trained with DecoderConfig.n_draft_heads (models/decoder.py);
    # output stays bit-identical to greedy, good heads cut sequential
    # steps per block up to (1 + spec_k_draft)x
    spec_decode: bool = False
    spec_k_draft: int = 4
    # Adaptive speculation depth for the POOL (serve/spec_control.py):
    # a ladder of k_draft rungs the pool compiles and switches between
    # at step boundaries from the live accept rate — rung 0 (plain
    # greedy) is always included, so a checkpoint whose draft heads
    # never accept degrades to greedy speed instead of a 2x loss.
    # Empty = fixed spec_k_draft.  Needs spec_decode=True.
    spec_k_ladder: Tuple[int, ...] = ()

    # Int8 quantization for the TPU-hosted serving models (speech
    # decoder, Llama LLM, Whisper ASR) — beyond reference: the CUDA
    # reference has no quantized path.  "" = off; "w8" = weight-only
    # (weights store int8 + per-output-channel scales, dequantized into
    # the matmul operand); "w8a8" = int8xint8 MXU compute with dynamic
    # per-token activation quantization (lm heads stay weight-only);
    # "w4" = weight-only int4 with group-wise scales (TPU packs s4 two
    # per byte in HBM — 4x fewer weight bytes per decode step; lm heads
    # stay w8).  ops/quant.py; parity bounds in tests/test_quant.py.
    quantize: str = ""

    pool_capacity: int = 0        # >0: continuous-batching pool slots
    # Occupancy-adaptive capacity ladder (overrides pool_capacity when
    # set, e.g. (16, 32)): one DecodePool per rung, engines migrate to
    # the smallest rung covering demand at sentence boundaries
    # (serve/pool.py::PoolLadder — step cost scales with pool CAPACITY,
    # so a big always-on pool taxes low-concurrency traffic)
    pool_ladder: Tuple[int, ...] = ()
    # >1: shard the pool's slot batch over a dp mesh of this many chips
    # (one shard_map'd decode program across the slice; capacity must
    # divide by it).  1 = single-device pool.
    pool_mesh_dp: int = 1
    # Pool decode block (0 = use decode_block): the REQUEST granularity —
    # a sentence's first chunk waits one scan of this size.  With
    # ``pool_merge_blocks`` the pool fuses two queued requests per slot
    # into one 2x-wide step at steady state, so throughput matches the
    # big block while first chunks keep the small one: measured r3
    # (benchmarks/pool_profile, depth-2 pipeline), fixed 32 -> 33x 4-way
    # agg RTF @ ~68 ms first chunk; fixed 64 -> 50x @ ~90 ms; merged
    # 32/64 targets 50x @ ~70 ms.  EOA overshoot stays masked on device;
    # the dedicated path keeps its own 32/16/128 ladder.
    pool_decode_block: int = 32
                                  # (2 per request); 0: dedicated replicas
    # Fuse two queued block requests per slot into one double-width pool
    # step when demand allows (exactness argument in
    # serve/pool.py::_dispatch_step).
    pool_merge_blocks: bool = True
    # In-flight pool steps (serve/pool.py::_step_loop).  Fetch round
    # trips overlap on the transport (benchmarks/fetch_probe.py: serial
    # fetches pay ~29 ms RTT each, concurrent fetches of chained steps
    # cost ~device time), so keeping K steps in flight with concurrent
    # fetch tasks makes the loop decode-bound instead of RTT-bound:
    # measured ms/step at B=16: block 32: 20.5 (depth 1) -> 14.5
    # (depth 2); block 64: 25.0 -> 19.6.  Consumers issue ahead one
    # block (2 outstanding per slot), so depth 2 is fillable at steady
    # state; >2 only helps when slots are staggered.
    pool_pipeline_depth: int = 2

    def dump_size_ladder(self, initial: int) -> List[int]:
        """The ×3-growth chunk schedule (streaming_server.py:373-376)."""
        sizes, d = [], initial
        while True:
            sizes.append(d)
            if d >= self.max_dump_size:
                break
            d = min(d * self.dump_growth_factor, self.max_dump_size)
        return sizes


@dataclass(frozen=True)
class TrainConfig:
    """Decoder-training knobs, mirroring configs/train_config.py:10-69."""

    # System
    dtype: str = "bfloat16"
    seed: int = 1337

    # Model init
    init_from: str = "scratch"  # ['scratch','resume','gpt2',...]
    out_dir: str = "results"
    checkpoint_filename: str = "ckpt"

    # Paths
    encoder_model_path: str = "charsiu/g2p_multilingual_byT5_tiny_16_layers_100"
    tokenizer_path: str = "google/byt5-small"
    wav_config_path: str = ""
    wav_model_path: str = ""
    data_path: str = ""
    speech_data_folder: str = ""

    # Control
    eval_interval: int = 100
    log_interval: int = 1
    eval_iters: int = 1
    eval_only: bool = False
    always_save_checkpoint: bool = False

    # Logging
    wandb_log: bool = False
    wandb_project: str = "llmvox_tpu"
    wandb_run_name: str = "run"

    # Hyperparameters
    gradient_accumulation_steps: int = 4
    batch_size: int = 2
    learning_rate: float = 3e-4
    max_iters: int = 2_600_000
    weight_decay: float = 1e-1
    beta1: float = 0.9
    beta2: float = 0.95
    adam_eps: float = 1e-5
    grad_clip: float = 1.0

    # LR schedule
    decay_lr: bool = True
    warmup_iters: int = 500
    lr_decay_iters: int = 2_600_000
    min_lr: float = 3e-6

    # Parallelism (new): data-parallel size -1 means "all devices".
    # sp_size > 1 shards the sequence axis and swaps ring attention in
    # (ops/ring_attention.py) — for the attention-bound long-block
    # training shape (T=8192) where dp cannot shrink T.
    dp_size: int = -1
    tp_size: int = 1
    sp_size: int = 1
    # sp ring layout: "ring" (device i owns chunk i — critical path n
    # tiles) or "zigzag" (device i owns chunks i and 2n-1-i — balanced,
    # ~half the critical path; needs T % 2*sp == 0).  Both are
    # loss-identical to dp (tests/test_ring_attention.py).
    sp_layout: str = "ring"
    # FSDP/ZeRO-3: shard parameters + optimizer moments over dp
    # (parallel/sharding.py::decoder_fsdp_shardings) — per-chip state
    # memory drops by dp; XLA derives the gather/scatter schedule.
    fsdp: bool = False


@dataclass(frozen=True)
class CodecTrainConfig:
    """WavTokenizer GAN-training knobs, mirroring the Lightning config
    (WavTokenizer/configs/...frame75...yaml:20-93, decoder/experiment.py)."""

    sample_rate: int = 24000
    initial_learning_rate: float = 2e-4
    mel_loss_coeff: float = 45.0
    mrd_loss_coeff: float = 1.0
    commit_loss_coeff: float = 1000.0
    num_warmup_steps: int = 0
    pretrain_mel_steps: int = 0
    max_steps: int = 20_000_000
    adam_b1: float = 0.9
    adam_b2: float = 0.999

    # data (decoder/dataset.py:24-84)
    filelist_train: str = ""
    filelist_val: str = ""
    num_samples: int = 72000     # 3 s crops @ 24 kHz
    batch_size: int = 40
    val_batch_size: int = 5
    train_gain_db_range: Tuple[float, float] = (-6.0, -1.0)
    val_gain_db: float = -3.0

    # Discriminator families (full reference sets by default; reducible
    # for small-scale runs/tests)
    mpd_periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    mrd_resolutions: Tuple[Tuple[int, int, int], ...] = (
        (1024, 256, 1024), (2048, 512, 2048), (512, 128, 512))
    dac_periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    dac_fft_sizes: Tuple[int, ...] = (2048, 1024, 512)

    # VQ (feature_extractors.py:79-80)
    vq_decay: float = 0.99
    vq_kmeans_iters: int = 200
    vq_threshold_dead: float = 2.0

    # eval toggles (experiment.py:30-33); heavyweight external models
    # (UTMOS/PESQ) are optional plug-ins
    evaluate_utmos: bool = False
    evaluate_pesq: bool = False
    evaluate_periodicity: bool = False

    # GAN-step compilation granularity: "fused" (one program), "split"
    # (disc/gen halves — experiment.py's two optimizer_steps), "micro"
    # (per-sub-discriminator grad programs + cotangent-accumulated
    # generator VJP — same math, chosen when the deployed-shape halves
    # exceed the tunnel compile helper's memory budget)
    step_impl: str = "split"

    seed: int = 3407
    out_dir: str = "results_codec"
    log_interval: int = 100
    val_interval: int = 10000
    use_wandb: bool = False
    use_tensorboard: bool = False
    dp_size: int = -1


# ---------------------------------------------------------------------------
# CLI override machinery
# ---------------------------------------------------------------------------

_SIMPLE_TYPES = (int, float, str, bool)


def add_dataclass_args(parser: argparse.ArgumentParser, cls) -> None:
    """Register one optional CLI flag per dataclass field.

    Defaults are ``None`` so that only user-provided flags override config
    values (the reference preserves defaults the same way,
    streaming_server.py:79-87).
    """
    taken = {a.dest for a in parser._actions}
    for f in dataclasses.fields(cls):
        if f.name in taken:
            # fields shared by two registered configs (e.g. sample_rate on
            # CodecConfig and CodecTrainConfig): one flag feeds both via
            # apply_cli_overrides
            continue
        if f.type in ("bool", bool) or isinstance(f.default, bool):
            parser.add_argument(f"--{f.name}", type=_str2bool, default=None)
        elif isinstance(f.default, _SIMPLE_TYPES):
            parser.add_argument(f"--{f.name}", type=type(f.default), default=None)
        elif isinstance(f.default, tuple) or (
            f.default_factory is not dataclasses.MISSING  # type: ignore[misc]
        ):
            parser.add_argument(f"--{f.name}", type=json.loads, default=None)


def _deep_tuple(v):
    return tuple(_deep_tuple(x) for x in v) if isinstance(v, list) else v


def apply_cli_overrides(config, args: argparse.Namespace):
    """Return a copy of ``config`` with non-None CLI args applied."""
    updates = {}
    for f in dataclasses.fields(config):
        v = getattr(args, f.name, None)
        if v is not None:
            if isinstance(f.default, tuple) and isinstance(v, list):
                # JSON lists (possibly nested, e.g. mrd_resolutions) must
                # become tuples: frozen configs are jit static args and
                # need to stay hashable all the way down
                v = _deep_tuple(v)
            updates[f.name] = v
    return dataclasses.replace(config, **updates)


def config_from_cli(cls, argv: Optional[Sequence[str]] = None,
                    description: str = ""):
    parser = argparse.ArgumentParser(description=description)
    add_dataclass_args(parser, cls)
    args = parser.parse_args(argv)
    return apply_cli_overrides(cls(), args)


def to_dict(config) -> dict:
    return dataclasses.asdict(config)
