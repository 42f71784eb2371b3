"""Whisper speech-recognition model in JAX — the full-TPU ASR host.

The reference transcribes voice-chat input with an HF Whisper pipeline on
CUDA (``/root/reference/inference/asr.py:14-168``: ``pipeline(
"automatic-speech-recognition", model="openai/whisper-<v>")``, base64
int16 PCM in, task=translate iff source != target language).  The
``streams/asr.py`` adapter reproduces that on the host; THIS module puts
the model itself on the TPU so the whole voice-chat stack — ASR, LLM,
TTS — runs on one chip:

* log-mel frontend as a jitted JAX function (HF ``WhisperFeatureExtractor``
  numerics: slaney-scale/slaney-norm mel filters, hann STFT, the
  max-8 dB dynamic-range clamp);
* encoder = 2 strided convs + non-causal transformer, stacked-layer
  params walked by one ``lax.scan`` (one compiled layer body);
* decoder with a fixed-capacity self-attention KV cache carried
  functionally through jit, cross-attention over per-layer K/V computed
  ONCE per utterance, and greedy block decode — N tokens per device
  program, EOS rows frozen in-program (the host sees one dispatch per
  block, same discipline as ``models/decoder.py`` / ``models/llama.py``);
* static shapes everywhere: audio pads to the 30 s window (3000 mel
  frames -> 1500 encoder positions), the decoder cache is
  ``max_target_positions`` rows.

Weight layout matches ``tools/convert.py::convert_whisper_state_dict``
(HF ``WhisperForConditionalGeneration`` checkpoints); numerics are
verified against the HF torch implementation in ``tests/test_whisper.py``.
"""
from __future__ import annotations

import dataclasses
import math
from functools import lru_cache, partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from llmvox_tpu.ops import nn as ops


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    """Mirrors the HF ``WhisperConfig`` fields the forward pass needs.
    Real checkpoints (tiny..large-v3) all have lane-friendly head dims
    (64); the mel/frame geometry is fixed across the family."""
    vocab_size: int = 51865
    n_mels: int = 80
    d_model: int = 384
    enc_layers: int = 4
    dec_layers: int = 4
    enc_heads: int = 6
    dec_heads: int = 6
    enc_ffn: int = 1536
    dec_ffn: int = 1536
    max_source_positions: int = 1500
    max_target_positions: int = 448
    # audio frontend (constant across the Whisper family)
    sample_rate: int = 16000
    n_fft: int = 400
    hop_length: int = 160
    # special ids (from the checkpoint's generation config)
    decoder_start_token_id: int = 50258
    eos_token_id: int = 50257

    @property
    def enc_head_dim(self) -> int:
        assert self.d_model % self.enc_heads == 0
        return self.d_model // self.enc_heads

    @property
    def dec_head_dim(self) -> int:
        assert self.d_model % self.dec_heads == 0
        return self.d_model // self.dec_heads

    @property
    def n_audio_frames(self) -> int:
        """Mel frames in the fixed 30 s window (HF pads/truncates here)."""
        return 2 * self.max_source_positions


jax.tree_util.register_static(WhisperConfig)


# ---------------------------------------------------------------------------
# log-mel frontend (HF WhisperFeatureExtractor numerics)
# ---------------------------------------------------------------------------


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    logstep = math.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_hz / f_sp + np.log(np.maximum(f, 1e-10)
                                               / min_log_hz) / logstep,
                    mels)


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@lru_cache(maxsize=4)
def whisper_mel_filters(sample_rate: int = 16000, n_fft: int = 400,
                        n_mels: int = 80) -> np.ndarray:
    """(n_freqs, n_mels) slaney-scale, slaney-normalized triangular bank —
    HF ``mel_filter_bank(..., norm="slaney", mel_scale="slaney")``, the
    filters every Whisper checkpoint was trained with (librosa's
    defaults, unlike the HTK/no-norm bank in ``codec/mel.py``)."""
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_slaney(0.0),
                        _hz_to_mel_slaney(sample_rate / 2.0), n_mels + 2)
    f_pts = _mel_to_hz_slaney(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    enorm = 2.0 / (f_pts[2: n_mels + 2] - f_pts[:n_mels])
    return (fb * enorm[None, :]).astype(np.float32)


@partial(jax.jit, static_argnames=("cfg",))
def log_mel(audio: jnp.ndarray, cfg: WhisperConfig) -> jnp.ndarray:
    """(B, n_samples) float32 in [-1, 1], already padded/truncated to the
    30 s window (``pad_or_trim``) -> (B, n_frames, n_mels) log-mel
    features, bit-matching HF's numpy extractor to float tolerance:
    power spectrogram, slaney mel bank, log10 clamped at 1e-10, per-clip
    dynamic-range floor at max - 8 dB, then (x + 4) / 4."""
    from llmvox_tpu.codec.mel import stft
    spec = stft(audio, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                center=True)                      # (B, F+1, bins) complex
    power = jnp.square(jnp.abs(spec))[:, :-1]     # HF drops the last frame
    fb = jnp.asarray(whisper_mel_filters(cfg.sample_rate, cfg.n_fft,
                                         cfg.n_mels))
    mel = jnp.einsum("btf,fm->btm", power, fb)
    logspec = jnp.log10(jnp.maximum(mel, 1e-10))
    floor = jnp.max(logspec, axis=(1, 2), keepdims=True) - 8.0
    return (jnp.maximum(logspec, floor) + 4.0) / 4.0


def pad_or_trim(audio: np.ndarray, cfg: WhisperConfig,
                n_frames: int | None = None) -> np.ndarray:
    """(T,) or (B, T) -> (B, window) zero-padded/truncated host-side.

    ``n_frames`` overrides the 30 s window with a shorter mel-frame
    count (the whisper.cpp ``audio_ctx`` trick): the encoder slices its
    positional table to the actual length, so a short utterance can run
    in a proportionally cheaper window.  Callers pick ``n_frames`` from
    a bucket ladder so each bucket compiles exactly once
    (streams/asr.py::JAXWhisperASR._pick_ctx)."""
    audio = np.atleast_2d(np.asarray(audio, np.float32))
    n = (n_frames or cfg.n_audio_frames) * cfg.hop_length
    if audio.shape[1] >= n:
        return audio[:, :n]
    return np.pad(audio, ((0, 0), (0, n - audio.shape[1])))


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------


def init_whisper_params(key: jax.Array, cfg: WhisperConfig) -> Dict:
    """Random params in the converted-checkpoint layout (HF init scale)."""
    d = cfg.d_model
    ks = iter(jax.random.split(key, 24))

    def norm(k, shape):
        return 0.02 * jax.random.normal(k, shape, jnp.float32)

    def attn(k, n_layer):
        sub = iter(jax.random.split(k, 8))
        p = {
            "wq": norm(next(sub), (n_layer, d, d)),
            "bq": jnp.zeros((n_layer, d)),
            "wk": norm(next(sub), (n_layer, d, d)),
            "wv": norm(next(sub), (n_layer, d, d)),
            "bv": jnp.zeros((n_layer, d)),
            "wo": norm(next(sub), (n_layer, d, d)),
            "bo": jnp.zeros((n_layer, d)),
        }
        return p

    def layer_common(k, n_layer, ffn):
        sub = iter(jax.random.split(k, 4))
        return {
            "ln1_s": jnp.ones((n_layer, d)), "ln1_b": jnp.zeros((n_layer, d)),
            "ln2_s": jnp.ones((n_layer, d)), "ln2_b": jnp.zeros((n_layer, d)),
            "fc1_w": norm(next(sub), (n_layer, d, ffn)),
            "fc1_b": jnp.zeros((n_layer, ffn)),
            "fc2_w": norm(next(sub), (n_layer, ffn, d)),
            "fc2_b": jnp.zeros((n_layer, d)),
        }

    enc_h = layer_common(next(ks), cfg.enc_layers, cfg.enc_ffn)
    enc_h.update(attn(next(ks), cfg.enc_layers))
    dec_h = layer_common(next(ks), cfg.dec_layers, cfg.dec_ffn)
    dec_h.update(attn(next(ks), cfg.dec_layers))
    dec_h.update({"x" + k: v for k, v in
                  attn(next(ks), cfg.dec_layers).items()})
    dec_h.update({"lnx_s": jnp.ones((cfg.dec_layers, d)),
                  "lnx_b": jnp.zeros((cfg.dec_layers, d))})
    return {
        "enc": {
            "conv1_w": norm(next(ks), (3, cfg.n_mels, d)),
            "conv1_b": jnp.zeros((d,)),
            "conv2_w": norm(next(ks), (3, d, d)),
            "conv2_b": jnp.zeros((d,)),
            "pos": norm(next(ks), (cfg.max_source_positions, d)),
            "h": enc_h,
            "lnf_s": jnp.ones((d,)), "lnf_b": jnp.zeros((d,)),
        },
        "dec": {
            "tok_emb": norm(next(ks), (cfg.vocab_size, d)),
            "pos": norm(next(ks), (cfg.max_target_positions, d)),
            "h": dec_h,
            "lnf_s": jnp.ones((d,)), "lnf_b": jnp.zeros((d,)),
        },
    }


def num_whisper_params(params: Dict) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# attention helper (HF WhisperAttention numerics: q scaled by hd^-0.5,
# f32 softmax)
# ---------------------------------------------------------------------------


def _mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """q: (B, T, H, hd); k/v: (B, S, H, hd); mask (T, S) or (B, T, S)
    bool (True = attend).  Returns (B, T, H, hd)."""
    hd = q.shape[-1]
    scale = 1.0 / math.sqrt(hd)
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32,
                        precision=ops.mm_precision(q.dtype)) * scale
    if mask is not None:
        if mask.ndim == 2:
            mask = mask[None]
        logits = jnp.where(mask[:, None], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhts,bshd->bthd", w, v,
                     precision=ops.mm_precision(q.dtype))
    return out


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg",))
def encode(params: Dict, mel: jnp.ndarray,
           cfg: WhisperConfig) -> jnp.ndarray:
    """(B, n_frames, n_mels) log-mel -> (B, S=n_frames/2, d) encoder states.

    HF WhisperEncoder: conv(k3,p1)+gelu, conv(k3,s2,p1)+gelu, + learned
    sinusoid table, pre-norm transformer, final LayerNorm."""
    p = params["enc"]
    b = mel.shape[0]
    # run the encoder in the parameter dtype: log_mel returns f32 (its
    # numerics are the HF extractor contract), but under bf16 serving the
    # whole stack — and the cross-KV it feeds — must stay bf16, or the
    # decoder residual silently promotes to f32 (scan carry mismatch)
    mel = mel.astype(p["conv1_w"].dtype)
    x = ops.gelu_exact(ops.conv1d(mel, p["conv1_w"], p["conv1_b"],
                                  padding=1))
    x = ops.gelu_exact(ops.conv1d(x, p["conv2_w"], p["conv2_b"],
                                  stride=2, padding=1))
    s = x.shape[1]
    x = x + p["pos"][None, :s].astype(x.dtype)
    hd = cfg.enc_head_dim

    def block(x, lp):
        h = ops.layer_norm(x, lp["ln1_s"], lp["ln1_b"], 1e-5)
        q = ops.linear(h, lp["wq"], lp["bq"]).reshape(b, s, cfg.enc_heads, hd)
        k = ops.linear(h, lp["wk"]).reshape(b, s, cfg.enc_heads, hd)
        v = ops.linear(h, lp["wv"], lp["bv"]).reshape(b, s, cfg.enc_heads, hd)
        att = _mha(q, k, v)
        x = x + ops.linear(att.reshape(b, s, cfg.d_model), lp["wo"],
                           lp["bo"])
        h = ops.layer_norm(x, lp["ln2_s"], lp["ln2_b"], 1e-5)
        h = ops.gelu_exact(ops.linear(h, lp["fc1_w"], lp["fc1_b"]))
        x = x + ops.linear(h, lp["fc2_w"], lp["fc2_b"])
        return x, None

    x, _ = lax.scan(block, x, p["h"])
    return ops.layer_norm(x, p["lnf_s"], p["lnf_b"], 1e-5)


# ---------------------------------------------------------------------------
# decoder with KV cache + precomputed cross-attention K/V
# ---------------------------------------------------------------------------


class CrossKV(NamedTuple):
    k: jnp.ndarray        # (L, B, S, H, hd)
    v: jnp.ndarray


class WhisperDecodeState(NamedTuple):
    k: jnp.ndarray        # (L, B, cap, H, hd) self-attention cache
    v: jnp.ndarray
    pos: jnp.ndarray      # scalar int32: tokens cached so far
    done: jnp.ndarray     # (B,) bool: row emitted EOS (sticky)


def init_whisper_decode_state(cfg: WhisperConfig, batch: int = 1,
                              dtype=jnp.float32) -> WhisperDecodeState:
    shape = (cfg.dec_layers, batch, cfg.max_target_positions,
             cfg.dec_heads, cfg.dec_head_dim)
    return WhisperDecodeState(jnp.zeros(shape, dtype),
                              jnp.zeros(shape, dtype),
                              jnp.asarray(0, jnp.int32),
                              jnp.zeros((batch,), jnp.bool_))


@partial(jax.jit, static_argnames=("cfg",))
def make_cross_kv(params: Dict, enc_out: jnp.ndarray,
                  cfg: WhisperConfig) -> CrossKV:
    """Per-layer cross-attention K/V from the encoder output — computed
    once per utterance, reused by every decode step (the HF
    ``past_key_values`` cross half)."""
    b, s, d = enc_out.shape
    hd = cfg.dec_head_dim
    hh = params["dec"]["h"]
    k = jnp.einsum("bsc,lcd->lbsd", enc_out, hh["xwk"],
                   precision=ops.mm_precision(enc_out.dtype))
    v = jnp.einsum("bsc,lcd->lbsd", enc_out, hh["xwv"],
                   precision=ops.mm_precision(enc_out.dtype))
    v = v + hh["xbv"][:, None, None, :]
    shape = (cfg.dec_layers, b, s, cfg.dec_heads, hd)
    return CrossKV(k.reshape(shape), v.reshape(shape))


def _decoder_layer(lp: Dict, x: jnp.ndarray, k_cache, v_cache, xk, xv,
                   pos, cfg: WhisperConfig):
    """One decoder layer for T new tokens at positions pos..pos+T-1."""
    b, t, _ = x.shape
    hd = cfg.dec_head_dim
    h = ops.layer_norm(x, lp["ln1_s"], lp["ln1_b"], 1e-5)
    q = ops.linear(h, lp["wq"], lp["bq"]).reshape(b, t, cfg.dec_heads, hd)
    k = ops.linear(h, lp["wk"]).reshape(b, t, cfg.dec_heads, hd)
    v = ops.linear(h, lp["wv"], lp["bv"]).reshape(b, t, cfg.dec_heads, hd)
    k_cache = lax.dynamic_update_slice(
        k_cache, k.astype(k_cache.dtype), (0, pos, 0, 0))
    v_cache = lax.dynamic_update_slice(
        v_cache, v.astype(v_cache.dtype), (0, pos, 0, 0))
    s = k_cache.shape[1]
    jpos = lax.broadcasted_iota(jnp.int32, (t, s), 1)
    ipos = lax.broadcasted_iota(jnp.int32, (t, s), 0)
    # cache/cross dtypes may differ from the activation dtype — cast after
    # the value matmul so the residual stream keeps x's dtype through the
    # scan carry (same rule as models/llama.py::_layer_step_rows)
    att = _mha(q, k_cache, v_cache, jpos <= pos + ipos).astype(x.dtype)
    x = x + ops.linear(att.reshape(b, t, cfg.d_model), lp["wo"], lp["bo"])
    h = ops.layer_norm(x, lp["lnx_s"], lp["lnx_b"], 1e-5)
    q = ops.linear(h, lp["xwq"], lp["xbq"]).reshape(b, t, cfg.dec_heads, hd)
    att = _mha(q, xk, xv).astype(x.dtype)
    x = x + ops.linear(att.reshape(b, t, cfg.d_model), lp["xwo"], lp["xbo"])
    h = ops.layer_norm(x, lp["ln2_s"], lp["ln2_b"], 1e-5)
    h = ops.gelu_exact(ops.linear(h, lp["fc1_w"], lp["fc1_b"]))
    x = x + ops.linear(h, lp["fc2_w"], lp["fc2_b"])
    return x, k_cache, v_cache


def _decoder_forward(params: Dict, tokens: jnp.ndarray,
                     state: WhisperDecodeState, cross: CrossKV,
                     cfg: WhisperConfig):
    """(B, T) new tokens -> (B, T, d) final hidden states; cache extended."""
    p = params["dec"]
    t = tokens.shape[1]
    positions = state.pos + jnp.arange(t)
    x = p["tok_emb"][tokens] + p["pos"][positions][None]

    def body(carry, scan_in):
        x = carry
        lp, kc, vc, xk, xv = scan_in
        x, kc, vc = _decoder_layer(lp, x, kc, vc, xk, xv, state.pos, cfg)
        return x, (kc, vc)

    x, (new_k, new_v) = lax.scan(
        body, x, (p["h"], state.k, state.v, cross.k, cross.v))
    x = ops.layer_norm(x, p["lnf_s"], p["lnf_b"], 1e-5)
    return x, state._replace(k=new_k, v=new_v, pos=state.pos + t)


def _logits(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Tied output head: hidden -> vocab (HF proj_out = embed_tokens)."""
    return ops.linear(x, params["dec"]["tok_emb"].T)


@partial(jax.jit, static_argnames=("cfg",))
def prefill(params: Dict, tokens: jnp.ndarray, state: WhisperDecodeState,
            cross: CrossKV, cfg: WhisperConfig
            ) -> Tuple[jnp.ndarray, WhisperDecodeState]:
    """Run the forced prompt (B, Tf) through the decoder; returns
    (B, Tf, V) logits at EVERY position (language detection reads the
    <|sot|> position, generation reads the last) + the extended state."""
    x, state = _decoder_forward(params, tokens, state, cross, cfg)
    return _logits(params, x), state


def _suppress(logits: jnp.ndarray, suppress: Tuple[int, ...]) -> jnp.ndarray:
    if not suppress:
        return logits
    idx = jnp.asarray(suppress, jnp.int32)
    return logits.at[..., idx].set(-jnp.inf)


@partial(jax.jit, static_argnames=("cfg", "block", "suppress"))
def decode_block(params: Dict, first_token: jnp.ndarray,
                 state: WhisperDecodeState, cross: CrossKV,
                 cfg: WhisperConfig, block: int = 16,
                 suppress: Tuple[int, ...] = ()
                 ) -> Tuple[jnp.ndarray, WhisperDecodeState]:
    """Greedy-generate ``block`` tokens on-device from ``first_token``
    (B,) int32.  Rows that emit EOS freeze (sticky ``state.done``; frozen
    rows keep emitting EOS, matching HF generate's pad-after-finish).
    Returns the tokens generated AFTER first_token: (B, block), + state.
    ``suppress`` (static) masks token ids to -inf before the argmax (the
    checkpoint generation config's ``suppress_tokens``)."""
    eos = jnp.int32(cfg.eos_token_id)

    def step(carry, _):
        tok, state, done = carry
        x, state = _decoder_forward(params, tok[:, None], state, cross, cfg)
        logits = _suppress(_logits(params, x[:, -1]), suppress)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, eos, nxt)
        done = done | (nxt == eos)
        return (nxt, state, done), nxt

    (tok, state, done), toks = lax.scan(
        step, (first_token, state, state.done), None, length=block)
    return toks.swapaxes(0, 1), state._replace(done=done)
