"""WavCodec: the WavTokenizer-compatible neural codec API.

TPU counterpart of WavTokenizer/decoder/pretrained.py:32-239.  Public
surface mirrors the reference:

- ``codes_to_features(codes)``  (pretrained.py:209-239)
- ``decode(features, bandwidth_id)``  (pretrained.py:192-207)
- ``decode_codes(codes)`` — fused lookup + decode, the serving hot path
- ``encode_infer(wav)``  (pretrained.py:187-189) — once the SEANet
  encoder params are present

Chunk synthesis is jitted per *bucket* length: the streaming scheduler's
x3 dump-size ladder is a fixed set of chunk sizes per config
(streaming_server.py:373-376), so each bucket compiles exactly once and
every later chunk reuses the compiled program; ragged chunks are padded
to the next bucket and trimmed host-side.
"""
from __future__ import annotations

import bisect
from functools import partial
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from llmvox_tpu.codec import backbone as bb
from llmvox_tpu.codec import heads, seanet
from llmvox_tpu.codec import vq
from llmvox_tpu.utils.config import CodecConfig

DEFAULT_BUCKETS = (16, 32, 96, 288, 512, 896, 1280)


def init_codec_params(key: jax.Array, cfg: CodecConfig,
                      with_encoder: bool = False,
                      with_decoder: bool = False) -> Dict:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    params = {
        "codebooks": vq.init_codebooks(k1, cfg.num_quantizers, cfg.vq_bins,
                                       cfg.vq_dim),
        "backbone": bb.init_backbone(k2, cfg),
        "head": heads.init_istft_head(k3, cfg),
    }
    if with_encoder:
        params["encoder"] = seanet.init_seanet_encoder(k4, cfg)
    if with_decoder:
        params["seanet_decoder"] = seanet.init_seanet_decoder(k5, cfg)
    return params


@partial(jax.jit, static_argnames=("cfg",))
def _decode_codes(params: Dict, codes: jnp.ndarray, bandwidth_id: jnp.ndarray,
                  valid_len: jnp.ndarray, cfg: CodecConfig) -> jnp.ndarray:
    feats = vq.codes_to_features(params["codebooks"], codes)
    h = bb.apply_backbone(params["backbone"], feats, bandwidth_id, cfg,
                          valid_len)
    return heads.apply_istft_head(params["head"], h, cfg, valid_len)


@partial(jax.jit, static_argnames=("cfg",))
def _decode_features(params: Dict, feats: jnp.ndarray, bandwidth_id: jnp.ndarray,
                     cfg: CodecConfig) -> jnp.ndarray:
    h = bb.apply_backbone(params["backbone"], feats, bandwidth_id, cfg)
    return heads.apply_istft_head(params["head"], h, cfg)


class WavCodec:
    """Parameter bundle + compiled decode programs for one device."""

    def __init__(self, params: Dict, cfg: Optional[CodecConfig] = None,
                 buckets: Sequence[int] = DEFAULT_BUCKETS,
                 device: Optional[jax.Device] = None):
        self.cfg = cfg or CodecConfig()
        if device is not None:
            params = jax.device_put(params, device)
        self.params = params
        self.device = device
        self.buckets = sorted(buckets)

    # -- factory ----------------------------------------------------------
    @classmethod
    def from_random(cls, seed: int = 0, cfg: Optional[CodecConfig] = None,
                    with_encoder: bool = False, with_decoder: bool = False,
                    **kw) -> "WavCodec":
        cfg = cfg or CodecConfig()
        params = init_codec_params(jax.random.PRNGKey(seed), cfg,
                                   with_encoder=with_encoder,
                                   with_decoder=with_decoder)
        return cls(params, cfg, **kw)

    @classmethod
    def from_pretrained(cls, path: str, cfg: Optional[CodecConfig] = None,
                        **kw) -> "WavCodec":
        """Load converted parameters (.npz from tools/convert_wavtokenizer)."""
        from llmvox_tpu.train.checkpoint import load_params_npz
        params = load_params_npz(path)
        return cls(params, cfg, **kw)

    # -- inference API ----------------------------------------------------
    def codes_to_features(self, codes) -> jnp.ndarray:
        """(B, L) codes -> (B, L, 512) features."""
        codes = jnp.asarray(codes, dtype=jnp.int32)
        return vq.codes_to_features(self.params["codebooks"], codes)

    def bucket_for(self, n: int) -> int:
        i = bisect.bisect_left(self.buckets, n)
        return self.buckets[i] if i < len(self.buckets) else self.buckets[-1]

    def decode_codes(self, codes: np.ndarray, bandwidth_id: int = 0,
                     pad_to_bucket: bool = True) -> np.ndarray:
        """(B, L) int codes -> (B, hop*L) float32 waveform (host numpy).

        Ragged L is zero-padded to the next bucket so XLA reuses one
        compiled program per bucket; ``valid_len`` masking inside the
        backbone/head makes the kept samples bit-equivalent to an
        exact-length decode.
        """
        codes = np.asarray(codes, dtype=np.int32)
        b, l = codes.shape
        lpad = self.bucket_for(l) if pad_to_bucket else l
        if lpad > l:
            codes = np.concatenate(
                [codes, np.zeros((b, lpad - l), np.int32)], axis=1)
        wav = _decode_codes(self.params, jnp.asarray(codes),
                            jnp.int32(bandwidth_id), jnp.int32(l), self.cfg)
        wav = np.asarray(wav)
        return wav[:, : l * self.cfg.hop_length]

    def decode_codes_ragged(self, codes: np.ndarray, lengths: np.ndarray,
                            bandwidth_id: int = 0) -> List[np.ndarray]:
        """Batched ragged decode: (B, Lmax) zero-padded codes with per-row
        valid ``lengths`` -> list of B waveforms, each bit-equivalent to an
        exact-length decode (per-batch valid-length masking).  This is the
        multi-stream synthesis path: one compiled program serves every
        stream in the batch."""
        codes = np.asarray(codes, dtype=np.int32)
        lengths = np.asarray(lengths, dtype=np.int32)
        b, l = codes.shape
        lpad = self.bucket_for(int(lengths.max()))
        if lpad > l:
            codes = np.concatenate(
                [codes, np.zeros((b, lpad - l), np.int32)], axis=1)
        else:
            codes = codes[:, :lpad]
        wav = np.asarray(_decode_codes(
            self.params, jnp.asarray(codes), jnp.int32(bandwidth_id),
            jnp.asarray(lengths), self.cfg))
        hop = self.cfg.hop_length
        return [wav[i, : int(lengths[i]) * hop] for i in range(b)]

    def decode_codes_device(self, codes: jnp.ndarray, lengths,
                            bandwidth_id: int = 0) -> jnp.ndarray:
        """Device-chained ragged decode: (B, bucket) int32 DEVICE codes
        (already padded to a bucket width) -> (B, bucket*hop) device
        waveform.  No host transfer on either side — callers chain this on
        other device computations (e.g. the pool's fused first chunk) and
        fetch everything in one round trip."""
        return _decode_codes(self.params, codes, jnp.int32(bandwidth_id),
                             jnp.asarray(lengths, jnp.int32), self.cfg)

    def decode(self, features: jnp.ndarray, bandwidth_id: int = 0) -> jnp.ndarray:
        """(B, L, 512) features -> (B, hop*L) waveform (device array)."""
        return _decode_features(self.params, features,
                                jnp.int32(bandwidth_id), self.cfg)

    def encode_infer(self, wav, bandwidth_id: int = 0):
        """(B, T) waveform -> ((B, L, 512) features, (B, L) codes).

        Mirrors encode_infer -> feature_extractor.infer with n_q forced to 1
        (pretrained.py:187, feature_extractors.py:130-141, vq.py:115-140).
        """
        if "encoder" not in self.params:
            raise ValueError("codec params have no SEANet encoder weights")
        wav = jnp.asarray(wav, dtype=jnp.float32)
        emb = seanet.apply_seanet_encoder(self.params["encoder"], wav, self.cfg)
        codes = vq.nearest_code(self.params["codebooks"][0], emb)
        feats = vq.codes_to_features(self.params["codebooks"], codes)
        return feats, codes

    def warmup(self, batch_size: int = 1) -> None:
        """Compile all bucket programs ahead of serving."""
        for n in self.buckets:
            self.decode_codes(np.zeros((batch_size, n), np.int32),
                              pad_to_bucket=False)

    # -- Encodec frame segmentation (encoder/model.py:126-188) -------------
    def segment_geometry(self, segment_s: Optional[float],
                         overlap: float = 0.01):
        """(segment_length, stride) in samples; (None, None) = whole signal
        (the deployed config, encoder/model.py:112-123)."""
        if segment_s is None:
            return None, None
        seg = int(segment_s * self.cfg.sample_rate)
        return seg, max(1, int((1 - overlap) * seg))

    def encode_frames(self, wav, segment_s: Optional[float] = None,
                      overlap: float = 0.01, normalize: bool = False,
                      bandwidth_id: int = 0):
        """Segmented encode (EncodecModel.encode, encoder/model.py:126-163):
        slice (B, T) audio into segment_length windows every stride
        samples; each frame is optionally volume-normalized (scale = rms
        + 1e-8) then SEANet-encoded + quantized.  Returns a list of
        (codes (B, L), scale (B, 1) | None) frames.
        """
        wav = np.asarray(wav, np.float32)
        b, length = wav.shape
        seg, stride = self.segment_geometry(segment_s, overlap)
        if seg is None:
            seg = stride = length
        frames = []
        for off in range(0, length, stride):
            x = wav[:, off: off + seg]
            scale = None
            if normalize:
                volume = np.sqrt(np.mean(x ** 2, axis=-1, keepdims=True))
                scale = 1e-8 + volume
                x = x / scale
            _, codes = self.encode_infer(x, bandwidth_id)
            frames.append((np.asarray(codes), scale))
        return frames

    def decode_frames(self, frames, segment_s: Optional[float] = None,
                      overlap: float = 0.01) -> np.ndarray:
        """Segmented decode (EncodecModel.decode, encoder/model.py:166-188):
        each frame's codes go through the SEANet DECODER (the Encodec
        reconstruction path; the streaming path uses the ConvNeXt/ISTFT
        head instead), scaled back if normalized, then merged by linear
        overlap-add.  Output may be slightly longer than the input; the
        caller trims (model.py:189-191).
        """
        if "seanet_decoder" not in self.params:
            raise ValueError("codec params have no SEANet decoder weights")
        _, stride = self.segment_geometry(segment_s, overlap)
        outs = []
        for codes, scale in frames:
            feats = self.codes_to_features(codes)
            wav = np.asarray(_seanet_decode(self.params, feats, self.cfg))
            if scale is not None:
                wav = wav * np.asarray(scale)
            outs.append(wav)
        if stride is None:
            assert len(outs) == 1
            return outs[0]
        return linear_overlap_add(outs, stride)


@partial(jax.jit, static_argnames=("cfg",))
def _seanet_decode(params: Dict, feats: jnp.ndarray,
                   cfg: CodecConfig) -> jnp.ndarray:
    return seanet.apply_seanet_decoder(params["seanet_decoder"], feats, cfg)


def linear_overlap_add(frames, stride: int) -> np.ndarray:
    """Triangle-weighted overlap-add (encoder/utils.py:16-60
    ``_linear_overlap_add``): each frame is weighted by a triangle peaking
    at its middle; the sum is normalized by the total weight per position,
    so a single-frame region is a no-op and a two-frame overlap is the
    exact linear crossfade.
    """
    assert len(frames)
    frames = [np.asarray(f, np.float32) for f in frames]
    shape = frames[0].shape[:-1]
    total = stride * (len(frames) - 1) + frames[-1].shape[-1]
    frame_length = frames[0].shape[-1]
    t = np.linspace(0, 1, frame_length + 2, dtype=np.float32)[1:-1]
    weight = 0.5 - np.abs(t - 0.5)
    sum_weight = np.zeros((total,), np.float32)
    out = np.zeros(shape + (total,), np.float32)
    offset = 0
    for frame in frames:
        n = frame.shape[-1]
        out[..., offset: offset + n] += weight[:n] * frame
        sum_weight[offset: offset + n] += weight[:n]
        offset += stride
    assert sum_weight.min() > 0
    return out / sum_weight
