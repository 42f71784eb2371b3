"""Codec decode-path parity: JAX modules vs independent torch oracle."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from llmvox_tpu.codec import backbone as bb
from llmvox_tpu.codec import vq
from llmvox_tpu.codec.codec import WavCodec, init_codec_params
from llmvox_tpu.utils.config import CodecConfig

from tests import torch_ref

# A shrunken codec config so CPU tests stay fast; same structure as deployed.
SMALL = CodecConfig(
    vq_bins=64, backbone_dim=64, backbone_intermediate_dim=192,
    backbone_num_layers=3, backbone_input_channels=32, vq_dim=32,
    n_fft=128, hop_length=32, groupnorm_groups=32,
)


@pytest.fixture(scope="module")
def small_params():
    return jax.device_get(init_codec_params(jax.random.PRNGKey(1), SMALL))


def _randomize(params, rng):
    """Replace zero-init biases/embeddings with noise to catch bias bugs."""
    return jax.tree.map(
        lambda x: x + 0.1 * rng.standard_normal(x.shape).astype(np.float32)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else x, params)


def test_codes_to_features_matches_embedding_sum():
    cb = np.random.default_rng(0).standard_normal((2, 16, 8)).astype(np.float32)
    codes = np.array([[[1, 5, 3], [2, 2, 0]],
                      [[0, 1, 2], [3, 4, 5]]], dtype=np.int32)  # (n_q, B, L)
    out = vq.codes_to_features(jnp.asarray(cb), jnp.asarray(codes))
    ref = cb[0][codes[0]] + cb[1][codes[1]]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6)


def test_resnet_block_matches_torch(small_params):
    rng = np.random.default_rng(2)
    p = _randomize(small_params["backbone"]["pos_net"]["res0"], rng)
    x = rng.standard_normal((2, 11, 64)).astype(np.float32)
    ours = bb._resnet_block(p, jnp.asarray(x), SMALL)
    ref = torch_ref.resnet_block(p, torch.from_numpy(x).transpose(1, 2))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.transpose(1, 2).numpy(), atol=1e-4)


def test_attn_block_matches_torch(small_params):
    rng = np.random.default_rng(3)
    p = _randomize(small_params["backbone"]["pos_net"]["attn"], rng)
    x = rng.standard_normal((2, 9, 64)).astype(np.float32)
    ours = bb._attn_block(p, jnp.asarray(x), SMALL)
    ref = torch_ref.attn_block(p, torch.from_numpy(x).transpose(1, 2))
    np.testing.assert_allclose(np.asarray(ours),
                               ref.transpose(1, 2).numpy(), atol=1e-4)


def test_convnext_block_matches_torch(small_params):
    rng = np.random.default_rng(4)
    stacked = small_params["backbone"]["convnext"]
    layer = {k: np.asarray(v)[0] for k, v in stacked.items()}
    layer = _randomize(layer, rng)
    x = rng.standard_normal((2, 13, 64)).astype(np.float32)
    ours = bb._convnext_block(layer, jnp.asarray(x), jnp.int32(2), SMALL.ln_eps)
    ref = torch_ref.convnext_block(layer, torch.from_numpy(x).transpose(1, 2), 2)
    np.testing.assert_allclose(np.asarray(ours),
                               ref.transpose(1, 2).numpy(), atol=1e-4)


def test_full_backbone_matches_torch(small_params):
    rng = np.random.default_rng(5)
    params = _randomize(small_params["backbone"], rng)
    feats = rng.standard_normal((1, 15, 32)).astype(np.float32)
    ours = bb.apply_backbone(params, jnp.asarray(feats), jnp.int32(0), SMALL)
    ref = torch_ref.backbone(params, feats, 0, SMALL)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-4)


@pytest.mark.slow
def test_full_codec_decode_matches_torch(small_params):
    rng = np.random.default_rng(6)
    params = _randomize(small_params, rng)
    codec = WavCodec(params, SMALL, buckets=(8, 16))
    codes = rng.integers(0, SMALL.vq_bins, (1, 8)).astype(np.int32)
    ours = codec.decode_codes(codes, pad_to_bucket=False)
    ref = torch_ref.codec_decode(params, codes, 0, SMALL)
    assert ours.shape == (1, 8 * SMALL.hop_length)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


@pytest.mark.slow
def test_bucket_padding_matches_exact():
    """Padded-to-bucket decode must equal exact-length decode bit-for-bit
    on the kept samples (valid_len masking through GroupNorm stats,
    attention keys, conv paddings and the ISTFT envelope)."""
    rng = np.random.default_rng(7)
    params = _randomize(
        jax.device_get(init_codec_params(jax.random.PRNGKey(2), SMALL)), rng)
    codec = WavCodec(params, SMALL, buckets=(8, 16))
    codes = rng.integers(0, SMALL.vq_bins, (1, 11)).astype(np.int32)
    padded = codec.decode_codes(codes)                     # pads 11 -> 16
    exact = codec.decode_codes(codes, pad_to_bucket=False)
    assert padded.shape == exact.shape == (1, 11 * SMALL.hop_length)
    np.testing.assert_allclose(padded, exact, atol=1e-5, rtol=1e-5)


def test_decode_is_deterministic(small_params):
    codec = WavCodec(small_params, SMALL, buckets=(8,))
    codes = np.full((1, 8), 3, np.int32)
    a = codec.decode_codes(codes, pad_to_bucket=False)
    b = codec.decode_codes(codes, pad_to_bucket=False)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_frame40_config_decode_matches_torch():
    """WavTokenizer 40-token/s variant (reference
    wavtokenizer/configs/*frame40*: n_fft 2400, hop 600) end-to-end at the
    real STFT sizes with a shrunken backbone."""
    cfg = dataclasses.replace(SMALL, n_fft=2400, hop_length=600)
    rng = np.random.default_rng(8)
    params = _randomize(
        jax.device_get(init_codec_params(jax.random.PRNGKey(3), cfg)), rng)
    codec = WavCodec(params, cfg, buckets=(8,))
    codes = rng.integers(0, cfg.vq_bins, (1, 6)).astype(np.int32)
    ours = codec.decode_codes(codes, pad_to_bucket=False)
    ref = torch_ref.codec_decode(params, codes, 0, cfg)
    assert ours.shape == (1, 6 * 600)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)
    padded = codec.decode_codes(codes)                     # pads 6 -> 8
    np.testing.assert_allclose(padded, ours, atol=1e-5, rtol=1e-5)
