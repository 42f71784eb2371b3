"""EncodecModel frame segmentation + linear overlap-add
(encoder/model.py:126-191, encoder/utils.py:16-60)."""
import numpy as np
import jax
import pytest

from llmvox_tpu.codec.codec import (WavCodec, init_codec_params,
                                    linear_overlap_add)
from llmvox_tpu.utils.config import CodecConfig

TINY = CodecConfig(downsamples=(2, 2), n_filters=4, seanet_dimension=16,
                   vq_dim=16, vq_bins=32, backbone_input_channels=16,
                   backbone_dim=32, backbone_intermediate_dim=96,
                   backbone_num_layers=1, n_fft=16, hop_length=4)


def _tiny_codec():
    params = init_codec_params(jax.random.PRNGKey(0), TINY,
                               with_encoder=True, with_decoder=True)
    return WavCodec(params, TINY, buckets=(8, 16, 32, 64, 128))


def test_overlap_add_constant_is_identity():
    frames = [np.full((1, 100), 3.0, np.float32) for _ in range(4)]
    out = linear_overlap_add(frames, stride=60)
    assert out.shape == (1, 60 * 3 + 100)
    np.testing.assert_allclose(out, 3.0, rtol=1e-6)


def test_overlap_add_two_frame_crossfade_is_linear():
    """In a two-frame overlap [S, T), frame 2's weight is (t-S)/(T-S)
    exactly (the derivation in encoder/utils.py:24-31)."""
    n, stride = 100, 60
    a = np.zeros((1, n), np.float32)
    b = np.ones((1, n), np.float32)
    out = linear_overlap_add([a, b], stride)
    ov = out[0, stride:n]              # overlap: S=stride, T=n
    expect = (np.arange(stride, n) - stride + 1) / (n - stride + 1)
    # endpoints of the reference's linspace weighting are open (1:-1)
    np.testing.assert_allclose(ov, expect.astype(np.float32), atol=1e-5)
    np.testing.assert_allclose(out[0, :stride], 0.0)
    np.testing.assert_allclose(out[0, n:], 1.0)


def test_segment_geometry_matches_reference():
    codec = _tiny_codec()
    # segment_length = segment*sr; stride = (1-overlap)*segment_length
    seg, stride = codec.segment_geometry(0.01, overlap=0.25)
    assert seg == int(0.01 * TINY.sample_rate) == 240
    assert stride == int(0.75 * 240) == 180
    assert codec.segment_geometry(None) == (None, None)


def test_encode_frames_slices_like_reference():
    codec = _tiny_codec()
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((1, 520)) * 0.1).astype(np.float32)
    seg_s = 240 / TINY.sample_rate
    frames = codec.encode_frames(wav, segment_s=seg_s, overlap=0.25)
    # reference loop: range(0, length, stride) -> offsets 0,180,360 and a
    # final partial 520-540 window... 520/180 -> offsets 0,180,360 (3)
    assert len(frames) == 3
    assert all(s is None for _, s in frames)
    # frame L = ceil(samples / prod(downsamples)) per SEANet geometry:
    # full segments give equal L; the last (160-sample) window is shorter
    l0 = frames[0][0].shape[1]
    assert frames[1][0].shape[1] == l0
    assert frames[2][0].shape[1] <= l0


def test_frame_roundtrip_with_normalization():
    codec = _tiny_codec()
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal((2, 600)) * 0.3).astype(np.float32)
    seg_s = 240 / TINY.sample_rate
    frames = codec.encode_frames(wav, segment_s=seg_s, overlap=0.25,
                                 normalize=True)
    assert all(s is not None and s.shape == (2, 1) for _, s in frames)
    out = codec.decode_frames(frames, segment_s=seg_s, overlap=0.25)
    # output may exceed the input; trim like EncodecModel.forward
    out = out[:, : wav.shape[1]]
    assert out.shape == wav.shape
    assert np.isfinite(out).all()


def test_decode_frames_requires_decoder_params():
    params = init_codec_params(jax.random.PRNGKey(0), TINY,
                               with_encoder=True)
    codec = WavCodec(params, TINY, buckets=(8, 16))
    with pytest.raises(ValueError, match="decoder"):
        codec.decode_frames([(np.zeros((1, 4), np.int32), None)])
