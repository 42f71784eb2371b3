"""SEANet encoder numerics vs an independent torch functional oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from llmvox_tpu.codec import seanet
from llmvox_tpu.utils.config import CodecConfig

RNG = np.random.default_rng(0)

TINY = CodecConfig(downsamples=(2, 2), n_filters=4, seanet_dimension=16,
                   seanet_lstm_layers=1)


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def _conv_w(w):
    """(K, Cin, Cout) -> torch (Cout, Cin, K)."""
    return _t(np.transpose(np.asarray(w), (2, 1, 0)))


def _sconv_torch(x_cf, p, stride=1, dilation=1):
    """Encodec SConv1d semantics: asymmetric reflect pad then valid conv
    (encoder/modules/conv.py:54-61, 195-211)."""
    import math
    w = np.asarray(p["w"])
    k = w.shape[0]
    keff = (k - 1) * dilation + 1
    pt = keff - stride
    length = x_cf.shape[-1]
    n_frames = (length - keff + pt) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (keff - pt)
    extra = ideal - length
    right = pt // 2
    left = pt - right
    x_cf = F.pad(x_cf, (left, right + extra), mode="reflect")
    return F.conv1d(x_cf, _conv_w(w), _t(p["b"]), stride=stride,
                    dilation=dilation)


def _lstm_torch(p, x_cf):
    """(B, H, L) through a torch-gate-order LSTM layer."""
    lstm = torch.nn.LSTM(input_size=np.asarray(p["wi"]).shape[0],
                         hidden_size=np.asarray(p["wh"]).shape[0],
                         batch_first=True)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(_t(np.asarray(p["wi"]).T))
        lstm.weight_hh_l0.copy_(_t(np.asarray(p["wh"]).T))
        lstm.bias_ih_l0.copy_(_t(p["bi"]))
        lstm.bias_hh_l0.copy_(_t(p["bh"]))
    y, _ = lstm(x_cf.transpose(1, 2))
    return y.transpose(1, 2)


def _encoder_torch(params, wav, cfg):
    x = _t(wav)[:, None, :]  # (B, 1, T)
    x = _sconv_torch(x, params["conv_in"])
    for ratio, stage in zip(reversed(cfg.downsamples), params["stages"]):
        for j, res in enumerate(stage["res"]):
            h = F.elu(x)
            h = _sconv_torch(h, res["conv1"],
                             dilation=cfg.seanet_dilation_base ** j)
            h = F.elu(h)
            h = _sconv_torch(h, res["conv2"])
            s = _sconv_torch(x, res["shortcut"])
            x = s + h
        x = F.elu(x)
        x = _sconv_torch(x, stage["down"], stride=ratio)
    lstm_in = x
    for layer in params["lstm"]:
        x = _lstm_torch(layer, x)
    x = x + lstm_in
    x = F.elu(x)
    x = _sconv_torch(x, params["conv_out"])
    return x.transpose(1, 2).detach().numpy()  # (B, L, C)


def test_seanet_encoder_matches_torch_oracle():
    params = jax.device_get(
        seanet.init_seanet_encoder(jax.random.PRNGKey(0), TINY))
    # randomize biases so bias bugs can't hide
    rng = np.random.default_rng(1)
    params = jax.tree.map(
        lambda x: np.asarray(x) + 0.05 * rng.standard_normal(
            np.shape(x)).astype(np.float32), params)
    wav = rng.standard_normal((2, 64)).astype(np.float32)
    ours = np.asarray(seanet.apply_seanet_encoder(params, jnp.asarray(wav),
                                                  TINY))
    ref = _encoder_torch(params, wav, TINY)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def _decoder_torch(params, z, cfg):
    """Torch oracle for apply_seanet_decoder (encoder/modules/seanet.py:
    147-238 semantics: ConvTranspose(k=2r, stride r) then asymmetric
    unpad, conv.py:248-253)."""
    x = _t(z).transpose(1, 2)  # (B, C, L)
    x = _sconv_torch(x, params["conv_in"])
    lstm_in = x
    for layer in params["lstm"]:
        x = _lstm_torch(layer, x)
    x = x + lstm_in
    for ratio, stage in zip(cfg.downsamples, params["stages"]):
        x = F.elu(x)
        w = np.asarray(stage["up"]["w"])  # (K, Cout, Cin)
        y = F.conv_transpose1d(x, _t(np.transpose(w, (2, 1, 0))),
                               _t(stage["up"]["b"]), stride=ratio)
        pt = ratio * 2 - ratio
        right = pt // 2
        left = pt - right
        x = y[..., left: y.shape[-1] - right]
        for j, res in enumerate(stage["res"]):
            h = F.elu(x)
            h = _sconv_torch(h, res["conv1"],
                             dilation=cfg.seanet_dilation_base ** j)
            h = F.elu(h)
            h = _sconv_torch(h, res["conv2"])
            s = _sconv_torch(x, res["shortcut"])
            x = s + h
    x = F.elu(x)
    x = _sconv_torch(x, params["conv_out"])
    return x[:, 0].detach().numpy()


def test_seanet_decoder_matches_torch_oracle():
    params = jax.device_get(
        seanet.init_seanet_decoder(jax.random.PRNGKey(2), TINY))
    rng = np.random.default_rng(3)
    params = jax.tree.map(
        lambda x: np.asarray(x) + 0.05 * rng.standard_normal(
            np.shape(x)).astype(np.float32), params)
    z = rng.standard_normal((2, 12, TINY.seanet_dimension)).astype(np.float32)
    ours = np.asarray(seanet.apply_seanet_decoder(params, jnp.asarray(z),
                                                  TINY))
    ref = _decoder_torch(params, z, TINY)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_seanet_roundtrip_shapes():
    """encode -> decode restores ~T samples (320x downsample at deployed
    ratios; 4x at TINY)."""
    enc = jax.device_get(seanet.init_seanet_encoder(jax.random.PRNGKey(4),
                                                    TINY))
    dec_p = jax.device_get(seanet.init_seanet_decoder(jax.random.PRNGKey(5),
                                                      TINY))
    wav = np.random.default_rng(6).standard_normal((1, 64)).astype(np.float32)
    emb = seanet.apply_seanet_encoder(enc, jnp.asarray(wav), TINY)
    assert emb.shape[1] == 64 // 4
    out = seanet.apply_seanet_decoder(dec_p, emb, TINY)
    assert out.shape[0] == 1 and out.shape[1] >= 64
