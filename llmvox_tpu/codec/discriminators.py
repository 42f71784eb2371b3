"""GAN discriminators for codec training.

Three families, mirroring the reference exactly:

- **MultiPeriodDiscriminator** — HiFi-GAN periods (2,3,5,7,11); 1D audio
  folded to (T/p, p) 2D, 5 weight-normed Conv2d stages + post conv
  (decoder/discriminators.py:9-98).
- **MultiResolutionDiscriminator** — UnivNet STFT resolutions
  (1024/2048/512), rectangular-window magnitude spectrograms, Conv2d stack
  (decoder/discriminators.py:101-202).
- **DACDiscriminator** — Descript combo: MPD per period + complex
  multi-band MRD per fft size (2048/1024/512), with DC-removal +0.8 peak
  normalization preprocessing (decoder/discriminator_dac.py:36-237).

All convs use weight-norm reparameterization ({g, v} params) to keep the
reference's optimization dynamics.  Tensors are channel-last; audio enters
as (B, T).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llmvox_tpu.codec.mel import stft
from llmvox_tpu.ops import nn

LRELU = 0.1


def _wn_conv2d_init(key, kh, kw, cin, cout):
    fan = kh * kw * cin
    bound = float(np.sqrt(1.0 / fan))
    w = jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32,
                           -bound, bound)
    p = nn.weight_norm_init(w)
    p["b"] = jnp.zeros((cout,))
    return p


def _wn_conv1d_init(key, k, cin, cout, groups=1):
    fan = k * (cin // groups)
    bound = float(np.sqrt(1.0 / fan))
    w = jax.random.uniform(key, (k, cin // groups, cout), jnp.float32,
                           -bound, bound)
    p = nn.weight_norm_init(w)
    p["b"] = jnp.zeros((cout,))
    return p


def _wn_conv2d(p, x, stride=(1, 1), padding=(0, 0), pad_mode="zero"):
    w = nn.effective_weight(p)
    if pad_mode == "zero":
        padspec = [(padding[0], padding[0]), (padding[1], padding[1])]
        return nn.conv2d(x, w, p["b"], stride=stride, padding=padspec)
    raise ValueError(pad_mode)


# ---------------------------------------------------------------------------
# Multi-period (vocos variant)
# ---------------------------------------------------------------------------

PERIODS = (2, 3, 5, 7, 11)
_MPD_CH = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]


def init_mpd(key, periods: Tuple[int, ...] = PERIODS) -> List[Dict]:
    """One param dict per period; the periods themselves stay out of the
    pytree (static structure, passed at apply time) so grads see only
    float leaves."""
    out = []
    for _ in periods:
        ks = jax.random.split(key, 7)
        key = ks[-1]
        convs = [_wn_conv2d_init(ks[i], 5, 1, cin, cout)
                 for i, (cin, cout) in enumerate(_MPD_CH)]
        post = _wn_conv2d_init(ks[5], 3, 1, 1024, 1)
        out.append({"convs": convs, "post": post})
    return out


def _fold_period(x: jnp.ndarray, period: int) -> jnp.ndarray:
    """(B, T) -> (B, T/p, p, 1) with reflect pad to a period multiple."""
    b, t = x.shape
    if t % period != 0:
        n_pad = period - (t % period)
        x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
        t = t + n_pad
    return x.reshape(b, t // period, period, 1)


def apply_discriminator_p(p: Dict, x: jnp.ndarray, period: int):
    """DiscriminatorP.forward (discriminators.py:70-98): flat score +
    feature maps (fmap collects stages > 0 and the post conv)."""
    h = _fold_period(x, period)
    fmap = []
    for i, conv in enumerate(p["convs"]):
        stride = (3, 1) if i < 4 else (1, 1)
        h = _wn_conv2d(conv, h, stride=stride, padding=(2, 0))
        h = nn.leaky_relu(h, LRELU)
        if i > 0:
            fmap.append(h)
    score = _wn_conv2d(p["post"], h, padding=(1, 0))
    fmap.append(score)
    return score.reshape(score.shape[0], -1), fmap


# ---------------------------------------------------------------------------
# Multi-resolution (vocos variant)
# ---------------------------------------------------------------------------

RESOLUTIONS = ((1024, 256, 1024), (2048, 512, 2048), (512, 128, 512))
_MRD_SPECS = [((7, 5), (2, 2), (3, 2)), ((5, 3), (2, 1), (2, 1)),
              ((5, 3), (2, 2), (2, 1)), ((3, 3), (2, 1), (1, 1)),
              ((3, 3), (2, 2), (1, 1))]


def init_mrd(key, resolutions=RESOLUTIONS, channels: int = 64) -> List[Dict]:
    out = []
    for _ in resolutions:
        ks = jax.random.split(key, 7)
        key = ks[-1]
        convs = []
        cin = 1
        for i, (kshape, _, _) in enumerate(_MRD_SPECS):
            convs.append(_wn_conv2d_init(ks[i], kshape[0], kshape[1],
                                         cin, channels))
            cin = channels
        post = _wn_conv2d_init(ks[5], 3, 3, channels, 1)
        out.append({"convs": convs, "post": post})
    return out


def apply_discriminator_r(p: Dict, x: jnp.ndarray, resolution):
    """DiscriminatorR.forward (discriminators.py:168-202): rectangular-
    window magnitude STFT -> Conv2d stack.  Layout: (B, freq, time, 1)
    matching torch's (B, 1, F, T) channel-first."""
    n_fft, hop, win = resolution
    s = jnp.abs(stft(x, n_fft=n_fft, hop_length=hop, win_length=win,
                     windowed=False))           # (B, frames, bins)
    h = jnp.transpose(s, (0, 2, 1))[..., None]  # (B, bins, frames, 1)
    fmap = []
    for conv, (kshape, stride, pad) in zip(p["convs"], _MRD_SPECS):
        h = _wn_conv2d(conv, h, stride=stride, padding=pad)
        h = nn.leaky_relu(h, LRELU)
        fmap.append(h)
    score = _wn_conv2d(p["post"], h, padding=(1, 1))
    fmap.append(score)
    return score.reshape(score.shape[0], -1), fmap


# ---------------------------------------------------------------------------
# DAC discriminator (MPD + complex multi-band MRD)
# ---------------------------------------------------------------------------

DAC_BANDS = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))
DAC_FFTS = (2048, 1024, 512)
_DAC_MPD_CH = [(1, 32), (32, 128), (128, 512), (512, 1024), (1024, 1024)]
_DAC_MRD_SPECS = [((3, 9), (1, 1), (1, 4)), ((3, 9), (1, 2), (1, 4)),
                  ((3, 9), (1, 2), (1, 4)), ((3, 9), (1, 2), (1, 4)),
                  ((3, 3), (1, 1), (1, 1))]


def init_dac(key, periods=PERIODS, fft_sizes=DAC_FFTS,
             bands=DAC_BANDS) -> Dict:
    mpds = []
    for _ in periods:
        ks = jax.random.split(key, 7)
        key = ks[-1]
        convs = [_wn_conv2d_init(ks[i], 5, 1, cin, cout)
                 for i, (cin, cout) in enumerate(_DAC_MPD_CH)]
        post = _wn_conv2d_init(ks[5], 3, 1, 1024, 1)
        mpds.append({"convs": convs, "post": post})
    mrds = []
    ch = 32
    for _ in fft_sizes:
        band_convs = []
        for _ in bands:
            ks = jax.random.split(key, 7)
            key = ks[-1]
            cin = 2
            convs = []
            for i, (kshape, _, _) in enumerate(_DAC_MRD_SPECS):
                convs.append(_wn_conv2d_init(ks[i], kshape[0], kshape[1],
                                             cin, ch))
                cin = ch
            band_convs.append(convs)
        ks = jax.random.split(key, 2)
        key = ks[-1]
        post = _wn_conv2d_init(ks[0], 3, 3, ch, 1)
        mrds.append({"band_convs": band_convs, "post": post})
    return {"mpd": mpds, "mrd": mrds}


def _dac_preprocess(x: jnp.ndarray) -> jnp.ndarray:
    """DC removal + 0.8 peak normalization (discriminator_dac.py:227-232)."""
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    peak = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    return 0.8 * x / (peak + 1e-9)


def _apply_dac_mpd(p: Dict, x: jnp.ndarray, period: int) -> List[jnp.ndarray]:
    h = _fold_period(x, period)
    fmap = []
    for i, conv in enumerate(p["convs"]):
        stride = (3, 1) if i < 4 else (1, 1)
        h = _wn_conv2d(conv, h, stride=stride, padding=(2, 0))
        h = nn.leaky_relu(h, LRELU)
        fmap.append(h)
    score = _wn_conv2d(p["post"], h, padding=(1, 0))
    fmap.append(score)
    return fmap


def _apply_dac_mrd(p: Dict, x: jnp.ndarray, n_fft: int,
                   bands=DAC_BANDS) -> List[jnp.ndarray]:
    s = stft(x, n_fft=n_fft, hop_length=n_fft // 4, windowed=False)
    # (B, time, freq) complex -> (B, time, freq, 2) real/imag channels
    h_full = jnp.stack([jnp.real(s), jnp.imag(s)], axis=-1)
    nbins = n_fft // 2 + 1
    fmap = []
    band_outs = []
    for (lo, hi), convs in zip(bands, p["band_convs"]):
        band = h_full[:, :, int(lo * nbins): int(hi * nbins), :]
        for conv, (kshape, stride, pad) in zip(convs, _DAC_MRD_SPECS):
            band = _wn_conv2d(conv, band, stride=stride, padding=pad)
            band = nn.leaky_relu(band, LRELU)
            fmap.append(band)
        band_outs.append(band)
    h = jnp.concatenate(band_outs, axis=2)  # concat over freq
    score = _wn_conv2d(p["post"], h, padding=(1, 1))
    fmap.append(score)
    return fmap


# ---------------------------------------------------------------------------
# MS-STFT discriminator — the Encodec alternate, shipped but unused by the
# reference experiment (encoder/msstftd.py; kept for codec-training parity)
# ---------------------------------------------------------------------------

MSSTFT_FFTS = (1024, 2048, 512)
_MSSTFT_DILATIONS = (1, 2, 4)


def init_msstft(key, fft_sizes=MSSTFT_FFTS, filters: int = 32) -> List[Dict]:
    out = []
    for _ in fft_sizes:
        ks = jax.random.split(key, 8)
        key = ks[-1]
        convs = [_wn_conv2d_init(ks[0], 3, 9, 2, filters)]
        cin = filters
        for i, _d in enumerate(_MSSTFT_DILATIONS):
            convs.append(_wn_conv2d_init(ks[1 + i], 3, 9, cin, filters))
            cin = filters
        convs.append(_wn_conv2d_init(ks[5], 3, 3, cin, filters))
        post = _wn_conv2d_init(ks[6], 3, 3, filters, 1)
        out.append({"convs": convs, "post": post})
    return out


def apply_msstft_one(p: Dict, x: jnp.ndarray, n_fft: int,
                     lrelu: float = 0.2):
    """DiscriminatorSTFT.forward (msstftd.py): normalized complex STFT
    (real/imag channels) -> Conv2d stack with time dilations."""
    hop = n_fft // 4
    s = stft(x, n_fft=n_fft, hop_length=hop, center=False)
    # torchaudio Spectrogram(normalized=True) is WINDOW normalization:
    # divide by sqrt(sum(hann^2)) (= sqrt(0.375 n_fft)), not sqrt(n_fft)
    from llmvox_tpu.codec.mel import hann_window
    s = s / jnp.sqrt(jnp.sum(jnp.square(jnp.asarray(hann_window(n_fft)))))
    h = jnp.stack([jnp.real(s), jnp.imag(s)], axis=-1)  # (B, T', F, 2)
    fmap = []
    dil_pad = [(1, 1)] + [((3 - 1) * d // 2, 4) for d in _MSSTFT_DILATIONS]
    for i, conv in enumerate(p["convs"]):
        if i == 0:
            h = _wn_conv2d(conv, h, padding=(1, 4))
        elif i <= len(_MSSTFT_DILATIONS):
            d = _MSSTFT_DILATIONS[i - 1]
            w = nn.effective_weight(conv)
            h = jax.lax.conv_general_dilated(
                h, w.astype(h.dtype), window_strides=(1, 2),
                padding=[((3 - 1) * d // 2, (3 - 1) * d // 2), (4, 4)],
                rhs_dilation=(d, 1),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST) + conv["b"]
        else:
            h = _wn_conv2d(conv, h, padding=(1, 1))
        h = nn.leaky_relu(h, lrelu)
        fmap.append(h)
    # the reference keeps conv_post OUT of fmap (msstftd.py:89-101)
    score = _wn_conv2d(p["post"], h, padding=(1, 1))
    return score.reshape(score.shape[0], -1), fmap


def apply_msstft(params: List[Dict], x: jnp.ndarray,
                 fft_sizes=MSSTFT_FFTS):
    scores, fmaps = [], []
    for p, f in zip(params, fft_sizes):
        s, fm = apply_msstft_one(p, x, f)
        scores.append(s)
        fmaps.append(fm)
    return scores, fmaps


def apply_dac(params: Dict, x: jnp.ndarray, periods=PERIODS,
              fft_sizes=DAC_FFTS, bands=DAC_BANDS) -> List[List[jnp.ndarray]]:
    """DACDiscriminator.forward: list of per-discriminator fmap lists
    (last entry of each is the score map)."""
    x = _dac_preprocess(x)
    out = [_apply_dac_mpd(p, x, per)
           for p, per in zip(params["mpd"], periods)]
    out += [_apply_dac_mrd(p, x, f, bands)
            for p, f in zip(params["mrd"], fft_sizes)]
    return out
