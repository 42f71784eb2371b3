"""Mel-spectrogram and STFT ops (torchaudio-compatible numerics).

Used by the codec GAN training losses: the reference mel-L1 loss wraps
``torchaudio.transforms.MelSpectrogram(center=True, power=1)``
(decoder/loss.py:12-39, defaults: hann window, reflect center padding,
HTK mel scale, no filterbank norm, f_min 0, f_max sr/2), and the
discriminator spectrograms use ``torch.stft`` with center=True and —
notably — **no window** (rectangular; discriminators.py:190-202,
discriminator_dac.py:159-174).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from llmvox_tpu.ops.istft import hann_window


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@lru_cache(maxsize=8)
def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   f_min: float = 0.0, f_max: float = None) -> np.ndarray:
    """(n_freqs, n_mels) triangular filterbank — torchaudio
    ``melscale_fbanks(norm=None, mel_scale='htk')`` semantics."""
    f_max = f_max or sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max),
                        n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def _frame(x: jnp.ndarray, win: int, hop: int) -> jnp.ndarray:
    """(B, T) -> (B, n_frames, win) sliding frames."""
    b, t = x.shape
    n_frames = 1 + (t - win) // hop
    # jnp (traced iota), NOT np: a concrete (n_frames, win) i32 index
    # matrix gets embedded in the MLIR as a decimal-printed dense
    # constant — ~9 MB per STFT resolution at 3 s crops, which pushed the
    # codec GAN step past the AOT compile helper's memory cap (round-4
    # finding: 27.7 MB of the disc step's 32.5 MB module was these).
    idx = (jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop +
           jnp.arange(win, dtype=jnp.int32)[None, :])
    return x[:, idx]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length",
                                  "windowed", "center"))
def stft(x: jnp.ndarray, *, n_fft: int, hop_length: int,
         win_length: int = None, windowed: bool = True,
         center: bool = True) -> jnp.ndarray:
    """torch.stft-compatible STFT of (B, T) -> complex (B, n_frames, n_bins).

    center=True reflect-pads n_fft//2 on both sides; ``windowed=False``
    reproduces torch's window=None (rectangular, win_length zero-padded to
    n_fft — here win_length defaults to n_fft).
    """
    win_length = win_length or n_fft
    if center:
        x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    frames = _frame(x, win_length, hop_length)
    if windowed:
        frames = frames * jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        pad = n_fft - win_length
        frames = jnp.pad(frames, ((0, 0), (0, 0), (pad // 2, pad - pad // 2)))
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def spectrogram(x: jnp.ndarray, *, n_fft: int, hop_length: int,
                win_length: int = None, windowed: bool = True,
                power: float = 1.0) -> jnp.ndarray:
    s = stft(x, n_fft=n_fft, hop_length=hop_length, win_length=win_length,
             windowed=windowed)
    mag = jnp.abs(s)
    return mag if power == 1.0 else mag ** power


def mel_spectrogram(x: jnp.ndarray, *, sample_rate: int = 24000,
                    n_fft: int = 1024, hop_length: int = 256,
                    n_mels: int = 100) -> jnp.ndarray:
    """(B, T) -> (B, n_mels, n_frames) magnitude mel spectrogram (power=1),
    matching the reference mel-loss transform (decoder/loss.py:21-23)."""
    spec = spectrogram(x, n_fft=n_fft, hop_length=hop_length)  # (B, F', bins)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
    mel = jnp.einsum("btf,fm->bmt", spec, fb)
    return mel


def safe_log(x: jnp.ndarray, clip_val: float = 1e-7) -> jnp.ndarray:
    """log with clipping (decoder/modules.py:194-205)."""
    return jnp.log(jnp.maximum(x, clip_val))


def mel_spectrogram_features(audio: jnp.ndarray, *, sample_rate: int = 24000,
                             n_fft: int = 1024, hop_length: int = 256,
                             n_mels: int = 100,
                             padding: str = "center") -> jnp.ndarray:
    """MelSpectrogramFeatures — the reference's alternative (non-Encodec)
    feature extractor (decoder/feature_extractors.py:30-51): safe-log mel
    of the waveform, (B, n_mels, frames)."""
    if padding == "same":
        pad = n_fft - hop_length
        audio = jnp.pad(audio, ((0, 0), (pad // 2, pad // 2)),
                        mode="reflect")
        spec = spectrogram(audio, n_fft=n_fft, hop_length=hop_length)
        # uncentered: frames from the padded signal only
        fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels))
        return safe_log(jnp.einsum("btf,fm->bmt", spec, fb))
    return safe_log(mel_spectrogram(audio, sample_rate=sample_rate,
                                    n_fft=n_fft, hop_length=hop_length,
                                    n_mels=n_mels))
