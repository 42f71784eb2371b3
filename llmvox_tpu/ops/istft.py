"""Inverse STFT with "same" padding as pure XLA ops.

Semantics match the reference's custom ISTFT
(WavTokenizer/decoder/spectral_ops.py:33-75): irfft per frame
(norm="backward"), Hann windowing, overlap-add, window-envelope
normalization, then trimming ``(win - hop)//2`` samples per side so the
output is exactly ``hop * T`` samples.

Instead of torch's ``F.fold`` scatter, overlap-add exploits the static
ratio ``r = win // hop`` (r = 4 for both deployed configs): each frame is
split into r hop-sized segments and summed with shifted adds — r fully
vectorized adds, no gather/scatter, XLA-fusable.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    """torch.hann_window(periodic=True): 0.5*(1-cos(2*pi*n/N))."""
    n = np.arange(win_length)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """OLA of (..., T, win) frames -> (..., (T-1)*hop + win) samples."""
    *lead, t, win = frames.shape
    r = win // hop
    assert r * hop == win, "win_length must be a multiple of hop_length"
    segs = frames.reshape(*lead, t, r, hop)
    out = jnp.zeros((*lead, t + r - 1, hop), dtype=frames.dtype)
    for j in range(r):
        out = out.at[..., j:j + t, :].add(segs[..., :, j, :])
    return out.reshape(*lead, (t + r - 1) * hop)


def cosine_window(n: int) -> np.ndarray:
    """scipy.signal.windows.cosine: sin(pi*(k+0.5)/n)."""
    k = np.arange(n)
    return np.sin(np.pi * (k + 0.5) / n).astype(np.float32)


@partial(jax.jit, static_argnames=("frame_len", "padding"))
def imdct(x: jnp.ndarray, *, frame_len: int, padding: str = "same"
          ) -> jnp.ndarray:
    """Inverse MDCT (reference decoder/spectral_ops.py:133-192).

    Args:
      x: (B, L, N) MDCT coefficients, N = frame_len // 2.
    Returns:
      (B, T) waveform; "same" keeps hop*L samples (hop = N).
    """
    b, l, n = x.shape
    assert n == frame_len // 2
    n0 = (n + 1) / 2.0
    k2 = np.arange(2 * n)
    pre = np.exp(1j * np.pi * n0 * k2 / n).astype(np.complex64)
    post = np.exp(1j * np.pi * (k2 + n0) / (2 * n)).astype(np.complex64)

    xc = x.astype(jnp.complex64)
    y_full = jnp.concatenate(
        [xc, -jnp.conj(jnp.flip(xc, axis=-1))], axis=-1)
    y = jnp.fft.ifft(y_full * pre, axis=-1)
    y = jnp.real(y * post) * np.sqrt(n) * np.sqrt(2.0)
    frames = y * jnp.asarray(cosine_window(frame_len))
    audio = _overlap_add(frames.astype(jnp.float32), frame_len // 2)
    pad = frame_len // 2 if padding == "center" else frame_len // 4
    return audio[:, pad:-pad]


@partial(jax.jit, static_argnames=("n_fft", "hop_length"))
def istft_same(spec: jnp.ndarray, *, n_fft: int, hop_length: int,
               valid_len=None) -> jnp.ndarray:
    """ISTFT of a complex spectrogram (B, T, n_fft//2 + 1) -> (B, hop*T).

    The frequency axis is last (channel-last convention); the reference is
    (B, N, T) channel-first (spectral_ops.py:52-56).

    With ``valid_len`` (scalar int), frames at index >= valid_len are
    treated as absent — both in the signal overlap-add and in the window
    envelope — so samples [0, hop*valid_len) are bit-equivalent to an
    exact-length call; samples beyond are meaningless and must be trimmed
    by the caller.
    """
    win = n_fft
    pad = (win - hop_length) // 2
    b, t, nbins = spec.shape
    assert nbins == n_fft // 2 + 1

    window = jnp.asarray(hann_window(win))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1).astype(jnp.float32)
    frames = frames * window

    env_frames = jnp.broadcast_to(jnp.square(window), (1, t, win))
    if valid_len is not None:
        vl = jnp.asarray(valid_len, jnp.int32).reshape(-1, 1, 1)
        fmask = (jnp.arange(t)[None, :, None] < vl).astype(jnp.float32)
        frames = frames * fmask
        env_frames = env_frames * fmask

    y = _overlap_add(frames, hop_length)[:, pad:-pad]
    envelope = _overlap_add(env_frames, hop_length)[:, pad:-pad]
    # NOLA guarantee: with Hann and 4x overlap the interior envelope is
    # strictly positive (reference asserts > 1e-11, spectral_ops.py:72).
    # The clamp only guards masked-out tail samples, which are trimmed.
    return y / jnp.maximum(envelope, 1e-11)
