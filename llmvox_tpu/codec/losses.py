"""Codec GAN losses (reference decoder/loss.py:12-158).

- hinge discriminator / generator losses (vocos MPD/MRD path)
- least-squares DAC discriminator / generator losses + DAC feature L1
- feature-matching L1
- mel-spectrogram L1 (n_fft 1024, hop 256, 100 mels, power 1, safe_log)
"""
from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp

from llmvox_tpu.codec.mel import mel_spectrogram, safe_log


def discriminator_loss(real_outputs: List[jnp.ndarray],
                       gen_outputs: List[jnp.ndarray]) -> jnp.ndarray:
    """Hinge loss, summed over sub-discriminators (loss.py:66-94)."""
    loss = 0.0
    for dr, dg in zip(real_outputs, gen_outputs):
        loss = loss + jnp.mean(jnp.maximum(1.0 - dr, 0.0))
        loss = loss + jnp.mean(jnp.maximum(1.0 + dg, 0.0))
    return loss


def generator_loss(gen_outputs: List[jnp.ndarray]) -> jnp.ndarray:
    """Hinge generator loss (loss.py:42-63)."""
    loss = 0.0
    for dg in gen_outputs:
        loss = loss + jnp.mean(jnp.maximum(1.0 - dg, 0.0))
    return loss


def feature_matching_loss(fmap_real: List[List[jnp.ndarray]],
                          fmap_gen: List[List[jnp.ndarray]]) -> jnp.ndarray:
    """Summed L1 over all feature maps (loss.py:97-116)."""
    loss = 0.0
    for dr, dg in zip(fmap_real, fmap_gen):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl - gl))
    return loss


def mel_loss(y_hat: jnp.ndarray, y: jnp.ndarray, *, sample_rate: int = 24000,
             n_fft: int = 1024, hop_length: int = 256,
             n_mels: int = 100) -> jnp.ndarray:
    """L1 between safe-log mel spectrograms (loss.py:12-39)."""
    kw = dict(sample_rate=sample_rate, n_fft=n_fft, hop_length=hop_length,
              n_mels=n_mels)
    return jnp.mean(jnp.abs(safe_log(mel_spectrogram(y, **kw)) -
                            safe_log(mel_spectrogram(y_hat, **kw))))


def dac_discriminator_loss(d_fake: List[List[jnp.ndarray]],
                           d_real: List[List[jnp.ndarray]]) -> jnp.ndarray:
    """Least-squares DAC loss on score maps (loss.py:137-144);
    fake branch carries no generator gradient (caller stops it)."""
    loss = 0.0
    for xf, xr in zip(d_fake, d_real):
        loss = loss + jnp.mean(jnp.square(xf[-1]))
        loss = loss + jnp.mean(jnp.square(1.0 - xr[-1]))
    return loss


def dac_generator_loss(d_fake: List[List[jnp.ndarray]],
                       d_real: List[List[jnp.ndarray]]
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(adversarial LS loss, feature L1) for the generator
    (loss.py:146-158); d_real features are treated as constants."""
    loss_g = 0.0
    for xf in d_fake:
        loss_g = loss_g + jnp.mean(jnp.square(1.0 - xf[-1]))
    loss_feat = 0.0
    for df, dr in zip(d_fake, d_real):
        for j in range(len(df) - 1):
            loss_feat = loss_feat + jnp.mean(jnp.abs(df[j] - dr[j]))
    return loss_g, loss_feat
