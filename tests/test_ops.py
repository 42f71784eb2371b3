"""Numerical parity of basic ops against torch."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from llmvox_tpu.ops import nn
from llmvox_tpu.ops.istft import istft_same

RNG = np.random.default_rng(0)


def test_layer_norm_matches_torch():
    x = RNG.standard_normal((2, 5, 16)).astype(np.float32)
    s = RNG.standard_normal(16).astype(np.float32)
    b = RNG.standard_normal(16).astype(np.float32)
    ours = nn.layer_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b), 1e-5)
    ref = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(s),
                       torch.from_numpy(b), 1e-5)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_group_norm_matches_torch():
    x = RNG.standard_normal((2, 7, 64)).astype(np.float32)
    s = RNG.standard_normal(64).astype(np.float32)
    b = RNG.standard_normal(64).astype(np.float32)
    ours = nn.group_norm(jnp.asarray(x), jnp.asarray(s), jnp.asarray(b), 32, 1e-6)
    # torch GroupNorm runs channel-first
    xt = torch.from_numpy(x).transpose(1, 2)
    ref = F.group_norm(xt, 32, torch.from_numpy(s), torch.from_numpy(b), 1e-6)
    np.testing.assert_allclose(np.asarray(ours), ref.transpose(1, 2).numpy(),
                               atol=1e-5)


def test_conv1d_matches_torch():
    x = RNG.standard_normal((2, 20, 8)).astype(np.float32)
    w = RNG.standard_normal((7, 8, 12)).astype(np.float32)
    b = RNG.standard_normal(12).astype(np.float32)
    ours = nn.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                     padding=[(3, 3)])
    ref = F.conv1d(torch.from_numpy(x).transpose(1, 2),
                   torch.from_numpy(np.transpose(w, (2, 1, 0))),
                   torch.from_numpy(b), padding=3)
    np.testing.assert_allclose(np.asarray(ours), ref.transpose(1, 2).numpy(),
                               atol=1e-4)


def test_depthwise_conv1d_matches_torch():
    x = RNG.standard_normal((1, 16, 6)).astype(np.float32)
    w = RNG.standard_normal((7, 1, 6)).astype(np.float32)
    ours = nn.conv1d(jnp.asarray(x), jnp.asarray(w), padding=[(3, 3)], groups=6)
    ref = F.conv1d(torch.from_numpy(x).transpose(1, 2),
                   torch.from_numpy(np.transpose(w, (2, 1, 0))),
                   padding=3, groups=6)
    np.testing.assert_allclose(np.asarray(ours), ref.transpose(1, 2).numpy(),
                               atol=1e-4)


def test_dilated_strided_conv_matches_torch():
    x = RNG.standard_normal((1, 40, 4)).astype(np.float32)
    w = RNG.standard_normal((3, 4, 8)).astype(np.float32)
    ours = nn.conv1d(jnp.asarray(x), jnp.asarray(w), stride=2,
                     padding=[(2, 2)], dilation=2)
    ref = F.conv1d(torch.from_numpy(x).transpose(1, 2),
                   torch.from_numpy(np.transpose(w, (2, 1, 0))),
                   stride=2, padding=2, dilation=2)
    np.testing.assert_allclose(np.asarray(ours), ref.transpose(1, 2).numpy(),
                               atol=1e-4)


def test_gelu_variants_match_torch():
    x = RNG.standard_normal((128,)).astype(np.float32) * 3
    np.testing.assert_allclose(
        np.asarray(nn.gelu_tanh(jnp.asarray(x))),
        F.gelu(torch.from_numpy(x), approximate="tanh").numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(nn.gelu_exact(jnp.asarray(x))),
        F.gelu(torch.from_numpy(x)).numpy(), atol=1e-5)


def test_l2_normalize_matches_torch():
    x = RNG.standard_normal((3, 10)).astype(np.float32)
    x[0] *= 1e-12  # exercise the eps clamp
    ours = nn.l2_normalize(jnp.asarray(x))
    ref = F.normalize(torch.from_numpy(x), p=2, dim=-1, eps=1e-8)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-6)


def test_istft_same_matches_torch_fold():
    from tests.torch_ref import istft_same as torch_istft
    n_fft, hop, T = 128, 32, 12
    mag = np.exp(RNG.standard_normal((2, T, n_fft // 2 + 1))).astype(np.float32)
    phase = RNG.uniform(-np.pi, np.pi, (2, T, n_fft // 2 + 1)).astype(np.float32)
    spec = mag * (np.cos(phase) + 1j * np.sin(phase))
    ours = istft_same(jnp.asarray(spec), n_fft=n_fft, hop_length=hop)
    ref = torch_istft(torch.from_numpy(spec), n_fft, hop)
    assert ours.shape == (2, hop * T)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-4)


def test_istft_deployed_shape():
    # deployed config: n_fft 1280, hop 320 -> 320 samples per frame
    T = 10
    spec = (RNG.standard_normal((1, T, 641)) +
            1j * RNG.standard_normal((1, T, 641))).astype(np.complex64)
    out = istft_same(jnp.asarray(spec), n_fft=1280, hop_length=320)
    assert out.shape == (1, 3200)


def test_flash_causal_attention_matches_naive():
    from llmvox_tpu.ops.attention import causal_attention, flash_causal_attention
    import jax
    q = jnp.asarray(RNG.standard_normal((2, 512, 4, 16)), jnp.float32)
    k = jnp.asarray(RNG.standard_normal((2, 512, 4, 16)), jnp.float32)
    v = jnp.asarray(RNG.standard_normal((2, 512, 4, 16)), jnp.float32)
    ref = causal_attention(q, k, v)
    got = flash_causal_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    # gradients flow and match
    def loss_naive(q):
        return jnp.sum(causal_attention(q, k, v) ** 2)
    def loss_flash(q):
        return jnp.sum(flash_causal_attention(q, k, v,
                                              block_q=128, block_k=128) ** 2)
    g1 = jax.grad(loss_naive)(q)
    g2 = jax.grad(loss_flash)(q)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               atol=5e-4, rtol=1e-3)
