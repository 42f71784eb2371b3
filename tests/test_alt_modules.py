"""Alternative codec modules: IMDCT heads, ResNet backbone, mel features,
SEANet decoder — the reference's shipped-but-not-deployed variants."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from llmvox_tpu.codec import backbone as bb
from llmvox_tpu.codec import heads
from llmvox_tpu.codec import seanet
from llmvox_tpu.codec.mel import mel_spectrogram_features
from llmvox_tpu.ops.istft import imdct
from llmvox_tpu.utils.config import CodecConfig

RNG = np.random.default_rng(0)


def _torch_imdct(X: np.ndarray, frame_len: int) -> np.ndarray:
    """Reference IMDCT math in torch (spectral_ops.py:133-192), 'same'."""
    import scipy.signal
    Xt = torch.from_numpy(X)
    B, L, N = Xt.shape
    n0 = (N + 1) / 2
    window = torch.from_numpy(
        scipy.signal.windows.cosine(frame_len)).float()
    pre = torch.exp(1j * torch.pi * n0 * torch.arange(N * 2) / N)
    post = torch.exp(1j * torch.pi * (torch.arange(N * 2) + n0) / (N * 2))
    Y = torch.zeros((B, L, N * 2), dtype=torch.complex64)
    Y[..., :N] = Xt
    Y[..., N:] = -1 * torch.conj(torch.flip(Xt, dims=(-1,)))
    y = torch.fft.ifft(Y * pre, dim=-1)
    y = torch.real(y * post) * np.sqrt(N) * np.sqrt(2)
    y = y * window
    audio = torch.nn.functional.fold(
        y.transpose(1, 2), output_size=(1, (L + 1) * N),
        kernel_size=(1, frame_len), stride=(1, frame_len // 2),
    )[:, 0, 0, :]
    pad = frame_len // 4
    return audio[:, pad:-pad].numpy()


def test_imdct_matches_torch_reference_math():
    frame_len, L = 64, 9
    X = RNG.standard_normal((2, L, frame_len // 2)).astype(np.float32)
    ours = np.asarray(imdct(jnp.asarray(X), frame_len=frame_len))
    ref = _torch_imdct(X, frame_len)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_imdct_heads_run():
    dim, frame_len, L = 16, 32, 7
    x = jnp.asarray(RNG.standard_normal((1, L, dim)), jnp.float32)
    p = heads.init_imdct_symexp_head(jax.random.PRNGKey(0), dim, frame_len,
                                     sample_rate=24000)
    audio = heads.apply_imdct_symexp_head(p, x, frame_len)
    assert audio.shape[0] == 1 and np.isfinite(np.asarray(audio)).all()
    p = heads.init_imdct_cos_head(jax.random.PRNGKey(1), dim, frame_len)
    audio = heads.apply_imdct_cos_head(p, x, frame_len)
    assert np.isfinite(np.asarray(audio)).all()


@pytest.mark.slow
def test_resnet_backbone_shapes():
    p = bb.init_resnet_backbone(jax.random.PRNGKey(0), input_channels=8,
                                dim=16, num_blocks=2)
    x = jnp.asarray(RNG.standard_normal((2, 11, 8)), jnp.float32)
    y = bb.apply_resnet_backbone(p, x)
    assert y.shape == (2, 11, 16)
    assert np.isfinite(np.asarray(y)).all()


def test_mel_features_shapes():
    audio = jnp.asarray(RNG.standard_normal((1, 4096)), jnp.float32)
    for padding in ("center", "same"):
        feats = mel_spectrogram_features(audio, padding=padding)
        assert feats.shape[1] == 100
        assert np.isfinite(np.asarray(feats)).all()


@pytest.mark.slow
def test_seanet_decoder_roundtrip_shapes():
    cfg = CodecConfig(downsamples=(2, 2), n_filters=4, seanet_dimension=16)
    enc = seanet.init_seanet_encoder(jax.random.PRNGKey(0), cfg)
    dec = seanet.init_seanet_decoder(jax.random.PRNGKey(1), cfg)
    wav = jnp.asarray(RNG.standard_normal((1, 64)), jnp.float32)
    emb = seanet.apply_seanet_encoder(enc, wav, cfg)
    assert emb.shape == (1, 16, 16)  # 64 / 4 frames
    recon = seanet.apply_seanet_decoder(dec, emb, cfg)
    assert recon.shape[0] == 1
    assert abs(recon.shape[1] - 64) <= 4  # transposed-conv edge trim
    assert np.isfinite(np.asarray(recon)).all()


@pytest.mark.slow
def test_msstft_discriminator_runs():
    from llmvox_tpu.codec import discriminators as disc
    params = disc.init_msstft(jax.random.PRNGKey(0), fft_sizes=(256,),
                              filters=8)
    x = jnp.asarray(RNG.standard_normal((1, 2048)), jnp.float32)
    scores, fmaps = disc.apply_msstft(params, x, fft_sizes=(256,))
    # 5 fmap entries: conv_post stays out of fmap (msstftd.py:95-101)
    assert len(scores) == 1 and len(fmaps[0]) == 5
    assert np.isfinite(np.asarray(scores[0])).all()


def test_resnet_backbone_matches_torch_oracle():
    """VocosResNetBackbone/ResBlock1 parity (models.py:238-264,
    modules.py:89-191): weight-norm embed conv + dilated HiFi-GAN blocks
    with per-conv layer scale."""
    dim, cin, num_blocks, L = 12, 8, 2, 17
    gamma0 = 1.0 / num_blocks / 3.0
    torch.manual_seed(0)

    embed = torch.nn.utils.weight_norm(
        torch.nn.Conv1d(cin, dim, 3, padding=1))
    blocks = []
    for _ in range(num_blocks):
        convs1 = [torch.nn.utils.weight_norm(
            torch.nn.Conv1d(dim, dim, 3, 1, dilation=d,
                            padding=(3 * d - d) // 2)) for d in (1, 3, 5)]
        convs2 = [torch.nn.utils.weight_norm(
            torch.nn.Conv1d(dim, dim, 3, 1, padding=1)) for _ in range(3)]
        gammas = [torch.nn.Parameter(gamma0 * torch.ones(dim, 1))
                  for _ in range(3)]
        blocks.append((convs1, convs2, gammas))

    def oracle(x):
        x = embed(x)
        for convs1, convs2, gammas in blocks:
            for c1, c2, g in zip(convs1, convs2, gammas):
                xt = torch.nn.functional.leaky_relu(x, negative_slope=0.1)
                xt = c1(xt)
                xt = torch.nn.functional.leaky_relu(xt, negative_slope=0.1)
                xt = c2(xt)
                x = g * xt + x
        return x.transpose(1, 2)

    def wn(conv):
        return {"g": jnp.asarray(conv.weight_g.detach().numpy()
                                 .transpose(2, 1, 0)),
                "v": jnp.asarray(conv.weight_v.detach().numpy()
                                 .transpose(2, 1, 0)),
                "b": jnp.asarray(conv.bias.detach().numpy())}

    params = {
        "embed": wn(embed),
        "blocks": [{
            "convs1": [wn(c) for c in convs1],
            "convs2": [wn(c) for c in convs2],
            "gamma": [jnp.asarray(g.detach().numpy()[:, 0])
                      for g in gammas],
        } for convs1, convs2, gammas in blocks],
    }

    x = RNG.standard_normal((2, L, cin)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    got = np.asarray(bb.apply_resnet_backbone(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_msstft_matches_torch_oracle():
    """DiscriminatorSTFT parity (encoder/msstftd.py:28-101): window-
    normalized complex STFT -> weight-norm Conv2d stack with time
    dilations; conv_post stays out of fmap."""
    from llmvox_tpu.codec import discriminators as disc
    n_fft, hop, filters = 128, 32, 4
    torch.manual_seed(1)
    wn = torch.nn.utils.weight_norm
    convs = [wn(torch.nn.Conv2d(2, filters, (3, 9), padding=(1, 4)))]
    for d in (1, 2, 4):
        convs.append(wn(torch.nn.Conv2d(
            filters, filters, (3, 9), stride=(1, 2), dilation=(d, 1),
            padding=((3 - 1) * d // 2, 4))))
    convs.append(wn(torch.nn.Conv2d(filters, filters, (3, 3),
                                    padding=(1, 1))))
    post = wn(torch.nn.Conv2d(filters, 1, (3, 3), padding=(1, 1)))
    act = torch.nn.LeakyReLU(0.2)

    def oracle(x):
        window = torch.hann_window(n_fft)
        z = torch.stft(x, n_fft, hop_length=hop, win_length=n_fft,
                       window=window, center=False, return_complex=True)
        z = z / window.pow(2).sum().sqrt()     # torchaudio normalized=True
        z = torch.stack([z.real, z.imag], dim=1)     # (B, 2, F, T')
        z = z.permute(0, 1, 3, 2)                    # b c w t -> b c t w
        fmap = []
        for c in convs:
            z = act(c(z))
            fmap.append(z)
        return post(z), fmap

    def export(c):
        return {"g": jnp.asarray(c.weight_g.detach().numpy()
                                 .transpose(2, 3, 1, 0)),
                "v": jnp.asarray(c.weight_v.detach().numpy()
                                 .transpose(2, 3, 1, 0)),
                "b": jnp.asarray(c.bias.detach().numpy())}

    params = [{"convs": [export(c) for c in convs], "post": export(post)}]
    x = RNG.standard_normal((2, 600)).astype(np.float32)
    with torch.no_grad():
        want_score, want_fmap = oracle(torch.from_numpy(x))
    scores, fmaps = disc.apply_msstft(params, jnp.asarray(x),
                                      fft_sizes=(n_fft,))
    assert len(fmaps[0]) == len(want_fmap) == 5
    np.testing.assert_allclose(
        np.asarray(scores[0]),
        want_score.numpy().transpose(0, 2, 3, 1).reshape(2, -1), atol=3e-5)
    for got, want in zip(fmaps[0], want_fmap):
        np.testing.assert_allclose(np.asarray(got),
                                   want.numpy().transpose(0, 2, 3, 1),
                                   atol=3e-5)
