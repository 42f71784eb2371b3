"""Codec GAN-training tests: STFT/mel parity, discriminator structure,
VQ EMA semantics, and one end-to-end GAN step on a tiny config."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from llmvox_tpu.codec import discriminators as disc
from llmvox_tpu.codec import losses
from llmvox_tpu.codec.mel import mel_filterbank, mel_spectrogram, stft
from llmvox_tpu.train import vq_train
from llmvox_tpu.train.codec_trainer import CodecTrainer
from llmvox_tpu.train.codec_data import crop_or_repeat, gain_normalize
from llmvox_tpu.utils.config import CodecConfig, CodecTrainConfig

RNG = np.random.default_rng(0)

TINY_CODEC = CodecConfig(
    downsamples=(2, 2), n_filters=4, seanet_dimension=16, vq_dim=16,
    vq_bins=32, backbone_input_channels=16, backbone_dim=64,
    backbone_intermediate_dim=96, backbone_num_layers=2,
    n_fft=16, hop_length=4)
TINY_TRAIN = CodecTrainConfig(batch_size=2, num_samples=3072,
                              vq_kmeans_iters=5, max_steps=100,
                              mpd_periods=(2, 3),
                              mrd_resolutions=((512, 128, 512),),
                              dac_periods=(2,), dac_fft_sizes=(512,))


def test_stft_matches_torch():
    x = RNG.standard_normal((2, 2000)).astype(np.float32)
    for windowed in (True, False):
        ours = np.asarray(stft(jnp.asarray(x), n_fft=256, hop_length=64,
                               windowed=windowed))
        window = torch.hann_window(256) if windowed else None
        ref = torch.stft(torch.from_numpy(x), n_fft=256, hop_length=64,
                         window=window, center=True, return_complex=True)
        ref = ref.numpy().transpose(0, 2, 1)  # (B, frames, bins)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(np.abs(ours), np.abs(ref),
                                   atol=1e-3, rtol=1e-4)


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(24000, 1024, 100)
    assert fb.shape == (513, 100)
    assert (fb >= 0).all()
    # every mel filter has support; interior freqs are covered
    assert (fb.sum(axis=0) > 0).all()
    mel = mel_spectrogram(jnp.asarray(RNG.standard_normal((1, 4096)),
                                      jnp.float32))
    assert mel.shape == (1, 100, 4096 // 256 + 1)


@pytest.mark.slow
def test_discriminator_p_structure():
    params = disc.init_mpd(jax.random.PRNGKey(0), periods=(2, 3))
    x = jnp.asarray(RNG.standard_normal((1, 600)), jnp.float32)
    score, fmap = disc.apply_discriminator_p(params[0], x, 2)
    # fmap: stages 1..4 + post conv = 5 maps (discriminators.py:83-94)
    assert len(fmap) == 5
    assert score.ndim == 2 and score.shape[0] == 1


@pytest.mark.slow
def test_discriminator_r_structure():
    params = disc.init_mrd(jax.random.PRNGKey(0),
                           resolutions=((256, 64, 256),))
    x = jnp.asarray(RNG.standard_normal((1, 2000)), jnp.float32)
    score, fmap = disc.apply_discriminator_r(params[0], x, (256, 64, 256))
    assert len(fmap) == 6  # 5 conv stages + post
    assert np.isfinite(np.asarray(score)).all()


@pytest.mark.slow
def test_dac_discriminator_structure():
    params = disc.init_dac(jax.random.PRNGKey(0), periods=(2,),
                           fft_sizes=(512,))
    x = jnp.asarray(RNG.standard_normal((1, 2048)), jnp.float32)
    fmaps = disc.apply_dac(params, x, periods=(2,), fft_sizes=(512,))
    assert len(fmaps) == 2  # 1 MPD + 1 MRD
    assert len(fmaps[0]) == 6  # 5 convs + post
    # MRD: 5 bands x 5 convs + post = 26
    assert len(fmaps[1]) == 26


def test_hinge_losses_reference_values():
    real = [jnp.asarray([2.0, 0.5])]
    gen = [jnp.asarray([-2.0, 0.5])]
    # disc: mean(clamp(1-real)) + mean(clamp(1+gen)) = (0+0.5)/2 + (0+1.5)/2
    np.testing.assert_allclose(
        float(losses.discriminator_loss(real, gen)), 0.25 + 0.75)
    # gen: mean(clamp(1-gen)) = (3 + 0.5)/2
    np.testing.assert_allclose(float(losses.generator_loss(gen)), 1.75)


@pytest.mark.slow
def test_vq_train_step_semantics():
    key = jax.random.PRNGKey(0)
    state = vq_train.init_vq_state(key, bins=8, dim=4)
    assert not bool(state.inited)
    x = jnp.asarray(RNG.standard_normal((64, 4)), jnp.float32)
    quant, codes, commit, state = vq_train.vq_train_step(
        state, x, key, kmeans_iters=3)
    assert bool(state.inited)
    assert quant.shape == x.shape
    assert codes.shape == (64,)
    assert float(commit) >= 0
    # STE: quantized output carries x's gradient
    g = jax.grad(lambda xx: jnp.sum(vq_train.vq_train_step(
        state, xx, key, kmeans_iters=1)[0]))(x)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(np.asarray(g)))
    # codes reproducible through infer
    q2, c2 = vq_train.vq_infer(state, x)
    assert c2.shape == (64,)


def test_data_utils():
    wav = RNG.standard_normal(1000).astype(np.float32)
    out = gain_normalize(wav, -3.0)
    np.testing.assert_allclose(np.max(np.abs(out)), 10 ** (-3 / 20), atol=1e-4)
    rng = np.random.default_rng(0)
    assert crop_or_repeat(wav, 2500, rng).shape == (2500,)
    assert crop_or_repeat(wav, 300, rng).shape == (300,)


@pytest.mark.slow
def test_codec_gan_step_end_to_end():
    from llmvox_tpu.parallel import create_mesh
    trainer = CodecTrainer(TINY_CODEC, TINY_TRAIN,
                           mesh=create_mesh(dp_size=2, tp_size=1))
    audio = RNG.standard_normal(
        (TINY_TRAIN.batch_size, TINY_TRAIN.num_samples)).astype(np.float32)
    logs = trainer.step(audio * 0.1)
    for k, v in logs.items():
        assert np.isfinite(v), f"{k} not finite: {v}"
    assert logs["mel"] > 0
    # params actually moved
    logs2 = trainer.step(audio * 0.1)
    assert logs2["gen_total"] != logs["gen_total"]
    # export produces WavCodec-compatible inference params
    params = trainer.export_inference_params()
    assert params["codebooks"].shape == (1, TINY_CODEC.vq_bins,
                                         TINY_CODEC.vq_dim)
    assert "w" in params["encoder"]["conv_in"]
    m = trainer.validation_metrics(audio * 0.1)
    assert np.isfinite(m["val_mel_loss"])


def test_split_step_matches_fused():
    """The trainer's split (disc_step, gen_step) pair equals the fused
    single-program alternating step — same params, vq state, and logs
    (tolerance covers one-jit vs two-jit XLA fusion ordering only)."""
    import jax
    from llmvox_tpu.parallel import create_mesh
    from llmvox_tpu.train.codec_trainer import make_codec_gan_step

    trainer = CodecTrainer(TINY_CODEC, TINY_TRAIN,
                           mesh=create_mesh(dp_size=2, tp_size=1))
    audio = 0.1 * RNG.standard_normal(
        (TINY_TRAIN.batch_size, TINY_TRAIN.num_samples)).astype(np.float32)
    # trainer.step donates its state buffers — keep host copies so the
    # fused replay below starts from live arrays.  The replay must run
    # under the SAME mesh placement (replicated state, dp-sharded audio):
    # a single-device replay sums gradients in a different order than the
    # dp=2 GSPMD program and drifts ~4e-3 on grad norms.
    from llmvox_tpu.parallel.sharding import batch_sharding, replicated
    state0 = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                          trainer.state)
    state0 = jax.device_put(state0, replicated(trainer.mesh))
    audio_d = jax.device_put(jnp.asarray(audio), batch_sharding(trainer.mesh))
    rng0 = trainer.rng
    fused = jax.jit(make_codec_gan_step(
        TINY_CODEC, TINY_TRAIN, trainer.tx_g, trainer.tx_d))

    logs_split = [trainer.step(audio), trainer.step(audio)]

    state, rng = state0, rng0
    logs_fused = []
    for _ in range(2):
        key, rng = jax.random.split(rng)
        state, logs = fused(state, audio_d, key)
        logs_fused.append({k: float(v) for k, v in logs.items()})

    for ls, lf in zip(logs_split, logs_fused):
        assert set(ls) == set(lf)
        for k in ls:
            np.testing.assert_allclose(ls[k], lf[k], rtol=2e-4, atol=2e-5,
                                       err_msg=k)
    assert int(state.step) == int(trainer.state.step) == 2
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        state.gen_params, trainer.state.gen_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        state.disc_params, trainer.state.disc_params)


def test_micro_step_matches_fused():
    """The per-sub-discriminator micro step (disc grads concatenated
    across param-disjoint units; generator VJP pulled back on the summed
    per-term y_hat cotangents) equals the fused alternating step — the
    compile-granularity ladder's finest rung must be the same math
    (codec_trainer.py make_codec_gan_micro)."""
    import dataclasses

    import jax
    from llmvox_tpu.parallel import create_mesh
    from llmvox_tpu.parallel.sharding import batch_sharding, replicated
    from llmvox_tpu.train.codec_trainer import make_codec_gan_step

    tcfg = dataclasses.replace(TINY_TRAIN, step_impl="micro")
    trainer = CodecTrainer(TINY_CODEC, tcfg,
                           mesh=create_mesh(dp_size=2, tp_size=1))
    # own generator: the shared module RNG makes the drawn audio (and so
    # the parity margins) depend on which tests ran before in-process
    audio = 0.1 * np.random.default_rng(11).standard_normal(
        (TINY_TRAIN.batch_size, TINY_TRAIN.num_samples)).astype(np.float32)
    state0 = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                          trainer.state)
    state0 = jax.device_put(state0, replicated(trainer.mesh))
    audio_d = jax.device_put(jnp.asarray(audio), batch_sharding(trainer.mesh))
    rng0 = trainer.rng
    fused = jax.jit(make_codec_gan_step(
        TINY_CODEC, TINY_TRAIN, trainer.tx_g, trainer.tx_d))

    logs_micro = [trainer.step(audio), trainer.step(audio)]

    state, rng = state0, rng0
    logs_fused = []
    for _ in range(2):
        key, rng = jax.random.split(rng)
        state, logs = fused(state, audio_d, key)
        logs_fused.append({k: float(v) for k, v in logs.items()})

    for lm, lf in zip(logs_micro, logs_fused):
        assert set(lm) == set(lf)
        for k in lm:
            np.testing.assert_allclose(lm[k], lf[k], rtol=2e-3, atol=1e-4,
                                       err_msg=k)
    assert int(state.step) == int(trainer.state.step) == 2
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-5),
        state.gen_params, trainer.state.gen_params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-5),
        state.disc_params, trainer.state.disc_params)


@pytest.mark.slow
def test_codec_main_cli_smoke(tmp_path):
    """The training CLI (WavTokenizer/train.py:7-15 counterpart) runs
    end-to-end: tiny config, 2 steps, checkpoint written."""
    import wave as wavemod
    from llmvox_tpu.train import codec_main

    rng = np.random.default_rng(0)
    files = []
    for i in range(2):
        p = tmp_path / f"a{i}.wav"
        pcm = (rng.standard_normal(4000) * 3000).astype(np.int16)
        with wavemod.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(24000)
            w.writeframes(pcm.tobytes())
        files.append(str(p))
    filelist = tmp_path / "files.txt"
    filelist.write_text("\n".join(files))

    out = tmp_path / "out"
    codec_main.main([
        "--filelist_train", str(filelist),
        "--out_dir", str(out),
        "--max_steps", "2", "--dp_size", "2",
        "--log_interval", "1", "--val_interval", "10",
        # exactly the TINY_CODEC/TINY_TRAIN shapes so the GAN-step program
        # compiled by test_codec_gan_step_end_to_end is reused in-process
        "--batch_size", "2", "--num_samples", "3072",
        "--vq_kmeans_iters", "5",
        "--mpd_periods", "[2, 3]",
        "--mrd_resolutions", "[[512, 128, 512]]",
        "--dac_periods", "[2]", "--dac_fft_sizes", "[512]",
        "--downsamples", "[2, 2]", "--n_filters", "4",
        "--seanet_dimension", "16", "--vq_dim", "16", "--vq_bins", "32",
        "--backbone_input_channels", "16", "--backbone_dim", "64",
        "--backbone_intermediate_dim", "96", "--backbone_num_layers", "2",
        "--n_fft", "16", "--hop_length", "4",
    ])
    assert any(out.iterdir())


@pytest.mark.slow
def test_validation_metrics_full():
    trainer = CodecTrainer(TINY_CODEC, TINY_TRAIN)
    audio = 0.1 * RNG.standard_normal(
        (2, TINY_TRAIN.num_samples)).astype(np.float32)
    m = trainer.validation_metrics(audio, full=True)
    assert np.isfinite(m["val_mel_loss"])
    assert "val_si_snr" in m and np.isfinite(m["val_si_snr"])
    assert "val_periodicity_rmse" in m or "val_f1" in m or any(
        k.startswith("val_") for k in m)


def test_kmeans_init_with_fewer_vectors_than_bins():
    """Deployed-shape regression: vq_bins=4096 with a 3 s first batch has
    fewer encoder frames than centroids; kmeans must sample with
    replacement (core_vq sample_vectors), not emit an (n, dim) codebook."""
    key = jax.random.PRNGKey(0)
    state = vq_train.init_vq_state(key, bins=32, dim=4)
    x = jnp.asarray(RNG.standard_normal((12, 4)), jnp.float32)   # 12 < 32
    quant, codes, commit, state = vq_train.vq_train_step(
        state, x, key, kmeans_iters=2)
    assert state.embed.shape == (32, 4)
    assert bool(state.inited)
    assert quant.shape == x.shape and np.isfinite(np.asarray(quant)).all()
