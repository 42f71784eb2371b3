"""Checkpoint-converter tests against synthetic reference-named state dicts."""
import math

import pytest

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from llmvox_tpu.models import decoder as dec
from llmvox_tpu.tools import convert
from llmvox_tpu.utils.config import DecoderConfig

CFG = DecoderConfig(n_layer=2, n_head=2, n_embd=32, block_size=64,
                    vocab_size=16, bias=False)


def _rand(shape, gen):
    return torch.from_numpy(
        0.1 * gen.standard_normal(shape).astype(np.float32))


def _make_decoder_sd(cfg, gen, prefix=""):
    c = cfg.n_embd
    sd = {f"{prefix}transformer.wpe.weight": _rand((cfg.block_size, c), gen),
          f"{prefix}transformer.ln_f.weight": _rand((c,), gen) + 1.0,
          f"{prefix}lm_head.weight": _rand((cfg.vocab_size, c), gen)}
    for i in range(cfg.n_layer):
        p = f"{prefix}transformer.h.{i}"
        sd[f"{p}.ln_1.weight"] = _rand((c,), gen) + 1.0
        sd[f"{p}.attn.c_attn.weight"] = _rand((3 * c, c), gen)
        sd[f"{p}.attn.c_proj.weight"] = _rand((c, c), gen)
        sd[f"{p}.ln_2.weight"] = _rand((c,), gen) + 1.0
        sd[f"{p}.mlp.c_fc.weight"] = _rand((4 * c, c), gen)
        sd[f"{p}.mlp.c_proj.weight"] = _rand((4 * c, c), gen).T.contiguous()
    return sd


def _torch_gpt_forward_from_sd(sd, cfg, emb):
    """Reference-semantics forward consuming the raw state dict
    (independent of the converter's layout choices)."""
    x = torch.from_numpy(emb)
    b, t, c = x.shape
    x = x + sd["transformer.wpe.weight"][:t]
    nh, hd = cfg.n_head, cfg.head_dim
    for i in range(cfg.n_layer):
        p = f"transformer.h.{i}"
        h = F.layer_norm(x, (c,), sd[f"{p}.ln_1.weight"], None, 1e-5)
        qkv = F.linear(h, sd[f"{p}.attn.c_attn.weight"])
        q, k, v = qkv.split(c, dim=2)
        q = q.view(b, t, nh, hd).transpose(1, 2)
        k = k.view(b, t, nh, hd).transpose(1, 2)
        v = v.view(b, t, nh, hd).transpose(1, 2)
        y = F.scaled_dot_product_attention(q, k, v, is_causal=True)
        y = y.transpose(1, 2).contiguous().view(b, t, c)
        x = x + F.linear(y, sd[f"{p}.attn.c_proj.weight"])
        h = F.layer_norm(x, (c,), sd[f"{p}.ln_2.weight"], None, 1e-5)
        m = F.linear(h, sd[f"{p}.mlp.c_fc.weight"])
        m = 0.5 * m * (1.0 + torch.tanh(
            math.sqrt(2.0 / math.pi) * (m + 0.044715 * m ** 3)))
        x = x + F.linear(m, sd[f"{p}.mlp.c_proj.weight"])
    x = F.layer_norm(x, (c,), sd["transformer.ln_f.weight"], None, 1e-5)
    return F.linear(x, sd["lm_head.weight"]).numpy()


def test_decoder_conversion_end_to_end():
    gen = np.random.default_rng(0)
    sd = _make_decoder_sd(CFG, gen, prefix="_orig_mod.")
    params = convert.convert_decoder_state_dict(sd, CFG.n_layer, CFG.bias)
    emb = gen.standard_normal((1, 7, CFG.n_embd)).astype(np.float32)
    ours = np.asarray(dec.apply_decoder(params, jnp.asarray(emb), CFG))
    ref = _torch_gpt_forward_from_sd(convert.strip_prefix(sd), CFG, emb)
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_weight_norm_folding_matches_torch():
    gen = np.random.default_rng(1)
    conv = torch.nn.Conv1d(4, 8, 3)
    wn = torch.nn.utils.weight_norm(conv)
    with torch.no_grad():
        wn.weight_g.copy_(_rand((8, 1, 1), gen).abs() + 0.5)
        wn.weight_v.copy_(_rand((8, 4, 3), gen))
    wn(torch.zeros(1, 4, 8))  # trigger the pre-forward hook recompute
    effective = wn.weight.detach().numpy()  # torch's own g*v/||v||
    sd = {"layer.weight_g": wn.weight_g.detach(),
          "layer.weight_v": wn.weight_v.detach(),
          "layer.bias": wn.bias.detach()}
    folded = convert.fold_weight_norm(sd)
    np.testing.assert_allclose(folded["layer.weight"], effective, atol=1e-6)
    assert "layer.bias" in folded
    assert not any("weight_g" in k or "weight_v" in k for k in folded)


def test_codec_conversion_layout():
    gen = np.random.default_rng(2)
    dim, nl = 64, 2
    sd = {}
    sd["feature_extractor.encodec.quantizer.vq.layers.0._codebook.embed"] = \
        _rand((16, 20), gen)
    b = "backbone"
    sd[f"{b}.embed.weight"] = _rand((dim, 20, 7), gen)
    sd[f"{b}.embed.bias"] = _rand((dim,), gen)
    for j, blk in enumerate([0, 1, 3, 4]):
        p = f"{b}.pos_net.{blk}"
        for n in ("norm1", "norm2"):
            sd[f"{p}.{n}.weight"] = _rand((dim,), gen)
            sd[f"{p}.{n}.bias"] = _rand((dim,), gen)
        for cname in ("conv1", "conv2"):
            sd[f"{p}.{cname}.weight"] = _rand((dim, dim, 3), gen)
            sd[f"{p}.{cname}.bias"] = _rand((dim,), gen)
    p = f"{b}.pos_net.2"
    sd[f"{p}.norm.weight"] = _rand((dim,), gen)
    sd[f"{p}.norm.bias"] = _rand((dim,), gen)
    for n in ("q", "k", "v", "proj_out"):
        sd[f"{p}.{n}.weight"] = _rand((dim, dim, 1), gen)
        sd[f"{p}.{n}.bias"] = _rand((dim,), gen)
    sd[f"{b}.pos_net.5.weight"] = _rand((dim,), gen)
    sd[f"{b}.pos_net.5.bias"] = _rand((dim,), gen)
    sd[f"{b}.norm.scale.weight"] = _rand((4, dim), gen)
    sd[f"{b}.norm.shift.weight"] = _rand((4, dim), gen)
    for i in range(nl):
        p = f"{b}.convnext.{i}"
        sd[f"{p}.dwconv.weight"] = _rand((dim, 1, 7), gen)
        sd[f"{p}.dwconv.bias"] = _rand((dim,), gen)
        sd[f"{p}.norm.scale.weight"] = _rand((4, dim), gen)
        sd[f"{p}.norm.shift.weight"] = _rand((4, dim), gen)
        sd[f"{p}.pwconv1.weight"] = _rand((3 * dim, dim), gen)
        sd[f"{p}.pwconv1.bias"] = _rand((3 * dim,), gen)
        sd[f"{p}.pwconv2.weight"] = _rand((dim, 3 * dim), gen)
        sd[f"{p}.pwconv2.bias"] = _rand((dim,), gen)
        sd[f"{p}.gamma"] = _rand((dim,), gen)
    sd[f"{b}.final_layer_norm.weight"] = _rand((dim,), gen)
    sd[f"{b}.final_layer_norm.bias"] = _rand((dim,), gen)
    sd["head.out.weight"] = _rand((130, dim), gen)
    sd["head.out.bias"] = _rand((130,), gen)
    # extra keys that must be filtered out (discriminators etc.)
    sd["multiperioddisc.foo"] = _rand((3,), gen)

    params = convert.convert_codec_state_dict(sd, n_layers=nl, n_q=1)
    assert params["codebooks"].shape == (1, 16, 20)
    np.testing.assert_allclose(
        params["backbone"]["embed"]["w"],
        np.transpose(sd[f"{b}.embed.weight"].numpy(), (2, 1, 0)))
    np.testing.assert_allclose(
        params["backbone"]["pos_net"]["attn"]["q_w"],
        sd[f"{b}.pos_net.2.q.weight"].numpy()[:, :, 0].T)
    np.testing.assert_allclose(
        params["backbone"]["convnext"]["pw1_w"][1],
        sd[f"{b}.convnext.1.pwconv1.weight"].numpy().T)
    assert params["head"]["w"].shape == (dim, 130)


def test_byt5_embedding_resize():
    gen = np.random.default_rng(3)
    w = gen.standard_normal((384, 16)).astype(np.float32)
    out = convert.convert_byt5_embeddings(w, target_rows=386)
    assert out.shape == (386, 16)
    np.testing.assert_allclose(out[:384], w)
    np.testing.assert_allclose(out[384], w.mean(axis=0), atol=1e-6)
    np.testing.assert_allclose(out[385], w.mean(axis=0), atol=1e-6)


@pytest.mark.slow
def test_prepare_data_cli(tmp_path):
    """Offline dataset prep: wav + manifest -> prepared npz (counterpart
    of the reference's in-dataloader encode, src/data.py:94-96)."""
    import json
    import wave as wavemod
    import jax
    from llmvox_tpu.codec.codec import init_codec_params
    from llmvox_tpu.tools import prepare_data
    from llmvox_tpu.train.checkpoint import save_params_npz
    from llmvox_tpu.train.data import SpeechDataset
    from llmvox_tpu.utils.config import CodecConfig

    cfg = CodecConfig(downsamples=(2, 2), n_filters=4, seanet_dimension=16,
                      vq_dim=16, vq_bins=32, backbone_input_channels=16,
                      backbone_dim=32, backbone_intermediate_dim=96,
                      backbone_num_layers=1, n_fft=16, hop_length=4)
    params = jax.device_get(
        init_codec_params(jax.random.PRNGKey(0), cfg, with_encoder=True))
    cp = tmp_path / "codec.npz"
    save_params_npz(str(cp), params, meta={"cfg": "tiny"})

    rng = np.random.default_rng(0)
    audio_dir = tmp_path / "audios"
    audio_dir.mkdir()
    items = []
    for i in range(2):
        pcm = (rng.standard_normal(1000) * 3000).astype(np.int16)
        with wavemod.open(str(audio_dir / f"s{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(24000)
            w.writeframes(pcm.tobytes())
        items.append({"id": f"s{i}", "answer_text": f"sample number {i}"})
    manifest = tmp_path / "data.json"
    manifest.write_text(json.dumps(items))

    # prepare_data builds WavCodec with the DEPLOYED config by default;
    # monkeypatch-free: pass the tiny config via from_pretrained... the
    # CLI reads params only, so inject cfg through WavCodec default.
    import llmvox_tpu.tools.prepare_data as pd
    orig = pd.WavCodec.from_pretrained
    pd.WavCodec.from_pretrained = classmethod(
        lambda cls, path, **kw: orig(path, cfg=cfg))
    try:
        out = tmp_path / "prep.npz"
        pd.main(["--data_path", str(manifest),
                 "--speech_data_folder", str(audio_dir),
                 "--codec_params", str(cp), "--out", str(out)])
    finally:
        pd.WavCodec.from_pretrained = orig
    ds = SpeechDataset(str(out))
    assert len(ds) == 2
    assert ds[0].codes.dtype == np.int32 and len(ds[0].codes) > 0
    assert ds[0].text_ids.dtype == np.int32 and len(ds[0].text_ids) > 0


def test_copy_synthesis_cli(tmp_path):
    """Codec copy-synthesis CLI (WavTokenizer/infer.py:44-68 counterpart):
    wav -> encode -> decode -> reconstruction wav."""
    import wave as wavemod
    import jax
    from llmvox_tpu.codec.codec import init_codec_params
    from llmvox_tpu.tools import copy_synthesis as cs
    from llmvox_tpu.train.checkpoint import save_params_npz
    from llmvox_tpu.utils.audio import read_wav
    from llmvox_tpu.utils.config import CodecConfig

    cfg = CodecConfig(downsamples=(2, 2), n_filters=4, seanet_dimension=16,
                      vq_dim=16, vq_bins=32, backbone_input_channels=16,
                      backbone_dim=32, backbone_intermediate_dim=96,
                      backbone_num_layers=1, n_fft=16, hop_length=4)
    params = jax.device_get(
        init_codec_params(jax.random.PRNGKey(1), cfg, with_encoder=True))
    cp = tmp_path / "codec.npz"
    save_params_npz(str(cp), params)

    rng = np.random.default_rng(1)
    pcm = (rng.standard_normal(800) * 3000).astype(np.int16)
    src = tmp_path / "in.wav"
    with wavemod.open(str(src), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(24000)
        w.writeframes(pcm.tobytes())

    orig = cs.WavCodec.from_pretrained
    cs.WavCodec.from_pretrained = classmethod(
        lambda cls, path, **kw: orig(path, cfg=cfg))
    try:
        out_dir = tmp_path / "recon"
        cs.main(["--codec_params", str(cp), "--inputs", str(src),
                 "--out_dir", str(out_dir)])
    finally:
        cs.WavCodec.from_pretrained = orig
    wav, sr = read_wav(str(out_dir / "in_recon.wav"))
    assert sr == 24000 and len(wav) > 0 and np.isfinite(wav).all()


@pytest.mark.slow
@pytest.mark.parametrize("cfg", [
    CFG,
    DecoderConfig(n_layer=4, n_head=8, n_embd=768, block_size=8192,
                  vocab_size=4096, bias=False),   # deployed shapes
], ids=["tiny", "deployed"])
@pytest.mark.slow
def test_validate_parity_harness_success_path(tmp_path, cfg):
    """tools/validate_parity against a SYNTHETIC reference-format
    checkpoint: converts it, imports the actual reference torch model
    from /root/reference, and must report parity (proves the harness
    itself works, not just its skip path)."""
    import os
    if not os.path.exists("/root/reference/src/model.py"):
        pytest.skip("reference repo not mounted")
    from llmvox_tpu.tools import validate_parity

    gen = np.random.default_rng(5)
    sd = _make_decoder_sd(cfg, gen, prefix="_orig_mod.")
    blob = {"model": sd,
            "model_args": dict(n_layer=cfg.n_layer, n_head=cfg.n_head,
                               n_embd=cfg.n_embd, block_size=cfg.block_size,
                               bias=cfg.bias, vocab_size=cfg.vocab_size,
                               dropout=0.0)}
    ckpt = tmp_path / "synthetic_ref.pt"
    torch.save(blob, str(ckpt))
    assert validate_parity.validate_decoder("/root/reference", str(ckpt))


@pytest.mark.slow
def test_validate_parity_codec_success_path(tmp_path):
    """Deployed-size codec golden check: instantiate the reference model
    from its own YAML (random init), save its state dict as the
    checkpoint, and the harness must report waveform parity — verifying
    converter + full decode stack against the real reference
    implementation (only the trained VALUES are synthetic)."""
    import os
    import sys
    cfgp = ("/root/reference/WavTokenizer/configs/"
            "wavtokenizer_smalldata_frame75_3s_nq1_code4096_dim512_"
            "kmeans200_attn.yaml")
    if not os.path.exists(cfgp):
        pytest.skip("reference repo not mounted")
    from llmvox_tpu.tools import validate_parity
    validate_parity._stub_torchaudio()
    sys.path.insert(0, "/root/reference/WavTokenizer")
    try:
        from decoder.pretrained import WavTokenizer
        torch.manual_seed(0)
        model = WavTokenizer.from_hparams0802(cfgp)
        ckpt = tmp_path / "synth_codec.ckpt"
        torch.save({"state_dict": model.state_dict()}, str(ckpt))
        del model
        assert validate_parity.validate_codec("/root/reference", str(ckpt),
                                              config_yaml=cfgp)
    finally:
        sys.path.remove("/root/reference/WavTokenizer")
