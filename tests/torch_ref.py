"""Independent PyTorch implementations of the reference numerics.

Written from the architectural spec (see SURVEY.md §2) purely as a parity
oracle for the JAX/TPU implementation: each function takes the *JAX*
parameter pytree, converts layouts (JAX is channel-last / (K,Cin,Cout)
kernels; torch is channel-first / (Cout,Cin,K)), and runs the same math
with torch ops.  Tests assert allclose between the two stacks.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x)).to(torch.float32)


def conv_w(w) -> torch.Tensor:
    """(K, Cin, Cout) -> torch (Cout, Cin, K)."""
    return t(np.transpose(np.asarray(w), (2, 1, 0)))


def lin_w(w) -> torch.Tensor:
    """(Cin, Cout) -> torch (Cout, Cin)."""
    return t(np.asarray(w).T)


# ---------------------------------------------------------------------------
# ISTFT ("same" padding) — oracle for ops/istft.py
# ---------------------------------------------------------------------------

def istft_same(spec: torch.Tensor, n_fft: int, hop: int) -> torch.Tensor:
    """spec: (B, T, n_fft//2+1) complex -> (B, hop*T)."""
    win = n_fft
    pad = (win - hop) // 2
    window = torch.hann_window(win)
    b, T, _ = spec.shape
    ifft = torch.fft.irfft(spec, n_fft, dim=-1, norm="backward")
    ifft = ifft * window
    # channel-first frames for fold: (B, win, T)
    frames = ifft.transpose(1, 2)
    out_size = (T - 1) * hop + win
    y = F.fold(frames, output_size=(1, out_size), kernel_size=(1, win),
               stride=(1, hop))[:, 0, 0, pad:-pad]
    wsq = window.square().expand(1, T, -1).transpose(1, 2)
    env = F.fold(wsq, output_size=(1, out_size), kernel_size=(1, win),
                 stride=(1, hop))[0, 0, 0, pad:-pad]
    return y / env


# ---------------------------------------------------------------------------
# Codec backbone pieces — oracles for codec/backbone.py
# ---------------------------------------------------------------------------

def group_norm(x_cf: torch.Tensor, s, b, groups=32, eps=1e-6) -> torch.Tensor:
    return F.group_norm(x_cf, groups, t(s), t(b), eps)


def resnet_block(p, x_cf: torch.Tensor, eps=1e-6) -> torch.Tensor:
    h = F.group_norm(x_cf, 32, t(p["norm1_s"]), t(p["norm1_b"]), eps)
    h = h * torch.sigmoid(h)
    h = F.conv1d(h, conv_w(p["conv1_w"]), t(p["conv1_b"]), padding=1)
    h = F.group_norm(h, 32, t(p["norm2_s"]), t(p["norm2_b"]), eps)
    h = h * torch.sigmoid(h)
    h = F.conv1d(h, conv_w(p["conv2_w"]), t(p["conv2_b"]), padding=1)
    return x_cf + h


def attn_block(p, x_cf: torch.Tensor, eps=1e-6) -> torch.Tensor:
    c = x_cf.shape[1]
    h = F.group_norm(x_cf, 32, t(p["norm_s"]), t(p["norm_b"]), eps)
    # 1x1 convs == linear over channels
    q = F.conv1d(h, lin_w(p["q_w"]).unsqueeze(-1), t(p["q_b"]))
    k = F.conv1d(h, lin_w(p["k_w"]).unsqueeze(-1), t(p["k_b"]))
    v = F.conv1d(h, lin_w(p["v_w"]).unsqueeze(-1), t(p["v_b"]))
    q = q.permute(0, 2, 1)
    w = torch.bmm(q, k) * (int(c) ** (-0.5))
    w = torch.softmax(w, dim=2)
    w = w.permute(0, 2, 1)
    h = torch.bmm(v, w)
    h = F.conv1d(h, lin_w(p["proj_w"]).unsqueeze(-1), t(p["proj_b"]))
    return x_cf + h


def ada_layer_norm(scale_emb, shift_emb, x_cl: torch.Tensor, cond: int,
                   eps=1e-6) -> torch.Tensor:
    dim = x_cl.shape[-1]
    y = F.layer_norm(x_cl, (dim,), eps=eps)
    return y * t(scale_emb)[cond] + t(shift_emb)[cond]


def convnext_block(p, x_cf: torch.Tensor, cond: int, eps=1e-6) -> torch.Tensor:
    residual = x_cf
    dim = x_cf.shape[1]
    h = F.conv1d(x_cf, conv_w(p["dwconv_w"]), t(p["dwconv_b"]), padding=3,
                 groups=dim)
    h = h.transpose(1, 2)
    h = ada_layer_norm(p["norm_scale"], p["norm_shift"], h, cond, eps)
    h = F.linear(h, lin_w(p["pw1_w"]), t(p["pw1_b"]))
    h = F.gelu(h)  # exact
    h = F.linear(h, lin_w(p["pw2_w"]), t(p["pw2_b"]))
    h = t(p["gamma"]) * h
    h = h.transpose(1, 2)
    return residual + h


def backbone(params, feats_cl: np.ndarray, cond: int, cfg) -> torch.Tensor:
    """feats_cl: (B, L, 512) numpy -> (B, L, 768) torch, mirrors
    VocosBackbone.forward."""
    x = t(feats_cl).transpose(1, 2)  # channel-first
    x = F.conv1d(x, conv_w(params["embed"]["w"]), t(params["embed"]["b"]),
                 padding=3)
    pn = params["pos_net"]
    x = resnet_block(pn["res0"], x)
    x = resnet_block(pn["res1"], x)
    x = attn_block(pn["attn"], x)
    x = resnet_block(pn["res2"], x)
    x = resnet_block(pn["res3"], x)
    x = F.group_norm(x, 32, t(pn["gn_s"]), t(pn["gn_b"]), 1e-6)
    x = ada_layer_norm(params["adanorm"]["scale"], params["adanorm"]["shift"],
                       x.transpose(1, 2), cond).transpose(1, 2)
    n_layers = np.asarray(params["convnext"]["gamma"]).shape[0]
    for i in range(n_layers):
        layer = {k: np.asarray(v)[i] for k, v in params["convnext"].items()}
        x = convnext_block(layer, x, cond)
    x = F.layer_norm(x.transpose(1, 2), (x.shape[1],),
                     t(params["final_ln"]["s"]), t(params["final_ln"]["b"]),
                     1e-6)
    return x  # (B, L, 768)


def istft_head(params, h_cl: torch.Tensor, n_fft: int, hop: int) -> torch.Tensor:
    x = F.linear(h_cl, lin_w(params["w"]), t(params["b"]))
    x = x.transpose(1, 2)  # (B, n_fft+2, L)
    mag, p = x.chunk(2, dim=1)
    mag = torch.exp(mag).clip(max=1e2)
    spec = mag * (torch.cos(p) + 1j * torch.sin(p))
    return istft_same(spec.transpose(1, 2), n_fft, hop)


def codec_decode(params, codes: np.ndarray, cond: int, cfg) -> np.ndarray:
    cb = np.asarray(params["codebooks"])
    feats = cb[0][codes]  # (B, L, 512), n_q = 1
    for q in range(1, cb.shape[0]):
        feats = feats + cb[q][codes]
    h = backbone(params["backbone"], feats, cond, cfg)
    wav = istft_head(params["head"], h, cfg.n_fft, cfg.hop_length)
    return wav.numpy()


# ---------------------------------------------------------------------------
# Speech decoder (GPT) — oracle for models/decoder.py
# ---------------------------------------------------------------------------

def new_gelu(x: torch.Tensor) -> torch.Tensor:
    return 0.5 * x * (1.0 + torch.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * torch.pow(x, 3.0))))


def gpt_forward(params, emb: np.ndarray, cfg) -> np.ndarray:
    """Full-sequence causal forward, LayerNorm eps 1e-5, returns logits."""
    x = t(emb)
    b, T, c = x.shape
    x = x + t(params["wpe"])[:T]
    h = params["h"]
    n_layer = np.asarray(h["ln1_s"]).shape[0]
    nh, hd = cfg.n_head, cfg.head_dim

    def get(name, i):
        return t(np.asarray(h[name])[i]) if name in h else None

    for i in range(n_layer):
        ln1 = F.layer_norm(x, (c,), get("ln1_s", i), get("ln1_b", i), 1e-5)
        qkv = F.linear(ln1, t(np.asarray(h["wqkv"])[i].T),
                       get("bqkv", i))
        q, k, v = qkv.split(c, dim=2)
        q = q.view(b, T, nh, hd).transpose(1, 2)
        k = k.view(b, T, nh, hd).transpose(1, 2)
        v = v.view(b, T, nh, hd).transpose(1, 2)
        y = F.scaled_dot_product_attention(q, k, v, is_causal=True)
        y = y.transpose(1, 2).contiguous().view(b, T, c)
        x = x + F.linear(y, t(np.asarray(h["wo"])[i].T), get("bo", i))
        ln2 = F.layer_norm(x, (c,), get("ln2_s", i), get("ln2_b", i), 1e-5)
        m = F.linear(ln2, t(np.asarray(h["wfc"])[i].T), get("bfc", i))
        m = new_gelu(m)
        x = x + F.linear(m, t(np.asarray(h["wproj"])[i].T), get("bproj", i))

    lnf_b = t(params["lnf_b"]) if "lnf_b" in params else None
    x = F.layer_norm(x, (c,), t(params["lnf_s"]), lnf_b, 1e-5)
    logits = F.linear(x, lin_w(params["head"]))
    return logits.numpy()
