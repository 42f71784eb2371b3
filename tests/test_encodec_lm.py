"""Encodec LM + StreamingTransformer + arithmetic coding
(encoder/model.py:27-66, encoder/modules/transformer.py, quantization/ac.py).

The transformer/LM are checked against an independent torch oracle built
from public torch modules with the streaming semantics from SURVEY's spec;
the coder is checked by exact roundtrips.
"""
import io
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from llmvox_tpu.codec import lm
from llmvox_tpu.codec.compress import compress_codes, decompress_codes
from llmvox_tpu.codec.entropy import (ArithmeticCoder, ArithmeticDecoder,
                                      BitPacker, BitUnpacker, quantized_cdf)

CFG = lm.LMConfig(n_q=3, card=33, dim=32, num_layers=2, num_heads=4,
                  past_context=14)


# --------------------------------------------------------------------------
# torch oracle
# --------------------------------------------------------------------------

class OracleLayer(torch.nn.Module):
    def __init__(self, dim, heads, hidden):
        super().__init__()
        self.attn = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
        self.norm1 = torch.nn.LayerNorm(dim)
        self.norm2 = torch.nn.LayerNorm(dim)
        self.ff1 = torch.nn.Linear(dim, hidden)
        self.ff2 = torch.nn.Linear(hidden, dim)

    def forward(self, x, x_past, past_context):
        sa_input = x
        t, h = x.shape[1], x_past.shape[1]
        keys = torch.cat([x_past, x], dim=1)
        qpos = torch.arange(h, t + h).view(-1, 1)
        kpos = torch.arange(t + h).view(1, -1)
        delta = qpos - kpos
        valid = (delta >= 0) & (delta <= past_context)
        a = self.attn(x, keys, keys, attn_mask=~valid, need_weights=False)[0]
        x = self.norm1(x + a)
        x = self.norm2(x + self.ff2(F.gelu(self.ff1(x))))
        return x, sa_input


class OracleTransformer(torch.nn.Module):
    def __init__(self, cfg: lm.LMConfig):
        super().__init__()
        self.cfg = cfg
        self.norm_in = torch.nn.LayerNorm(cfg.dim)
        self.layers = torch.nn.ModuleList(
            [OracleLayer(cfg.dim, cfg.num_heads, cfg.hidden_dim)
             for _ in range(cfg.num_layers)])

    def forward(self, x, states=None, offset=0):
        b, t, c = x.shape
        if states is None:
            states = [torch.zeros_like(x[:, :1])
                      for _ in range(len(self.layers))]
        pos = torch.arange(t).view(1, -1, 1) + offset
        half = c // 2
        adim = torch.arange(half).view(1, 1, -1)
        phase = pos / (self.cfg.max_period ** (adim / (half - 1)))
        pos_emb = torch.cat([torch.cos(phase), torch.sin(phase)], dim=-1)
        x = self.norm_in(x) + pos_emb
        new_states = []
        for st, layer in zip(states, self.layers):
            x, sa_input = layer(x, st, self.cfg.past_context)
            st = torch.cat([st, sa_input], dim=1)
            new_states.append(st[:, -self.cfg.past_context:])
        return x, new_states, offset + t


class OracleLM(torch.nn.Module):
    def __init__(self, cfg: lm.LMConfig):
        super().__init__()
        self.transformer = OracleTransformer(cfg)
        self.emb = torch.nn.ModuleList(
            [torch.nn.Embedding(cfg.card + 1, cfg.dim)
             for _ in range(cfg.n_q)])
        self.heads = torch.nn.ModuleList(
            [torch.nn.Linear(cfg.dim, cfg.card) for _ in range(cfg.n_q)])

    def forward(self, indices, states=None, offset=0):
        b, k, t = indices.shape
        x = sum(self.emb[i](indices[:, i]) for i in range(k))
        out, states, offset = self.transformer(x, states, offset)
        logits = torch.stack([self.heads[i](out) for i in range(k)],
                             dim=1).permute(0, 3, 1, 2)
        return torch.softmax(logits, dim=1), states, offset


def _export_transformer(oracle: OracleTransformer) -> dict:
    layers = []
    for ol in oracle.layers:
        layers.append({
            "qkv": {"w": ol.attn.in_proj_weight.T, "b": ol.attn.in_proj_bias},
            "out": {"w": ol.attn.out_proj.weight.T,
                    "b": ol.attn.out_proj.bias},
            "ff1": {"w": ol.ff1.weight.T, "b": ol.ff1.bias},
            "ff2": {"w": ol.ff2.weight.T, "b": ol.ff2.bias},
            "norm1": {"scale": ol.norm1.weight, "bias": ol.norm1.bias},
            "norm2": {"scale": ol.norm2.weight, "bias": ol.norm2.bias},
        })
    stacked = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x.detach().numpy()) for x in xs]),
        *layers)
    return {"layers": stacked,
            "norm_in": {"scale": jnp.asarray(oracle.norm_in.weight.detach()
                                             .numpy()),
                        "bias": jnp.asarray(oracle.norm_in.bias.detach()
                                            .numpy())}}


def _export_lm(oracle: OracleLM, cfg: lm.LMConfig) -> dict:
    return {
        "emb": jnp.stack([jnp.asarray(e.weight.detach().numpy())
                          for e in oracle.emb]),
        "heads": {
            "w": jnp.stack([jnp.asarray(h.weight.T.detach().numpy())
                            for h in oracle.heads]),
            "b": jnp.stack([jnp.asarray(h.bias.detach().numpy())
                            for h in oracle.heads]),
        },
        "transformer": _export_transformer(oracle.transformer),
    }


@pytest.fixture(scope="module")
def oracle_pair():
    torch.manual_seed(0)
    oracle = OracleLM(CFG).eval()
    return oracle, _export_lm(oracle, CFG)


def test_sin_embedding_matches_reference_formula():
    pos = jnp.arange(7, dtype=jnp.float32)[None]
    got = lm.sin_embedding(pos, 8, max_period=100.0)
    half = 4
    adim = np.arange(half)
    phase = np.arange(7)[:, None] / (100.0 ** (adim / (half - 1)))
    want = np.concatenate([np.cos(phase), np.sin(phase)], -1)[None]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_lm_forward_matches_torch_oracle(oracle_pair):
    oracle, params = oracle_pair
    b, t = 2, 10
    idx = np.random.default_rng(0).integers(0, CFG.card + 1,
                                            (b, CFG.n_q, t))
    with torch.no_grad():
        want, _, _ = oracle(torch.as_tensor(idx, dtype=torch.long))
    got, _ = lm.apply_lm(params, jnp.asarray(idx, jnp.int32),
                         lm.init_stream_state(CFG, b), CFG)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_streaming_state_matches_torch_oracle(oracle_pair):
    """Chunked streaming (4+6+8 frames, crossing past_context=14) matches
    the oracle's growing-concat state handling."""
    oracle, params = oracle_pair
    b = 1
    rng = np.random.default_rng(1)
    chunks = [rng.integers(0, CFG.card + 1, (b, CFG.n_q, t))
              for t in (4, 6, 8)]
    states, offset = None, 0
    state = lm.init_stream_state(CFG, b)
    for idx in chunks:
        with torch.no_grad():
            want, states, offset = oracle(
                torch.as_tensor(idx, dtype=torch.long), states, offset)
        got, state = lm.apply_lm(params, jnp.asarray(idx, jnp.int32),
                                 state, CFG)
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_chunked_equals_full_pass():
    cfg = CFG
    params = lm.init_lm(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(1), (2, cfg.n_q, 9), 0,
                             cfg.card + 1)
    full, _ = lm.apply_lm(params, idx, lm.init_stream_state(cfg, 2), cfg)
    p1, st = lm.apply_lm(params, idx[..., :4],
                         lm.init_stream_state(cfg, 2), cfg)
    p2, _ = lm.apply_lm(params, idx[..., 4:], st, cfg)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([p1, p2], -1)), np.asarray(full),
        atol=1e-5)


def test_lm_is_causal():
    cfg = CFG
    params = lm.init_lm(jax.random.PRNGKey(0), cfg)
    idx = jax.random.randint(jax.random.PRNGKey(2), (1, cfg.n_q, 8), 0,
                             cfg.card + 1)
    base, _ = lm.apply_lm(params, idx, lm.init_stream_state(cfg, 1), cfg)
    mut = idx.at[:, :, 5].set((idx[:, :, 5] + 1) % (cfg.card + 1))
    moved, _ = lm.apply_lm(params, mut, lm.init_stream_state(cfg, 1), cfg)
    np.testing.assert_allclose(np.asarray(moved[..., :5]),
                               np.asarray(base[..., :5]), atol=1e-6)


def test_lm_config_for_matches_get_lm_model():
    """get_lm_model (model.py:203-204): n_q, bins, past_context =
    int(3.5 * frame_rate)."""
    from llmvox_tpu.utils.config import CodecConfig
    ccfg = CodecConfig()
    cfg = lm.lm_config_for(ccfg)
    hop = int(np.prod(ccfg.downsamples))
    assert cfg.past_context == int(3.5 * math.ceil(ccfg.sample_rate / hop))
    assert cfg.n_q == ccfg.num_quantizers and cfg.card == ccfg.vq_bins
    assert cfg.dim == 200 and cfg.num_layers == 5


# --------------------------------------------------------------------------
# entropy coding
# --------------------------------------------------------------------------

def test_bit_packer_roundtrip():
    bits = [1, 0, 1, 1, 0, 0, 1, 0, 1, 1, 1]   # non-byte-aligned tail
    fo = io.BytesIO()
    p = BitPacker(fo)
    for b in bits:
        p.push(b)
    p.flush()
    fo.seek(0)
    u = BitUnpacker(fo)
    got = [u.pull() for _ in range(len(bits))]
    assert got == bits
    # tail padding is zeros, then the stream drains to None
    rest = [u.pull() for _ in range(8)]
    assert set(rest) <= {0, None} and rest[-1] is None


def test_quantized_cdf_properties():
    pdf = np.asarray([0.7, 0.2, 0.05, 0.05])
    cdf = quantized_cdf(pdf)
    widths = np.diff(np.concatenate([[0], cdf]))
    assert (widths >= 2).all()                    # min_range floor
    assert cdf[-1] <= 1 << 24
    assert widths[0] > widths[1] > widths[2]      # monotone with the pdf
    with pytest.raises(ValueError):
        quantized_cdf(pdf, min_range=1)


def test_arithmetic_coder_roundtrip_random_pdfs():
    """The ac.py self-test (ac.py:263-288), numpy edition."""
    rng = np.random.default_rng(1234)
    for _ in range(3):
        card = int(rng.integers(4, 1500))
        steps = int(rng.integers(50, 200))
        fo = io.BytesIO()
        enc = ArithmeticCoder(fo)
        pdfs, syms = [], []
        for _ in range(steps):
            p = rng.dirichlet(np.ones(card) * 0.3)
            s = int(rng.choice(card, p=p))
            pdfs.append(p)
            syms.append(s)
            enc.push(s, quantized_cdf(p))
        enc.flush()
        fo.seek(0)
        dec = ArithmeticDecoder(fo)
        for p, s in zip(pdfs, syms):
            assert dec.pull(quantized_cdf(p)) == s
        assert dec.pull(np.asarray([1 << 24])) is None


def test_compress_roundtrip_is_exact():
    cfg = lm.LMConfig(n_q=3, card=64, dim=16, num_layers=2, num_heads=4,
                      past_context=20)
    params = lm.init_lm(jax.random.PRNGKey(0), cfg)
    codes = np.asarray(jax.random.randint(jax.random.PRNGKey(2),
                                          (cfg.n_q, 25), 0, cfg.card))
    rec = decompress_codes(params, compress_codes(params, codes, cfg), cfg)
    np.testing.assert_array_equal(rec, codes)


def test_confident_lm_compresses_below_raw_bits():
    cfg = lm.LMConfig(n_q=3, card=64, dim=16, num_layers=2, num_heads=4,
                      past_context=20)
    params = lm.init_lm(jax.random.PRNGKey(0), cfg)
    params["heads"]["b"] = params["heads"]["b"].at[:, 7].add(12.0)
    codes = np.full((cfg.n_q, 40), 7, np.int32)
    blob = compress_codes(params, codes, cfg)
    raw_bits = codes.size * math.log2(cfg.card)
    assert len(blob) * 8 < 0.25 * raw_bits
    np.testing.assert_array_equal(
        decompress_codes(params, blob, cfg), codes)


def test_compress_rejects_wrong_n_q():
    cfg = lm.LMConfig(n_q=2, card=8, dim=8, num_layers=1, num_heads=2,
                      past_context=8)
    params = lm.init_lm(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="codebooks"):
        compress_codes(params, np.zeros((3, 4), np.int32), cfg)


def test_compress_rejects_out_of_range_codes():
    """A code >= card (or negative) must raise a clear ValueError, not a
    cryptic IndexError deep inside the arithmetic coder."""
    cfg = lm.LMConfig(n_q=2, card=8, dim=8, num_layers=1, num_heads=2,
                      past_context=8)
    params = lm.init_lm(jax.random.PRNGKey(0), cfg)
    bad_hi = np.zeros((2, 4), np.int32)
    bad_hi[1, 2] = 8                       # == card
    with pytest.raises(ValueError, match=r"\[0, 8\)"):
        compress_codes(params, bad_hi, cfg)
    bad_lo = np.zeros((2, 4), np.int32)
    bad_lo[0, 0] = -1
    with pytest.raises(ValueError, match=r"\[0, 8\)"):
        compress_codes(params, bad_lo, cfg)


def test_convert_lm_state_dict_matches_oracle(oracle_pair):
    """A reference-format LMModel checkpoint (self_attn/linear1/linears/emb
    key names) converts to params that reproduce the oracle's output."""
    from llmvox_tpu.tools.convert import convert_lm_state_dict
    oracle, _ = oracle_pair
    sd = {}
    sd["transformer.norm_in.weight"] = oracle.transformer.norm_in.weight
    sd["transformer.norm_in.bias"] = oracle.transformer.norm_in.bias
    for i, ol in enumerate(oracle.transformer.layers):
        t = f"transformer.layers.{i}."
        sd[t + "self_attn.in_proj_weight"] = ol.attn.in_proj_weight
        sd[t + "self_attn.in_proj_bias"] = ol.attn.in_proj_bias
        sd[t + "self_attn.out_proj.weight"] = ol.attn.out_proj.weight
        sd[t + "self_attn.out_proj.bias"] = ol.attn.out_proj.bias
        sd[t + "linear1.weight"] = ol.ff1.weight
        sd[t + "linear1.bias"] = ol.ff1.bias
        sd[t + "linear2.weight"] = ol.ff2.weight
        sd[t + "linear2.bias"] = ol.ff2.bias
        sd[t + "norm1.weight"] = ol.norm1.weight
        sd[t + "norm1.bias"] = ol.norm1.bias
        sd[t + "norm2.weight"] = ol.norm2.weight
        sd[t + "norm2.bias"] = ol.norm2.bias
    for k in range(CFG.n_q):
        sd[f"emb.{k}.weight"] = oracle.emb[k].weight
        sd[f"linears.{k}.weight"] = oracle.heads[k].weight
        sd[f"linears.{k}.bias"] = oracle.heads[k].bias
    sd = {k: v.detach() for k, v in sd.items()}
    params = jax.tree.map(jnp.asarray,
                          convert_lm_state_dict(sd, CFG.n_q, CFG.num_layers))
    idx = np.random.default_rng(3).integers(0, CFG.card + 1, (1, CFG.n_q, 6))
    with torch.no_grad():
        want, _, _ = oracle(torch.as_tensor(idx, dtype=torch.long))
    got, _ = lm.apply_lm(params, jnp.asarray(idx, jnp.int32),
                         lm.init_stream_state(CFG, 1), CFG)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_compress_empty_and_single_frame():
    cfg = lm.LMConfig(n_q=2, card=16, dim=8, num_layers=1, num_heads=2,
                      past_context=8)
    params = lm.init_lm(jax.random.PRNGKey(0), cfg)
    for t in (0, 1):
        codes = np.zeros((cfg.n_q, t), np.int32)
        blob = compress_codes(params, codes, cfg)
        rec = decompress_codes(params, blob, cfg)
        assert rec.shape == (cfg.n_q, t)
        np.testing.assert_array_equal(rec, codes)


def test_decompress_rejects_truncated_stream():
    cfg = lm.LMConfig(n_q=2, card=16, dim=8, num_layers=1, num_heads=2,
                      past_context=8)
    params = lm.init_lm(jax.random.PRNGKey(0), cfg)
    codes = np.asarray(jax.random.randint(jax.random.PRNGKey(1),
                                          (cfg.n_q, 12), 0, cfg.card))
    blob = compress_codes(params, codes, cfg)
    with pytest.raises(ValueError, match="ended early"):
        decompress_codes(params, blob[: len(blob) // 3], cfg)


def test_arithmetic_coder_single_symbol_alphabet_degenerate():
    """Cardinality-2 minimum: a peaked 2-symbol pdf still roundtrips."""
    fo = io.BytesIO()
    enc = ArithmeticCoder(fo)
    pdf = np.asarray([0.999, 0.001])
    for s in [0] * 50 + [1] + [0] * 50:
        enc.push(s, quantized_cdf(pdf))
    enc.flush()
    fo.seek(0)
    dec = ArithmeticDecoder(fo)
    got = [dec.pull(quantized_cdf(pdf)) for _ in range(101)]
    assert got == [0] * 50 + [1] + [0] * 50
