"""Golden parity validation against the REAL reference checkpoints.

The unit tests validate every module against independent torch oracles on
synthetic reference-shaped state dicts; this script closes the last gap —
bit-level comparison on the actual shipped weights — whenever the
checkpoints and the reference repo are available:

    python -m llmvox_tpu.tools.validate_parity \
        --reference /path/to/LLMVoX \
        --decoder_ckpt CHECKPOINTS/ckpt_english_tiny.pt \
        --codec_ckpt CHECKPOINTS/wavtokenizer_large_speech_320_24k.ckpt

It converts the checkpoints with tools/convert, loads the reference's own
torch implementation (imported from ``--reference``, never vendored), runs
both stacks on identical inputs, and reports max-abs deltas:

- decoder: GPT forward logits on a random normalized embedding sequence
  (reference src/model.py:149-237);
- codec: codes -> waveform decode on random token ids (reference
  WavTokenizer/decoder/pretrained.py:192-239).

Each section is skipped with a notice when its inputs are missing, so the
script is safe to run in any environment.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _report(name: str, ours: np.ndarray, ref: np.ndarray,
            tol: float) -> bool:
    d = float(np.max(np.abs(ours.astype(np.float64) - ref.astype(np.float64))))
    ok = d <= tol
    print(f"{name}: max |delta| = {d:.3e} "
          f"({'OK' if ok else f'FAIL (tol {tol:g})'})")
    return ok


def validate_decoder(reference: str, ckpt: str, tol: float = 2e-3) -> bool:
    import torch
    import jax
    import jax.numpy as jnp
    from llmvox_tpu.models import decoder as dec
    from llmvox_tpu.tools.convert import convert_decoder_ckpt
    from llmvox_tpu.utils.config import DecoderConfig

    params, args = convert_decoder_ckpt(ckpt)
    cfg = DecoderConfig(n_layer=args["n_layer"], n_head=args["n_head"],
                        n_embd=args["n_embd"], block_size=args["block_size"],
                        bias=args.get("bias", False),
                        vocab_size=args.get("vocab_size", 4096))

    sys.path.insert(0, reference)
    from src.model import GPT, GPTConfig  # reference implementation
    blob = torch.load(ckpt, map_location="cpu", weights_only=False)
    margs = dict(blob["model_args"])
    # is_train=True makes the reference SDPA causal — required for a
    # full-sequence logit comparison (src/model.py:85-93)
    margs["is_train"] = True
    model = GPT(GPTConfig(**{k: v for k, v in margs.items()
                             if k in GPTConfig.__dataclass_fields__}))
    sd = {k.replace("_orig_mod.", ""): v for k, v in blob["model"].items()}
    model.load_state_dict(sd, strict=False)
    model.eval()

    rng = np.random.default_rng(0)
    t = 16
    emb = rng.standard_normal((1, t, cfg.n_embd)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)

    ours = np.asarray(dec.apply_decoder(params, jnp.asarray(emb), cfg))
    with torch.no_grad():
        # GPT.forward returns (logits, loss, new_kvcache); passing targets
        # makes it emit full-sequence logits (src/model.py:201-237)
        dummy_targets = torch.zeros((1, t), dtype=torch.long)
        ref_logits = model(torch.from_numpy(emb), targets=dummy_targets)[0]
    ref = ref_logits.float().numpy()
    if ref.shape[1] == 1:  # inference mode returns last position only
        ours = ours[:, -1:]
    return _report("decoder logits", ours, ref, tol)


def _stub_torchaudio() -> None:
    """The reference codec imports torchaudio, which isn't in this image;
    the Encodec decode path never calls it, so satisfy the imports with a
    stub (HTK mel converters included for completeness)."""
    import sys
    import types
    try:
        import torchaudio  # noqa: F401
        return
    except ImportError:
        pass
    ta = types.ModuleType("torchaudio")
    ta.__path__ = []
    tr = types.ModuleType("torchaudio.transforms")
    tr.MelSpectrogram = None
    fn = types.ModuleType("torchaudio.functional")
    fn.__path__ = []
    fnf = types.ModuleType("torchaudio.functional.functional")
    fnf._hz_to_mel = lambda f, mel_scale="htk": 2595.0 * np.log10(
        1.0 + f / 700.0)
    fnf._mel_to_hz = lambda m, mel_scale="htk": 700.0 * (
        10.0 ** (m / 2595.0) - 1.0)
    ta.transforms, ta.functional, fn.functional = tr, fn, fnf
    for name, mod in (("torchaudio", ta), ("torchaudio.transforms", tr),
                      ("torchaudio.functional", fn),
                      ("torchaudio.functional.functional", fnf)):
        sys.modules.setdefault(name, mod)


def validate_codec(reference: str, ckpt: str, config_yaml: str = "",
                   tol: float = 5e-3) -> bool:
    import torch
    _stub_torchaudio()
    import jax.numpy as jnp
    from llmvox_tpu.codec.codec import WavCodec
    from llmvox_tpu.tools.convert import convert_wavtokenizer_ckpt
    from llmvox_tpu.utils.config import CodecConfig

    params = convert_wavtokenizer_ckpt(ckpt, with_encoder=False)
    codec = WavCodec(params, CodecConfig(), buckets=(32,))

    sys.path.insert(0, os.path.join(reference, "WavTokenizer"))
    from decoder.pretrained import WavTokenizer  # reference implementation
    if not config_yaml:
        cands = [os.path.join(reference, "WavTokenizer", "configs", f)
                 for f in os.listdir(
                     os.path.join(reference, "WavTokenizer", "configs"))
                 if "frame75" in f or "320" in f]
        config_yaml = cands[0]
    ref_model = WavTokenizer.from_pretrained0802(config_yaml, ckpt)
    ref_model.eval()

    rng = np.random.default_rng(1)
    codes = rng.integers(0, 4096, (1, 32)).astype(np.int64)
    ours = codec.decode_codes(np.asarray(codes, np.int32),
                              pad_to_bucket=False)
    with torch.no_grad():
        feats = ref_model.codes_to_features(torch.from_numpy(codes)[None][0]
                                            if codes.ndim == 2
                                            else torch.from_numpy(codes))
        ref = ref_model.decode(
            feats, bandwidth_id=torch.tensor([0])).float().numpy()
    n = min(ours.shape[-1], ref.shape[-1])
    return _report("codec waveform", ours[..., :n], ref[..., :n], tol)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--decoder_ckpt", default="")
    ap.add_argument("--codec_ckpt", default="")
    ap.add_argument("--codec_config", default="")
    args = ap.parse_args(argv)

    ok = True
    if args.decoder_ckpt and os.path.exists(args.decoder_ckpt):
        ok &= validate_decoder(args.reference, args.decoder_ckpt)
    else:
        print("decoder: checkpoint not provided/found — skipped")
    if args.codec_ckpt and os.path.exists(args.codec_ckpt):
        ok &= validate_codec(args.reference, args.codec_ckpt,
                             args.codec_config)
    else:
        print("codec: checkpoint not provided/found — skipped")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
