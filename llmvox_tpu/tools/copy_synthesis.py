"""CLI: codec copy-synthesis — encode wav files to codes, decode back.

Counterpart of WavTokenizer/infer.py:44-68 (the codec's manual quality
check): for each input wav, run SEANet encode -> VQ -> ConvNeXt/ISTFT
decode and save the reconstruction as PCM16.

  python -m llmvox_tpu.tools.copy_synthesis --codec_params out/codec.npz \
      --inputs a.wav b.wav --out_dir recon/
"""
from __future__ import annotations

import argparse
import os

from llmvox_tpu.codec.codec import WavCodec
from llmvox_tpu.utils.audio import convert_audio, read_wav, write_wav


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--codec_params", required=True)
    parser.add_argument("--inputs", nargs="+", required=True)
    parser.add_argument("--out_dir", required=True)
    args = parser.parse_args(argv)

    codec = WavCodec.from_pretrained(args.codec_params)
    os.makedirs(args.out_dir, exist_ok=True)
    for path in args.inputs:
        wav, sr = read_wav(path)
        wav = convert_audio(wav, sr, codec.cfg.sample_rate, 1)
        _, codes = codec.encode_infer(wav)
        recon = codec.decode_codes(codes, pad_to_bucket=False)
        out = os.path.join(args.out_dir,
                           os.path.basename(path).replace(".wav", "_recon.wav"))
        write_wav(out, recon[0], codec.cfg.sample_rate)
        print(f"{path} -> {out} ({recon.shape[1] / codec.cfg.sample_rate:.2f}s)")


if __name__ == "__main__":
    main()
