"""Decoder-training CLI: ``python -m llmvox_tpu.train --flags``.

The counterpart of ``python train.py --flags`` (reference train.py:47-136):
every TrainConfig/DecoderConfig knob is a flag; only flags the user passes
override the defaults.

Required artifacts (produced by ``python -m llmvox_tpu.tools.convert`` and
``python -m llmvox_tpu.tools.prepare_data``):
- ``--byt5_table``: ByT5 embedding table .npz (key 'table')
- ``--codec_params``: converted WavTokenizer params .npz (codebooks used
  for input features)
- ``--data_path``: prepared dataset .npz or reference-style JSON manifest
  with precomputed codes
"""
from __future__ import annotations

import argparse

import numpy as np

from llmvox_tpu.models import decoder as dec
from llmvox_tpu.train.data import BatchIterator, SpeechDataset
from llmvox_tpu.train.trainer import Trainer
from llmvox_tpu.utils.config import (
    DecoderConfig, TrainConfig, add_dataclass_args, apply_cli_overrides)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="LLMVoX-TPU decoder training")
    add_dataclass_args(parser, TrainConfig)
    add_dataclass_args(parser, DecoderConfig)
    parser.add_argument("--byt5_table", type=str, default=None)
    parser.add_argument("--codec_params", type=str, default=None)
    parser.add_argument("--bucket", type=int, default=256)
    parser.add_argument("--pack", action="store_true",
                        help="pack multiple sentences per row "
                             "(train/data.py::collate_packed): one fixed "
                             "(batch_size, pack_len) shape at near-full "
                             "token occupancy instead of pad-heavy "
                             "bucketed batches")
    parser.add_argument("--pack_len", type=int, default=1024)
    args = parser.parse_args(argv)

    tcfg = apply_cli_overrides(TrainConfig(), args)
    mcfg = apply_cli_overrides(DecoderConfig(), args)

    if args.byt5_table:
        table = np.load(args.byt5_table)["table"]
    else:
        print("WARNING: no --byt5_table; using random table (smoke mode)")
        table = 0.02 * np.random.default_rng(0).standard_normal(
            (mcfg.text_vocab_size, mcfg.text_embed_dim)).astype(np.float32)
    if args.codec_params:
        from llmvox_tpu.train.checkpoint import load_params_npz
        codebook = np.asarray(load_params_npz(args.codec_params)["codebooks"])[0]
    else:
        print("WARNING: no --codec_params; using random codebook (smoke mode)")
        codebook = np.random.default_rng(1).standard_normal(
            (max(mcfg.vocab_size, mcfg.eoa_token_id + 1),
             mcfg.speech_embed_dim)).astype(np.float32)

    if tcfg.init_from.startswith("gpt2"):
        # reference default init (configs/train_config.py:41): import HF
        # gpt2* weights; forces the gpt2 architecture (src/model.py:252-283)
        from llmvox_tpu.models.gpt2_import import init_from_gpt2
        import jax
        from llmvox_tpu.parallel.sharding import replicated
        gpt2_params, mcfg = init_from_gpt2(tcfg.init_from, mcfg.vocab_size)
        trainer = Trainer(tcfg, mcfg, table, codebook)
        trainer.state = trainer.state._replace(params=jax.device_put(
            gpt2_params, replicated(trainer.mesh)))
        print(f"initialized from {tcfg.init_from}")
    else:
        trainer = Trainer(tcfg, mcfg, table, codebook)
    if tcfg.init_from == "resume":
        import os
        trainer.load_checkpoint(
            os.path.join(tcfg.out_dir, tcfg.checkpoint_filename + ".npz"))
        print(f"resumed at iter {trainer.iter_num}")

    dataset = SpeechDataset(tcfg.data_path)
    print(f"dataset: {len(dataset)} samples; model: "
          f"{trainer.n_params / 1e6:.2f}M params")
    if args.pack:
        from llmvox_tpu.train.data import PackedBatchIterator
        batches = iter(PackedBatchIterator(dataset, mcfg, tcfg.batch_size,
                                           args.pack_len, seed=tcfg.seed))
    else:
        batches = iter(BatchIterator(dataset, mcfg, tcfg.batch_size,
                                     bucket=args.bucket, seed=tcfg.seed))
    if tcfg.eval_only:
        print(f"eval loss: {trainer.estimate_loss(batches, tcfg.eval_iters):.4f}")
        return
    from llmvox_tpu.utils.logging import MetricsLogger
    logger = MetricsLogger(tcfg.out_dir, tcfg.wandb_run_name,
                           use_wandb=tcfg.wandb_log,
                           wandb_project=tcfg.wandb_project)
    try:
        trainer.train(batches, logger=logger)
    finally:
        logger.close()


if __name__ == "__main__":
    main()
