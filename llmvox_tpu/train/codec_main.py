"""Codec GAN training CLI: ``python -m llmvox_tpu.train.codec_main --flags``.

Counterpart of ``python WavTokenizer/train.py fit --config <yaml>``
(WavTokenizer/train.py:7-15), with flags instead of Lightning YAML.
"""
from __future__ import annotations

import argparse
import os
import time

from llmvox_tpu.utils.config import (
    CodecConfig, CodecTrainConfig, add_dataclass_args, apply_cli_overrides)


def main(argv=None) -> None:
    from llmvox_tpu.train.codec_data import CodecDataset
    from llmvox_tpu.train.codec_trainer import CodecTrainer
    from llmvox_tpu.train.checkpoint import save_params_npz
    from llmvox_tpu.utils.logging import MetricsLogger

    parser = argparse.ArgumentParser(description="LLMVoX-TPU codec GAN training")
    add_dataclass_args(parser, CodecTrainConfig)
    add_dataclass_args(parser, CodecConfig)
    args = parser.parse_args(argv)
    tcfg = apply_cli_overrides(CodecTrainConfig(), args)
    cfg = apply_cli_overrides(CodecConfig(), args)

    trainer = CodecTrainer(cfg, tcfg)
    logger = MetricsLogger(tcfg.out_dir, "codec",
                           use_wandb=getattr(tcfg, "use_wandb", False),
                           use_tensorboard=getattr(tcfg, "use_tensorboard",
                                                   False))
    train_ds = CodecDataset(tcfg.filelist_train, tcfg, train=True,
                            seed=tcfg.seed)
    val_ds = (CodecDataset(tcfg.filelist_val, tcfg, train=False)
              if tcfg.filelist_val else None)
    print(f"train files: {len(train_ds)}")

    batches = train_ds.batches()
    t0 = time.time()
    for audio in batches:
        logs = trainer.step(audio)
        logger.log(trainer.iter_num, logs)
        if trainer.iter_num % tcfg.log_interval == 0:
            dt = time.time() - t0
            t0 = time.time()
            print(f"step {trainer.iter_num}: "
                  f"gen {logs['gen_total']:.3f} disc {logs['disc_total']:.3f} "
                  f"mel {logs['mel']:.3f} commit {logs['commit']:.4f} "
                  f"({dt:.1f}s/{tcfg.log_interval} steps)")
        if trainer.iter_num % tcfg.val_interval == 0:
            if val_ds is not None:
                val_audio = next(val_ds.batches(tcfg.val_batch_size))
                vm = trainer.validation_metrics(val_audio)
                logger.log(trainer.iter_num, vm)
                # reconstruction audio + mel image (reference
                # experiment.py:195-216 logs these every val pass)
                try:
                    recon = trainer.reconstruct(val_audio[:1])
                    logger.log_audio(trainer.iter_num, "val/recon", recon,
                                     cfg.sample_rate)
                except Exception as e:  # logging must never kill training
                    print(f"audio logging skipped: {e}")
                print(f"step {trainer.iter_num}: {vm}")
            trainer.save_checkpoint()
            save_params_npz(
                os.path.join(tcfg.out_dir, "codec_inference.npz"),
                trainer.export_inference_params())
        if trainer.iter_num >= tcfg.max_steps:
            break
    trainer.save_checkpoint()
    logger.close()


if __name__ == "__main__":
    main()
