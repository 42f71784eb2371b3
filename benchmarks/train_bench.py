"""Training-step benchmark: deployed-shape decoder training MFU on TPU.

Reference comparison point: the torch stack trains bs 2 x block 8192 with
grad-accum 4 on A100-class GPUs (configs/train_config.py:54-68) and logs
PaLM-style MFU against A100's 312 TFLOPS (src/model.py:367-381); here MFU
is against the TPU's bf16 peak.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax.numpy as jnp

from llmvox_tpu.train import data as dmod
from llmvox_tpu.train.trainer import Trainer, estimate_mfu
from llmvox_tpu.utils.config import DecoderConfig, TrainConfig
from llmvox_tpu.utils.runtime import enable_compilation_cache


def main():
    enable_compilation_cache()
    mcfg = DecoderConfig()  # deployed 4L/8H/768, block 8192
    tcfg = TrainConfig(batch_size=2, gradient_accumulation_steps=1,
                       eval_interval=10**9)
    rng = np.random.default_rng(0)
    table = (0.02 * rng.standard_normal(
        (mcfg.text_vocab_size, mcfg.text_embed_dim))).astype(np.float32)
    codebook = (0.02 * rng.standard_normal(
        (max(mcfg.vocab_size, mcfg.eoa_token_id + 1),
         mcfg.speech_embed_dim))).astype(np.float32)
    trainer = Trainer(tcfg, mcfg, table, codebook)

    def batch(t):
        samples = [dmod.Sample(
            text_ids=rng.integers(0, 384, 256).astype(np.int32),
            codes=rng.integers(0, mcfg.vocab_size, t - 1).astype(np.int32))
            for _ in range(tcfg.batch_size)]
        return dmod.collate(samples, mcfg, bucket=t)

    for t in (2048, 8192):
        text_ids, targets = batch(t)
        t0 = time.time()
        trainer.step(text_ids, targets)
        print(f"T={t}: compile+first {time.time() - t0:.1f}s")
        times = []
        for _ in range(5):
            t0 = time.time()
            trainer.step(text_ids, targets)
            times.append(time.time() - t0)
        dt = float(np.median(times))
        tokens = tcfg.batch_size * t
        mfu = estimate_mfu(mcfg, trainer.n_params, tokens, dt)
        print(f"T={t}: {dt * 1000:.0f} ms/step, {tokens / dt:.0f} tok/s, "
              f"MFU {mfu * 100:.1f}% (vs TPU bf16 peak)")


if __name__ == "__main__":
    main()
