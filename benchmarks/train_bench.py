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

    # T=8192 is the reference's configured block and the WORST case for
    # this 4L/hd=96 model (attention underfills the MXU; VERDICT r1/r2
    # threads).  Real data collates to the train/data.py bucket ladder
    # (multiples of 256, sentence-length driven), so the realistic MFU
    # lives at the shorter rows — sweep them too (bigger per-chip batch
    # fits at shorter T).
    for bs, t in ((8, 512), (8, 1024), (8, 2048), (4, 4096),
                  (2, 2048), (2, 8192)):
        tcfg_t = TrainConfig(batch_size=bs, gradient_accumulation_steps=1,
                             eval_interval=10**9)
        trainer_t = trainer if bs == tcfg.batch_size else Trainer(
            tcfg_t, mcfg, table, codebook)
        samples = [dmod.Sample(
            text_ids=rng.integers(0, 384, min(256, t // 2)).astype(np.int32),
            codes=rng.integers(0, mcfg.vocab_size, t - 1).astype(np.int32))
            for _ in range(bs)]
        text_ids, targets = dmod.collate(samples, mcfg, bucket=t)
        t0 = time.time()
        trainer_t.step(text_ids, targets)
        print(f"bs{bs} T={t}: compile+first {time.time() - t0:.1f}s")
        times = []
        for _ in range(5):
            t0 = time.time()
            trainer_t.step(text_ids, targets)
            times.append(time.time() - t0)
        dt = float(np.median(times))
        tokens = bs * t
        mfu = estimate_mfu(mcfg, trainer_t.n_params, tokens, dt)
        print(f"bs{bs} T={t}: {dt * 1000:.0f} ms/step, "
              f"{tokens / dt:.0f} tok/s, "
              f"MFU {mfu * 100:.1f}% (vs TPU bf16 peak)")


if __name__ == "__main__":
    main()
