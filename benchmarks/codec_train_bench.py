"""Codec GAN training step time at the reference's per-device shape.

The reference trains WavTokenizer at batch 40 x 3 s crops per GPU
(WavTokenizer config yaml:10-11, 87-92; BASELINE.md "Codec training").
This measures our jitted alternating GAN step (generator + MPD/MRD/DAC
discriminators, EMA VQ) at that shape on one TPU chip.

Run: python benchmarks/codec_train_bench.py [batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from llmvox_tpu.utils.runtime import enable_compilation_cache

enable_compilation_cache()

from llmvox_tpu.train.codec_trainer import CodecTrainer  # noqa: E402
from llmvox_tpu.utils.config import CodecConfig, CodecTrainConfig  # noqa: E402


def measure_codec_gan(batch: int = 40, repeats: int = 5,
                      step_impl: str = "micro") -> dict:
    """One jitted alternating GAN step at the reference's per-device
    shape; returns step time + train-audio throughput (the codec-GAN
    regression row bench.py records — VERDICT r3 #2).

    Default step_impl="micro": at this shape both the fused program and
    the split halves exceed the tunnel AOT compile helper's memory
    budget (SIGKILL — BENCH_r04's null row); the per-sub-discriminator
    micro programs compile.  Same math, proven by
    test_micro_step_matches_fused."""
    cfg = CodecConfig()                      # deployed large-320-24k
    tcfg = CodecTrainConfig(batch_size=batch, step_impl=step_impl)
    trainer = CodecTrainer(cfg, tcfg)
    rng = np.random.default_rng(0)
    audio = 0.1 * rng.standard_normal(
        (batch, tcfg.num_samples)).astype(np.float32)

    t0 = time.time()
    trainer.step(audio)                      # compile
    compile_s = time.time() - t0

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        logs = trainer.step(audio)
        times.append(time.perf_counter() - t0)
    step_s = float(np.median(times))
    audio_s = batch * tcfg.num_samples / tcfg.sample_rate
    return {
        "batch": batch,
        "crop_s": tcfg.num_samples / tcfg.sample_rate,
        "compile_s": round(compile_s, 1),
        "step_ms": round(step_s * 1e3, 1),
        "train_audio_s_per_s": round(audio_s / step_s, 1),
        "mel": round(float(logs["mel"]), 4),
    }


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    impl = sys.argv[2] if len(sys.argv) > 2 else "micro"
    print(measure_codec_gan(batch, step_impl=impl))


if __name__ == "__main__":
    main()
