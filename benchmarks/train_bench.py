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


def _mk_tables(mcfg, rng):
    table = (0.02 * rng.standard_normal(
        (mcfg.text_vocab_size, mcfg.text_embed_dim))).astype(np.float32)
    codebook = (0.02 * rng.standard_normal(
        (max(mcfg.vocab_size, mcfg.eoa_token_id + 1),
         mcfg.speech_embed_dim))).astype(np.float32)
    return table, codebook


def _realistic_mix(mcfg, rng, n=160):
    """Synthetic sentence-length mix shaped like speech data: the codec
    emits 75 codes/s, sentences run ~1-8 s, so lengths cluster at a few
    hundred with a long-ish tail (lognormal, clipped)."""
    lens = np.clip(rng.lognormal(np.log(250), 0.6, n), 60, 900).astype(int)
    return [dmod.Sample(
        text_ids=rng.integers(0, 384, max(4, L // 3)).astype(np.int32),
        codes=rng.integers(0, mcfg.vocab_size, L).astype(np.int32))
        for L in lens]


def _packed_epoch(samples, mcfg, rows, seq_len, spb=64):
    """All packed batches covering ``samples`` once (collate_packed with
    carry, terminating)."""
    queue = list(samples)
    carry, out = [], []
    while queue or carry:
        take = max(0, spb - len(carry))
        offer = carry + queue[:take]
        queue = queue[take:]
        text, tgt, seg, pos, carry = dmod.collate_packed(
            offer, mcfg, rows=rows, seq_len=seq_len)
        out.append((text, tgt, seg, pos))
    return out


def measure_train_perf(steps: int = 5, mix_n: int = 160,
                       verbose: bool = True) -> dict:
    """Training rows for bench.py (VERDICT r3 #2): the deployed decoder's
    MFU/tokens-per-second at the best realistic bucket (bs8/T=1024), and
    the measured sequence-packing gain on a realistic sentence-length
    mix — REAL (non-pad) target tokens per second, bucketed-unpacked vs
    packed at one fixed (8, 1024) shape."""
    enable_compilation_cache()
    mcfg = DecoderConfig()
    rng = np.random.default_rng(0)
    table, codebook = _mk_tables(mcfg, rng)
    tcfg = TrainConfig(batch_size=8, gradient_accumulation_steps=1,
                       eval_interval=10**9)
    trainer = Trainer(tcfg, mcfg, table, codebook)

    def chained_step_ms(text_ids, targets, n=10):
        """Device step time with ONE fetch per chain: per-call
        ``trainer.step`` floats the loss, paying a full tunnel sync per
        step (~25 ms on round-5 hosts — comparable to the step itself,
        so the r4 MFU rows measured the tunnel).  Chain the jitted step
        through donated state and fetch once at the end."""
        import jax
        import jax.numpy as jnp
        ti = jax.device_put(jnp.asarray(text_ids), trainer.bsh)
        tg = jax.device_put(jnp.asarray(targets), trainer.bsh)
        key = jax.random.PRNGKey(0)
        state = trainer.state
        state, loss = trainer._step(state, trainer.text_table,
                                    trainer.codebook, ti, tg, key)
        float(loss)                           # compile + settle
        state, loss = trainer._step(state, trainer.text_table,
                                    trainer.codebook, ti, tg, key)
        float(loss)                           # steady-state executable
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = trainer._step(state, trainer.text_table,
                                        trainer.codebook, ti, tg, key)
        float(loss)
        dt = (time.perf_counter() - t0) / n
        trainer.state = state
        return dt

    # -- fixed-shape MFU row (bs8 / T1024) --------------------------------
    samples = [dmod.Sample(
        text_ids=rng.integers(0, 384, 256).astype(np.int32),
        codes=rng.integers(0, mcfg.vocab_size, 1023).astype(np.int32))
        for _ in range(8)]
    text_ids, targets = dmod.collate(samples, mcfg, bucket=1024)
    dt = chained_step_ms(text_ids, targets)
    tokens = 8 * 1024
    # seq_len=actual T: the pre-r5 rows used cfg.block_size=8192 in the
    # attention term and overstated this row ~2x (see estimate_mfu)
    out = {
        "train_mfu_bs8_t1024": round(
            estimate_mfu(mcfg, trainer.n_params, tokens, dt,
                         seq_len=1024) * 100, 2),
        "train_tok_s_bs8_t1024": round(tokens / dt, 0),
        "train_step_ms_bs8_t1024": round(dt * 1e3, 1),
    }

    # -- deployed-block row (VERDICT r4 #5): the reference's configured
    # training shape is block 8192 x bs2 (configs/train_config.py:20,54-68)
    # — the attention-dominated regime the model actually trains at.
    big = [dmod.Sample(
        text_ids=rng.integers(0, 384, 256).astype(np.int32),
        codes=rng.integers(0, mcfg.vocab_size, 8191).astype(np.int32))
        for _ in range(2)]
    text8, tgt8 = dmod.collate(big, mcfg, bucket=8192)
    dt8 = chained_step_ms(text8, tgt8)
    out["train_mfu_bs2_t8192"] = round(
        estimate_mfu(mcfg, trainer.n_params, 2 * 8192, dt8,
                     seq_len=8192) * 100, 2)
    out["train_tok_s_bs2_t8192"] = round(2 * 8192 / dt8, 0)
    out["train_step_ms_bs2_t8192"] = round(dt8 * 1e3, 1)

    # -- packing gain on the realistic mix --------------------------------
    mix = _realistic_mix(mcfg, rng, mix_n)

    # unpacked: bucketed batches of 8 in arrival order (the deployed
    # BatchIterator's collate); warm each distinct bucket shape first
    ub = [dmod.collate(mix[i:i + 8], mcfg, bucket=256)
          for i in range(0, len(mix) - 7, 8)]
    def chained_epoch_s(batches):
        """Whole-epoch wall with ONE final fetch (per-step float(loss)
        syncs would bias the pack comparison: the unpacked side runs ~2x
        the steps and would pay ~2x the tunnel syncs)."""
        import jax
        import jax.numpy as jnp
        key = jax.random.PRNGKey(0)
        state = trainer.state
        t0 = time.perf_counter()
        loss = None
        for b in batches:
            args = [jax.device_put(jnp.asarray(x), trainer.bsh)
                    for x in b]
            seg_pos = args[2:] if len(args) > 2 else [None, None]
            state, loss = trainer._step(state, trainer.text_table,
                                        trainer.codebook, args[0],
                                        args[1], key, *seg_pos)
        float(loss)
        dt = time.perf_counter() - t0
        trainer.state = state
        return dt

    for shape in {b[0].shape for b in ub}:
        probe = next(b for b in ub if b[0].shape == shape)
        trainer.step(*probe)
    real_u = sum(int((b[1] != mcfg.ignore_index).sum()) for b in ub)
    dt_u = chained_epoch_s(ub)

    pb = _packed_epoch(mix, mcfg, rows=8, seq_len=1024)
    trainer.step(*pb[0])                      # compile the packed program
    real_p = sum(int((b[1] != mcfg.ignore_index).sum()) for b in pb)
    dt_p = chained_epoch_s(pb)

    out["train_unpacked_real_tok_s"] = round(real_u / dt_u, 0)
    out["train_packed_real_tok_s"] = round(real_p / dt_p, 0)
    out["train_pack_speedup"] = round((real_p / dt_p) / (real_u / dt_u), 2)
    out["train_pack_occupancy"] = round(real_p / (len(pb) * 8 * 1024), 3)
    if verbose:
        print(out, flush=True)
    return out


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
        mfu = estimate_mfu(mcfg, trainer_t.n_params, tokens, dt, seq_len=t)
        print(f"bs{bs} T={t}: {dt * 1000:.0f} ms/step, "
              f"{tokens / dt:.0f} tok/s, "
              f"MFU {mfu * 100:.1f}% (vs TPU bf16 peak)")


if __name__ == "__main__":
    main()
