"""Decoder training loop: pjit data-parallel over a TPU mesh.

The reference stack (train.py:255-428) is torchrun DDP + AMP GradScaler +
torch.compile.  Here the whole step — device-side input construction from
int32 ids, bf16 forward/backward, AdamW update — is one jitted program
over a (dp, tp) mesh; GSPMD inserts the gradient all-reduce that DDP/NCCL
did (train.py:363-365).  bf16 needs no loss scaling (GradScaler has no
counterpart).
"""
from __future__ import annotations

import os
import time
from typing import Dict, Iterator, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from llmvox_tpu.models import decoder as dec
from llmvox_tpu.parallel import mesh as pmesh
from llmvox_tpu.parallel.sharding import (batch_seq_sharding,
                                          batch_sharding, replicated)
from llmvox_tpu.train import checkpoint as ckpt
from llmvox_tpu.train.data import build_decoder_inputs
from llmvox_tpu.train.optim import make_optimizer
from llmvox_tpu.utils.config import DecoderConfig, TrainConfig

# v5e bf16 peak; the reference hardcodes A100 312e12 (src/model.py:377-379)
TPU_PEAK_FLOPS = float(os.environ.get("LLMVOX_TPU_PEAK_FLOPS", 197e12))


class TrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    step: jnp.ndarray


def _zigzag_perm(t: int, n: int):
    """Static (T,) zigzag gather index for the balanced sp layout —
    computed at trace time per sequence width, baked into the program as
    a constant (ops/ring_attention.py::zigzag_permutation)."""
    from llmvox_tpu.ops.ring_attention import zigzag_permutation
    return jnp.asarray(zigzag_permutation(t, n)[0])


def make_train_step(cfg: DecoderConfig, tx, compute_dtype=jnp.bfloat16,
                    attn_fn=None, zigzag_sp: int = 0):
    """Returns train_step(state, text_table, codebook, text_ids, targets, rng).

    ``attn_fn`` (optional) replaces the attention op — the
    sequence-parallel trainer passes ``make_ring_attention(mesh)`` so the
    T axis shards over the mesh's sp ring (ops/ring_attention.py); the
    shard_map inside doubles as the sharding constraint that keeps the
    surrounding activations T-sharded under GSPMD.  ``zigzag_sp = n > 0``
    pairs a ``make_zigzag_ring_attention`` attn_fn with the device-side
    T-permutation of emb/targets (decoder_loss ``perm=``): inputs arrive
    in ORIGINAL order with the usual (dp, sp) sharding, the jitted step
    gathers them into the balanced layout (one all-to-all, negligible
    next to the T^2 attention term)."""

    def loss_fn(params, text_table, codebook, text_ids, targets, rng,
                segments, positions):
        emb = build_decoder_inputs(text_table, codebook, text_ids, targets,
                                   cfg, pos_ids=positions)
        emb = emb.astype(compute_dtype)
        perm = (_zigzag_perm(targets.shape[1], zigzag_sp)
                if zigzag_sp else None)
        return dec.decoder_loss(params, emb, targets, cfg,
                                dropout_rng=rng, train=True, attn_fn=attn_fn,
                                segments=segments, positions=positions,
                                perm=perm)

    def train_step(state: TrainState, text_table, codebook,
                   text_ids, targets, rng, segments=None, positions=None):
        # segments/positions: packed batches (train/data.py::
        # collate_packed) — None (an empty pytree under jit) keeps the
        # unpacked program unchanged.
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, text_table, codebook, text_ids, targets, rng,
            segments, positions)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return train_step


def make_eval_step(cfg: DecoderConfig, compute_dtype=jnp.bfloat16,
                   attn_fn=None, zigzag_sp: int = 0):
    def eval_step(params, text_table, codebook, text_ids, targets,
                  segments=None, positions=None):
        emb = build_decoder_inputs(text_table, codebook, text_ids, targets,
                                   cfg, pos_ids=positions)
        perm = (_zigzag_perm(targets.shape[1], zigzag_sp)
                if zigzag_sp else None)
        return dec.decoder_loss(params, emb.astype(compute_dtype), targets,
                                cfg, train=False, attn_fn=attn_fn,
                                segments=segments, positions=positions,
                                perm=perm)
    return eval_step


def estimate_mfu(cfg: DecoderConfig, n_params: int, tokens_per_iter: int,
                 dt: float, peak: float = TPU_PEAK_FLOPS,
                 seq_len: int = 0) -> float:
    """PaLM-style MFU (reference src/model.py:367-381), vs TPU peak.

    ``seq_len`` is the ACTUAL training sequence width; the attention
    term is quadratic in it.  The reference hardcodes ``cfg.block_size``
    because it always trains at the full block; we train at bucketed
    widths, so defaulting to block_size (pre-r5 behavior) overstated the
    short-bucket rows ~2x (attention at T=8192 is 302 MFLOPs/token vs
    38 at T=1024, against 6N = 207).  Pass the step's real T."""
    l, h, q = cfg.n_layer, cfg.n_head, cfg.head_dim
    t = seq_len or cfg.block_size
    flops_per_token = 6 * n_params + 12 * l * h * q * t
    return flops_per_token * tokens_per_iter / dt / peak


class Trainer:
    """End-to-end training driver (the counterpart of train.py:255-428)."""

    def __init__(self, tcfg: TrainConfig, mcfg: DecoderConfig,
                 text_table: np.ndarray, codebook: np.ndarray,
                 mesh=None, compute_dtype=jnp.bfloat16, attn_fn=None):
        self.tcfg, self.mcfg = tcfg, mcfg
        sp = getattr(tcfg, "sp_size", 1)
        self.mesh = mesh or pmesh.create_mesh(tcfg.dp_size, tcfg.tp_size,
                                              sp)
        self.compute_dtype = compute_dtype
        # sequence parallelism: ring attention over the mesh's sp axis
        # (even when the mesh was passed in, honor its sp extent);
        # an explicit ``attn_fn`` (e.g. a different flash threshold,
        # benchmarks/train_attn_probe.py) is honored on sp=1 meshes
        sp = int(self.mesh.shape.get(pmesh.SP_AXIS, 1))
        zigzag = 0
        if sp > 1:
            if getattr(tcfg, "sp_layout", "ring") == "zigzag":
                from llmvox_tpu.ops.ring_attention import (
                    make_zigzag_ring_attention)
                attn_fn = make_zigzag_ring_attention(self.mesh)
                zigzag = sp
            else:
                from llmvox_tpu.ops.ring_attention import make_ring_attention
                attn_fn = make_ring_attention(self.mesh)
        self._zigzag = zigzag
        self.rng = jax.random.PRNGKey(tcfg.seed + jax.process_index())

        key, self.rng = jax.random.split(self.rng)
        params = dec.init_decoder_params(key, mcfg)
        self.tx = make_optimizer(tcfg, params)

        rep = replicated(self.mesh)
        self.bsh = (batch_seq_sharding(self.mesh) if sp > 1
                    else batch_sharding(self.mesh))
        if getattr(tcfg, "fsdp", False):
            from llmvox_tpu.parallel.sharding import (
                decoder_fsdp_shardings, opt_state_shardings)
            self.psh = decoder_fsdp_shardings(self.mesh, params)
            params = jax.device_put(params, self.psh)
            # moments take the param shardings explicitly — tx.init's
            # zeros_like has no data dependence on params, so GSPMD
            # propagation can't carry the annotations through
            self._osh = opt_state_shardings(self.mesh, self.tx, params,
                                            self.psh)
        else:
            self.psh = rep
            params = jax.device_put(params, rep)
            self._osh = rep
        opt_state = jax.jit(self.tx.init, out_shardings=self._osh)(params)
        self.state = TrainState(params, opt_state, jnp.int32(0))
        self.text_table = jax.device_put(jnp.asarray(text_table), rep)
        self.codebook = jax.device_put(jnp.asarray(codebook), rep)

        self._step = jax.jit(
            make_train_step(mcfg, self.tx, compute_dtype, attn_fn=attn_fn,
                            zigzag_sp=zigzag),
            donate_argnums=(0,))
        self._eval = jax.jit(make_eval_step(mcfg, compute_dtype,
                                            attn_fn=attn_fn,
                                            zigzag_sp=zigzag))
        self.n_params = dec.num_params(params)
        self.iter_num = 0

    # -- checkpointing ---------------------------------------------------
    def save_checkpoint(self, tag: Optional[str] = None) -> str:
        out = self.tcfg.out_dir
        name = tag or self.tcfg.checkpoint_filename
        path = os.path.join(out, f"{name}.npz")
        if pmesh.is_master():
            ckpt.save_params_npz(path, jax.device_get(self.state.params),
                                 meta={"iter_num": self.iter_num,
                                       "model_args": self.mcfg.__dict__,
                                       "config": self.tcfg.__dict__})
            ckpt.save_opaque(os.path.join(out, f"{name}.opt.npz"),
                             jax.device_get(self.state.opt_state))
        return path

    def load_checkpoint(self, path: str) -> None:
        params = ckpt.load_params_npz(path)
        meta = ckpt.load_meta(path)
        self.iter_num = int(meta.get("iter_num", 0))
        params = jax.device_put(params, self.psh)
        opt_path = path.replace(".npz", ".opt.npz")
        if os.path.exists(opt_path):
            opt_state = ckpt.fill_like(jax.device_get(self.state.opt_state),
                                       opt_path)
            # restore into the live opt state's shardings (replicated, or
            # dp-sharded moments under fsdp)
            osh = jax.tree.map(lambda x: x.sharding, self.state.opt_state)
            opt_state = jax.device_put(opt_state, osh)
        else:
            opt_state = jax.jit(self.tx.init,
                                out_shardings=self._osh)(params)
        self.state = TrainState(params, opt_state, jnp.int32(self.iter_num))

    # -- steps -----------------------------------------------------------
    def step(self, text_ids: np.ndarray, targets: np.ndarray,
             segments: Optional[np.ndarray] = None,
             positions: Optional[np.ndarray] = None) -> float:
        key, self.rng = jax.random.split(self.rng)
        text_ids = jax.device_put(jnp.asarray(text_ids), self.bsh)
        targets = jax.device_put(jnp.asarray(targets), self.bsh)
        if segments is not None:
            segments = jax.device_put(jnp.asarray(segments), self.bsh)
            positions = jax.device_put(jnp.asarray(positions), self.bsh)
        self.state, loss = self._step(self.state, self.text_table,
                                      self.codebook, text_ids, targets, key,
                                      segments, positions)
        self.iter_num += 1
        return float(loss)

    def estimate_loss(self, batches: Iterator[Tuple[np.ndarray, np.ndarray]],
                      eval_iters: int) -> float:
        """Mean loss over eval_iters batches (src/utils.py:83-102)."""
        losses = []
        for _ in range(eval_iters):
            batch = next(batches)          # (text, targets[, seg, pos])
            dev = [jax.device_put(jnp.asarray(a), self.bsh) for a in batch]
            losses.append(float(self._eval(
                self.state.params, self.text_table, self.codebook, *dev)))
        return float(np.mean(losses))

    # -- loop ------------------------------------------------------------
    def train(self, batches: Iterator[Tuple[np.ndarray, np.ndarray]],
              max_iters: Optional[int] = None, log=print,
              logger=None) -> None:
        """``logger``: optional utils.logging.MetricsLogger — mirrors the
        reference's W&B logging of iter/loss/lr/mfu (train.py:343-350)."""
        from llmvox_tpu.train.optim import lr_schedule
        lr_fn = lr_schedule(self.tcfg)
        tcfg = self.tcfg
        max_iters = max_iters or tcfg.max_iters
        t0 = time.time()
        last_log_iter = self.iter_num
        while self.iter_num < max_iters:
            if (self.iter_num % tcfg.eval_interval == 0 and
                    self.iter_num > 0):
                val = self.estimate_loss(batches, tcfg.eval_iters)
                log(f"iter {self.iter_num}: eval loss {val:.4f}")
                if logger is not None:
                    logger.log(self.iter_num, {"val/loss": float(val)})
                self.save_checkpoint()
                if tcfg.always_save_checkpoint:
                    self.save_checkpoint(
                        f"{tcfg.checkpoint_filename}_{self.iter_num}")
            batch = next(batches)          # (text, targets[, seg, pos])
            text_ids = batch[0]
            loss = self.step(*batch)
            if self.iter_num % tcfg.log_interval == 0:
                dt = time.time() - t0
                t0 = time.time()
                # dt spans every iteration since the last log, so tokens
                # must too (with log_interval=1 this is one batch).
                n_iters = max(self.iter_num - last_log_iter, 1)
                last_log_iter = self.iter_num
                tokens = text_ids.shape[0] * text_ids.shape[1] * n_iters
                mfu = estimate_mfu(self.mcfg, self.n_params, tokens,
                                   max(dt, 1e-9),
                                   seq_len=text_ids.shape[1])
                log(f"iter {self.iter_num}: loss {loss:.4f}, "
                    f"time {dt * 1000:.1f}ms, mfu {mfu * 100:.2f}%")
                if logger is not None:
                    logger.log(self.iter_num, {
                        "train/loss": float(loss),
                        "lr": float(lr_fn(self.iter_num)), "mfu": mfu})
