"""Optimizer and LR schedule for decoder training.

Mirrors the reference hyperparameter semantics exactly:
- cosine schedule with linear warmup and a floor (src/utils.py:105-123);
- AdamW with eps 1e-5, betas (0.9, 0.95), weight decay applied only to
  matmul/embedding weights (src/model.py:337-365) — the reference selects
  by ndim >= 2, which with our stacked-layer param layout translates to
  selection by name (norm scales/biases are excluded);
- global-norm gradient clipping at 1.0 (train.py:383);
- gradient accumulation via optax.MultiSteps (train.py:353-365).

XLA fuses the optax AdamW update into a handful of kernels on TPU — the
counterpart of torch's fused CUDA AdamW (src/model.py:356-362).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from llmvox_tpu.utils.config import TrainConfig

_NO_DECAY_KEYS = frozenset({
    "ln1_s", "ln1_b", "ln2_s", "ln2_b", "lnf_s", "lnf_b",
    "bqkv", "bo", "bfc", "bproj",
})


def lr_schedule(cfg: TrainConfig):
    """get_lr (src/utils.py:105-123) as a jax-friendly schedule."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.asarray(cfg.learning_rate, jnp.float32)
        if not cfg.decay_lr:
            return lr
        warm = lr * step / max(cfg.warmup_iters, 1)
        ratio = (step - cfg.warmup_iters) / max(
            cfg.lr_decay_iters - cfg.warmup_iters, 1)
        ratio = jnp.clip(ratio, 0.0, 1.0)
        coeff = 0.5 * (1.0 + jnp.cos(jnp.pi * ratio))
        cos = cfg.min_lr + coeff * (lr - cfg.min_lr)
        out = jnp.where(step < cfg.warmup_iters, warm, cos)
        return jnp.where(step > cfg.lr_decay_iters, cfg.min_lr, out)
    return fn


def decay_mask(params) -> dict:
    """True for params that get weight decay (matmuls + embeddings)."""
    def pick(path, leaf):
        name = path[-1].key
        return name not in _NO_DECAY_KEYS
    return jax.tree_util.tree_map_with_path(pick, params)


def make_optimizer(cfg: TrainConfig, params) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=lr_schedule(cfg),
            b1=cfg.beta1, b2=cfg.beta2, eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
            mask=decay_mask(params),
        ),
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx
