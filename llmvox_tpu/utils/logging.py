"""Training metrics logging: JSONL built-in, W&B/TensorBoard optional.

The reference uses optional W&B for decoder training (src/utils.py:126-140)
and TensorBoard for codec training (configs yaml:68-71).  The built-in
here is an append-only JSONL file (machine-readable, dependency-free);
W&B and TensorBoard attach when their packages are installed.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsLogger:
    def __init__(self, out_dir: str, run_name: str = "run",
                 use_wandb: bool = False, wandb_project: str = "llmvox_tpu",
                 use_tensorboard: bool = False):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"{run_name}.metrics.jsonl")
        self._f = open(self.path, "a")
        self._wandb = None
        self._tb = None
        if use_wandb:
            try:
                import wandb
                wandb.init(project=wandb_project, name=run_name)
                self._wandb = wandb
            except ImportError:
                print("wandb not installed; JSONL logging only")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(os.path.join(out_dir, "tb", run_name))
            except ImportError:
                print("tensorboard not installed; JSONL logging only")

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {"step": step, "time": time.time(), **metrics}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()
