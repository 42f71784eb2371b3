"""Device-mesh construction and distributed runtime init.

TPU-native replacement for the reference's NCCL/torch.distributed plumbing
(src/utils.py:15-34, WavTokenizer/encoder/distrib.py:14-124): instead of
process groups and hand-rolled broadcast/all-reduce, we build a
``jax.sharding.Mesh`` over the slice — data-parallel axis on ICI, with an
optional tensor-parallel axis — and let GSPMD insert the collectives from
sharding annotations.  Multi-host (multi-slice over DCN) uses
``jax.distributed.initialize``.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DP_AXIS = "dp"
SP_AXIS = "sp"
EP_AXIS = "ep"
TP_AXIS = "tp"


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (the torchrun/NCCL counterpart, train.py:2-16).

    On single-host TPU (or CPU testing) this is a no-op; on multi-host
    pods JAX usually auto-detects, and explicit args are for DCN setups.
    """
    if coordinator is None and "COORDINATOR_ADDRESS" in os.environ:
        coordinator = os.environ["COORDINATOR_ADDRESS"]
    if coordinator is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes or int(os.environ.get("NUM_PROCESSES", 1)),
            process_id=process_id or int(os.environ.get("PROCESS_ID", 0)),
        )


def create_mesh(dp_size: int = -1, tp_size: int = 1, sp_size: int = 1,
                ep_size: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (dp, sp, ep, tp) mesh. ``dp_size=-1`` means all remaining
    devices.  Axes are NAMED, so shardings written against any subset
    (P("dp"), P(None, "tp"), ...) are untouched by the extra size-1 axes.

    Mesh-axis order puts ``tp`` innermost (its per-matmul all-reduces are
    the chattiest) with ``ep`` next (the MoE dispatch/combine all-to-alls
    move one token row per route — heavy but less frequent than tp's
    per-matmul reductions) and ``sp`` outside that (one K/V ppermute per
    layer per ring step — neighbor traffic that wants adjacent ICI links).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp_size == -1:
        assert n % (tp_size * sp_size * ep_size) == 0, (
            f"{n} devices not divisible by tp*sp*ep="
            f"{tp_size * sp_size * ep_size}")
        dp_size = n // (tp_size * sp_size * ep_size)
    need = dp_size * sp_size * ep_size * tp_size
    assert need <= n, f"need {need} devices, have {n}"
    grid = np.asarray(devices[:need]).reshape(dp_size, sp_size, ep_size,
                                              tp_size)
    return Mesh(grid, (DP_AXIS, SP_AXIS, EP_AXIS, TP_AXIS))


def is_master() -> bool:
    return jax.process_index() == 0


def average_metrics(metrics: dict) -> dict:
    """Mean of scalar metrics across processes (reference
    encoder/distrib.py:112-124 ``average_metrics``).  Single-process runs
    (and per-device averaging, which the sharded train steps already do
    with ``pmean``) pass through unchanged.
    """
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    from jax.experimental import multihost_utils
    keys = sorted(metrics)
    local = np.asarray([float(metrics[k]) for k in keys], np.float32)
    gathered = multihost_utils.process_allgather(local)
    return dict(zip(keys, np.mean(gathered, axis=0).tolist()))


def broadcast_from_master(tree):
    """Make every process adopt process 0's values (reference
    encoder/distrib.py:55-90 ``broadcast_tensors``/``sync_buffer`` — used
    there to keep EMA VQ codebooks in lockstep).  Under jit+pmean our VQ
    stats stay synchronized by construction; this is for host-side state
    (e.g. freshly loaded checkpoints) on multi-host pods.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(tree)
