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


def create_mesh(dp_size: int = -1, tp_size: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (dp, tp) mesh. ``dp_size=-1`` means all remaining devices.

    Mesh-axis order puts ``tp`` innermost so tensor-parallel collectives
    ride the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp_size == -1:
        assert n % tp_size == 0, f"{n} devices not divisible by tp={tp_size}"
        dp_size = n // tp_size
    assert dp_size * tp_size <= n, (
        f"need {dp_size * tp_size} devices, have {n}")
    grid = np.asarray(devices[: dp_size * tp_size]).reshape(dp_size, tp_size)
    return Mesh(grid, (DP_AXIS, TP_AXIS))


def is_master() -> bool:
    return jax.process_index() == 0
