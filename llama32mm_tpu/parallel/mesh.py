"""Device mesh construction.

The reference has no distributed layer at all (SURVEY §2.8); this is the
TPU-native replacement: a ``jax.sharding.Mesh`` whose axes GSPMD shards over.
Collectives are compiler-emitted over ICI — no NCCL/MPI analogue exists or is
needed.

Axes:
- ``dp``  — data parallel (batch).
- ``sp``  — sequence/context parallel (the token axis of activations for
  long-context prefill/training; the flash kernel's SPMD rules keep q
  seq-sharded and all-gather only K/V — see ops/pallas/attention.py).
- ``tp``  — tensor parallel (attention heads / MLP intermediate / vocab).

Axis names ``pp``/``ep`` are reserved for pipeline/expert parallelism so
meshes stay forward-compatible (SURVEY §2.8: "leave the mesh axis naming
open").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

AXIS_DP = "dp"
AXIS_SP = "sp"
AXIS_TP = "tp"


def create_mesh(
    dp: int = 1,
    tp: int = 1,
    sp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``(dp, sp, tp)`` mesh. TP stays innermost so its collectives
    ride the fastest ICI dimension; SP sits between (its K/V all-gathers are
    per-layer, cheaper than TP's per-matmul all-reduces but hotter than DP's
    per-step gradient reduction)."""
    devices = list(devices) if devices is not None else jax.devices()
    n = dp * sp * tp
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{sp}x{tp} needs {n} devices, have {len(devices)}")
    try:
        dev_array = mesh_utils.create_device_mesh((dp, sp, tp), devices=devices[:n])
    except (ValueError, AssertionError):
        dev_array = np.asarray(devices[:n]).reshape(dp, sp, tp)
    return Mesh(dev_array, (AXIS_DP, AXIS_SP, AXIS_TP))


def single_device_mesh() -> Mesh:
    return create_mesh(1, 1)
