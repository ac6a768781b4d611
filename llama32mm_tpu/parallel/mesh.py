"""Device mesh construction.

The reference has no distributed layer at all (SURVEY §2.8); this is the
TPU-native replacement: a ``jax.sharding.Mesh`` whose axes GSPMD shards over.
Collectives are compiler-emitted over ICI — no NCCL/MPI analogue exists or is
needed.

Axes:
- ``dp``  — data parallel (batch).
- ``tp``  — tensor parallel (attention heads / MLP intermediate / vocab).

Axis names ``pp``/``sp``/``ep`` are reserved for pipeline/sequence/expert
parallelism so meshes stay forward-compatible (SURVEY §2.8: "leave the mesh
axis naming open").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

AXIS_DP = "dp"
AXIS_TP = "tp"


def create_mesh(
    dp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``(dp, tp)`` mesh. TP stays innermost so its collectives ride
    the fastest ICI dimension."""
    devices = list(devices) if devices is not None else jax.devices()
    n = dp * tp
    if n > len(devices):
        raise ValueError(f"mesh {dp}x{tp} needs {n} devices, have {len(devices)}")
    try:
        dev_array = mesh_utils.create_device_mesh((dp, tp), devices=devices[:n])
    except (ValueError, AssertionError):
        dev_array = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(dev_array, (AXIS_DP, AXIS_TP))


def single_device_mesh() -> Mesh:
    return create_mesh(1, 1)
