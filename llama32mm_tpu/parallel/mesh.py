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

- ``pp``  — pipeline parallel (decoder layer stack split into stages; GPipe
  microbatch schedule via ``shard_map`` + nearest-neighbor ``ppermute`` —
  see parallel/pipeline.py).

Axis name ``ep`` stays reserved for expert parallelism so meshes remain
forward-compatible (SURVEY §2.8: "leave the mesh axis naming open"; the
reference has no MoE to match).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

AXIS_DP = "dp"
AXIS_PP = "pp"
AXIS_SP = "sp"
AXIS_TP = "tp"


def create_mesh(
    dp: int = 1,
    tp: int = 1,
    sp: int = 1,
    pp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``(dp, pp, sp, tp)`` mesh. TP stays innermost so its
    collectives ride the fastest ICI dimension; SP sits between (its per-layer
    K/V rotations are cheaper than TP's per-matmul all-reduces but hotter
    than DP's per-step gradient reduction); PP sits outside SP (one
    activation hop per microbatch-step) and DP outermost."""
    devices = list(devices) if devices is not None else jax.devices()
    n = dp * pp * sp * tp
    if n > len(devices):
        raise ValueError(
            f"mesh {dp}x{pp}x{sp}x{tp} needs {n} devices, have {len(devices)}"
        )
    try:
        dev_array = mesh_utils.create_device_mesh((dp, pp, sp, tp), devices=devices[:n])
    except (ValueError, AssertionError):
        dev_array = np.asarray(devices[:n]).reshape(dp, pp, sp, tp)
    return Mesh(dev_array, (AXIS_DP, AXIS_PP, AXIS_SP, AXIS_TP))


def single_device_mesh() -> Mesh:
    return create_mesh(1, 1)
