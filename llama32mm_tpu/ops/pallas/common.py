"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

import jax


def use_interpret() -> bool:
    """Compiled on TPU; interpreter mode elsewhere (CPU tests)."""
    return jax.default_backend() != "tpu"


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
