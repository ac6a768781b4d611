"""Weights-only int8 dequantizing matmul Pallas kernel.

Decode is weight-streaming-bound (BASELINE north star: ≥90% of the HBM
roofline); storing linear weights as int8 with per-output-channel fp32 scales
halves the streamed bytes, and this kernel converts int8→bf16 *inside VMEM*
so the dequantized copy never exists in HBM (an XLA ``astype`` before the dot
would materialize it and forfeit the bandwidth win).

Layout: ``w_q [in, out] int8``, ``scale [out] fp32``;
``out = (x @ w_q) * scale`` — the per-column scale commutes with the
contraction, so it is applied once to the fp32 accumulator tile.

No reference counterpart (the reference has no quantization); this is a
TPU-native serving extension (opt-in, not on the parity path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama32mm_tpu.ops.pallas.common import cdiv, round_up, use_interpret


def _kernel(x_ref, wq_ref, scale_ref, out_ref, acc_ref, *, bh, h, ragged):
    kh = pl.program_id(2)

    @pl.when(kh == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = wq_ref[:].astype(x.dtype)  # int8 → compute dtype, in VMEM
    if ragged:
        col = kh * bh + jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(col < h, x, 0)
        row = kh * bh + jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
        w = jnp.where(row < h, w, 0)
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(kh == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = (acc_ref[:] * scale_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def int8_matmul_pallas(
    x: jax.Array,  # [..., H] bf16/f32
    w_q: jax.Array,  # [H, O] int8
    scale: jax.Array,  # [O] fp32
) -> jax.Array:
    shape = x.shape
    h = shape[-1]
    o = w_q.shape[1]
    x2d = x.reshape(-1, h)
    r = x2d.shape[0]

    if r <= 8:
        # Decode gemv: per-grid-step overhead (~4 µs) dwarfs the block DMA at
        # small tiles (measured 16% of HBM bw at 512 KB blocks on v5e) — use
        # full-H stripes and ~4 MB weight blocks so the transfer dominates.
        bm = round_up(r, 8)
        bh = min(round_up(h, 128), 4096)
        bn = max(128, min(round_up(o, 128), (4 * 1024 * 1024) // bh // 128 * 128))
    else:
        bm = min(256, round_up(r, 8))
        bn = min(512, round_up(o, 128))
        bh = min(1024, round_up(h, 128))
    ragged = h % bh != 0
    grid = (cdiv(r, bm), cdiv(o, bn), cdiv(h, bh))

    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, h=h, ragged=ragged),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bh), lambda im, ib, kh: (im, kh), memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, bn), lambda im, ib, kh: (kh, ib), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda im, ib, kh: (0, ib), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda im, ib, kh: (im, ib), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, o), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * h * o,
            bytes_accessed=r * h * x.dtype.itemsize + h * o + r * o * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(x2d, w_q, scale[None, :])
    return out.reshape(*shape[:-1], o)
