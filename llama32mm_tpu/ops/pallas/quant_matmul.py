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


def _int4_kernel(xlo_ref, xhi_ref, q4_ref, scale_ref, out_ref, acc_ref, *, bg, g, bn):
    """One grid step covers ``bg`` groups of ``g`` contraction rows.

    The nibble unpack is the cost center (VPU-bound — the DMA this kernel
    saves over int8 is small next to elementwise work), so it is minimal:
    AND / SHR on an i32 view of the offset-encoded bytes (u = q+8, so no
    sign-extension arithmetic), one convert per plane, and the per-group
    fp32 scale folded into each plane; each plane then needs one half-K MXU
    dot. The x operand arrives pre-split into the lo/hi column planes by the
    XLA caller (Mosaic cannot lower the strided middle-axis gather
    in-kernel; on the small activation it is free outside). The +8 offset is
    NOT removed here — the caller subtracts ``8·(rowsum_g(x) @ scale)``
    from the fp32 result (``dot(x, (u-8)·s) = dot(x, u·s) - 8·Σx_g·s``),
    which is why the kernel emits fp32: the offset makes the raw dot ~16×
    the corrected value, and a bf16 round before that cancellation would
    cost ~4 % relative error."""
    ig = pl.program_id(2)

    @pl.when(ig == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g2 = g // 2
    x_lo = xlo_ref[:]  # [bm, bg*g2]
    x_hi = xhi_ref[:]
    # Unpack via i32 AND/SHR (Mosaic has no direct u8→bf16 convert and no
    # i8 vector shifts; measured: this route runs the full gemv within ~7%
    # of the int8 kernel's wall time at half the HBM bytes).
    b = q4_ref[:].astype(jnp.int32)  # [bg*g2, bn]
    sc_x = scale_ref[:].astype(x_lo.dtype)[:, None, :]  # broadcast over g2 rows
    lo = ((b & 0xF).astype(x_lo.dtype).reshape(bg, g2, bn) * sc_x).reshape(bg * g2, bn)
    hi = ((b >> 4).astype(x_lo.dtype).reshape(bg, g2, bn) * sc_x).reshape(bg * g2, bn)
    acc_ref[:] = acc_ref[:] + jnp.dot(
        x_lo, lo, preferred_element_type=jnp.float32
    ) + jnp.dot(x_hi, hi, preferred_element_type=jnp.float32)

    @pl.when(ig == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def int4_matmul_pallas(
    x: jax.Array,  # [..., H] bf16/f32
    q4: jax.Array,  # [H/2, O] uint8 — split-half-per-group nibble packing
    scale: jax.Array,  # [NG, O] fp32 per-(group, channel)
) -> jax.Array:
    """``x @ dequant(q4, scale)`` streaming only the PACKED bytes from HBM:
    the nibble unpack happens on the VMEM-resident block, so int4 weights
    cost half the traffic of int8 (the decode-gemv bound). Requires
    ``H % group == 0`` with even group (enforced by ``quantize_weight_int4``).
    """
    shape = x.shape
    h = shape[-1]
    o = q4.shape[1]
    ng = scale.shape[0]
    g = h // ng
    g2 = g // 2
    x2d = x.reshape(-1, h)
    r = x2d.shape[0]

    bm = min(256, round_up(r, 8))
    # Groups per grid step: big enough that the packed block DMA (~bg·g2·bn
    # bytes, target ~2 MB) dominates the ~4 µs per-step overhead, small enough
    # for VMEM; bg must divide NG and keep the fp32 scale block Mosaic-legal
    # (bg == NG, or a multiple of the 8-row sublane tile). If no legal bg fits
    # the VMEM budget at this output-block width, narrow bn and retry.
    bn = min(round_up(o, 128), 8192)
    bg = None
    while True:
        bgmax = min(ng, max(1, (2 * 1024 * 1024) // max(g2 * bn, 1)))
        bg = next(
            (b for b in range(bgmax, 0, -1) if ng % b == 0 and (b == ng or b % 8 == 0)),
            None,
        )
        if bg is not None and bg * g2 * bn <= 4 * 1024 * 1024:
            break
        if bn <= 128:
            bg = ng  # tiny problem: take the whole thing in one block
            break
        bn //= 2
    grid = (cdiv(r, bm), cdiv(o, bn), ng // bg)

    # Pre-split x into the lo/hi column planes (matching the split-half
    # nibble packing) — trivial on the small activation, illegal (strided
    # gather) inside the Mosaic kernel.
    xg = x2d.reshape(r, ng, g)
    x_lo = xg[:, :, : g // 2].reshape(r, h // 2)
    x_hi = xg[:, :, g // 2 :].reshape(r, h // 2)

    raw = pl.pallas_call(
        functools.partial(_int4_kernel, bg=bg, g=g, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bg * g2), lambda im, ib, ig: (im, ig), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bg * g2), lambda im, ib, ig: (im, ig), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg * g2, bn), lambda im, ib, ig: (ig, ib), memory_space=pltpu.VMEM),
            pl.BlockSpec((bg, bn), lambda im, ib, ig: (ig, ib), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda im, ib, ig: (im, ib), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, o), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * h * o,
            bytes_accessed=r * h * x.dtype.itemsize + h * o // 2 + ng * o * 4
            + r * o * jnp.float32.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(x_lo, x_hi, q4, scale)
    # Offset removal (see kernel docstring): fp32 until after the subtraction.
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)  # [r, ng]
    out = raw - 8.0 * jnp.dot(xsum, scale, preferred_element_type=jnp.float32)
    return out.astype(x.dtype).reshape(*shape[:-1], o)
