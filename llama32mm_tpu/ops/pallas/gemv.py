"""Decode gemv Pallas kernel — large-block HBM weight streaming.

The decode step is weight-streaming-bound: every matmul is ``x [B≤8, K] @
w [K, N]`` where the weight read dominates (BASELINE.md north star: ≥90% of
the HBM roofline). XLA's own gemv schedule measures ~655-704 GB/s effective
on v5e; a Pallas grid over LARGE column blocks (~12-16 MB — Mosaic
auto-double-buffers the next block's DMA behind the current block's VPU/MXU
work) measures ~750 GB/s on the same bytes (scripts/bench_pallas_stream.py).
The round-2 int8 kernel (ops/pallas/quant_matmul.py) lost to XLA precisely
because its 4 MB blocks under-fill the DMA pipeline.

No reference counterpart; this replaces the reference's whole CUDA-kernel
performance play (``Tools/swiglu/swiglu.cu``) on the TPU decode path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama32mm_tpu.ops.pallas.common import cdiv, round_up, use_interpret

# Target weight-block bytes: big enough that the block DMA dwarfs per-step
# overhead and reaches stream speed (measured on v5e: 16.8 MB → 750 GB/s,
# 4 MB → 676, XLA → 655), small enough that double buffering fits VMEM.
_TARGET_BLOCK_BYTES = 14 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024

_MB = 1024 * 1024


def default_decode_routes(quantized: bool = False) -> dict | None:
    """Per-weight decode-gemv routing: only routes that won IN THE REAL
    ENGINE survive here (scripts/bench_route_ablation.py) — the per-shape
    isolated wins (scripts/bench_gemv_ab.py; w_down 587→729 GB/s, wk/wv
    588→902, ...) do NOT compose with XLA's full-program overlap and measured
    as a wash or a regression inside the decode loop (BASELINE.md round-3
    matrix).

    int8: the [4096, 128k] int8 lm_head is the exception — XLA's dequant-gemv
    schedule collapses on it (412 GB/s isolated) and the Pallas route wins
    end-to-end: 69.15 → 71.72 tok/s at 11B shapes (+3.7%).

    bf16: no route survives composition; XLA's schedule stands (108.5 tok/s
    with and without the best single route)."""
    if quantized:
        return {"lm_head": 8 * _MB}
    return None


def _kernel(x_ref, w_ref, out_ref):
    out_ref[:] = jnp.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _block_n(k: int, n: int, itemsize: int, target: int) -> int:
    bn = max(128, (target // (k * itemsize)) // 128 * 128)
    return min(round_up(n, 128), bn)


def gemv_pallas(x: jax.Array, w: jax.Array, block_bytes: int | None = None) -> jax.Array:
    """``x [..., K] @ w [K, N]`` tuned for few-row (decode) shapes.

    Full-K column blocks sized to ``block_bytes`` stream through a 1-D grid;
    no K tiling (every decode K ≤ 8192 fits VMEM alongside the block), so
    each block is one fp32-accumulated MXU dot. Rows are padded to the
    8-sublane tile by the caller's reshape; use only when the row count is
    small (the block holds [K, BN] regardless of rows, so prefill shapes
    would starve the MXU — route those through plain ``jnp.matmul``)."""
    shape = x.shape
    k, n = w.shape
    x2d = x.reshape(-1, k)
    r = x2d.shape[0]
    bn = _block_n(k, n, w.dtype.itemsize, block_bytes or _TARGET_BLOCK_BYTES)

    out = pl.pallas_call(
        _kernel,
        grid=(cdiv(n, bn),),
        in_specs=[
            pl.BlockSpec((r, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * k * n,
            bytes_accessed=r * k * x.dtype.itemsize + k * n * w.dtype.itemsize
            + r * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(x2d, w)
    return out.reshape(*shape[:-1], n)


def _stacked_kernel(l_ref, x_ref, w_ref, out_ref):
    out_ref[:] = jnp.dot(
        x_ref[:], w_ref[0], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def gemv_stacked_pallas(
    x: jax.Array,  # [..., K]
    w: jax.Array,  # [L, K, N] stacked per-layer weights
    layer_idx: jax.Array,  # scalar int32
    block_bytes: int | None = None,
) -> jax.Array:
    """``x @ w[layer_idx]`` reading layer ``layer_idx``'s blocks DIRECTLY out
    of the stacked HBM array via a scalar-prefetch index_map.

    This is the decode-critical variant: inside the model's ``lax.scan`` over
    layers, slicing ``w[l]`` outside a Pallas call materializes a copy of the
    whole layer weight before the custom call (measured: the same gemv runs
    706 GB/s on a static slice but 220 GB/s on a scan-sliced operand — the
    dynamic-slice copy eats the bandwidth the kernel saves). With the layer
    index prefetched, no slice ever exists."""
    shape = x.shape
    L, k, n = w.shape
    x2d = x.reshape(-1, k)
    r = x2d.shape[0]
    bn = _block_n(k, n, w.dtype.itemsize, block_bytes or _TARGET_BLOCK_BYTES)
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    out = pl.pallas_call(
        _stacked_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cdiv(n, bn),),
            in_specs=[
                pl.BlockSpec((r, k), lambda i, l: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k, bn), lambda i, l: (l[0], 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((r, bn), lambda i, l: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((r, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * k * n,
            bytes_accessed=r * k * x.dtype.itemsize + k * n * w.dtype.itemsize
            + r * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(lidx, x2d, w)
    return out.reshape(*shape[:-1], n)


def _qstacked_kernel(l_ref, x_ref, w_ref, scale_ref, out_ref):
    acc = jnp.dot(
        x_ref[:], w_ref[0].astype(x_ref.dtype), preferred_element_type=jnp.float32
    )
    out_ref[:] = (acc * scale_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def int8_gemv_stacked_pallas(
    x: jax.Array,  # [..., K]
    w_q: jax.Array,  # [L, K, N] int8
    scale: jax.Array,  # [L, N] fp32
    layer_idx: jax.Array,  # scalar int32
    block_bytes: int | None = None,
) -> jax.Array:
    """int8 weights-only variant of :func:`gemv_stacked_pallas` (dequant
    fused in VMEM, per-output-channel scales, no scan-slice copy)."""
    shape = x.shape
    L, k, n = w_q.shape
    x2d = x.reshape(-1, k)
    r = x2d.shape[0]
    bn = _block_n(k, n, 1, block_bytes or _TARGET_BLOCK_BYTES)
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    out = pl.pallas_call(
        _qstacked_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cdiv(n, bn),),
            in_specs=[
                pl.BlockSpec((r, k), lambda i, l: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k, bn), lambda i, l: (l[0], 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bn), lambda i, l: (l[0], 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((r, bn), lambda i, l: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((r, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * k * n,
            bytes_accessed=r * k * x.dtype.itemsize + k * n + n * 4
            + r * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(lidx, x2d, w_q, scale[:, None, :])
    return out.reshape(*shape[:-1], n)


def _int4_kernel(l_ref, xlo_ref, xhi_ref, xsum_ref, w_ref, scale_ref, out_ref,
                 *, g2, ng, chunk_rows):
    """Full-K int4 gemv block: unpack the split-half nibble packing
    (ops/quant.py::quantize_weight_int4) in VMEM, group-chunked so the i32 /
    plane intermediates stay ~``chunk_rows``×BN, and fold the ``u = q+8``
    offset out with an in-kernel fp32 correction dot
    (``dot(x, (u-8)·s) = dot(x_planes, u·s) - 8·Σ_g xsum_g·s_g``) — unlike
    the round-3 kernel (ops/pallas/quant_matmul.py) no fp32 raw output or
    XLA-side scale slice ever exists, so the stacked variant streams ONLY the
    packed bytes + scales per decode step."""
    r = xlo_ref.shape[0]
    bn = out_ref.shape[1]
    acc = jnp.zeros((r, bn), jnp.float32)
    cdtype = xlo_ref.dtype

    def plane_dots(acc, row0, rl, lo, hi):
        acc = acc + jnp.dot(
            xlo_ref[:, row0:row0 + rl], lo, preferred_element_type=jnp.float32
        )
        return acc + jnp.dot(
            xhi_ref[:, row0:row0 + rl], hi, preferred_element_type=jnp.float32
        )

    if g2 <= chunk_rows:
        cg = max(1, chunk_rows // g2)
        for g0 in range(0, ng, cg):
            gn = min(cg, ng - g0)
            row0, rl = g0 * g2, gn * g2
            b = w_ref[0, row0:row0 + rl, :].astype(jnp.int32)
            sc = scale_ref[0, g0:g0 + gn, :]
            scx = sc.astype(cdtype)[:, None, :]
            lo = ((b & 0xF).astype(cdtype).reshape(gn, g2, bn) * scx).reshape(rl, bn)
            hi = ((b >> 4).astype(cdtype).reshape(gn, g2, bn) * scx).reshape(rl, bn)
            acc = plane_dots(acc, row0, rl, lo, hi)
            acc = acc - 8.0 * jnp.dot(
                xsum_ref[:, g0:g0 + gn], sc, preferred_element_type=jnp.float32
            )
    else:
        # few huge groups (per-channel int4: ng == 1) — sub-chunk rows within
        # each group; the group's scale row broadcasts over the sub-chunk
        for g0 in range(ng):
            sc = scale_ref[0, g0:g0 + 1, :]  # [1, bn] fp32
            scx = sc.astype(cdtype)
            for rs in range(0, g2, chunk_rows):
                rl = min(chunk_rows, g2 - rs)
                row0 = g0 * g2 + rs
                b = w_ref[0, row0:row0 + rl, :].astype(jnp.int32)
                lo = (b & 0xF).astype(cdtype) * scx
                hi = (b >> 4).astype(cdtype) * scx
                acc = plane_dots(acc, row0, rl, lo, hi)
            acc = acc - 8.0 * jnp.dot(
                xsum_ref[:, g0:g0 + 1], sc, preferred_element_type=jnp.float32
            )
    out_ref[:] = acc.astype(out_ref.dtype)


def _int4_kernel_post(l_ref, x_ref, xsum_ref, w_ref, scale_ref, out_ref,
                      *, g2, ng, chunk_rows, cat):
    """v2 int4 unpack — minimum VPU ops per packed byte, and no shift.

    The v1 kernel (:func:`_int4_kernel`) measured only ~300 GB/s of packed
    bytes (vs ~700 for the int8 kernel's stream) because its unpack pays ~7
    lane-ops per byte: an i32 widen, mask+shift in 32-bit lanes, two
    int→bf16 converts, and two per-element scale multiplies. Two changes:

    1. **Shift-free nibble algebra.** Mosaic only legalizes vector shifts at
       i32 width (``arith.shrui``/``shrsi`` fail on i8/i16 lanes — probed on
       chip), which is exactly the widening v1 pays for. But the high nibble
       never needs extracting: with ``b = 16·u_hi + u_lo`` and the x columns
       pre-transformed host-side to ``x_hi' = x_hi/16`` (exact in bf16 —
       power-of-two exponent step) and ``x_lo' = x_lo − x_hi'``,

           dot(x_hi', b) + dot(x_lo', u_lo)
         = Σ x_hi·u_hi + (1/16)Σ x_hi·u_lo + Σ x_lo·u_lo − (1/16)Σ x_hi·u_lo
         = Σ x_hi·u_hi + Σ x_lo·u_lo.

       So the kernel only computes ``u_lo = b & 0xF`` (AND on the u8 lanes,
       then the i8 hop — Mosaic has no u8→bf16 cast; u8→i8 is a reinterpret
       for values 0..15) and casts ``b`` whole via i16 (0..255 is exact in
       bf16). No shift, no i32 lanes.
    2. **fp32 per-group post-scale.** The per-(group, channel) scale is
       applied ONCE per group to the [r, bn] partial dot in fp32 — legal
       because the scale is constant along the contraction rows of its
       group: ``dot(x_g, u_g·s_g) = dot(x_g, u_g)·s_g``. The ``u = q+8``
       offset folds out with one correction dot at the end:
       ``Σ_g dot(x_g, u_g)·s_g − 8·dot(xsum, s)`` (xsum from the ORIGINAL
       x, not the transformed planes).

    ``cat=True`` stacks each group's (u_lo, b) planes into one [g, bn]
    operand so the group partial is a single K=g dot (the split-half packing
    makes the matching x slice contiguous: group g's transformed x columns
    are [x_lo'_g | x_hi'_g]); ``cat=False`` runs two K=g/2 dots and skips
    the concatenate copy. A/B'd on chip in scripts/bench_int4_kernel.py.
    """
    r = x_ref.shape[0]
    bn = out_ref.shape[1]
    g = 2 * g2
    acc = jnp.zeros((r, bn), jnp.float32)
    cdtype = x_ref.dtype

    def planes(b):
        lo = (b & 0xF).astype(jnp.int8).astype(cdtype)
        bc = b.astype(jnp.int16).astype(cdtype)
        return lo, bc

    if g2 <= chunk_rows:
        for g0 in range(ng):
            lo, bc = planes(w_ref[0, g0 * g2:(g0 + 1) * g2, :])
            if cat:
                wg = jnp.concatenate([lo, bc], axis=0)  # [g, bn]
                part = jnp.dot(x_ref[:, g0 * g:(g0 + 1) * g], wg,
                               preferred_element_type=jnp.float32)
            else:
                part = jnp.dot(x_ref[:, g0 * g:g0 * g + g2], lo,
                               preferred_element_type=jnp.float32)
                part = part + jnp.dot(x_ref[:, g0 * g + g2:(g0 + 1) * g], bc,
                                      preferred_element_type=jnp.float32)
            acc = acc + part * scale_ref[0, g0:g0 + 1, :]
    else:
        # few huge groups (per-channel int4: ng == 1) — sub-chunk packed rows
        # within each group; the scale still applies once per group
        for g0 in range(ng):
            part = jnp.zeros((r, bn), jnp.float32)
            for rs in range(0, g2, chunk_rows):
                rl = min(chunk_rows, g2 - rs)
                lo, bc = planes(w_ref[0, g0 * g2 + rs:g0 * g2 + rs + rl, :])
                part = part + jnp.dot(x_ref[:, g0 * g + rs:g0 * g + rs + rl],
                                      lo, preferred_element_type=jnp.float32)
                part = part + jnp.dot(
                    x_ref[:, g0 * g + g2 + rs:g0 * g + g2 + rs + rl], bc,
                    preferred_element_type=jnp.float32)
            acc = acc + part * scale_ref[0, g0:g0 + 1, :]
    acc = acc - 8.0 * jnp.dot(xsum_ref[:], scale_ref[0],
                              preferred_element_type=jnp.float32)
    out_ref[:] = acc.astype(out_ref.dtype)


def _int4_kernel_w4a8(l_ref, xq_ref, xqsumlo_ref, ax_ref, w_ref, scale_ref,
                      out_ref, *, g2, ng, chunk_rows):
    """W4A8 int4 gemv block — int8 MXU dots, 3 lane-ops per packed byte.

    The v2 bf16 unpack (:func:`_int4_kernel_post`) still pays ~4 VPU lane-ops
    per byte (AND + i8→bf16 + i16 hop + i16→bf16), and its SoL probe reads
    only ~468 GB/s of packed bytes vs ~700 for the int8 kernel's stream —
    the unpack, not the DMA, is the bound. This variant quantizes the
    ACTIVATION to per-row int8 once per step (``x ≈ ax·xq``, exact row-max
    scaling — the only numerics change vs W4A16) so both nibble planes feed
    s8×s8→s32 MXU dots and the unpack needs no int→float cast at all:

      ``lo = (b & 0xF)``            as s8  = ``u_lo``            (1 lane-op)
      ``hi = ((b ^ 0x80) & 0xF0)``  as s8  = ``16·u_hi − 128``   (2 lane-ops)

    The ``^ 0x80`` top-bit flip makes every masked value fit s8 exactly
    (offset nibbles ``u ∈ [1,15]`` put ``16·u_hi`` up to 240 — unrepresentable
    without it). With ``P = 16·dot(xq_lo, lo) + dot(xq_hi, hi)`` (exact in
    i32: |P| < 2³¹ even at K=64k):

      ``Σ_g xq·(u−8) = P/16 − 8·xqsum_lo_g``

    — the −128 term IS the hi-plane's ``−8·xqsum_hi`` offset removal (8·16),
    so only the lo-plane rowsums need the end correction dot. Per group the
    fp32 work is one [r,bn] scale-multiply-accumulate, same as "post"."""
    r = xq_ref.shape[0]
    bn = out_ref.shape[1]
    g = 2 * g2
    acc = jnp.zeros((r, bn), jnp.float32)

    def planes(b):
        lo = (b & 0xF).astype(jnp.int8)
        hi = ((b ^ 0x80) & 0xF0).astype(jnp.int8)
        return lo, hi

    if g2 <= chunk_rows:
        for g0 in range(ng):
            lo, hi = planes(w_ref[0, g0 * g2:(g0 + 1) * g2, :])
            a = jnp.dot(xq_ref[:, g0 * g:g0 * g + g2], lo,
                        preferred_element_type=jnp.int32)
            h = jnp.dot(xq_ref[:, g0 * g + g2:(g0 + 1) * g], hi,
                        preferred_element_type=jnp.int32)
            p = a * 16 + h
            acc = acc + p.astype(jnp.float32) * (
                scale_ref[0, g0:g0 + 1, :] * 0.0625
            )
    else:
        # few huge groups (per-channel int4: ng == 1) — sub-chunk packed rows
        for g0 in range(ng):
            p = jnp.zeros((r, bn), jnp.int32)
            for rs in range(0, g2, chunk_rows):
                rl = min(chunk_rows, g2 - rs)
                lo, hi = planes(w_ref[0, g0 * g2 + rs:g0 * g2 + rs + rl, :])
                p = p + jnp.dot(xq_ref[:, g0 * g + rs:g0 * g + rs + rl], lo,
                                preferred_element_type=jnp.int32) * 16
                p = p + jnp.dot(
                    xq_ref[:, g0 * g + g2 + rs:g0 * g + g2 + rs + rl], hi,
                    preferred_element_type=jnp.int32)
            acc = acc + p.astype(jnp.float32) * (
                scale_ref[0, g0:g0 + 1, :] * 0.0625
            )
    acc = acc - 8.0 * jnp.dot(xqsumlo_ref[:], scale_ref[0],
                              preferred_element_type=jnp.float32)
    out_ref[:] = (acc * ax_ref[:]).astype(out_ref.dtype)


def _int4_kernel_w4a8b(l_ref, xqb_ref, xqsumlo_ref, ax_ref, w_ref, scale_ref,
                       out_ref, *, g2, ng, chunk_groups):
    """Batched-dot variant of :func:`_int4_kernel_w4a8`: the per-group s8
    dots are independent (the f32 accumulation is associative), but the
    unrolled loop chains them through ``acc`` — this variant makes the
    independence explicit as ONE ``dot_general`` batched over ``chunk_groups``
    groups per step, so Mosaic can pipeline the MXU passes back-to-back.
    Same math, same exactness. The activation arrives group-major
    ``[ng, r, g]`` (Mosaic requires leading batch dims on both operands)."""
    r = out_ref.shape[0]
    bn = out_ref.shape[1]
    acc = jnp.zeros((r, bn), jnp.float32)
    for c0 in range(0, ng, chunk_groups):
        cg = min(chunk_groups, ng - c0)
        b = w_ref[0, c0 * g2:(c0 + cg) * g2, :]
        lo = (b & 0xF).astype(jnp.int8).reshape(cg, g2, bn)
        hi = ((b ^ 0x80) & 0xF0).astype(jnp.int8).reshape(cg, g2, bn)
        xc = xqb_ref[c0:c0 + cg]  # [cg, r, g]
        dn = (((2,), (1,)), ((0,), (0,)))  # contract g2, batch over groups
        a = jax.lax.dot_general(xc[:, :, :g2], lo, dn,
                                preferred_element_type=jnp.int32)  # [cg, r, bn]
        h = jax.lax.dot_general(xc[:, :, g2:], hi, dn,
                                preferred_element_type=jnp.int32)
        p = a * 16 + h
        scl = scale_ref[0, c0:c0 + cg, :] * 0.0625  # [cg, bn]
        acc = acc + jnp.sum(p.astype(jnp.float32) * scl[:, None, :], axis=0)
    acc = acc - 8.0 * jnp.dot(xqsumlo_ref[:], scale_ref[0],
                              preferred_element_type=jnp.float32)
    out_ref[:] = (acc * ax_ref[:]).astype(out_ref.dtype)


_INT4_CHUNK_ROWS = 512  # packed rows unpacked per in-kernel step (~BN·4 KB i32)


def _int4_xplanes(x2d, k2: int, ng: int):
    """Split x into the lo/hi contraction planes matching the split-half
    nibble packing, plus the per-group fp32 row sums for offset removal."""
    r, k = x2d.shape
    g = k // ng
    xg = x2d.reshape(r, ng, g)
    x_lo = xg[:, :, : g // 2].reshape(r, k2)
    x_hi = xg[:, :, g // 2 :].reshape(r, k2)
    xsum = jnp.sum(xg.astype(jnp.float32), axis=2)  # [r, ng]
    return x_lo, x_hi, xsum


import os as _os

# Default unpack variant for the int4 decode gemvs. "post" (W4A16 bf16
# unpack) was the round-4 chip A/B winner (scripts/bench_int4_kernel.py);
# "w4a8" (s8-MXU unpack) is selectable per-call or via env for A/B — it is
# the only variant whose numerics differ from the dequantized matmul
# (per-row int8 activation quantization), so flipping the default is a
# speed/quality decision measured in scripts/train_3b_quality.py +
# bench_int4_decode_sol.py, not a pure scheduling one.
_INT4_VARIANT = _os.environ.get("LLAMA32MM_INT4_VARIANT", "post")


def int4_gemv_stacked_pallas(
    x: jax.Array,  # [..., K]
    q4: jax.Array,  # [L, K/2, N] uint8 (split-half nibble packing)
    scale: jax.Array,  # [L, NG, N] fp32 per-(group, output-channel)
    layer_idx: jax.Array,  # scalar int32
    block_bytes: int | None = None,
    variant: str | None = None,
) -> jax.Array:
    """int4 weights-only variant of :func:`gemv_stacked_pallas`.

    This is what makes int4 a SPEED mode, not just a capacity mode: the
    round-3 kernel (``ops/pallas/quant_matmul.py::int4_matmul_pallas``)
    consumed the layer scan's dynamic-slice operand, so every decode step
    paid an HBM→HBM copy of the packed bytes before the kernel even ran
    (the same ~3× traffic penalty gemv_stacked_pallas documents for bf16).
    Reading layer ``layer_idx``'s full-K column blocks straight out of the
    stacked HBM array leaves only the packed stream + the VMEM nibble
    unpack — and the unpack cost per byte decides whether int4 beats int8
    (see :func:`_int4_kernel_post`). ``variant``: "post" (u8-native unpack,
    fp32 per-group post-scale), "post-cat" (same, single K=g dot per group),
    "pre" (v1: i32 unpack, bf16 premultiplied scales), "w4a8" (int8-quantized
    activations + s8 MXU dots — fastest unpack, the one variant whose
    numerics differ from dequant-matmul; see :func:`_int4_kernel_w4a8`)."""
    variant = variant or _INT4_VARIANT
    if variant not in ("pre", "post", "post-cat", "w4a8", "w4a8b"):
        raise ValueError(
            f"int4 gemv variant must be one of 'pre'/'post'/'post-cat'/"
            f"'w4a8'/'w4a8b', got {variant!r}"
        )
    shape = x.shape
    L, k2, n = q4.shape
    ng = scale.shape[1]
    k = 2 * k2
    g2 = k2 // ng
    x2d = x.reshape(-1, k)
    r = x2d.shape[0]
    bn = _block_n(k2, n, 1, block_bytes or (8 * _MB))
    lidx = jnp.asarray(layer_idx, jnp.int32).reshape(1)

    common = dict(
        out_shape=jax.ShapeDtypeStruct((r, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * k * n,
            bytes_accessed=2 * r * k2 * x.dtype.itemsize + k2 * n + ng * n * 4
            + r * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )

    if variant in ("w4a8", "w4a8b"):
        if variant == "w4a8b" and g2 > _INT4_CHUNK_ROWS:
            # the batched kernel keeps whole groups' nibble planes resident;
            # huge per-channel groups need the row-sub-chunking w4a8 body
            variant = "w4a8"
        if variant == "w4a8b":
            kernel = functools.partial(
                _int4_kernel_w4a8b, g2=g2, ng=ng,
                chunk_groups=max(1, _INT4_CHUNK_ROWS // g2),
            )
        else:
            kernel = functools.partial(
                _int4_kernel_w4a8, g2=g2, ng=ng, chunk_rows=_INT4_CHUNK_ROWS,
            )
        xf = x2d.astype(jnp.float32)
        ax = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0  # [r, 1]
        ax = jnp.where(ax > 0, ax, 1.0)
        xq = jnp.clip(jnp.round(xf / ax), -127, 127).astype(jnp.int8)
        # lo-plane per-group rowsums (exact in f32: |Σ| ≤ g2·127 < 2²⁴)
        xqsum_lo = jnp.sum(
            xq.reshape(r, ng, 2, g2)[:, :, 0].astype(jnp.float32), axis=2
        )  # [r, ng]
        g = 2 * g2
        if variant == "w4a8b":  # group-major activation (leading batch dims)
            xq = xq.reshape(r, ng, g).transpose(1, 0, 2)  # [ng, r, g] — tiny
            x_spec = pl.BlockSpec((ng, r, g), lambda i, l: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
        else:
            x_spec = pl.BlockSpec((r, k), lambda i, l: (0, 0),
                                  memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(cdiv(n, bn),),
                in_specs=[
                    x_spec,
                    pl.BlockSpec((r, ng), lambda i, l: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((r, 1), lambda i, l: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, k2, bn), lambda i, l: (l[0], 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, ng, bn), lambda i, l: (l[0], 0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((r, bn), lambda i, l: (0, i),
                                       memory_space=pltpu.VMEM),
            ),
            **common,
        )(lidx, xq, xqsum_lo, ax.astype(jnp.float32), q4, scale)
        return out.reshape(*shape[:-1], n)

    if variant.startswith("post"):
        xf = x2d.reshape(r, ng, 2, g2).astype(jnp.float32)
        xsum = jnp.sum(xf, axis=(2, 3))  # [r, ng] — from the ORIGINAL x
        # shift-free scheme (see _int4_kernel_post): x_hi' = x_hi/16 (exact),
        # x_lo' = x_lo − x_hi'
        xhi = xf[:, :, 1] * (1.0 / 16.0)
        xprep = jnp.stack([xf[:, :, 0] - xhi, xhi], axis=2)
        xprep = xprep.reshape(r, k).astype(x.dtype)
        out = pl.pallas_call(
            functools.partial(
                _int4_kernel_post, g2=g2, ng=ng,
                chunk_rows=_INT4_CHUNK_ROWS, cat=(variant == "post-cat"),
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(cdiv(n, bn),),
                in_specs=[
                    pl.BlockSpec((r, k), lambda i, l: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((r, ng), lambda i, l: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, k2, bn), lambda i, l: (l[0], 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, ng, bn), lambda i, l: (l[0], 0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((r, bn), lambda i, l: (0, i),
                                       memory_space=pltpu.VMEM),
            ),
            **common,
        )(lidx, xprep, xsum, q4, scale)
        return out.reshape(*shape[:-1], n)

    x_lo, x_hi, xsum = _int4_xplanes(x2d, k2, ng)
    out = pl.pallas_call(
        functools.partial(_int4_kernel, g2=g2, ng=ng, chunk_rows=_INT4_CHUNK_ROWS),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cdiv(n, bn),),
            in_specs=[
                pl.BlockSpec((r, k2), lambda i, l: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((r, k2), lambda i, l: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((r, ng), lambda i, l: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k2, bn), lambda i, l: (l[0], 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ng, bn), lambda i, l: (l[0], 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((r, bn), lambda i, l: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
        **common,
    )(lidx, x_lo, x_hi, xsum, q4, scale)
    return out.reshape(*shape[:-1], n)


def int4_gemv_pallas(
    x: jax.Array,  # [..., K]
    q4: jax.Array,  # [K/2, N] uint8
    scale: jax.Array,  # [NG, N] fp32
    block_bytes: int | None = None,
    variant: str | None = None,
) -> jax.Array:
    """Single-weight int4 gemv (the int4 lm_head / slice-mode case): the
    stacked kernel over an L=1 view (the reshape is free — same buffer)."""
    return int4_gemv_stacked_pallas(
        x, q4[None], scale[None], jnp.int32(0), block_bytes=block_bytes,
        variant=variant,
    )


def _t_kernel(x_ref, wt_ref, out_ref):
    # wt block is [BN, K]; contract x's K with wt's K (no transpose copy —
    # the MXU takes either operand orientation).
    out_ref[:] = jax.lax.dot_general(
        x_ref[:], wt_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def gemv_t_pallas(x: jax.Array, w_t: jax.Array, block_bytes: int | None = None) -> jax.Array:
    """``x [..., K] @ w_t.T`` where the weight is stored **[N, K]** — the tied
    lm_head case (``lm_head = tok_emb.T``, reference ``Model/model.py:363-364``):
    the embedding table is [vocab, hidden] row-major, so streaming row blocks
    is the contiguous orientation; transposing outside the kernel would copy
    0.8 GB per step."""
    shape = x.shape
    n, k = w_t.shape
    x2d = x.reshape(-1, k)
    r = x2d.shape[0]
    bn = _block_n(k, n, w_t.dtype.itemsize, block_bytes or _TARGET_BLOCK_BYTES)

    out = pl.pallas_call(
        _t_kernel,
        grid=(cdiv(n, bn),),
        in_specs=[
            pl.BlockSpec((r, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * k * n,
            bytes_accessed=r * k * x.dtype.itemsize + k * n * w_t.dtype.itemsize
            + r * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(x2d, w_t)
    return out.reshape(*shape[:-1], n)


def _qkernel(x_ref, w_ref, scale_ref, out_ref):
    acc = jnp.dot(
        x_ref[:], w_ref[:].astype(x_ref.dtype), preferred_element_type=jnp.float32
    )
    out_ref[:] = (acc * scale_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def int8_gemv_pallas(
    x: jax.Array,  # [..., K] bf16/f32
    w_q: jax.Array,  # [K, N] int8
    scale: jax.Array,  # [N] fp32 per-output-channel
    block_bytes: int | None = None,
) -> jax.Array:
    """int8 weights-only gemv with the dequant fused in VMEM and the same
    large-block streaming as :func:`gemv_pallas` (the round-2 4 MB-block
    kernel measured 125 tok/s vs XLA's 177 on the full decode; block size,
    not the conversion, was the deficit)."""
    shape = x.shape
    k, n = w_q.shape
    x2d = x.reshape(-1, k)
    r = x2d.shape[0]
    bn = _block_n(k, n, 1, block_bytes or _TARGET_BLOCK_BYTES)

    out = pl.pallas_call(
        _qkernel,
        grid=(cdiv(n, bn),),
        in_specs=[
            pl.BlockSpec((r, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * k * n,
            bytes_accessed=r * k * x.dtype.itemsize + k * n + n * 4
            + r * n * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=use_interpret(),
    )(x2d, w_q, scale[None, :])
    return out.reshape(*shape[:-1], n)
