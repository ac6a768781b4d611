"""Fused Add-RMSNorm Pallas TPU kernel with custom VJP.

TPU-native equivalent of the reference CUDA kernels:

- forward mirrors ``kernels::rmsnorm_kernel_fused`` (rmsnorm.cuh:13-108): one
  pass computes ``t = x + residual`` (the updated residual highway is also
  emitted, like the CUDA kernel's in-place HBM write-back), an **fp32**
  sum-of-squares reduction (fp32 accumulators per rmsnorm.cuh:36,60),
  ``rms = sqrt(mean + eps)``, and ``out = t/rms * weight``; per-row fp32
  ``rms`` is emitted for the backward (rmsnorm.cuh "OUTPUT_RMS").
- backward mirrors ``rmsnorm_backward_kernel`` (rmsnorm.cuh:110-154):
  ``dt = (g·w − t·(Σ g·w·t)/(C·rms²))/rms``, ``dw = Σ_rows g·t/rms`` — but
  treats (x, residual) gradients symmetrically on the *summed* input (the CUDA
  path differentiates against pre-add x, SURVEY §2.9 #13) and drops the CUDA
  backward's extra ``+1e-6`` on rms (SURVEY §2.9 #16): this is the exact VJP.

Instead of one-block-per-row warp shuffles, rows are tiled ``(block_rows, C)``
into VMEM and reduced on the VPU; ``dw`` accumulates across sequential grid
steps into a single output block (TPU grids execute in order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama32mm_tpu.ops.pallas.common import cdiv, use_interpret

_VMEM_BUDGET = 8 * 1024 * 1024  # bytes of VMEM we aim to use for the row tile


def _pick_block_rows(n_rows: int, n_cols: int, bytes_per_el: int = 4) -> int:
    # 4 live [BR, C] fp32 tiles (x, res, t, out) per step.
    per_row = 4 * n_cols * bytes_per_el
    br = max(8, _VMEM_BUDGET // per_row)
    br = min(br, 512, n_rows)
    return max(8, (br // 8) * 8)


def _fwd_kernel(x_ref, res_ref, w_ref, out_ref, t_ref, rms_ref, *, eps):
    t = x_ref[:].astype(jnp.float32) + res_ref[:].astype(jnp.float32)
    ms = jnp.mean(t * t, axis=-1, keepdims=True)
    rms = jnp.sqrt(ms + eps)
    inv = 1.0 / rms
    w = w_ref[:].astype(jnp.float32)
    out_ref[:] = (t * inv * w).astype(out_ref.dtype)
    t_ref[:] = t.astype(t_ref.dtype)
    rms_ref[:] = rms


def _fwd_only_kernel(x_ref, res_ref, w_ref, out_ref, *, eps):
    t = x_ref[:].astype(jnp.float32) + res_ref[:].astype(jnp.float32)
    ms = jnp.mean(t * t, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(ms + eps)
    out_ref[:] = (t * inv * w_ref[:].astype(jnp.float32)).astype(out_ref.dtype)


def _bwd_kernel(g_ref, t_ref, w_ref, rms_ref, dt_ref, dw_ref, *, n_rows, block_rows, n_cols):
    g = g_ref[:].astype(jnp.float32)
    t = t_ref[:].astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)
    inv = 1.0 / rms_ref[:]  # [BR, 1]
    gw = g * w
    dot = jnp.sum(gw * t, axis=-1, keepdims=True)
    dt = inv * (gw - t * (dot * inv * inv / n_cols))
    dt_ref[:] = dt.astype(dt_ref.dtype)

    # mask rows beyond the logical array edge in the last (padded) block
    i = pl.program_id(0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0) + i * block_rows
    valid = row_ids < n_rows
    contrib = jnp.sum(jnp.where(valid, g * t * inv, 0.0), axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dw_ref[:] += contrib


def _rmsnorm_fwd_call(x2d, w2d, res2d, eps):
    r, c = x2d.shape
    br = _pick_block_rows(r, c)
    grid = (cdiv(r, br),)
    row_spec = pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out, t, rms = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[row_spec, row_spec, w_spec],
        out_specs=[
            row_spec,
            row_spec,
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), x2d.dtype),
            jax.ShapeDtypeStruct((r, c), x2d.dtype),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ],
        interpret=use_interpret(),
    )(x2d, res2d, w2d)
    return out, t, rms


def _rmsnorm_fwd_only_call(x2d, w2d, res2d, eps):
    """Inference forward: emits only `out` (no saved t/rms) — this op is pure
    HBM bandwidth, so the two extra output streams of the VJP variant would
    cost ~50% more traffic."""
    r, c = x2d.shape
    br = _pick_block_rows(r, c)
    grid = (cdiv(r, br),)
    row_spec = pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_only_kernel, eps=eps),
        grid=grid,
        in_specs=[row_spec, row_spec, w_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((r, c), x2d.dtype),
        interpret=use_interpret(),
    )(x2d, res2d, w2d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_add_rmsnorm_p(x2d, weight, res2d, eps):
    # Primal (no-grad) path: forward-only kernel. Under jax.grad the VJP pair
    # below replaces this.
    return _rmsnorm_fwd_only_call(x2d, weight[None, :], res2d, eps)


def _vjp_fwd(x2d, weight, res2d, eps):
    out, t, rms = _rmsnorm_fwd_call(x2d, weight[None, :], res2d, eps)
    return out, (t, weight, rms)


def _vjp_bwd(eps, saved, g):
    t, weight, rms = saved
    r, c = t.shape
    br = _pick_block_rows(r, c)
    grid = (cdiv(r, br),)
    row_spec = pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dt, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, n_rows=r, block_rows=br, n_cols=c),
        grid=grid,
        in_specs=[
            row_spec,
            row_spec,
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            row_spec,
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), t.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        interpret=use_interpret(),
    )(g, t, weight[None, :], rms)
    # (x, residual) gradients are symmetric through t = x + residual.
    return dt, dw[0].astype(weight.dtype), dt


_fused_add_rmsnorm_p.defvjp(_vjp_fwd, _vjp_bwd)


def fused_add_rmsnorm_pallas(x, weight, residual, eps: float):
    """``rmsnorm(x + residual) * weight`` — Pallas path.

    x/residual: ``[..., C]``; weight: ``[C]``. Returns ``[..., C]`` in x.dtype.
    """
    shape = x.shape
    c = shape[-1]
    x2d = x.reshape(-1, c)
    res2d = residual.reshape(-1, c)
    out = _fused_add_rmsnorm_p(x2d, weight, res2d, float(eps))
    return out.reshape(shape)
