"""Fused SwiGLU Pallas TPU kernels with custom VJP.

TPU-native equivalent of the reference CUDA kernels
(``Tools/swiglu/swiglu.cu``):

- forward replaces ``swiglu_forward_kernel`` (swiglu.cu:58-100, one thread per
  output element doing serial dot products) with MXU-tiled matmuls: a
  ``(M, N, K)`` grid accumulates both the gate and up projections for a
  ``[BM, BN]`` tile in fp32 VMEM scratch, then applies ``silu(gate) * up`` on
  the VPU — the intermediate activations never round-trip HBM. K-dim tiling
  keeps the weight panels inside the ~16 MB VMEM budget at bf16.
- backward implements the gradient math of ``swiglu_backward_kernel``
  (swiglu.cu:179-223): ``d_gate = silu'(gate)·(g·up)``, ``d_up = g·silu(gate)``
  — completing the backward the reference binds but never defines (SURVEY
  §2.9 #11). gate/up are recomputed blockwise; the final ``dx``/``dw``
  contractions are large dense matmuls left to XLA's MXU codegen.
- ``swiglu_down_pallas`` replaces ``swiglu_down_forward_kernel``
  (swiglu.cu:229-272, O(hidden·inter) work per thread): the full FFN
  ``(silu(x@wg)·(x@wu)) @ w_down`` accumulated over intermediate-dim tiles,
  for single-block decode rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama32mm_tpu.ops.pallas.common import cdiv, round_up, use_interpret


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _silu_grad(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _pick_tiles(r, h, i):
    bm = min(512, round_up(r, 8))
    bn = min(512, round_up(i, 128))
    bh = min(512, round_up(h, 128))
    return bm, bn, bh


def _masked_xw(x_ref, w_ref, kh, bh, h, ragged):
    """Partial [BM, BN] product of the kh-th K block, zeroing ragged-K padding
    on both sides (0·NaN = NaN, so one-sided masking is not enough)."""
    x = x_ref[:]
    w = w_ref[:]
    if ragged:
        col = kh * bh + jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        x = jnp.where(col < h, x, 0)
        row = kh * bh + jax.lax.broadcasted_iota(jnp.int32, w.shape, 0)
        w = jnp.where(row < h, w, 0)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, wg_ref, wu_ref, out_ref, gate_acc, up_acc, *, bh, h, ragged):
    kh = pl.program_id(2)

    @pl.when(kh == 0)
    def _():
        gate_acc[:] = jnp.zeros_like(gate_acc)
        up_acc[:] = jnp.zeros_like(up_acc)

    gate_acc[:] += _masked_xw(x_ref, wg_ref, kh, bh, h, ragged)
    up_acc[:] += _masked_xw(x_ref, wu_ref, kh, bh, h, ragged)

    @pl.when(kh == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = (_silu(gate_acc[:]) * up_acc[:]).astype(out_ref.dtype)


def _swiglu_grid_call(kernel_factory, x2d, w_gate, w_up, extra_inputs, out_shapes, n_scratch):
    r, h = x2d.shape
    i = w_gate.shape[1]
    bm, bn, bh = _pick_tiles(r, h, i)
    ragged = h % bh != 0
    grid = (cdiv(r, bm), cdiv(i, bn), cdiv(h, bh))

    x_spec = pl.BlockSpec((bm, bh), lambda im, ib, kh: (im, kh), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((bh, bn), lambda im, ib, kh: (kh, ib), memory_space=pltpu.VMEM)
    io_spec = pl.BlockSpec((bm, bn), lambda im, ib, kh: (im, ib), memory_space=pltpu.VMEM)

    kernel = kernel_factory(bh=bh, h=h, ragged=ragged)
    n_extra = len(extra_inputs)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[x_spec, w_spec, w_spec] + [io_spec] * n_extra,
        out_specs=[io_spec] * len(out_shapes) if len(out_shapes) > 1 else io_spec,
        out_shape=out_shapes if len(out_shapes) > 1 else out_shapes[0],
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)] * n_scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * r * h * i,
            bytes_accessed=(r * h + 2 * h * i + r * i) * x2d.dtype.itemsize,
            transcendentals=r * i,
        ),
        interpret=use_interpret(),
    )(x2d, w_gate, w_up, *extra_inputs)


def _swiglu_fwd_call(x2d, w_gate, w_up):
    r = x2d.shape[0]
    i = w_gate.shape[1]
    return _swiglu_grid_call(
        lambda **kw: functools.partial(_fwd_kernel, **kw),
        x2d,
        w_gate,
        w_up,
        extra_inputs=(),
        out_shapes=[jax.ShapeDtypeStruct((r, i), x2d.dtype)],
        n_scratch=2,
    )


# ---------------------------------------------------------------------------
# Backward: recompute gate/up, emit d_gate/d_up
# ---------------------------------------------------------------------------


def _bwd_kernel(x_ref, wg_ref, wu_ref, g_ref, dgate_ref, dup_ref, gate_acc, up_acc,
                *, bh, h, ragged):
    kh = pl.program_id(2)

    @pl.when(kh == 0)
    def _():
        gate_acc[:] = jnp.zeros_like(gate_acc)
        up_acc[:] = jnp.zeros_like(up_acc)

    gate_acc[:] += _masked_xw(x_ref, wg_ref, kh, bh, h, ragged)
    up_acc[:] += _masked_xw(x_ref, wu_ref, kh, bh, h, ragged)

    @pl.when(kh == pl.num_programs(2) - 1)
    def _():
        g = g_ref[:].astype(jnp.float32)
        gate, up = gate_acc[:], up_acc[:]
        dgate_ref[:] = (_silu_grad(gate) * g * up).astype(dgate_ref.dtype)
        dup_ref[:] = (g * _silu(gate)).astype(dup_ref.dtype)


def _swiglu_bwd_call(x2d, w_gate, w_up, g2d):
    r = x2d.shape[0]
    i = w_gate.shape[1]
    return _swiglu_grid_call(
        lambda **kw: functools.partial(_bwd_kernel, **kw),
        x2d,
        w_gate,
        w_up,
        extra_inputs=(g2d,),
        out_shapes=[
            jax.ShapeDtypeStruct((r, i), x2d.dtype),
            jax.ShapeDtypeStruct((r, i), x2d.dtype),
        ],
        n_scratch=2,
    )


@jax.custom_vjp
def _fused_swiglu_p(x2d, w_gate, w_up):
    return _swiglu_fwd_call(x2d, w_gate, w_up)


def _vjp_fwd(x2d, w_gate, w_up):
    return _swiglu_fwd_call(x2d, w_gate, w_up), (x2d, w_gate, w_up)


def _vjp_bwd(saved, g):
    x2d, w_gate, w_up = saved
    dgate, dup = _swiglu_bwd_call(x2d, w_gate, w_up, g)
    # Large dense contractions → XLA MXU.
    dx = jnp.dot(dgate, w_gate.T) + jnp.dot(dup, w_up.T)
    dwg = jnp.dot(x2d.T, dgate).astype(w_gate.dtype)
    dwu = jnp.dot(x2d.T, dup).astype(w_up.dtype)
    return dx.astype(x2d.dtype), dwg, dwu


_fused_swiglu_p.defvjp(_vjp_fwd, _vjp_bwd)


def fused_swiglu_pallas(x, w_gate, w_up, b_gate=None, b_up=None):
    """``silu(x @ w_gate) * (x @ w_up)`` — Pallas path. Biased variants (only
    reachable via non-LLaMA configs) compose the bias through the XLA path."""
    if b_gate is not None or b_up is not None:
        gate = jnp.matmul(x, w_gate)
        up = jnp.matmul(x, w_up)
        if b_gate is not None:
            gate = gate + b_gate
        if b_up is not None:
            up = up + b_up
        return _silu(gate.astype(jnp.float32)).astype(x.dtype) * up
    shape = x.shape
    x2d = x.reshape(-1, shape[-1])
    out = _fused_swiglu_p(x2d, w_gate, w_up)
    return out.reshape(*shape[:-1], w_gate.shape[1])


# ---------------------------------------------------------------------------
# Full-FFN mega-fusion (inference): (silu(x@wg)·(x@wu)) @ w_down
# ---------------------------------------------------------------------------


def _down_kernel(x_ref, wg_ref, wu_ref, wd_ref, out_ref, acc_ref, *, n_inter, bk):
    ik = pl.program_id(1)

    @pl.when(ik == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    gate = jnp.dot(x, wg_ref[:], preferred_element_type=jnp.float32)
    up = jnp.dot(x, wu_ref[:], preferred_element_type=jnp.float32)
    inter = _silu(gate) * up
    # Zero both sides of the ragged last K block (0·NaN = NaN).
    col_ids = jax.lax.broadcasted_iota(jnp.int32, inter.shape, 1) + ik * bk
    inter = jnp.where(col_ids < n_inter, inter, 0.0).astype(x.dtype)
    wd = wd_ref[:]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, wd.shape, 0) + ik * bk
    wd = jnp.where(row_ids < n_inter, wd, 0.0)
    acc_ref[:] += jnp.dot(inter, wd, preferred_element_type=jnp.float32)

    @pl.when(ik == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def swiglu_down_pallas(x, w_gate, w_up, w_down, b_gate=None, b_up=None):
    """Decode-oriented full-FFN fusion; rows are expected to be few (the decode
    batch), so x stays resident while intermediate tiles stream through."""
    if b_gate is not None or b_up is not None:
        return jnp.matmul(fused_swiglu_pallas(x, w_gate, w_up, b_gate, b_up), w_down)
    shape = x.shape
    h = shape[-1]
    x2d = x.reshape(-1, h)
    r = x2d.shape[0]
    i = w_gate.shape[1]
    h_out = w_down.shape[1]
    bm = min(64, round_up(r, 8))
    bk = min(256, round_up(i, 128))
    grid = (cdiv(r, bm), cdiv(i, bk))
    out = pl.pallas_call(
        functools.partial(_down_kernel, n_inter=i, bk=bk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, h), lambda im, ik: (im, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, bk), lambda im, ik: (0, ik), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, bk), lambda im, ik: (0, ik), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, h_out), lambda im, ik: (ik, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, h_out), lambda im, ik: (im, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, h_out), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((bm, h_out), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=use_interpret(),
    )(x2d, w_gate, w_up, w_down)
    return out.reshape(*shape[:-1], h_out)
