"""Blockwise flash-style GQA attention Pallas TPU kernel.

The reference materializes the full ``[Tq, Tk]`` score matrix per head
(``Model/model.py:249-253``); this kernel streams K/V blocks through VMEM with
an online softmax, so attention memory is O(Tq·hd) regardless of context
length (SURVEY §5 'Long-context').

Mask handling is **structured** rather than dense: a per-key validity row
``kv_valid [B, Tk]`` (prompt padding + cache-tail bounds) plus a scalar
``q_offset`` (absolute position of query row 0) from which causal block masks
are built with iota — a dense ``[B, Tq, Tk]`` additive mask would cost more
HBM reads than the attention FLOPs themselves at the bench shapes (each of the
``n_heads`` grid rows would re-stream it).

Numerics match the reference's mask-then-scale softmax
``softmax((s + mask)/√d)`` (SURVEY §2.9 #3): allowed logits are ``s/√d``;
blocked positions get probability exactly 0 (the reference's ``-inf`` /
``finfo.min`` terms both underflow to 0 through exp in fp32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama32mm_tpu.ops.pallas.common import cdiv, round_up, use_interpret

_NEG_BIG = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(
    qoff_ref,  # SMEM [1, 1] int32: absolute position of query row 0
    q_ref,  # [1, BQ, hd]
    k_ref,  # [1, BK, hd]
    v_ref,  # [1, BK, hd]
    kvv_ref,  # [1, 1, BK] int32 key-slot validity (3D: Mosaic needs the
    #           second-to-last block dim to equal the array dim or be 8-aligned)
    ks_ref,  # [1, 1, BK] f32 per-position key scales (int8-KV mode)
    vs_ref,  # [1, 1, BK] f32 per-position value scales
    o_ref,  # [1, BQ, hd]
    m_scr,  # VMEM [BQ, 1] f32
    l_scr,  # VMEM [BQ, 1] f32
    acc_scr,  # VMEM [BQ, hd] f32
    *,
    inv_sqrt_d: float,
    bq: int,
    bk: int,
    tk: int,
    causal: bool,
    scaled_kv: bool,
):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_BIG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # All grid/ref reads happen OUTSIDE pl.when bodies (program_id cannot be
    # lowered inside a cond in interpret mode).
    iq = pl.program_id(1)
    k_pos = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    if causal:
        qoff = qoff_ref[0, 0]
        q_pos = qoff + iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        # Causal block skipping: a KV block whose first key position exceeds
        # the last query position of this Q block is fully masked — skip its
        # matmuls entirely (≈2× fewer FLOPs for causal prefill).
        relevant = (ik * bk) <= (qoff + (iq + 1) * bq - 1)
    else:
        q_pos = None
        relevant = True

    @pl.when(relevant)
    def _():
        q = q_ref[0]
        k = k_ref[0].astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        if scaled_kv:
            # int8-KV: per-position key scale commutes out of the dot
            # (ops/attention.py) — applied before masking.
            s = s * ks_ref[0, 0][None, :]

        allowed = (kvv_ref[0, 0] != 0)[None, :]  # [1, BK]
        # Bound the ragged last KV block: beyond Tk both k/v and kv_valid
        # blocks hold padding garbage, so mask by absolute key position.
        allowed = allowed & (k_pos < tk)
        if causal:
            allowed = allowed & (k_pos <= q_pos)

        logits = jnp.where(allowed, s * inv_sqrt_d, _NEG_BIG)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new) * allowed.astype(jnp.float32)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[:] = m_new
        if scaled_kv:
            # fold the per-position value scale into the attention weights;
            # re-mask because the ragged last block's scale slots are
            # padding garbage (NaN-filled in interpret mode: 0·NaN = NaN)
            p = jnp.where(allowed, p * vs_ref[0, 0][None, :], 0.0)
        # zero padded V rows: p is 0 there, but 0·NaN = NaN through the dot
        v = v_ref[0].astype(q.dtype)
        v_row_valid = (ik * bk + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)) < tk
        v = jnp.where(v_row_valid, v, 0)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == pl.num_programs(2) - 1)
    def _():
        l = l_scr[:]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def flash_gqa_attention(
    q: jax.Array,  # [B, nq, Tq, hd]
    k: jax.Array,  # [B, nkv, Tk, hd] — float, or int8 with scales given
    v: jax.Array,  # [B, nkv, Tk, hd]
    kv_valid: jax.Array,  # [B, Tk] (bool/int) — key-slot validity
    q_offset,  # scalar int32 — absolute position of query row 0
    causal: bool = True,
    block_q: int = 512,
    block_k: int = 1024,
    k_scale: jax.Array = None,  # [B, nkv, Tk] fp32 (int8-KV serving mode)
    v_scale: jax.Array = None,
) -> jax.Array:
    if (k_scale is None) != (v_scale is None):
        raise ValueError("k_scale and v_scale must be given together (int8-KV mode)")
    b, nq, tq, hd = q.shape
    nkv, tk = k.shape[1], k.shape[2]
    group = nq // nkv
    scaled_kv = k_scale is not None

    bq = min(block_q, round_up(tq, 8))
    bk = min(block_k, round_up(tk, 128))
    grid = (b * nq, cdiv(tq, bq), cdiv(tk, bk))

    q3 = q.reshape(b * nq, tq, hd)
    k3 = k.reshape(b * nkv, tk, hd)
    v3 = v.reshape(b * nkv, tk, hd)
    # validity/scale rows carry a singleton middle axis so their blocks are
    # (1, 1, bk) — Mosaic requires the second-to-last block dim to equal the
    # array dim (here 1) or be 8-aligned; a 2D (1, bk) block over a >1-row
    # array fails TPU lowering.
    kvv = kv_valid.astype(jnp.int32)[:, None, :]
    qoff = jnp.asarray(q_offset, jnp.int32).reshape(1, 1)
    if scaled_kv:
        ks2 = k_scale.astype(jnp.float32).reshape(b * nkv, 1, tk)
        vs2 = v_scale.astype(jnp.float32).reshape(b * nkv, 1, tk)
    else:
        # 1-row dummies; the kernel never reads them (scaled_kv is static)
        ks2 = jnp.ones((1, 1, 128), jnp.float32)
        vs2 = ks2

    def kv_head_ix(bh, iq, ik):
        return ((bh // (nkv * group)) * nkv + (bh % (nkv * group)) // group, ik, 0)

    def scale_ix(bh, iq, ik):
        if scaled_kv:
            h, _ik, _ = kv_head_ix(bh, iq, ik)
            return (h, 0, _ik)
        return (0, 0, 0)

    scale_bk = bk if scaled_kv else 128

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, inv_sqrt_d=1.0 / (hd**0.5), bq=bq, bk=bk, tk=tk,
            causal=causal, scaled_kv=scaled_kv,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda bh, iq, ik: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, hd), lambda bh, iq, ik: (bh, iq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), kv_head_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), kv_head_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, bk),
                lambda bh, iq, ik: (bh // (nkv * group), 0, ik),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, scale_bk), scale_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, scale_bk), scale_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, hd), lambda bh, iq, ik: (bh, iq, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * nq, tq, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * nq * tq * tk * hd,
            bytes_accessed=(
                2 * b * nq * tq * hd * q.dtype.itemsize  # q in, o out
                + 2 * b * nkv * tk * hd * k.dtype.itemsize  # k, v (int8-aware)
                + (2 * b * nkv * tk * 4 if scaled_kv else 0)  # fp32 scales
            ),
            transcendentals=b * nq * tq * tk,
        ),
        interpret=use_interpret(),
    )(qoff, q3, k3, v3, kvv, ks2, vs2)
    return out.reshape(b, nq, tq, hd)
