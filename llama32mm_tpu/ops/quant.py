"""Weights-only int8 quantization (serving extension — opt-in, off the
fp32-parity path; the reference has no quantization).

``quantize_weight`` produces symmetric per-output-channel int8 + fp32 scales;
``qlinear`` computes ``x @ dequant(w)`` via XLA's convert-into-dot fusion
(measured fastest on v5e — see the qlinear docstring), with the Pallas
dequant-in-VMEM kernel available by explicit request.
``quantize_llama_params`` rewrites the text-decoder linears of a param tree in
place; norms, embeddings, and the vision tower stay in the float dtype.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from llama32mm_tpu.ops.dispatch import resolve_impl, resolve_impl_prefer_xla


def quantize_weight(w: jax.Array) -> dict:
    """[in, out] float → {"q": int8 [in,out], "scale": fp32 [out]}."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0)  # per output channel
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale}


def quantize_weight_int4(w: jax.Array, group_size: int = 128) -> dict:
    """[in, out] float → {"q": int4 [in,out], "scale": fp32 [in/g, out]}.

    Symmetric round-to-nearest with per-(group, output-channel) scales —
    the standard 4-bit serving recipe (group_size=128). The int4 dtype packs
    two weights per byte in HBM on TPU, halving weight traffic again vs int8;
    groups run along the contraction (input) dim so each group's partial dot
    is rescaled once (see :func:`qlinear`)."""
    ci, co = w.shape[-2], w.shape[-1]
    if ci % group_size:
        raise ValueError(f"input dim {ci} not divisible by group_size {group_size}")
    ng = ci // group_size
    w32 = w.astype(jnp.float32).reshape(*w.shape[:-2], ng, group_size, co)
    absmax = jnp.max(jnp.abs(w32), axis=-2)  # [.., ng, out]
    scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
    q = jnp.clip(jnp.round(w32 / scale[..., None, :]), -7, 7).astype(jnp.int4)
    return {"q": q.reshape(w.shape), "scale": scale}


def _is_int4(qw: dict) -> bool:
    return jnp.asarray(qw["q"]).dtype == jnp.int4


def dequantize_weight(qw: dict, dtype=jnp.bfloat16) -> jax.Array:
    q, scale = qw["q"], qw["scale"]
    if _is_int4(qw):
        ng = scale.shape[-2]
        ci, co = q.shape[-2], q.shape[-1]
        w32 = q.astype(jnp.float32).reshape(*q.shape[:-2], ng, ci // ng, co)
        return (w32 * scale[..., None, :]).reshape(q.shape).astype(dtype)
    return (q.astype(jnp.float32) * scale).astype(dtype)


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and "q" in leaf and "scale" in leaf


def qlinear(x: jax.Array, qw: dict, impl: str = "auto") -> jax.Array:
    """``x @ dequant(qw)`` with the dequant fused into the matmul.

    int8 (per-output-channel scales): "auto" routes to XLA — its
    convert-into-dot fusion streams the int8 weights without materializing
    the bf16 copy and measured 177 tok/s vs 125 for the standalone Pallas
    kernel on the full int8 decode (v5e, 3B). Explicit impl="pallas" /
    LLAMA32MM_OPS_IMPL still force the kernel.

    int4 (per-group scales): blocked over the contraction dim — one batched
    convert-into-dot per group axis, partial sums rescaled by the group
    scale and reduced. Pure XLA; the int4 operand stays packed in HBM."""
    if _is_int4(qw):
        q, scale = qw["q"], qw["scale"]
        ci, co = q.shape
        ng = scale.shape[0]
        g = ci // ng
        xg = x.reshape(*x.shape[:-1], ng, g)
        qg = q.reshape(ng, g, co)
        # [..., ng, g] @ [ng, g, co] → [..., ng, co], batched over ng
        part = jnp.einsum("...ni,nio->...no", xg, qg.astype(x.dtype))
        out = jnp.einsum("...no,no->...o", part.astype(jnp.float32), scale)
        return out.astype(x.dtype)
    if resolve_impl_prefer_xla(impl) == "pallas":
        from llama32mm_tpu.ops.pallas.quant_matmul import int8_matmul_pallas

        return int8_matmul_pallas(x, qw["q"], qw["scale"])
    w = qw["q"].astype(x.dtype)
    return (jnp.matmul(x, w).astype(jnp.float32) * qw["scale"]).astype(x.dtype)


# stacked [L, ...] → per-layer quantization (lax.map: the fp32 intermediate
# is one layer, not the whole stack)
_quantize_stacked = jax.jit(lambda w: jax.lax.map(quantize_weight, w))
_quantize_stacked_donating = jax.jit(
    lambda w: jax.lax.map(quantize_weight, w), donate_argnums=(0,)
)

_QUANT_TARGET_PATHS = (
    ("att", "W_query", "weight"),
    ("att", "W_key", "weight"),
    ("att", "W_value", "weight"),
    ("att", "out_proj", "weight"),
    ("ff", "swiglu", "w_gate"),
    ("ff", "swiglu", "w_up"),
    ("ff", "w_down", "weight"),
    # serving-fused layout (models/fuse.py) — [L, H, tp, chunk]
    ("att", "W_qkv", "weight"),
    ("ff", "w_gateup", "weight"),
)


def quantize_llama_params(
    params: dict,
    quantize_lm_head: bool = True,
    free_originals: bool = False,
    bits: int = 8,
    group_size: int = 128,
) -> dict:
    """Quantize the stacked text-decoder linears of a VLM/causal-LM param tree.

    ``bits=8`` (default): each ``[L, in, out]`` stacked weight becomes
    ``{"q": int8 [L,in,out], "scale": fp32 [L,out]}`` (per-layer per-channel
    scales). ``bits=4``: int4 with per-(group, channel) scales
    ``[L, in/group_size, out]`` — half the weight HBM traffic again, lossier
    (quality table: docs/serving.md). Embeddings, norms, and the vision tower
    are untouched either way.

    Quantization runs layer-by-layer (``lax.map``) so the fp32 intermediate is
    one layer, not the whole stack. With ``free_originals=True`` each source
    bf16 buffer is donated to its quantization call and freed immediately —
    HBM never holds both full copies (needed to serve int8 on a chip the bf16
    weights barely fit; the caller's tree is invalidated).
    """
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    donate = free_originals and jax.default_backend() != "cpu"
    # module-level jitted fns so same-shaped leaves (W_query/out_proj,
    # w_gate/w_up) reuse one compiled executable
    if bits == 4:
        q1 = lambda w: quantize_weight_int4(w, group_size)  # noqa: E731
        q_leaf = jax.jit(
            lambda w: jax.lax.map(q1, w), donate_argnums=(0,) if donate else ()
        )
        head_q = q1
    else:
        q_leaf = _quantize_stacked_donating if donate else _quantize_stacked
        head_q = quantize_weight

    lm = params.get("language_model", params)
    blocks = lm["model"]["blocks"]

    def rewrite(node, path):
        out = {}
        for name, leaf in node.items():
            p = path + (name,)
            if isinstance(leaf, dict):
                out[name] = rewrite(leaf, p)
            elif p in _QUANT_TARGET_PATHS:
                if bits == 4 and p[-2] in ("W_qkv", "w_gateup"):
                    raise ValueError(
                        "int4 grouping runs along the contraction dim; the "
                        "serving-fused [L, H, tp, chunk] layout is not "
                        "supported — int4 serves the unfused layout only"
                    )
                out[name] = q_leaf(leaf)
            else:
                out[name] = leaf
        return out

    new_blocks = rewrite(blocks, ())
    new_model = {**lm["model"], "blocks": new_blocks}
    new_lm = {**lm, "model": new_model}

    if quantize_lm_head and lm.get("lm_head", {}).get("weight") is not None:
        new_lm = {**new_lm, "lm_head": {"weight": head_q(lm["lm_head"]["weight"])}}

    if "language_model" in params:
        return {**params, "language_model": new_lm}
    return new_lm
