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
    """[in, out] float → {"q4": uint8 [in/2, out], "scale": fp32 [in/g, out]}.

    Symmetric round-to-nearest with per-(group, output-channel) scales — the
    standard 4-bit serving recipe (group_size=128). Two weights pack into each
    byte, halving weight HBM traffic again vs int8. The packing is
    **split-half per group**: within group ``j`` (contraction rows
    ``j·g .. j·g+g-1``), packed byte row ``i`` holds original row ``j·g+i`` in
    the low nibble and row ``j·g+g/2+i`` in the high nibble (two's-complement
    nibbles). This layout lets the consumer compute the group partial-dot as
    two half-K matmuls against the nibble planes — no stride-2 interleave, so
    the unpack vectorizes cleanly in VMEM (``ops/pallas/quant_matmul.py``).

    Groups run along the contraction (input) dim so each group's partial dot
    is rescaled once (see :func:`qlinear`). Deliberately NOT ``jnp.int4``:
    the packed-uint8 format is backend-portable (S4 jit arguments crash the
    axon TPU runtime's layout negotiation) and its memory layout is explicit.
    """
    ci, co = w.shape[-2], w.shape[-1]
    if ci % group_size or group_size % 2:
        raise ValueError(
            f"input dim {ci} must be divisible by even group_size {group_size}"
        )
    ng = ci // group_size
    g2 = group_size // 2
    w32 = w.astype(jnp.float32).reshape(*w.shape[:-2], ng, group_size, co)
    absmax = jnp.max(jnp.abs(w32), axis=-2)  # [.., ng, out]
    scale = jnp.where(absmax > 0, absmax / 7.0, 1.0)
    # Offset encoding: nibble u = q+8 ∈ [1, 15]. The consumer then unpacks
    # with just AND/SHR (no sign-extension arithmetic) and removes the +8
    # analytically: dot(x, u-8) = dot(x, u) - 8·rowsum(x).
    u = jnp.clip(jnp.round(w32 / scale[..., None, :]), -7, 7).astype(jnp.int32) + 8
    packed = (u[..., :g2, :] | (u[..., g2:, :] << 4)).astype(jnp.uint8)
    return {"q4": packed.reshape(*w.shape[:-2], ci // 2, co), "scale": scale}


def _is_int4(qw: dict) -> bool:
    return "q4" in qw


def unpack_int4(q4: jax.Array, ng: int) -> jax.Array:
    """Packed [.., in/2, out] uint8 → int32 nibble values [.., in, out],
    undoing the split-half-per-group layout (ng groups along the packed dim)."""
    half, co = q4.shape[-2], q4.shape[-1]
    g2 = half // ng
    b = q4.astype(jnp.int32).reshape(*q4.shape[:-2], ng, g2, co)
    lo = (b & 0xF) - 8
    hi = (b >> 4) - 8
    vals = jnp.concatenate([lo, hi], axis=-2)  # [.., ng, g, out]
    return vals.reshape(*q4.shape[:-2], 2 * half, co)


def dequantize_weight(qw: dict, dtype=jnp.bfloat16) -> jax.Array:
    if _is_int4(qw):
        q4, scale = qw["q4"], qw["scale"]
        ng = scale.shape[-2]
        ci, co = 2 * q4.shape[-2], q4.shape[-1]
        vals = unpack_int4(q4, ng).reshape(*q4.shape[:-2], ng, ci // ng, co)
        w32 = vals.astype(jnp.float32) * scale[..., None, :]
        return w32.reshape(*q4.shape[:-2], ci, co).astype(dtype)
    q, scale = qw["q"], qw["scale"]
    if q.ndim == scale.ndim + 1:  # stacked [L, in, out] with scales [L, out]
        scale = scale[..., None, :]
    return (q.astype(jnp.float32) * scale).astype(dtype)


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and ("q" in leaf or "q4" in leaf) and "scale" in leaf


def qlinear(x: jax.Array, qw: dict, impl: str = "auto") -> jax.Array:
    """``x @ dequant(qw)`` with the dequant fused into the matmul.

    int8 (per-output-channel scales): "auto" routes to XLA — its
    convert-into-dot fusion streams the int8 weights without materializing
    the bf16 copy and measured 177 tok/s vs 125 for the standalone Pallas
    kernel on the full int8 decode (v5e, 3B). Explicit impl="pallas" /
    LLAMA32MM_OPS_IMPL still force the kernel.

    int4 (packed nibbles, per-group scales): "auto" routes to the Pallas
    kernel on TPU — it unpacks the nibble planes *inside VMEM* so only the
    packed bytes stream from HBM (an XLA unpack would materialize the bf16
    copy and forfeit the 2× win over int8). The XLA fallback (CPU / explicit
    impl="xla") computes the same split-half math unfused."""
    if _is_int4(qw):
        import math

        q4, scale = qw["q4"], qw["scale"]
        ng = scale.shape[0]
        rows = math.prod(x.shape[:-1])
        # The VMEM-unpack kernel exists for the bandwidth-bound decode gemv
        # (few rows, weights dominate HBM). At prefill/matmul row counts the
        # op is compute-bound, the packed-streaming win is irrelevant, and
        # the kernel's fp32 [rows, out] result can blow the 16 MB scoped-VMEM
        # budget when XLA places it there — route those through XLA.
        if resolve_impl(impl) == "pallas" and rows <= 64:
            from llama32mm_tpu.ops.pallas.quant_matmul import int4_matmul_pallas

            return int4_matmul_pallas(x, q4, scale)
        if rows > 64:
            # Prefill/matmul rows: dequantize the weight once (one transient
            # bf16 copy, ~weight-sized) and run a plain matmul. The grouped
            # einsum below would materialize a [rows, ng, out] fp32 partial
            # PER LAYER (gigabytes at 11B prefill — measured to triple TTFT).
            return jnp.matmul(x, dequantize_weight(qw, x.dtype))
        ci, co = 2 * q4.shape[0], q4.shape[1]
        g = ci // ng
        xg = x.reshape(*x.shape[:-1], ng, g)
        vals = unpack_int4(q4, ng).reshape(ng, g, co).astype(x.dtype)
        # [..., ng, g] @ [ng, g, co] → [..., ng, co], batched over ng
        part = jnp.einsum("...ni,nio->...no", xg, vals)
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

# The standard int4 capacity recipe (docs/serving.md): gate/up + lm_head —
# ~2/3 of decoder weight bytes — at int4; the error-sensitive attention
# projections and w_down (whose error the residual stream accumulates
# directly) stay int8. Measured quality: scripts/bench_int4_quality.py.
INT4_MIXED_RECIPE = {
    "w_gate": 4,
    "w_up": 4,
    "lm_head": 4,
    "W_query": 8,
    "W_key": 8,
    "W_value": 8,
    "out_proj": 8,
    "w_down": 8,
}

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
    recipe: Optional[dict] = None,
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

    ``recipe``: mixed-precision override — maps a weight name (``"W_query"``,
    ``"W_key"``, ``"W_value"``, ``"out_proj"``, ``"w_gate"``, ``"w_up"``,
    ``"w_down"``, ``"lm_head"``) to its bits (4 or 8), taking precedence over
    ``bits`` for that weight. The standard capacity recipe keeps the
    error-sensitive attention + down projections int8 and puts the fat
    gate/up (+ head) at int4 — see ``INT4_MIXED_RECIPE``.
    """
    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    if recipe:
        bad = set(recipe.values()) - {4, 8}
        if bad:
            raise ValueError(f"recipe bits must be 4 or 8, got {sorted(bad)}")
    donate = free_originals and jax.default_backend() != "cpu"

    # module-level jitted fns so same-shaped leaves (W_query/out_proj,
    # w_gate/w_up) reuse one compiled executable
    q1_int4 = lambda w: quantize_weight_int4(w, group_size)  # noqa: E731
    q_leaf4 = jax.jit(
        lambda w: jax.lax.map(q1_int4, w), donate_argnums=(0,) if donate else ()
    )
    q_leaf8 = _quantize_stacked_donating if donate else _quantize_stacked

    def bits_for(name: str) -> int:
        if recipe and name in recipe:
            return recipe[name]
        return bits

    lm = params.get("language_model", params)
    blocks = lm["model"]["blocks"]

    def rewrite(node, path):
        out = {}
        for name, leaf in node.items():
            p = path + (name,)
            if isinstance(leaf, dict):
                out[name] = rewrite(leaf, p)
            elif p in _QUANT_TARGET_PATHS:
                wname = p[-1] if p[-1] != "weight" else p[-2]
                b = bits_for(wname)
                if b == 4 and p[-2] in ("W_qkv", "w_gateup"):
                    raise ValueError(
                        "int4 grouping runs along the contraction dim; the "
                        "serving-fused [L, H, tp, chunk] layout is not "
                        "supported — int4 serves the unfused layout only"
                    )
                out[name] = (q_leaf4 if b == 4 else q_leaf8)(leaf)
            else:
                out[name] = leaf
        return out

    new_blocks = rewrite(blocks, ())
    new_model = {**lm["model"], "blocks": new_blocks}
    new_lm = {**lm, "model": new_model}

    if quantize_lm_head and lm.get("lm_head", {}).get("weight") is not None:
        head_q = q1_int4 if bits_for("lm_head") == 4 else quantize_weight
        new_lm = {**new_lm, "lm_head": {"weight": head_q(lm["lm_head"]["weight"])}}

    if "language_model" in params:
        return {**params, "language_model": new_lm}
    return new_lm
