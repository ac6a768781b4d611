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


def dequantize_weight(qw: dict, dtype=jnp.bfloat16) -> jax.Array:
    return (qw["q"].astype(jnp.float32) * qw["scale"]).astype(dtype)


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and "q" in leaf and "scale" in leaf


def qlinear(x: jax.Array, qw: dict, impl: str = "auto") -> jax.Array:
    """``x @ dequant(qw)`` with the dequant fused into the matmul.

    "auto" routes to XLA: its convert-into-dot fusion streams the int8
    weights without materializing the bf16 copy and measured 177 tok/s vs
    125 for the standalone Pallas kernel on the full int8 decode (v5e, 3B).
    Explicit impl="pallas" / LLAMA32MM_OPS_IMPL still force the kernel."""
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
    params: dict, quantize_lm_head: bool = True, free_originals: bool = False
) -> dict:
    """Quantize the stacked text-decoder linears of a VLM/causal-LM param tree.

    Each ``[L, in, out]`` stacked weight becomes ``{"q": int8 [L,in,out],
    "scale": fp32 [L,out]}`` (per-layer per-channel scales). Embeddings,
    norms, and the vision tower are untouched.

    Quantization runs layer-by-layer (``lax.map``) so the fp32 intermediate is
    one layer, not the whole stack. With ``free_originals=True`` each source
    bf16 buffer is donated to its quantization call and freed immediately —
    HBM never holds both full copies (needed to serve int8 on a chip the bf16
    weights barely fit; the caller's tree is invalidated).
    """
    donate = free_originals and jax.default_backend() != "cpu"
    # module-level jitted fns so same-shaped leaves (W_query/out_proj,
    # w_gate/w_up) reuse one compiled executable
    q_leaf = _quantize_stacked_donating if donate else _quantize_stacked

    lm = params.get("language_model", params)
    blocks = lm["model"]["blocks"]

    def rewrite(node, path):
        out = {}
        for name, leaf in node.items():
            p = path + (name,)
            if isinstance(leaf, dict):
                out[name] = rewrite(leaf, p)
            elif p in _QUANT_TARGET_PATHS:
                out[name] = q_leaf(leaf)
            else:
                out[name] = leaf
        return out

    new_blocks = rewrite(blocks, ())
    new_model = {**lm["model"], "blocks": new_blocks}
    new_lm = {**lm, "model": new_model}

    if quantize_lm_head and lm.get("lm_head", {}).get("weight") is not None:
        new_lm = {**new_lm, "lm_head": {"weight": quantize_weight(lm["lm_head"]["weight"])}}

    if "language_model" in params:
        return {**params, "language_model": new_lm}
    return new_lm
