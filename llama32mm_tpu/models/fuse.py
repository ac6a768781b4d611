"""Serving-time projection fusion: QKV and gate/up as single matmuls.

The reference issues three separate attention projections and two FFN
projections per layer (``Model/model.py:238-241``, ``FusedSwiglu.py:17-20``).
At decode each projection is a weight-streaming gemv whose fixed cost (DMA
ramp, kernel launch) is material; fusing them into one wider matmul cuts the
per-layer op count from 7 linears to 4 and gives the MXU/DMA pipeline larger
contiguous reads. Numerics are exactly preserved: each output column is an
independent dot product, so ``x @ [A | B]`` equals ``[x @ A | x @ B]``
bit-for-bit.

Tensor-parallel layout: fused weights are stored ``[L, H, tp, chunk]`` where
``chunk`` stacks this shard's columns (``q_s | k_s | v_s`` resp.
``gate_s | up_s``). Sharding ``P(None, None, "tp", None)`` then puts every
shard exactly its own heads/channels with q/k/v head order left natural (no
permutation needed because per-shard head ranges are contiguous and the GQA
group mapping ``q_head i → kv_head i // group`` is shard-local for any tp
dividing both head counts).

Fusion is a pure param-tree transform applied explicitly by the caller
(``params = fuse_decoder_params(params, cfg.text_config, tp=...)``, before
``shard_params`` for multi-chip serving — rebind so the unfused decoder
weights free); the unfused tree remains the checkpoint/training format, and
``language.py`` dispatches on the presence of ``W_qkv`` / ``w_gateup`` in
the block params. Measured on one v5e chip the fusion is throughput-neutral
(XLA already schedules the separate gemvs at bandwidth — see
``scripts/bench_fuse_ab.py``); its value is the TP-serving layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from llama32mm_tpu.configs import LLAMA32Config
from llama32mm_tpu.ops.quant import is_quantized


def _split_cols(w, tp):
    """[L, H, O] → [L, H, tp, O // tp] (column range of shard s at index s)."""
    l, h, o = w.shape
    return w.reshape(l, h, tp, o // tp)


def _fuse(parts, tp):
    """Concat per-shard column blocks of several [L, H, O_i] weights into
    [L, H, tp, Σ O_i // tp]."""
    return jnp.concatenate([_split_cols(p, tp) for p in parts], axis=-1)


def _fuse_maybe_quantized(parts, tp):
    if any(is_quantized(p) for p in parts):
        assert all(is_quantized(p) for p in parts), "mixed quantized/float fusion"
        if any("q4" in p for p in parts):
            raise ValueError(
                "int4 group-quantized weights cannot be serving-fused — "
                "int4 serves the unfused layout only"
            )
        q = _fuse([p["q"] for p in parts], tp)
        # scales [L, O_i] → [L, tp, ΣO_i/tp]
        scale = jnp.concatenate(
            [p["scale"].reshape(p["scale"].shape[0], tp, -1) for p in parts], axis=-1
        )
        return {"q": q, "scale": scale}
    return {"weight": _fuse([p["weight"] if isinstance(p, dict) else p for p in parts], tp)}


def fuse_decoder_params(params: dict, config: LLAMA32Config, tp: int = 1) -> dict:
    """Rewrite the decoder blocks of a (VLM or causal-LM) param tree with
    fused ``W_qkv`` / ``w_gateup`` projections. Accepts float or int8-
    quantized blocks. ``tp`` must divide both ``n_heads`` and ``n_kv_groups``
    (and ``hidden_dim``); use the mesh's tensor-parallel degree."""
    if config.n_heads % tp or config.n_kv_groups % tp or config.hidden_dim % tp:
        raise ValueError(f"tp={tp} must divide n_heads/n_kv_groups/hidden_dim")

    lm = params.get("language_model", params)
    blocks = lm["model"]["blocks"]
    att, ff = blocks["att"], blocks["ff"]

    def leaf(node):
        return node if is_quantized(node) else node["weight"]

    new_att = {
        "W_qkv": _fuse_maybe_quantized(
            [leaf(att["W_query"]), leaf(att["W_key"]), leaf(att["W_value"])], tp
        ),
        "out_proj": att["out_proj"],
    }
    sw = ff["swiglu"]
    new_ff = {
        "w_gateup": _fuse_maybe_quantized([sw["w_gate"], sw["w_up"]], tp),
        "w_down": ff["w_down"],
    }
    if sw.get("b_gate") is not None or sw.get("b_up") is not None:
        raise NotImplementedError("fusion with swiglu biases not supported")

    new_blocks = {**blocks, "att": new_att, "ff": new_ff}
    new_lm = {**lm, "model": {**lm["model"], "blocks": new_blocks}}
    if "language_model" in params:
        return {**params, "language_model": new_lm}
    return new_lm
