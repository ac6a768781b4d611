"""GSPMD sharding rules (the 90B layout — BASELINE config #5).

Layout (SURVEY §2.8 / §7): tensor-parallel attention (shard the head axis of
the QKV projections, the head-input axis of out_proj) and MLP (shard the
intermediate axis of gate/up, the intermediate-input axis of down), vocab
sharded on the embedding/lm_head, **vision tower replicated**, batch on
``dp``. The KV cache shards its head axis on ``tp`` consistently with the
attention layout, so decode never re-gathers keys. XLA inserts the
all-reduces (out_proj / w_down products) over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llama32mm_tpu.configs import MLLAMAConfig
from llama32mm_tpu.parallel.mesh import AXIS_DP, AXIS_SP, AXIS_TP


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def _replicate_tree(tree, mesh):
    return jax.tree.map(lambda _: _ns(mesh), tree)


def text_block_shardings(mesh: Mesh) -> dict:
    """Shardings for the stacked per-layer decoder params ([L, ...] arrays;
    the layer axis is never sharded — it is scanned)."""
    return {
        "norm1": {"weight": _ns(mesh, None, None)},
        "att": {
            "W_query": {"weight": _ns(mesh, None, None, AXIS_TP)},
            "W_key": {"weight": _ns(mesh, None, None, AXIS_TP)},
            "W_value": {"weight": _ns(mesh, None, None, AXIS_TP)},
            "out_proj": {"weight": _ns(mesh, None, AXIS_TP, None)},
        },
        "norm2": {"weight": _ns(mesh, None, None)},
        "ff": {
            "swiglu": {
                "w_gate": _ns(mesh, None, None, AXIS_TP),
                "w_up": _ns(mesh, None, None, AXIS_TP),
            },
            "w_down": {"weight": _ns(mesh, None, AXIS_TP, None)},
        },
    }


def fused_block_shardings(mesh: Mesh) -> dict:
    """Shardings for serving-fused blocks (models/fuse.py): fused weights are
    [L, H, tp, chunk] with the tp axis at dim 2."""
    base = text_block_shardings(mesh)
    return {
        "norm1": base["norm1"],
        "norm2": base["norm2"],
        "att": {
            "W_qkv": {"weight": _ns(mesh, None, None, AXIS_TP, None)},
            "out_proj": base["att"]["out_proj"],
        },
        "ff": {
            "w_gateup": {"weight": _ns(mesh, None, None, AXIS_TP, None)},
            "w_down": base["ff"]["w_down"],
        },
    }


def vision_block_shardings(mesh: Mesh) -> dict:
    """Tensor-parallel ViT tower: MHSA head axis (q/k/v out-dims + their
    biases) and MLP intermediate axis sharded over ``tp``; out_proj/fc2
    contract over the sharded axis (GSPMD inserts the psum). The default
    layout keeps vision replicated (SURVEY §7 — it is small next to the
    decoder); sharding it instead cuts the vision-tower slice of TTFT ~tp×
    at 11B/90B scale, where the 32-layer ViT-H over 1600 patches is pure
    replicated latency on every image."""
    return {
        "layernorm1": {"weight": _ns(mesh, None, None), "bias": _ns(mesh, None, None)},
        "self_attn": {
            "q_proj": {"weight": _ns(mesh, None, None, AXIS_TP), "bias": _ns(mesh, None, AXIS_TP)},
            "k_proj": {"weight": _ns(mesh, None, None, AXIS_TP), "bias": _ns(mesh, None, AXIS_TP)},
            "v_proj": {"weight": _ns(mesh, None, None, AXIS_TP), "bias": _ns(mesh, None, AXIS_TP)},
            "out_proj": {"weight": _ns(mesh, None, AXIS_TP, None), "bias": _ns(mesh, None, None)},
        },
        "layernorm2": {"weight": _ns(mesh, None, None), "bias": _ns(mesh, None, None)},
        "mlp": {
            "fc1": {"weight": _ns(mesh, None, None, AXIS_TP), "bias": _ns(mesh, None, AXIS_TP)},
            "fc2": {"weight": _ns(mesh, None, AXIS_TP, None), "bias": _ns(mesh, None, None)},
        },
    }


def param_shardings(
    config: MLLAMAConfig,
    mesh: Mesh,
    params_like: Optional[dict] = None,
    vision_tp: bool = False,
) -> dict:
    """Sharding tree matching ``init_vlm_params`` structure. ``vision_tp``
    shards the ViT tower over ``tp`` (see ``vision_block_shardings``)
    instead of replicating it."""
    lm = {
        "tok_emb": {"weight": _ns(mesh, AXIS_TP, None)},  # vocab sharded
        "blocks": text_block_shardings(mesh),
        "final_norm": {"weight": _ns(mesh)},
    }
    head_w = _ns(mesh, None, AXIS_TP)  # [H, V] — vocab sharded
    tree = {
        "vision_model": None,  # filled below (replicated)
        "multi_modal_projector": {"linear": {"weight": _ns(mesh), "bias": _ns(mesh)}},
        "language_model": {"model": lm, "lm_head": {"weight": head_w}},
    }
    if params_like is not None:
        tree["vision_model"] = _replicate_tree(params_like["vision_model"], mesh)
        if params_like["language_model"]["lm_head"]["weight"] is None:
            tree["language_model"]["lm_head"] = {"weight": None}
        if "W_qkv" in params_like["language_model"]["model"]["blocks"]["att"]:
            lm["blocks"] = fused_block_shardings(mesh)
    else:
        # structural placeholder; callers with concrete params should pass them
        from llama32mm_tpu.models.vision import init_vision_params

        shapes = jax.eval_shape(
            lambda k: init_vision_params(k, config.vision_config), jax.random.PRNGKey(0)
        )
        tree["vision_model"] = _replicate_tree(shapes, mesh)
    if vision_tp:
        tree["vision_model"] = dict(tree["vision_model"])
        tree["vision_model"]["layers"] = vision_block_shardings(mesh)
    return tree


def lora_shardings(mesh: Mesh, lora_like: dict) -> dict:
    """LoRA adapters: A replicated on the in-dim, B sharded like the base
    weight's out axis would be — small enough that replication is also fine;
    keep them replicated for simplicity (adapters are tiny)."""
    return jax.tree.map(lambda _: _ns(mesh), lora_like)


def kv_cache_sharding(mesh: Mesh):
    """[L, B, n_kv, S, hd] — batch on dp, kv heads on tp."""
    from llama32mm_tpu.utils.kvcache import KVCache

    return KVCache(
        k=_ns(mesh, None, AXIS_DP, AXIS_TP, None, None),
        v=_ns(mesh, None, AXIS_DP, AXIS_TP, None, None),
        pos=_ns(mesh),
        k_scale=_ns(mesh, None, AXIS_DP, AXIS_TP, None),
        v_scale=_ns(mesh, None, AXIS_DP, AXIS_TP, None),
    )


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Batch-sharded arrays: [B, ...] on dp."""
    return _ns(mesh, AXIS_DP, *([None] * (ndim - 1)))


def seq_data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Batch+sequence-sharded token arrays: ``[B, T, ...]`` on ``(dp, sp)``.

    Feeding ``input_ids``/``labels`` with this sharding context-parallelizes
    the whole forward/backward: GSPMD propagates the token-axis sharding
    through embeds/norms/linears/RoPE, and the flash kernel's partitioning
    rules (ops/pallas/attention.py) keep q sharded over ``sp`` — only K/V are
    all-gathered per layer. Activation memory per device scales 1/sp, the
    enabler for long-context training (SURVEY §5 'Long-context')."""
    if ndim < 2:
        raise ValueError("sequence sharding needs at least [B, T]")
    return _ns(mesh, AXIS_DP, AXIS_SP, *([None] * (ndim - 2)))


def _zero1_extend(sharding: NamedSharding, shape, axis: str) -> NamedSharding:
    """Extend a parameter's NamedSharding with ``axis`` on its largest
    still-unsharded, divisible dimension (ZeRO-style optimizer partitioning).
    Returns the input sharding unchanged when no dimension qualifies or the
    axis has size 1."""
    if not isinstance(sharding, NamedSharding):
        return sharding  # unplaced / single-device leaf: nothing to extend
    mesh = sharding.mesh
    if axis not in mesh.shape or mesh.shape[axis] == 1:
        return sharding
    spec = list(sharding.spec) + [None] * (len(shape) - len(sharding.spec))
    used = {a for s in spec if s is not None for a in ((s,) if isinstance(s, str) else tuple(s))}
    if axis in used:
        return sharding
    size = mesh.shape[axis]
    best_dim, best = -1, 0
    for d, s in enumerate(spec):
        if s is None and shape[d] % size == 0 and shape[d] > best:
            best, best_dim = shape[d], d
    if best_dim < 0:
        return sharding
    spec[best_dim] = axis
    return NamedSharding(mesh, P(*spec))


def zero1_shardings(params, axis: str = AXIS_DP):
    """ZeRO-1 optimizer-state shardings: for every param leaf, the sharding it
    already has (tp layout) *extended* over ``axis`` on the largest unsharded
    divisible dim. Adam moments placed this way occupy 1/|axis| of the
    TP-only layout per chip; GSPMD turns the surrounding train step into the
    ZeRO dataflow automatically (reduce-scattered grads in, all-gathered
    updates out). Accepts concrete arrays or ``ShapeDtypeStruct``s (anything
    with ``.sharding``/``.shape``). SURVEY §2.8: the reference has no
    distributed training at all; this is the TPU-native optimizer-sharding
    layer a 90B full fine-tune requires (docs/AOT_NORTHSTAR.md)."""
    return jax.tree.map(lambda p: _zero1_extend(p.sharding, p.shape, axis), params)


def shard_params(
    params: dict, config: MLLAMAConfig, mesh: Mesh, vision_tp: bool = False
) -> dict:
    """Place a param tree onto the mesh with the TP layout. Handles int8
    quantized leaves (``{"q", "scale"}``): the int8 tensor takes the float
    weight's sharding; the per-channel scale shards on the same output axis.
    ``vision_tp`` shards the ViT tower too (``vision_block_shardings``)."""
    from llama32mm_tpu.ops.quant import is_quantized

    spec_tree = param_shardings(config, mesh, params_like=params, vision_tp=vision_tp)

    def walk(p, s):
        if p is None:
            return None
        if is_quantized(p):
            if isinstance(s, dict) and isinstance(s.get("weight"), NamedSharding):
                s = s["weight"]  # quantized leaf replaced the {"weight": ...} node
            pspec = tuple(s.spec) if isinstance(s, NamedSharding) else ()
            qkey = "q4" if "q4" in p else "q"
            # The packed/int tensor reuses the float weight's sharding: same
            # rank, and halving the contraction dim (int4) keeps divisibility.
            # NOTE: out_proj/w_down specs shard the INPUT (contraction) axis;
            # for int4 that splits quant groups across shards — GSPMD keeps
            # the grouped einsum correct (partial sums + collectives), and
            # the grouped scale is replicated (its out axis is unsharded for
            # exactly those leaves), verified by test_int4_sharded_forward.
            if p[qkey].ndim == 4:  # fused [L, in, tp, chunk] — scale [L, tp, chunk]
                tp_axis = pspec[2] if len(pspec) > 2 else None
                scale_sh = _ns(mesh, None, tp_axis, None)
            elif p[qkey].ndim == 3:  # stacked [L, in(/2), out]
                out_axis = pspec[-1] if pspec else None
                if p["scale"].ndim == 3:  # int4 grouped: scale [L, in/g, out]
                    scale_sh = _ns(mesh, None, None, out_axis)
                else:
                    scale_sh = _ns(mesh, None, out_axis)
            else:  # [in(/2), out]
                out_axis = pspec[-1] if pspec else None
                if p["scale"].ndim == 2:  # int4 grouped: scale [in/g, out]
                    scale_sh = _ns(mesh, None, out_axis)
                else:
                    scale_sh = _ns(mesh, out_axis)
            return {
                qkey: jax.device_put(p[qkey], s),
                "scale": jax.device_put(p["scale"], scale_sh),
            }
        if isinstance(p, dict):
            return {k: walk(v, s[k] if isinstance(s, dict) else s) for k, v in p.items()}
        return jax.device_put(p, s)

    return walk(params, spec_tree)
