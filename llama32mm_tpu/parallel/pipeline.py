"""Pipeline parallelism — the ``pp`` mesh axis (GPipe microbatch schedule).

The reference has no distributed layer at all (SURVEY §2.8); tensor/sequence/
data parallelism landed in rounds 1–3 as GSPMD sharding rules. Pipeline
parallelism is the remaining classic axis, and on TPU it has a particularly
clean native form because the decoder blocks are ALREADY a stacked-params
``lax.scan`` (``models/language.py::llama_forward``):

- a pipeline **stage** is a contiguous slice of the ``[L, ...]`` stacked
  block params — "stage placement" is nothing more than a
  ``NamedSharding(P('pp'))`` on the layer axis (``pipeline_param_specs``);
- the **schedule** is ``jax.shard_map`` over the ``pp`` axis: each device
  scans its local ``[L/P, ...]`` sub-stack, activations hop to the next
  stage by ``lax.ppermute`` (nearest-neighbor — rides a single ICI hop on a
  ring), and M microbatches keep stages busy (GPipe bubble fraction
  ``(P-1)/(M+P-1)``);
- **backward needs no new code**: ``ppermute``'s transpose is the reverse
  rotation and ``scan``'s transpose is the reverse schedule, so
  ``jax.grad`` of the pipelined loss IS the GPipe backward pass.
  ``remat=True`` gives the standard "recompute within a stage" memory
  profile (activations saved only at microbatch/stage boundaries).

Composition: only ``pp`` is *manual* inside the shard_map — every other mesh
axis stays an AUTO (GSPMD) axis straight through the schedule. ``pp × dp``
(batch sharded over ``dp``) and ``pp × tp`` (stage body tensor-parallel:
place the block params with BOTH axes — ``pipeline_shard_params(tp=True)``
— and GSPMD runs each stage's matmuls tp-sharded with its usual per-layer
all-reduces) compose for free, including together as the full 3D
``pp × dp × tp`` layout (pinned numerics-equal in tests/test_pipeline.py).
Serving/decode stays on the GSPMD tp path (a bubble-free decode pipeline
needs continuous batching across requests, not microbatching — the tp
layout is strictly better there at these scales).
"""

from __future__ import annotations

import math

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from llama32mm_tpu.configs import LLAMA32Config
from llama32mm_tpu.models.language import _block_forward, lm_head_apply
from llama32mm_tpu.models.vlm import shifted_cross_entropy
from llama32mm_tpu.ops.attention import AttnMask
from llama32mm_tpu.ops.rmsnorm import fused_add_rmsnorm
from llama32mm_tpu.ops.rope import rope_cos_sin

AXIS_PP = "pp"


def pipeline_param_specs(
    model_params: dict, pp_axis: str = AXIS_PP, tp: bool = False,
):
    """PartitionSpecs placing the stacked ``[L, ...]`` block params over the
    ``pp`` axis (layer axis 0 = stage slices); everything else replicated.
    ``tp=True`` additionally shards each stage's head/intermediate axes over
    ``tp`` (the decoder TP layout of ``sharding.text_block_shardings``, with
    the layer axis staged instead of replicated) — the pp×tp layout."""
    if tp:
        tp_blocks = {
            "norm1": {"weight": P(pp_axis, None)},
            "att": {
                "W_query": {"weight": P(pp_axis, None, "tp")},
                "W_key": {"weight": P(pp_axis, None, "tp")},
                "W_value": {"weight": P(pp_axis, None, "tp")},
                "out_proj": {"weight": P(pp_axis, "tp", None)},
            },
            "norm2": {"weight": P(pp_axis, None)},
            "ff": {
                "swiglu": {"w_gate": P(pp_axis, None, "tp"),
                           "w_up": P(pp_axis, None, "tp")},
                "w_down": {"weight": P(pp_axis, "tp", None)},
            },
        }

    def spec_for(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "blocks" in names:
            if tp:
                node = tp_blocks
                for n in names[names.index("blocks") + 1:]:
                    node = node[n]
                return node
            return P(pp_axis)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, model_params)


def pipeline_shard_params(
    model_params: dict, mesh: Mesh, pp_axis: str = AXIS_PP, tp: bool = False,
):
    """Place text-model params for pipelining: block stacks split over pp
    (and, with ``tp=True``, stage bodies tensor-parallel over tp)."""
    specs = pipeline_param_specs(model_params, pp_axis, tp=tp)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), model_params, specs
    )


def pipeline_decoder_hidden(
    model_params: dict,
    config: LLAMA32Config,
    h: jax.Array,
    mesh: Mesh,
    n_microbatches: int,
    *,
    lora_blocks: Optional[dict] = None,
    remat: bool = False,
    impl: str = "xla",
    pp_axis: str = AXIS_PP,
    dp_axis: Optional[str] = "dp",
) -> jax.Array:
    """Run the decoder block stack pipelined over ``pp``; returns the
    final-norm'd hidden states (the ``Llama3Model`` body, training path —
    causal self-attention, no KV cache).

    ``h``: embedded + √d-scaled hidden ``[B, T, H]`` (batch may be sharded
    over ``dp_axis``). ``model_params``: the ``params["model"]`` subtree with
    ``blocks`` leaves sharded ``P('pp')`` on the layer axis
    (``pipeline_shard_params``). ``lora_blocks``: stacked per-layer adapters
    (``lora["blocks"]``, each leaf ``[L, ...]``) — they ride the same stage
    placement as their base layers, so LoRA/QLoRA trains through the
    pipeline with stage-local adapter state (dropout not supported here).
    """
    pp = mesh.shape[pp_axis]
    M = n_microbatches
    if config.n_layers % pp:
        raise ValueError(f"n_layers {config.n_layers} not divisible by pp={pp}")

    b, t, hidden = h.shape
    dp = mesh.shape.get(dp_axis, 1) if dp_axis else 1
    if b % (dp * M):
        raise ValueError(f"batch {b} must divide dp*microbatches = {dp}*{M}")
    del dp_axis  # dp stays an AUTO axis: only pp is manual inside shard_map,
    # so GSPMD keeps the batch dimension dp-sharded straight through the
    # schedule (specs below may only name manual axes)

    # rope tables are position-only — one row broadcasts over the microbatch
    pos = jnp.arange(t, dtype=jnp.int32)[None]
    scaling = config.rope_freq_dict if config.apply_rope_scaling else None
    cos, sin = rope_cos_sin(pos, config.head_dim, config.rope_base, h.dtype, scaling)

    blocks = model_params["blocks"]
    block_specs = jax.tree.map(lambda _: P(pp_axis), blocks)
    lora_in = lora_blocks if lora_blocks is not None else {}
    lora_specs = jax.tree.map(lambda _: P(pp_axis), lora_in)
    h_spec = P()

    def schedule(blocks_stage, lora_stage, h_loc):
        """Per-device program: blocks_stage [L/pp, ...], h_loc [b/dp, T, H]."""
        mb = h_loc.shape[0] // M
        x = h_loc.reshape(M, mb, t, hidden)
        stage = jax.lax.axis_index(pp_axis)

        causal = AttnMask(
            kv_valid=jnp.ones((mb, t), jnp.int32), q_offset=jnp.asarray(0, jnp.int32)
        )

        def layer_body(carry, xs):
            layer_params, lora_l = xs
            out, *_ = _block_forward(
                carry, layer_params, config, cos, sin, None, causal,
                None, None, None, None, None, None, lora_l or None, None, impl,
            )
            return out, None

        if remat:
            layer_body = jax.checkpoint(layer_body, prevent_cse=False)

        def apply_stage(h_in):
            out, _ = jax.lax.scan(layer_body, h_in, (blocks_stage, lora_stage))
            return out

        fwd = [(i, i + 1) for i in range(pp - 1)]

        def step(carry, i):
            buf, out = carry
            mb_idx = jnp.clip(i, 0, M - 1)
            inp = jnp.where(
                stage == 0, jax.lax.dynamic_index_in_dim(x, mb_idx, 0, keepdims=False), buf
            )
            y = apply_stage(inp)
            nxt = jax.lax.ppermute(y, pp_axis, fwd) if pp > 1 else y
            # last stage records its finished microbatch at slot i-(pp-1)
            slot = jnp.clip(i - (pp - 1), 0, M - 1)
            write = (stage == pp - 1) & (i >= pp - 1)
            cur = jax.lax.dynamic_index_in_dim(out, slot, 0, keepdims=False)
            out = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(write, y, cur), slot, 0
            )
            return (nxt, out), None

        buf0 = jnp.zeros((mb, t, hidden), h_loc.dtype)
        out0 = jnp.zeros((M, mb, t, hidden), h_loc.dtype)
        (_, out), _ = jax.lax.scan(
            step, (buf0, out0), jnp.arange(M + pp - 1, dtype=jnp.int32)
        )
        # result lives on the last stage — masked psum broadcasts it to all
        # stages (ICI all-reduce of one activation tensor, once per step)
        out = jnp.where(stage == pp - 1, out, jnp.zeros_like(out))
        out = jax.lax.psum(out, pp_axis)
        return out.reshape(h_loc.shape)

    piped = jax.shard_map(
        schedule,
        mesh=mesh,
        in_specs=(block_specs, lora_specs, h_spec),
        out_specs=h_spec,
        axis_names={pp_axis},
        check_vma=False,  # the masked-psum broadcast defeats static rep-checking
    )(blocks, lora_in, h)

    return fused_add_rmsnorm(
        piped, model_params["final_norm"]["weight"], config.rms_norm_eps, impl=impl
    )


def pipeline_causal_lm_loss(
    params: dict,
    config: LLAMA32Config,
    input_ids: jax.Array,
    labels: jax.Array,
    mesh: Mesh,
    n_microbatches: int,
    *,
    ignore_index: int = -100,
    lora: Optional[dict] = None,
    remat: bool = False,
    loss_chunk: Optional[int] = None,
    impl: str = "xla",
) -> jax.Array:
    """Shifted next-token CE through the pipelined decoder (text-only
    training path; embedding / lm_head replicated, blocks staged over pp).
    ``loss_chunk`` streams positions through lm_head + fp32 log-softmax in
    chunks (``chunked_shifted_cross_entropy``) — required at real vocab
    sizes where full ``[B, T, V]`` logits cannot materialize. ``lora``: the
    full adapter dict (``init_lora_params``) — block adapters ride the
    stage placement, the lm_head adapter applies outside the manual region."""
    ids = jnp.clip(input_ids, 0, config.vocab_size - 1)
    h = params["model"]["tok_emb"]["weight"][ids]
    h = h * jnp.asarray(math.sqrt(config.hidden_size), h.dtype)
    head_lora = None if lora is None else lora.get("lm_head")
    h = pipeline_decoder_hidden(
        params["model"], config, h, mesh, n_microbatches,
        lora_blocks=None if lora is None else lora.get("blocks"),
        remat=remat, impl=impl,
    )
    if loss_chunk:
        from llama32mm_tpu.models.vlm import chunked_shifted_cross_entropy

        return chunked_shifted_cross_entropy(
            params, config, h, labels, ignore_index, chunk=loss_chunk,
            lora=head_lora, impl=impl,
        )
    logits = lm_head_apply(params, config, h, lora=head_lora, impl=impl)
    return shifted_cross_entropy(logits.astype(jnp.float32), labels, ignore_index)


def pipeline_shard_lora(lora: dict, mesh: Mesh, pp_axis: str = AXIS_PP) -> dict:
    """Place adapters for the pipeline: block adapters stage-local
    (``P('pp')`` on their layer axis, co-located with their base layers),
    lm_head/projector adapters replicated."""

    def spec_for(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return P(pp_axis) if "blocks" in names else P()

    specs = jax.tree_util.tree_map_with_path(spec_for, lora)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), lora, specs
    )


def make_pipeline_lora_train_step(
    config: LLAMA32Config,
    mesh: Mesh,
    n_microbatches: int,
    learning_rate: float = 1e-4,
    *,
    remat: bool = False,
    loss_chunk: Optional[int] = None,
    impl: str = "xla",
):
    """(init_state, step) — LoRA/QLoRA through the pipeline: adapters train
    stage-local (their Adam moments too), the frozen base streams staged —
    quantized bases included (``step(params, state, batch, rng)`` matches
    ``train/lora.py::make_lora_train_step``'s signature; rng unused — no
    adapter dropout in the pipelined path)."""
    import optax

    tx = optax.adam(learning_rate)

    def init_state(lora: dict):
        return {"lora": lora, "opt": tx.init(lora), "step": jnp.zeros((), jnp.int32)}

    def step(params: dict, state: dict, batch: dict, rng: jax.Array):
        del rng

        def loss_fn(lora):
            return pipeline_causal_lm_loss(
                params, config, batch["input_ids"], batch["labels"], mesh,
                n_microbatches, lora=lora, remat=remat, loss_chunk=loss_chunk,
                impl=impl,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state["lora"])
        updates, opt = tx.update(grads, state["opt"], state["lora"])
        lora = optax.apply_updates(state["lora"], updates)
        return {"lora": lora, "opt": opt, "step": state["step"] + 1}, loss

    return init_state, step


def make_pipeline_train_step(
    config: LLAMA32Config,
    mesh: Mesh,
    n_microbatches: int,
    learning_rate: float = 1e-4,
    *,
    remat: bool = False,
    loss_chunk: Optional[int] = None,
    impl: str = "xla",
):
    """(init_state, step) training ALL text params through the pipelined
    loss — the pp×dp analogue of ``train/full.py`` for the causal LM.
    Optimizer state inherits the pp param placement (stage-local moments)."""
    import optax

    tx = optax.adam(learning_rate)

    def init_state(params: dict):
        return {"params": params, "opt": tx.init(params), "step": jnp.zeros((), jnp.int32)}

    def step(state: dict, batch: dict, rng: jax.Array):
        del rng

        def loss_fn(p):
            return pipeline_causal_lm_loss(
                p, config, batch["input_ids"], batch["labels"], mesh,
                n_microbatches, remat=remat, loss_chunk=loss_chunk, impl=impl,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt = tx.update(grads, state["opt"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt": opt, "step": state["step"] + 1}, loss

    return init_state, step
