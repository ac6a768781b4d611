"""MllamaForConditionalGeneration — the top-level VLM, pure-functional.

Parity target: reference ``Model/model.py:367-464``:

- plain-ViT vision tower → ``MultiModalProjector`` (one biased linear,
  ``:275-285``) → token-embedding splice → LLaMA decoder → lm_head;
- optional shifted cross-entropy loss with ``ignore_index`` (``:431-438``);
- ``_merge_input_ids_with_image_features`` (``:442-464``): the reference's
  per-batch python loop becomes a fully vectorized gather/where — for each
  sequence, the **first** run of ``<image>`` placeholder positions (clipped to
  the sequence length) is overwritten with the projected patch features, and
  the attention mask is set to 1 over that span.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from llama32mm_tpu.configs import MLLAMAConfig
from llama32mm_tpu.models.language import (
    init_causal_lm_params,
    llama_forward,
    lm_head_apply,
)
from llama32mm_tpu.models.vision import init_vision_params, vision_encoder_forward
from llama32mm_tpu.utils.kvcache import KVCache


class VLMOutput(NamedTuple):
    logits: jax.Array
    loss: Optional[jax.Array]
    hidden_states: jax.Array
    kv_cache: Optional[KVCache]
    # per-layer activation calibration stats (ops/awq.py) — collect_stats only
    stats: Optional[dict] = None


def init_vlm_params(key: jax.Array, config: MLLAMAConfig, tie_weights: bool = True) -> dict:
    kv, kp, kl = jax.random.split(key, 3)
    dt = config.text_config.jnp_dtype
    vdim = config.vision_config.hidden_size
    tdim = config.text_config.hidden_size
    bound = 1.0 / math.sqrt(vdim)
    proj_w = jax.random.uniform(kp, (vdim, tdim), jnp.float32, -bound, bound).astype(dt)
    kb = jax.random.fold_in(kp, 1)
    proj_b = jax.random.uniform(kb, (tdim,), jnp.float32, -bound, bound).astype(dt)
    return {
        "vision_model": init_vision_params(kv, config.vision_config, dtype=dt),
        "multi_modal_projector": {"linear": {"weight": proj_w, "bias": proj_b}},
        "language_model": init_causal_lm_params(kl, config.text_config, tie_weights=tie_weights),
    }


def merge_input_ids_with_image_features(
    image_features: jax.Array,  # [B, N, H]
    inputs_embeds: jax.Array,  # [B, S, H]
    input_ids: jax.Array,  # [B, S]
    attention_mask: Optional[jax.Array],  # [B, S] or None
    image_token_index: int,
):
    """Vectorized splice (reference ``:442-464``): overwrite the span
    ``[first_image_pos, first_image_pos + N)`` (clipped to S) with the patch
    features; mark those positions attended."""
    b, s = input_ids.shape
    n = image_features.shape[1]

    if attention_mask is None:
        attention_mask = jnp.ones_like(input_ids)

    is_img = input_ids == image_token_index
    has_img = jnp.any(is_img, axis=1)  # [B]
    start = jnp.argmax(is_img, axis=1)  # [B] (0 when none — gated by has_img)

    pos = jnp.arange(s)[None, :]  # [1, S]
    rel = pos - start[:, None]  # [B, S] index into patch axis
    in_span = (rel >= 0) & (rel < n) & has_img[:, None]

    gathered = jnp.take_along_axis(
        image_features, jnp.clip(rel, 0, n - 1)[:, :, None], axis=1
    )  # [B, S, H]
    merged = jnp.where(in_span[:, :, None], gathered.astype(inputs_embeds.dtype), inputs_embeds)
    if hasattr(attention_mask, "ndim") and attention_mask.ndim == 2:
        merged_mask = jnp.where(in_span, jnp.ones_like(attention_mask), attention_mask)
    else:
        # Prebuilt masks (dense 4D or structured AttnMask) pass through.
        merged_mask = attention_mask
    return merged, merged_mask


def encode_image(
    params: dict,
    config: MLLAMAConfig,
    pixel_values: jax.Array,
    impl: str = "auto",
    dropout_rng: Optional[jax.Array] = None,
    lora: Optional[dict] = None,
    lora_dropout: float = 0.0,
) -> jax.Array:
    """Vision tower + projector: ``[B, C, H, W] → [B, N, text_hidden]``.
    ``lora`` is the projector's adapter leaf (optional fine-tune target)."""
    from llama32mm_tpu.utils.profiling import annotate

    with annotate("vision_encode"):
        feats = vision_encoder_forward(
            params["vision_model"], config.vision_config, pixel_values, impl=impl,
            dropout_rng=dropout_rng,
        )
    with annotate("mm_projector"):
        proj = params["multi_modal_projector"]["linear"]
        out = jnp.matmul(feats, proj["weight"]) + proj["bias"]
    if lora is not None:
        from llama32mm_tpu.models.language import _maybe_lora

        proj_rng = (
            jax.random.fold_in(dropout_rng, 0x4C6F)
            if (dropout_rng is not None and lora_dropout > 0.0)
            else None
        )
        out = _maybe_lora(feats, out, lora, proj_rng, lora_dropout)
    return out


def vlm_forward(
    params: dict,
    config: MLLAMAConfig,
    input_ids: Optional[jax.Array] = None,
    pixel_values: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    kv_cache: Optional[KVCache] = None,
    lora: Optional[dict] = None,
    dropout_rng: Optional[jax.Array] = None,
    lora_dropout: float = 0.0,
    impl: str = "auto",
    logits_positions: Optional[jax.Array] = None,
    remat: bool = False,
    loss_chunk: Optional[int] = None,
    gemv_routes: Optional[dict] = None,
    collect_stats: bool = False,
) -> VLMOutput:
    """Reference ``MllamaForConditionalGeneration.forward`` (``:398-440``).

    ``logits_positions`` (``[B, k]``, serving fast-path): compute lm_head only
    at those sequence positions — at prefill the full ``[B, S, vocab]`` logits
    (~0.4 GB for a 1.6k-token image prompt) are never needed, only the
    last valid position's row. Incompatible with ``labels``.
    """
    tc = config.text_config

    inputs_embeds = None
    if input_ids is not None:
        ids = jnp.clip(input_ids, 0, tc.vocab_size - 1)
        inputs_embeds = params["language_model"]["model"]["tok_emb"]["weight"][ids]

    if pixel_values is not None and inputs_embeds is not None:
        # Train-mode ViT attention dropout (and projector-LoRA input dropout)
        # share the caller's dropout rng; the fold keeps the vision stream
        # decorrelated from the decoder LoRA input-dropout streams.
        needs_vis_rng = config.vision_config.attention_dropout > 0.0 or (
            lora is not None and lora.get("projector") is not None and lora_dropout > 0.0
        )
        vis_rng = (
            jax.random.fold_in(dropout_rng, 0x7E57)
            if (dropout_rng is not None and needs_vis_rng)
            else None
        )
        image_features = encode_image(
            params, config, pixel_values, impl=impl, dropout_rng=vis_rng,
            lora=None if lora is None else lora.get("projector"),
            lora_dropout=lora_dropout,
        )
        from llama32mm_tpu.utils.profiling import annotate

        with annotate("image_splice"):
            inputs_embeds, attention_mask = merge_input_ids_with_image_features(
                image_features, inputs_embeds, input_ids, attention_mask,
                config.image_token_index,
            )

    with jax.named_scope("decoder"):
        out = llama_forward(
            params["language_model"]["model"],
            tc,
            input_embeds=inputs_embeds,
            attention_mask=attention_mask,
            position_ids=position_ids,
            kv_cache=kv_cache,
            lora=lora,
            dropout_rng=dropout_rng,
            lora_dropout=lora_dropout,
            impl=impl,
            remat=remat,
            gemv_routes=None if gemv_routes is None else {
                k: v for k, v in gemv_routes.items() if k != "lm_head"
            },
            collect_stats=collect_stats,
        )
    hidden = out.hidden_states
    if logits_positions is not None:
        if labels is not None:
            raise ValueError("logits_positions is incompatible with labels")
        hidden = jnp.take_along_axis(
            hidden, logits_positions[:, :, None].astype(jnp.int32), axis=1
        )
    if loss_chunk is not None:
        # long-context training: stream positions through lm_head + CE in
        # chunks — the full [B, T, vocab] logits (GBs at 8k+) never exist.
        # Head-LoRA applies; head-LoRA *dropout* does not on this path.
        if labels is None:
            raise ValueError("loss_chunk requires labels")
        loss = chunked_shifted_cross_entropy(
            params["language_model"], tc, hidden, labels, config.ignore_index,
            chunk=loss_chunk, lora=None if lora is None else lora.get("lm_head"),
            impl=impl,
        )
        return VLMOutput(
            logits=None, loss=loss, hidden_states=out.hidden_states,
            kv_cache=out.kv_cache, stats=out.stats,
        )
    head_lora = None if lora is None else lora.get("lm_head")
    head_rng = (
        jax.random.fold_in(dropout_rng, 0x48454144)
        if (dropout_rng is not None and head_lora is not None and lora_dropout > 0.0)
        else None
    )
    t_small = hidden.shape[1] <= 32
    logits = lm_head_apply(
        params["language_model"], tc, hidden, lora=head_lora, impl=impl,
        dropout_rng=head_rng, dropout_rate=lora_dropout,
        gemv_route=(gemv_routes or {}).get("lm_head") if t_small else None,
    )

    loss = None
    if labels is not None:
        loss = shifted_cross_entropy(logits, labels, config.ignore_index)

    return VLMOutput(
        logits=logits, loss=loss, hidden_states=out.hidden_states,
        kv_cache=out.kv_cache, stats=out.stats,
    )


def chunked_shifted_cross_entropy(
    lm_params: dict,
    config,
    hidden: jax.Array,  # [B, T, H]
    labels: jax.Array,  # [B, T]
    ignore_index: int,
    chunk: int = 1024,
    lora=None,
    impl: str = "auto",
) -> jax.Array:
    """``shifted_cross_entropy`` computed WITHOUT materializing the full
    ``[B, T, V]`` logits: positions stream through lm_head + fp32 log-softmax
    in chunks under a rematerialized ``lax.scan`` (backward recomputes each
    chunk's logits from the saved hidden chunk). At 8k × 128256-vocab the
    full-logits loss needs >4 GB of fp32 softmax buffers fwd AND bwd — this
    is the piece that makes long-context training fit next to the weights
    (pairs with ``remat=True`` in ``llama_forward``). Numerics identical to
    the reference reduction (``Model/model.py:431-438``)."""
    from llama32mm_tpu.models.language import lm_head_apply

    b, t, h = hidden.shape
    sh = hidden[:, :-1]
    st = labels[:, 1:]
    n = t - 1
    chunk = int(min(chunk, n))
    n_pad = -(-n // chunk) * chunk
    if n_pad != n:
        sh = jnp.pad(sh, ((0, 0), (0, n_pad - n), (0, 0)))
        st = jnp.pad(st, ((0, 0), (0, n_pad - n)), constant_values=ignore_index)
    # [n_chunks, B, chunk, ...] scan layout
    sh = sh.reshape(b, n_pad // chunk, chunk, h).swapaxes(0, 1)
    st = st.reshape(b, n_pad // chunk, chunk).swapaxes(0, 1)

    def body(carry, xs):
        nll_sum, cnt = carry
        h_c, t_c = xs
        logits = lm_head_apply(lm_params, config, h_c, lora=lora, impl=impl)
        valid = t_c != ignore_index
        safe = jnp.where(valid, t_c, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, nll, 0.0)
        return (nll_sum + jnp.sum(nll), cnt + jnp.sum(valid)), None

    (nll_sum, cnt), _ = jax.lax.scan(
        jax.checkpoint(body, prevent_cse=False),
        (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)),
        (sh, st),
    )
    return nll_sum / jnp.maximum(cnt, 1)


def shifted_cross_entropy(logits: jax.Array, labels: jax.Array, ignore_index: int) -> jax.Array:
    """Shifted next-token CE with ignore_index (reference ``:431-438``,
    matching ``nn.CrossEntropyLoss`` mean-over-valid reduction)."""
    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / count
