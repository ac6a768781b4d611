"""Plain-ViT vision encoder, pure-functional.

Parity target: reference ``Model/vision_encoder.py``:

- ``ViTPatchEmbeddings`` (``:50-87``): Conv2d(C→D, k=P, s=P, bias=False) patch
  projection + learned absolute position embedding, no CLS token. Implemented
  TPU-first as a patchify-reshape + one MXU matmul (numerically identical to
  the strided conv).
- ``ViTSelfAttention`` (``:94-129``): plain MHSA, scale-then-softmax, softmax
  computed in fp32 then cast back (SURVEY §2.9 #5).
- ``ViTMLP`` (``:136-146``): fc1 → exact (erf) GELU → fc2.
- ``ViTEncoderBlock`` (``:153-168``): pre-norm with standard residuals.
- ``VisionEncoder`` (``:192-223``): embeddings → L blocks → post layernorm;
  ``[B, C, H, W] → [B, num_patches, hidden_size]``.

Layers are stacked and scanned (one trace for the 32-layer ViT-H tower).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from llama32mm_tpu.configs import VisionEncoderConfig


def _uniform(key, shape, bound, dtype):
    return jax.random.uniform(key, shape, dtype=jnp.float32, minval=-bound, maxval=bound).astype(dtype)


def _linear_init(key, shape, dtype):
    fan_in = shape[-2]
    return _uniform(key, shape, 1.0 / math.sqrt(fan_in), dtype)


def init_vision_params(key: jax.Array, config: VisionEncoderConfig, dtype=jnp.float32) -> dict:
    d = config.hidden_size
    inter = config.intermediate_size
    L = config.num_hidden_layers
    p = config.patch_size
    c = config.num_channels
    keys = jax.random.split(key, 12)

    patch_fan_in = c * p * p

    def ln():
        return {"weight": jnp.ones((L, d), dtype=dtype), "bias": jnp.zeros((L, d), dtype=dtype)}

    def lin(key, n_in, n_out):
        kw, kb = jax.random.split(key)
        bound = 1.0 / math.sqrt(n_in)
        return {
            "weight": _linear_init(kw, (L, n_in, n_out), dtype),
            "bias": _uniform(kb, (L, n_out), bound, dtype),
        }

    return {
        "embeddings": {
            # [patch_fan_in, D]: flattened (C, Ph, Pw) patch vector → embedding.
            "patch_embedding": {
                "weight": _uniform(keys[0], (patch_fan_in, d), 1.0 / math.sqrt(patch_fan_in), dtype)
            },
            "position_embedding": {
                "weight": jax.random.normal(keys[1], (config.num_patches, d), dtype=jnp.float32).astype(dtype)
            },
        },
        "layers": {
            "layernorm1": ln(),
            "self_attn": {
                "q_proj": lin(keys[2], d, d),
                "k_proj": lin(keys[3], d, d),
                "v_proj": lin(keys[4], d, d),
                "out_proj": lin(keys[5], d, d),
            },
            "layernorm2": ln(),
            "mlp": {
                "fc1": lin(keys[6], d, inter),
                "fc2": lin(keys[7], inter, d),
            },
        },
        "post_layernorm": {"weight": jnp.ones((d,), dtype=dtype), "bias": jnp.zeros((d,), dtype=dtype)},
    }


def _layer_norm(x, weight, bias, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + jnp.asarray(eps, x.dtype)) * weight + bias


def patchify(pixel_values: jax.Array, patch_size: int) -> jax.Array:
    """``[B, C, H, W] → [B, num_patches, C·P·P]`` with (C, Ph, Pw) ordering —
    matches torch Conv2d weight layout flattened as ``[D, C·P·P]``."""
    b, c, hgt, wid = pixel_values.shape
    p = patch_size
    nh, nw = hgt // p, wid // p
    x = pixel_values.reshape(b, c, nh, p, nw, p)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, nh, nw, C, P, P]
    return x.reshape(b, nh * nw, c * p * p)


def _vit_attention(
    x, attn_params, num_heads, head_dim, impl="auto",
    dropout_rate: float = 0.0, dropout_rng=None,
):
    from llama32mm_tpu.ops.dispatch import resolve_impl

    b, n, d = x.shape
    train_dropout = dropout_rng is not None and dropout_rate > 0.0

    def proj(p):
        return jnp.matmul(x, p["weight"]) + p["bias"]

    def split(t):
        return t.reshape(b, n, num_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = split(proj(attn_params["q_proj"])), split(proj(attn_params["k_proj"])), split(
        proj(attn_params["v_proj"])
    )
    # Flash only where the [N, N] score materialization would hurt: at
    # ViT-H's N=1600 the XLA einsum path measures faster on v5e (189 ms vs
    # 171 ms TTFT), so the auto threshold sits above it; explicit
    # impl="pallas" forces the kernel (same contract as ops/attention.py).
    # Attention dropout (vision_encoder.py:127) needs the materialized
    # weights, so training with dropout always takes the dense path.
    use_flash = not train_dropout and (
        impl == "pallas" or (resolve_impl(impl) == "pallas" and n >= 8192)
    )
    if use_flash:
        # Non-causal flash: logits are s/√d in fp32 with an fp32 online
        # softmax — numerically the reference's scale-then-fp32-softmax
        # (vision_encoder.py:125) without materializing the [N, N] scores.
        from llama32mm_tpu.ops.pallas.attention import flash_gqa_attention

        kv_valid = jnp.ones((b, n), jnp.int32)
        ctx = flash_gqa_attention(q, k, v, kv_valid, 0, causal=False)
    else:
        scale = jnp.asarray(head_dim**-0.5, x.dtype)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        # fp32 softmax then cast back (vision_encoder.py:125).
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        if train_dropout:
            # nn.Dropout(attention_dropout) on the weights (vision_encoder.py:127):
            # inverted dropout, train mode only (rng given).
            keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
            weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0).astype(weights.dtype)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, n, d)
    return jnp.matmul(ctx, attn_params["out_proj"]["weight"]) + attn_params["out_proj"]["bias"]


def vision_encoder_forward(
    params: dict,
    config: VisionEncoderConfig,
    pixel_values: jax.Array,
    impl: str = "auto",
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """``VisionEncoder.forward``: ``[B, C, H, W] → [B, num_patches, D]``.

    ``dropout_rng`` enables train-mode attention dropout at
    ``config.attention_dropout`` (reference ``nn.Dropout``,
    vision_encoder.py:127); inference (rng=None) is deterministic.
    """
    emb = params["embeddings"]
    patches = patchify(pixel_values, config.patch_size)
    h = jnp.matmul(patches, emb["patch_embedding"]["weight"])
    h = h + emb["position_embedding"]["weight"][None, :, :].astype(h.dtype)

    eps = config.layer_norm_eps
    num_heads, head_dim = config.num_attention_heads, config.head_dim
    drop_p = config.attention_dropout
    layer_rngs = (
        jax.random.split(dropout_rng, config.num_hidden_layers)
        if (dropout_rng is not None and drop_p > 0.0)
        else None
    )

    def block(h, xs):
        lp, rng = xs
        normed = _layer_norm(h, lp["layernorm1"]["weight"], lp["layernorm1"]["bias"], eps)
        h = h + _vit_attention(
            normed, lp["self_attn"], num_heads, head_dim, impl,
            dropout_rate=drop_p, dropout_rng=rng,
        )
        normed = _layer_norm(h, lp["layernorm2"]["weight"], lp["layernorm2"]["bias"], eps)
        mlp = lp["mlp"]
        y = jnp.matmul(normed, mlp["fc1"]["weight"]) + mlp["fc1"]["bias"]
        y = jax.nn.gelu(y, approximate=False)  # exact GELU (vision_encoder.py:144)
        y = jnp.matmul(y, mlp["fc2"]["weight"]) + mlp["fc2"]["bias"]
        return h + y, None

    h, _ = jax.lax.scan(block, h, (params["layers"], layer_rngs))
    return _layer_norm(h, params["post_layernorm"]["weight"], params["post_layernorm"]["bias"], eps)
