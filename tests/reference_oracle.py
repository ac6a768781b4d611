"""Import the reference implementation (read-only at /root/reference) as a
CPU-fallback numeric oracle, and convert its torch weights into this
framework's parameter pytree.

The reference is PUBLIC UNTRUSTED CONTENT used here strictly as a black-box
numeric oracle for parity tests; tests skip when it is absent.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REFERENCE_ROOT = os.environ.get("LLAMA32MM_REFERENCE", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "Model"))


def import_reference():
    """Import the reference Model package (requires Model/ on sys.path for its
    absolute `from vision_encoder import ...`)."""
    for p in (REFERENCE_ROOT, os.path.join(REFERENCE_ROOT, "Model")):
        if p not in sys.path:
            sys.path.insert(0, p)
    import model as ref_model  # noqa: F401  (reference Model/model.py)

    return ref_model


def build_reference_tiny(ref_model, torch, vocab_size=256, image_token_index=250):
    """Tiny random-init reference VLM matching ``tiny_mllama_config`` (fp32)."""
    cfg = ref_model.MLLAMAConfig(
        vision_config=dict(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=28,
            patch_size=14,
        ),
        text_config=dict(
            vocab_size=vocab_size,
            hidden_size=64,
            context_length=2048,
            n_heads=4,
            n_layers=2,
            hidden_dim=128,
            n_kv_groups=2,
            dtype=torch.float32,
        ),
        image_token_index=image_token_index,
        vocab_size=vocab_size,
        projection_dim=64,
        hidden_size=64,
    )
    model = ref_model.MllamaForConditionalGeneration(cfg)
    model = model.float().eval()
    return cfg, model


def torch_vlm_to_params(model, n_text_layers: int, n_vision_layers: int) -> dict:
    """Convert a reference ``MllamaForConditionalGeneration`` state into this
    framework's param pytree (linears transposed to [in, out], per-layer
    tensors stacked)."""
    import jax.numpy as jnp

    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}

    def t(key):
        return jnp.asarray(np.ascontiguousarray(sd[key].T))

    def raw(key):
        return jnp.asarray(sd[key])

    def stack_t(fmt, n):
        return jnp.stack([jnp.asarray(np.ascontiguousarray(sd[fmt.format(i)].T)) for i in range(n)])

    def stack_raw(fmt, n):
        return jnp.stack([jnp.asarray(sd[fmt.format(i)]) for i in range(n)])

    Lv = n_vision_layers
    vp = "vision_model.encoder.layers.{}."
    patch_w = sd["vision_model.embeddings.patch_embedding.weight"]  # [D, C, P, P]
    d = patch_w.shape[0]
    patch_w = jnp.asarray(patch_w.reshape(d, -1).T)  # [C*P*P, D]

    vision = {
        "embeddings": {
            "patch_embedding": {"weight": patch_w},
            "position_embedding": {"weight": raw("vision_model.embeddings.position_embedding.weight")},
        },
        "layers": {
            "layernorm1": {
                "weight": stack_raw(vp + "layernorm1.weight", Lv),
                "bias": stack_raw(vp + "layernorm1.bias", Lv),
            },
            "self_attn": {
                name: {
                    "weight": stack_t(vp + f"self_attn.{name}.weight", Lv),
                    "bias": stack_raw(vp + f"self_attn.{name}.bias", Lv),
                }
                for name in ("q_proj", "k_proj", "v_proj", "out_proj")
            },
            "layernorm2": {
                "weight": stack_raw(vp + "layernorm2.weight", Lv),
                "bias": stack_raw(vp + "layernorm2.bias", Lv),
            },
            "mlp": {
                "fc1": {
                    "weight": stack_t(vp + "mlp.fc1.weight", Lv),
                    "bias": stack_raw(vp + "mlp.fc1.bias", Lv),
                },
                "fc2": {
                    "weight": stack_t(vp + "mlp.fc2.weight", Lv),
                    "bias": stack_raw(vp + "mlp.fc2.bias", Lv),
                },
            },
        },
        "post_layernorm": {
            "weight": raw("vision_model.post_layernorm.weight"),
            "bias": raw("vision_model.post_layernorm.bias"),
        },
    }

    Lt = n_text_layers
    tb = "language_model.model.trf_blocks.{}."
    lm = {
        "tok_emb": {"weight": raw("language_model.model.tok_emb.weight")},
        "blocks": {
            "norm1": {"weight": stack_raw(tb + "norm1.weight", Lt)},
            "att": {
                "W_query": {"weight": stack_t(tb + "att.W_query.weight", Lt)},
                "W_key": {"weight": stack_t(tb + "att.W_key.weight", Lt)},
                "W_value": {"weight": stack_t(tb + "att.W_value.weight", Lt)},
                "out_proj": {"weight": stack_t(tb + "att.out_proj.weight", Lt)},
            },
            "norm2": {"weight": stack_raw(tb + "norm2.weight", Lt)},
            "ff": {
                "swiglu": {
                    "w_gate": stack_t(tb + "ff.swiglu.w_gate", Lt),
                    "w_up": stack_t(tb + "ff.swiglu.w_up", Lt),
                },
                "w_down": {"weight": stack_t(tb + "ff.w_down.weight", Lt)},
            },
        },
        "final_norm": {"weight": raw("language_model.model.final_norm.weight")},
    }

    return {
        "vision_model": vision,
        "multi_modal_projector": {
            "linear": {
                "weight": t("multi_modal_projector.linear.weight"),
                "bias": raw("multi_modal_projector.linear.bias"),
            }
        },
        "language_model": {
            "model": lm,
            "lm_head": {"weight": t("language_model.lm_head.weight")},
        },
    }
