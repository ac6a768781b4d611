"""Regenerate the vendored Llama-3.2-11B-Vision-Instruct checkpoint metadata
fixtures under tests/assets/:

- ``llama32_11b_vision_config.json``  — hub-style config dict
- ``llama32_11b_vision_manifest.json`` — {hub key: shape} for every tensor

The real weights are not available in this environment (zero egress), but the
key manifest is derivable without them: the hub checkpoint's safetensors index
keys are, by construction, the ``state_dict()`` keys of transformers'
``MllamaForConditionalGeneration`` — the exact modeling code that wrote and
loads the real checkpoint. We meta-initialize that model at the published 11B
dimensions (text: 40 layers with cross-attention at [3,8,13,18,23,28,33,38],
hidden 4096, inter 14336, 32 heads / 8 KV, rope llama3-scaled; vision: 32
local + 8 global layers, hidden 1280, image 560/patch 14) and rename through
the inverse of transformers' ``_checkpoint_conversion_mapping`` to recover the
hub (legacy) key layout the real index.json uses:

    model.language_model.X -> language_model.model.X
    lm_head.X              -> language_model.lm_head.X
    model.vision_model.X   -> vision_model.X
    model.multi_modal_projector.X -> multi_modal_projector.X

Run: ``python scripts/make_11b_manifest.py``
"""

import json
import os

import torch
from transformers import MllamaConfig, MllamaForConditionalGeneration
from transformers.models.mllama.configuration_mllama import (
    MllamaTextConfig,
    MllamaVisionConfig,
)

ASSETS = os.path.join(os.path.dirname(__file__), "..", "tests", "assets")


def hub_key(k: str) -> str:
    if k.startswith("model.language_model."):
        return "language_model.model." + k[len("model.language_model."):]
    if k.startswith("lm_head."):
        return "language_model.lm_head." + k[len("lm_head."):]
    if k.startswith("model.vision_model."):
        return "vision_model." + k[len("model.vision_model."):]
    if k.startswith("model.multi_modal_projector."):
        return "multi_modal_projector." + k[len("model.multi_modal_projector."):]
    raise ValueError(f"unmapped prefix: {k}")


def main() -> None:
    text = MllamaTextConfig(
        rope_scaling={
            "factor": 8.0,
            "high_freq_factor": 4.0,
            "low_freq_factor": 1.0,
            "original_max_position_embeddings": 8192,
            "rope_type": "llama3",
        }
    )
    vision = MllamaVisionConfig(image_size=560)
    cfg = MllamaConfig(vision_config=vision, text_config=text)
    with torch.device("meta"):
        model = MllamaForConditionalGeneration(cfg)
    manifest = {hub_key(k): list(v.shape) for k, v in model.state_dict().items()}

    cfg_dict = cfg.to_dict()
    os.makedirs(ASSETS, exist_ok=True)
    with open(os.path.join(ASSETS, "llama32_11b_vision_config.json"), "w") as f:
        json.dump(cfg_dict, f, indent=1, sort_keys=True, default=str)
    with open(os.path.join(ASSETS, "llama32_11b_vision_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=0, sort_keys=True)
    print(f"wrote {len(manifest)} keys; text layers="
          f"{cfg.text_config.num_hidden_layers}, cross-attn at "
          f"{cfg.text_config.cross_attention_layers}")


if __name__ == "__main__":
    main()
