"""Object-style API parity wrappers over the functional core.

The reference exposes ``MllamaForConditionalGeneration(config)`` /
``Llama3ForCausalLM(config)`` modules (``Model/model.py:349-440``); these thin
wrappers hold the param pytree + config and delegate to the pure functions, so
reference users keep the same call shape while everything stays jit/pjit-able.
"""

from __future__ import annotations

from typing import Optional

import jax

from llama32mm_tpu.configs import LLAMA32Config, MLLAMAConfig
from llama32mm_tpu.models.language import (
    causal_lm_forward,
    init_causal_lm_params,
    init_llama_params,
    llama_forward,
)
from llama32mm_tpu.models.vlm import init_vlm_params, vlm_forward


class Llama3Model:
    """Parity: reference ``Llama3Model`` (Model/model.py:287-346) — the bare
    decoder stack (embeddings → blocks → final_norm), no lm_head. Returns
    ``LlamaOutput(hidden_states, kv_cache)`` (the reference mutates its cache
    in place and returns hidden states only)."""

    def __init__(self, config: LLAMA32Config, params: Optional[dict] = None, seed: int = 0):
        self.config = config
        self.params = (
            params
            if params is not None
            else init_llama_params(jax.random.PRNGKey(seed), config)
        )

    def __call__(self, input_ids=None, input_embeds=None, attention_mask=None,
                 position_ids=None, kv_cache=None):
        return llama_forward(
            self.params, self.config,
            input_ids=input_ids, input_embeds=input_embeds,
            attention_mask=attention_mask, position_ids=position_ids, kv_cache=kv_cache,
        )

    forward = __call__


class Llama3ForCausalLM:
    """Parity: reference ``Llama3ForCausalLM`` (Model/model.py:349-364)."""

    def __init__(self, config: LLAMA32Config, params: Optional[dict] = None, seed: int = 0):
        self.config = config
        self.params = (
            params
            if params is not None
            else init_causal_lm_params(jax.random.PRNGKey(seed), config, tie_weights=False)
        )

    def __call__(self, input_ids=None, input_embeds=None, attention_mask=None,
                 position_ids=None, kv_cache=None):
        return causal_lm_forward(
            self.params, self.config,
            input_ids=input_ids, input_embeds=input_embeds,
            attention_mask=attention_mask, position_ids=position_ids, kv_cache=kv_cache,
        )

    forward = __call__

    def tie_weights(self):
        """Tie lm_head to tok_emb (reference :363-364). In the functional
        layout a tied head is ``weight=None`` (applied as embedding.T)."""
        self.params = {**self.params, "lm_head": {"weight": None}}


class MllamaForConditionalGeneration:
    """Parity: reference ``MllamaForConditionalGeneration`` (Model/model.py:367-440).

    ``forward`` returns the same dict: ``{"logits", "loss", "hidden_states",
    "kv_cache"}``.
    """

    def __init__(self, config: MLLAMAConfig, params: Optional[dict] = None, seed: int = 0):
        self.config = config
        self.text_config = config.text_config
        self.vision_config = config.vision_config
        self.vocab_size = config.vocab_size
        self.ignore_index = config.ignore_index
        self.image_token_index = config.image_token_index
        self.params = (
            params
            if params is not None
            else init_vlm_params(jax.random.PRNGKey(seed), config, tie_weights=False)
        )

    def __call__(
        self,
        input_ids=None,
        pixel_values=None,
        attention_mask=None,
        position_ids=None,
        labels=None,
        kv_cache=None,
        lora=None,
        **kwargs,
    ):
        out = vlm_forward(
            self.params,
            self.config,
            input_ids=input_ids,
            pixel_values=pixel_values,
            attention_mask=attention_mask,
            position_ids=position_ids,
            labels=labels,
            kv_cache=kv_cache,
            lora=lora,
        )
        return {
            "logits": out.logits,
            "loss": out.loss,
            "hidden_states": out.hidden_states,
            "kv_cache": out.kv_cache,
        }

    forward = __call__

    def tie_weights(self):
        lm = self.params["language_model"]
        self.params = {**self.params, "language_model": {**lm, "lm_head": {"weight": None}}}

    def get_input_embeddings(self):
        return self.params["language_model"]["model"]["tok_emb"]["weight"]
