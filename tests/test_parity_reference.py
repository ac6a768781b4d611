"""Logits parity vs the reference's PyTorch CPU-fallback path (north star:
fp32 tolerance). The reference at /root/reference is imported as a black-box
numeric oracle; skipped when absent.

Covers SURVEY §2.9 fallback-semantics items 1-6: √hidden_size embedding scale,
residual-stream drop, mask-then-scale softmax, unscaled RoPE, input-dtype
RMSNorm variance, fp32 ViT softmax.
"""

import numpy as np
import pytest

from reference_oracle import (
    build_reference_tiny,
    import_reference,
    reference_available,
    torch_vlm_to_params,
)

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")

ATOL = 2e-4
RTOL = 2e-4


@pytest.fixture(scope="module")
def oracle():
    torch = pytest.importorskip("torch")
    ref_model = import_reference()
    torch.manual_seed(0)
    cfg, model = build_reference_tiny(ref_model, torch)
    return torch, ref_model, cfg, model


@pytest.fixture(scope="module")
def jax_side(oracle):
    torch, ref_model, ref_cfg, ref_m = oracle
    import jax

    from llama32mm_tpu import tiny_mllama_config

    cfg = tiny_mllama_config()
    params = torch_vlm_to_params(
        ref_m, cfg.text_config.n_layers, cfg.vision_config.num_hidden_layers
    )
    return cfg, params


def _rand_inputs(torch, vocab, image_token_index, B=2, S=12, seed=1):
    g = torch.Generator().manual_seed(seed)
    ids = torch.randint(0, vocab - 10, (B, S), generator=g)
    ids[:, :4] = image_token_index  # first run of <image> placeholders
    px = torch.randn(B, 3, 28, 28, generator=g)
    mask = torch.ones(B, S, dtype=torch.long)
    return ids, px, mask


def test_vlm_prefill_logits_parity(oracle, jax_side):
    torch, ref_model, ref_cfg, ref_m = oracle
    cfg, params = jax_side
    import jax.numpy as jnp

    from llama32mm_tpu.models.vlm import vlm_forward

    ids, px, mask = _rand_inputs(torch, cfg.vocab_size, cfg.image_token_index)
    with torch.no_grad():
        ref_out = ref_m(input_ids=ids, pixel_values=px, attention_mask=mask)
    ref_logits = ref_out["logits"].numpy()

    out = vlm_forward(
        params,
        cfg,
        input_ids=jnp.asarray(ids.numpy()),
        pixel_values=jnp.asarray(px.numpy()),
        attention_mask=jnp.asarray(mask.numpy()),
        impl="xla",
    )
    np.testing.assert_allclose(np.asarray(out.logits), ref_logits, atol=ATOL, rtol=RTOL)


def test_vision_tower_parity(oracle, jax_side):
    torch, ref_model, ref_cfg, ref_m = oracle
    cfg, params = jax_side
    import jax.numpy as jnp

    from llama32mm_tpu.models.vision import vision_encoder_forward

    g = torch.Generator().manual_seed(3)
    px = torch.randn(2, 3, 28, 28, generator=g)
    with torch.no_grad():
        ref_feats = ref_m.vision_model(px).numpy()
    feats = vision_encoder_forward(params["vision_model"], cfg.vision_config, jnp.asarray(px.numpy()))
    np.testing.assert_allclose(np.asarray(feats), ref_feats, atol=ATOL, rtol=RTOL)


def test_language_model_parity_text_only(oracle, jax_side):
    torch, ref_model, ref_cfg, ref_m = oracle
    cfg, params = jax_side
    import jax.numpy as jnp

    from llama32mm_tpu.models.language import causal_lm_forward

    g = torch.Generator().manual_seed(4)
    ids = torch.randint(0, cfg.vocab_size - 10, (2, 9), generator=g)
    with torch.no_grad():
        ref_logits, _ = ref_m.language_model(input_ids=ids)
    logits, _ = causal_lm_forward(
        params["language_model"], cfg.text_config, input_ids=jnp.asarray(ids.numpy()), impl="xla"
    )
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(), atol=ATOL, rtol=RTOL)


def test_loss_parity(oracle, jax_side):
    torch, ref_model, ref_cfg, ref_m = oracle
    cfg, params = jax_side
    import jax.numpy as jnp

    from llama32mm_tpu.models.vlm import vlm_forward

    ids, px, mask = _rand_inputs(torch, cfg.vocab_size, cfg.image_token_index, seed=5)
    labels = ids.clone()
    labels[:, :4] = -100
    with torch.no_grad():
        ref_out = ref_m(input_ids=ids, pixel_values=px, attention_mask=mask, labels=labels)
    out = vlm_forward(
        params,
        cfg,
        input_ids=jnp.asarray(ids.numpy()),
        pixel_values=jnp.asarray(px.numpy()),
        attention_mask=jnp.asarray(mask.numpy()),
        labels=jnp.asarray(labels.numpy()),
        impl="xla",
    )
    np.testing.assert_allclose(float(out.loss), float(ref_out["loss"]), atol=1e-4, rtol=1e-4)


def test_decode_step_parity(oracle, jax_side):
    """Decode-step parity with positions fixed to intent: the reference is fed
    explicit position_ids == cache length (its default would be 0 — SURVEY
    §2.9 #9), mask=None (its grown-mask path crashes — §2.9 #8)."""
    torch, ref_model, ref_cfg, ref_m = oracle
    cfg, params = jax_side
    import jax.numpy as jnp

    from llama32mm_tpu.models.vlm import vlm_forward
    from llama32mm_tpu.utils.kvcache import init_kv_cache

    ids, px, mask = _rand_inputs(torch, cfg.vocab_size, cfg.image_token_index, B=1, seed=6)
    S = ids.shape[1]

    # Reference prefill + one decode step.
    ref_cache = ref_model.KVCache()
    with torch.no_grad():
        ref_out = ref_m(
            input_ids=ids, pixel_values=px, attention_mask=mask, kv_cache=ref_cache
        )
        next_tok = ref_out["logits"][0, -1].argmax().reshape(1, 1)
        ref_step = ref_m(
            input_ids=next_tok,
            pixel_values=None,
            attention_mask=None,
            position_ids=torch.tensor([[S]]),
            kv_cache=ref_cache,
        )
    ref_step_logits = ref_step["logits"].numpy()

    # Ours: static cache, additive 4D masks.
    max_len = 32
    cache = init_kv_cache(cfg.text_config, 1, max_length=max_len, dtype=jnp.float32)
    neg = np.finfo(np.float32).min
    pre_mask = np.zeros((1, 1, S, max_len), np.float32)
    pre_mask[:, :, :, S:] = neg
    for q in range(S):
        pre_mask[:, :, q, q + 1 : S] = -np.inf
    out = vlm_forward(
        params,
        cfg,
        input_ids=jnp.asarray(ids.numpy()),
        pixel_values=jnp.asarray(px.numpy()),
        attention_mask=jnp.asarray(pre_mask),
        kv_cache=cache,
        impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(out.logits), ref_out["logits"].numpy(), atol=ATOL, rtol=RTOL
    )

    step_mask = np.full((1, 1, 1, max_len), 0.0, np.float32)
    step_mask[:, :, :, S + 1 :] = neg
    step = vlm_forward(
        params,
        cfg,
        input_ids=jnp.asarray(next_tok.numpy()),
        attention_mask=jnp.asarray(step_mask),
        position_ids=jnp.asarray([[S]]),
        kv_cache=out.kv_cache,
        impl="xla",
    )
    np.testing.assert_allclose(np.asarray(step.logits), ref_step_logits, atol=ATOL, rtol=RTOL)
