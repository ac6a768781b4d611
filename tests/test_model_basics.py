"""Self-contained model unit tests (no reference repo required)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_kv_cache, init_vlm_params, tiny_mllama_config
from llama32mm_tpu.configs import LLAMA32Config, MLLAMAConfig, VisionEncoderConfig
from llama32mm_tpu.models.language import causal_lm_forward, prepare_attention_mask
from llama32mm_tpu.models.vlm import merge_input_ids_with_image_features, vlm_forward
from llama32mm_tpu.ops.rope import rope_cos_sin


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_config_derivations():
    cfg = MLLAMAConfig(
        vision_config=VisionEncoderConfig(image_size=560, patch_size=14),
        text_config=LLAMA32Config(vocab_size=128256),
        projection_dim=4096,
    )
    # num_image_tokens derived as (560/14)^2 = 1600 (reference Model/model.py:101-103)
    assert cfg.text_config.num_image_tokens == 1600
    assert cfg.vision_config.projection_dim == 4096
    assert cfg.vocab_size == cfg.text_config.vocab_size


def test_config_accepts_dicts():
    cfg = MLLAMAConfig(
        vision_config=dict(hidden_size=32, image_size=28, patch_size=14, num_hidden_layers=2,
                           num_attention_heads=4, intermediate_size=64),
        text_config=dict(vocab_size=100, hidden_size=64, n_heads=4, n_layers=2,
                         hidden_dim=128, n_kv_groups=2),
        pad_token_index=7,
    )
    assert cfg.text_config.pad_token_index == 7
    assert cfg.text_config.num_image_tokens == 4


def test_merge_splices_first_image_run(tiny):
    cfg, params = tiny
    B, S, N, H = 2, 10, 4, 8
    feats = jnp.arange(B * N * H, dtype=jnp.float32).reshape(B, N, H) + 100.0
    embeds = jnp.zeros((B, S, H))
    ids = jnp.zeros((B, S), dtype=jnp.int32)
    ids = ids.at[0, 2].set(cfg.image_token_index)
    ids = ids.at[0, 3].set(cfg.image_token_index)
    # batch 1 has no image tokens
    mask = jnp.zeros((B, S), dtype=jnp.int32)

    merged, mmask = merge_input_ids_with_image_features(
        feats, embeds, ids, mask, cfg.image_token_index
    )
    # span [2, 2+N) overwritten for batch 0
    np.testing.assert_array_equal(np.asarray(merged[0, 2:6]), np.asarray(feats[0]))
    assert np.all(np.asarray(merged[0, :2]) == 0)
    assert np.all(np.asarray(merged[0, 6:]) == 0)
    assert np.all(np.asarray(merged[1]) == 0)  # untouched without image tokens
    np.testing.assert_array_equal(np.asarray(mmask[0, 2:6]), np.ones(4, np.int32))
    assert np.all(np.asarray(mmask[1]) == 0)


def test_merge_clips_to_seq_len(tiny):
    cfg, params = tiny
    B, S, N, H = 1, 5, 4, 8
    feats = jnp.ones((B, N, H))
    embeds = jnp.zeros((B, S, H))
    ids = jnp.zeros((B, S), dtype=jnp.int32).at[0, 3].set(cfg.image_token_index)
    merged, _ = merge_input_ids_with_image_features(feats, embeds, ids, None, cfg.image_token_index)
    # only positions 3,4 fit (clipped), like the reference's min(start+N, seq_len)
    assert np.all(np.asarray(merged[0, 3:]) == 1)
    assert np.all(np.asarray(merged[0, :3]) == 0)


def test_prepare_attention_mask_matches_reference_semantics():
    base = jnp.array([[1, 1, 0]], dtype=jnp.int32)
    mask = prepare_attention_mask(base, 1, 3, jnp.float32)
    m = np.asarray(mask)[0, 0]
    assert m[0, 0] == 0.0
    assert np.isinf(m[0, 1]) and m[0, 1] < 0  # causal -inf
    assert m[1, 1] == 0.0
    assert m[2, 2] == np.finfo(np.float32).min  # padding term on padded col
    assert np.isneginf(m[1, 2])  # -inf + finfo.min overflows to -inf


def test_decode_equals_prefill_logits(tiny):
    """Incremental decode through the static cache reproduces the full-sequence
    (teacher-forced) logits position by position."""
    cfg, params = tiny
    tc = cfg.text_config
    B, S = 1, 8
    ids = jax.random.randint(jax.random.PRNGKey(3), (B, S), 0, cfg.vocab_size - 10)

    full_logits, _ = causal_lm_forward(params["language_model"], tc, input_ids=ids, impl="xla")

    max_len = 16
    neg = np.finfo(np.float32).min
    cache = init_kv_cache(tc, B, max_length=max_len, dtype=jnp.float32)
    step_logits = []
    for t in range(S):
        m = np.zeros((B, 1, 1, max_len), np.float32)
        m[:, :, :, t + 1 :] = neg
        logits, cache = causal_lm_forward(
            params["language_model"],
            tc,
            input_ids=ids[:, t : t + 1],
            attention_mask=jnp.asarray(m),
            position_ids=jnp.full((B, 1), t, dtype=jnp.int32),
            kv_cache=cache,
            impl="xla",
        )
        step_logits.append(np.asarray(logits[:, 0]))
    np.testing.assert_allclose(
        np.stack(step_logits, axis=1), np.asarray(full_logits), atol=1e-4, rtol=1e-4
    )


def test_rope_scaling_flag_changes_long_wavelengths():
    pos = jnp.arange(8)[None, :]
    cos0, sin0 = rope_cos_sin(pos, 16, 500000.0)
    scaling = dict(factor=32.0, low_freq_factor=1.0, high_freq_factor=4.0, original_context_length=8192)
    cos1, sin1 = rope_cos_sin(pos, 16, 500000.0, scaling=scaling)
    assert not np.allclose(np.asarray(cos0), np.asarray(cos1))


def test_loss_ignore_index(tiny):
    cfg, params = tiny
    ids = jax.random.randint(jax.random.PRNGKey(5), (1, 6), 0, cfg.vocab_size - 10)
    labels_all_ignored = jnp.full_like(ids, -100)
    out = vlm_forward(params, cfg, input_ids=ids, labels=labels_all_ignored, impl="xla")
    assert float(out.loss) == 0.0


def test_pad_token_row_zeroed_at_init():
    cfg = LLAMA32Config(vocab_size=50, hidden_size=16, n_heads=2, n_layers=1,
                        hidden_dim=32, n_kv_groups=1, dtype="float32", pad_token_index=3)
    from llama32mm_tpu.models.language import init_llama_params

    p = init_llama_params(jax.random.PRNGKey(0), cfg)
    assert np.all(np.asarray(p["tok_emb"]["weight"][3]) == 0)
