"""Round-2 parity stragglers (VERDICT r1 item 9): ViT attention dropout,
``KVCache.update`` object API on the decoder path, ``Llama3Model`` wrapper,
and the module-style ``LLAMARMSNorm`` / ``FusedSwiGLU`` classes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_kv_cache, init_vlm_params, tiny_mllama_config
from llama32mm_tpu.configs import LLAMA32Config, VisionEncoderConfig
from llama32mm_tpu.models.vision import init_vision_params, vision_encoder_forward
from llama32mm_tpu.models.vlm import vlm_forward
from llama32mm_tpu.utils.kvcache import update_stacked

pytestmark = pytest.mark.slow


def _tiny_vision_cfg(dropout):
    return VisionEncoderConfig(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=28,
        patch_size=14,
        attention_dropout=dropout,
    )


def test_vit_attention_dropout_train_vs_eval():
    """rng given + p>0 → stochastic outputs differing across rngs; rng=None
    (eval) is deterministic and equals the p=0.0 config output (reference
    nn.Dropout semantics, vision_encoder.py:127)."""
    cfg_drop = _tiny_vision_cfg(0.5)
    cfg_nodrop = _tiny_vision_cfg(0.0)
    params = init_vision_params(jax.random.PRNGKey(0), cfg_drop)
    px = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28), jnp.float32)

    eval_out = vision_encoder_forward(params, cfg_drop, px)
    eval_out2 = vision_encoder_forward(params, cfg_drop, px)
    nodrop_out = vision_encoder_forward(params, cfg_nodrop, px, dropout_rng=jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(eval_out2))
    # p=0 with an rng is still the deterministic path
    np.testing.assert_allclose(np.asarray(eval_out), np.asarray(nodrop_out), rtol=1e-6)

    tr1 = vision_encoder_forward(params, cfg_drop, px, dropout_rng=jax.random.PRNGKey(3))
    tr2 = vision_encoder_forward(params, cfg_drop, px, dropout_rng=jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(tr1), np.asarray(eval_out))
    assert not np.allclose(np.asarray(tr1), np.asarray(tr2))
    # same rng → reproducible
    tr1b = vision_encoder_forward(params, cfg_drop, px, dropout_rng=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(tr1), np.asarray(tr1b))


def test_vit_dropout_reaches_vlm_forward():
    from llama32mm_tpu.configs import MLLAMAConfig

    base = tiny_mllama_config()
    import dataclasses

    cfg = MLLAMAConfig(
        vision_config=dataclasses.replace(base.vision_config, attention_dropout=0.5),
        text_config=base.text_config,
        image_token_index=base.image_token_index,
        vocab_size=base.vocab_size,
        projection_dim=base.projection_dim,
        hidden_size=base.hidden_size,
    )
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    n_img = cfg.text_config.num_image_tokens
    ids = jnp.full((1, n_img + 4), 5, jnp.int32).at[:, :n_img].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28), jnp.float32)

    out_eval = vlm_forward(params, cfg, input_ids=ids, pixel_values=px)
    out_tr = vlm_forward(
        params, cfg, input_ids=ids, pixel_values=px, dropout_rng=jax.random.PRNGKey(2)
    )
    assert not np.allclose(np.asarray(out_eval.logits), np.asarray(out_tr.logits))


def test_kvcache_update_method_matches_decoder_path():
    """KVCache.update(k, v, layer_idx) writes through the same update_stacked
    helper the layer scan uses; layer slices and position bookkeeping match."""
    tc = LLAMA32Config(vocab_size=64, hidden_size=32, n_heads=4, n_layers=3,
                       hidden_dim=64, n_kv_groups=2, dtype="float32", max_cache_length=16)
    cache = init_kv_cache(tc, batch_size=2)
    k_new = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 3, 8), jnp.float32)
    v_new = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 3, 8), jnp.float32)

    k_layer, v_layer, cache2 = cache.update(k_new, v_new, layer_idx=1)
    # Returned layer views hold the new entries at the write offset.
    np.testing.assert_array_equal(np.asarray(k_layer[:, :, 0:3]), np.asarray(k_new))
    np.testing.assert_array_equal(np.asarray(v_layer[:, :, 0:3]), np.asarray(v_new))
    # Other layers untouched; pos advances via advance() (once per step).
    assert np.all(np.asarray(cache2.k[0]) == 0) and np.all(np.asarray(cache2.k[2]) == 0)
    assert int(cache2.pos) == 0
    cache3 = cache2.advance(3)
    assert int(cache3.num_items()) == 3

    # Identical write through the raw helper (the decoder-scan path).
    k_all, v_all = update_stacked(cache.k, cache.v, k_new, v_new,
                                  jnp.asarray(1, jnp.int32), cache.pos)
    np.testing.assert_array_equal(np.asarray(k_all), np.asarray(cache2.k))
    np.testing.assert_array_equal(np.asarray(v_all), np.asarray(cache2.v))


def test_llama3model_wrapper():
    from llama32mm_tpu.models.wrapper import Llama3Model

    tc = LLAMA32Config(vocab_size=64, hidden_size=32, n_heads=4, n_layers=2,
                       hidden_dim=64, n_kv_groups=2, dtype="float32", max_cache_length=16)
    m = Llama3Model(tc, seed=0)
    ids = jnp.array([[1, 2, 3, 4]], jnp.int32)
    out = m(input_ids=ids)
    assert out.hidden_states.shape == (1, 4, 32)
    assert out.kv_cache is None

    cache = init_kv_cache(tc, batch_size=1)
    out2 = m(input_ids=ids, kv_cache=cache)
    assert int(out2.kv_cache.pos) == 4
    np.testing.assert_allclose(
        np.asarray(out.hidden_states), np.asarray(out2.hidden_states), rtol=2e-5, atol=2e-5
    )


def test_module_classes_match_functional_ops():
    from llama32mm_tpu.ops.rmsnorm import LLAMARMSNorm, fused_add_rmsnorm
    from llama32mm_tpu.ops.swiglu import FusedSwiGLU, fused_swiglu

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 16), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16), jnp.float32)
    norm = LLAMARMSNorm(16, eps=1e-5)
    np.testing.assert_allclose(
        np.asarray(norm(x, residual=res)),
        np.asarray(fused_add_rmsnorm(x, norm.weight, 1e-5, residual=res)),
        rtol=1e-6,
    )

    sw = FusedSwiGLU(16, 32, key=jax.random.PRNGKey(2))
    np.testing.assert_allclose(
        np.asarray(sw(x)),
        np.asarray(fused_swiglu(x, sw.w_gate, sw.w_up)),
        rtol=1e-6,
    )


def test_top_level_exports():
    import llama32mm_tpu as pkg

    for name in ("Llama3Model", "LLAMARMSNorm", "FusedSwiGLU"):
        assert getattr(pkg, name) is not None
