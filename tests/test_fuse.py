"""Serving-time projection fusion (models/fuse.py): fused QKV / gate-up
matmuls must reproduce the unfused forward exactly (column-independent dots),
for float and int8 trees, at tp=1 and tp>1 layouts, and under GSPMD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.models.fuse import fuse_decoder_params
from llama32mm_tpu.models.vlm import vlm_forward

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def batch(tiny):
    cfg, _ = tiny
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, cfg.vocab_size - 10)
    ids = ids.at[:, :4].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 28, 28))
    return ids, px


def _logits(params, cfg, ids, px):
    return np.asarray(
        vlm_forward(params, cfg, input_ids=ids, pixel_values=px, impl="xla").logits
    )


@pytest.mark.parametrize("tp", [1, 2])
def test_fused_forward_matches_unfused(tiny, batch, tp):
    cfg, params = tiny
    ids, px = batch
    want = _logits(params, cfg, ids, px)
    fused = fuse_decoder_params(params, cfg.text_config, tp=tp)
    blocks = fused["language_model"]["model"]["blocks"]
    assert "W_qkv" in blocks["att"] and "W_query" not in blocks["att"]
    got = _logits(fused, cfg, ids, px)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_fused_quantized_matches_unfused_quantized(tiny, batch):
    from llama32mm_tpu.ops.quant import quantize_llama_params

    cfg, params = tiny
    ids, px = batch
    qparams = quantize_llama_params(params)
    want = _logits(qparams, cfg, ids, px)
    fused = fuse_decoder_params(qparams, cfg.text_config, tp=2)
    assert "q" in fused["language_model"]["model"]["blocks"]["att"]["W_qkv"]
    got = _logits(fused, cfg, ids, px)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_fuse_then_quantize_matches(tiny, batch):
    from llama32mm_tpu.ops.quant import quantize_llama_params

    cfg, params = tiny
    ids, px = batch
    want = _logits(quantize_llama_params(params), cfg, ids, px)
    got = _logits(
        quantize_llama_params(fuse_decoder_params(params, cfg.text_config, tp=1)),
        cfg, ids, px,
    )
    # same per-column scales either way → identical math up to fp reduction
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fused_engine_generate_matches(tiny, batch):
    from llama32mm_tpu.inference.engine import InferenceEngine

    cfg, params = tiny
    ids, px = batch
    eng = InferenceEngine(params, cfg, max_cache_length=64)
    fused_eng = InferenceEngine(
        fuse_decoder_params(params, cfg.text_config), cfg, max_cache_length=64
    )
    kw = dict(max_new_tokens=8, temperature=0.0, eos_token_id=-1, rng=jax.random.PRNGKey(0))
    a = eng.generate(ids, px, **kw)
    b = fused_eng.generate(ids, px, **kw)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


def test_fused_sharded_forward(tiny, batch):
    from llama32mm_tpu.parallel.mesh import create_mesh
    from llama32mm_tpu.parallel.sharding import shard_params

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg, params = tiny
    ids, px = batch
    want = _logits(params, cfg, ids, px)

    mesh = create_mesh(dp=2, tp=2)
    fused = fuse_decoder_params(params, cfg.text_config, tp=2)
    fused = shard_params(fused, cfg, mesh)
    w = fused["language_model"]["model"]["blocks"]["att"]["W_qkv"]["weight"]
    assert w.sharding.spec[2] == "tp"
    got = _logits(fused, cfg, ids, px)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_fused_lora_delta_applies(tiny, batch):
    from llama32mm_tpu.train.lora import init_lora_params

    cfg, params = tiny
    ids, px = batch
    lora = init_lora_params(jax.random.PRNGKey(5), cfg.text_config, rank=4)
    # make B nonzero so adapters change the output
    lora["blocks"]["W_query"]["lora_b"] = (
        jax.random.normal(jax.random.PRNGKey(6), lora["blocks"]["W_query"]["lora_b"].shape) * 0.02
    )
    fused = fuse_decoder_params(params, cfg.text_config, tp=2)

    base = vlm_forward(params, cfg, input_ids=ids, pixel_values=px, lora=lora, impl="xla").logits
    got = vlm_forward(fused, cfg, input_ids=ids, pixel_values=px, lora=lora, impl="xla").logits
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5, rtol=1e-5)
    # and it actually differs from no-lora
    nolora = vlm_forward(fused, cfg, input_ids=ids, pixel_values=px, impl="xla").logits
    assert float(jnp.max(jnp.abs(got - nolora))) > 1e-4
