"""int8 weights-only quantization tests (serving extension)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.models.vlm import vlm_forward
from llama32mm_tpu.ops.pallas.quant_matmul import int8_matmul_pallas
from llama32mm_tpu.ops.quant import (
    dequantize_weight,
    is_quantized,
    qlinear,
    quantize_llama_params,
    quantize_weight,
)


pytestmark = pytest.mark.slow


def test_quantize_roundtrip_error_bounded():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 96)) * 0.05
    qw = quantize_weight(w)
    assert qw["q"].dtype == jnp.int8 and qw["scale"].shape == (96,)
    back = dequantize_weight(qw, jnp.float32)
    # symmetric per-channel int8: error ≤ scale/2 per element
    err = np.abs(np.asarray(back) - np.asarray(w))
    bound = np.asarray(qw["scale"])[None, :] * 0.5 + 1e-8
    assert np.all(err <= bound)


@pytest.mark.parametrize("r,h,o", [(4, 64, 128), (33, 96, 200), (1, 128, 384)])
def test_int8_matmul_pallas_matches_dequant(r, h, o):
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    x = jax.random.normal(keys[0], (r, h), jnp.float32)
    w = jax.random.normal(keys[1], (h, o), jnp.float32) * 0.05
    qw = quantize_weight(w)
    got = int8_matmul_pallas(x, qw["q"], qw["scale"])
    want = jnp.matmul(x, dequantize_weight(qw, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_qlinear_xla_matches_pallas():
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (64, 96), jnp.float32) * 0.05
    qw = quantize_weight(w)
    a = qlinear(x, qw, impl="pallas")
    b = qlinear(x, qw, impl="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_quantize_llama_params_structure():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, tie_weights=False)
    qparams = quantize_llama_params(params)
    blocks = qparams["language_model"]["model"]["blocks"]
    assert is_quantized(blocks["att"]["W_query"]["weight"])
    assert blocks["att"]["W_query"]["weight"]["q"].dtype == jnp.int8
    L = cfg.text_config.n_layers
    assert blocks["ff"]["swiglu"]["w_gate"]["q"].shape[0] == L
    assert blocks["norm1"]["weight"].dtype != jnp.int8  # norms untouched
    assert is_quantized(qparams["language_model"]["lm_head"]["weight"])
    # vision untouched
    assert not is_quantized(qparams["vision_model"]["embeddings"]["patch_embedding"]["weight"])


def test_tiny_model_int8_close_to_float():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, tie_weights=False)
    qparams = quantize_llama_params(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab_size - 10)
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))

    ref = vlm_forward(params, cfg, input_ids=ids, pixel_values=px, impl="xla")
    got = vlm_forward(qparams, cfg, input_ids=ids, pixel_values=px, impl="xla")
    # int8 error accumulates; top-1 agreement is what matters for greedy decode
    top_ref = np.asarray(jnp.argmax(ref.logits[0, -1]))
    top_q = np.asarray(jnp.argmax(got.logits[0, -1]))
    rel = np.abs(np.asarray(got.logits) - np.asarray(ref.logits)).mean() / (
        np.abs(np.asarray(ref.logits)).mean() + 1e-9
    )
    assert rel < 0.1, rel
    assert top_ref == top_q


def test_engine_decode_int8():
    from llama32mm_tpu.inference.engine import InferenceEngine

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, tie_weights=False)
    qparams = quantize_llama_params(params)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 10), 0, cfg.vocab_size - 10)

    eng = InferenceEngine(qparams, cfg, max_cache_length=32, impl="xla")
    res = eng.generate(ids, max_new_tokens=6, eos_token_id=-1)
    assert np.asarray(res.tokens).shape == (1, 6)
    eng_f = InferenceEngine(params, cfg, max_cache_length=32, impl="xla")
    res_f = eng_f.generate(ids, max_new_tokens=6, eos_token_id=-1)
    # first token should agree between int8 and float on the tiny model
    assert int(res.tokens[0, 0]) == int(res_f.tokens[0, 0])
