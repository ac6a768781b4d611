"""int4 group-wise weight quantization (serving extension, off the parity
path): round-trip error bounds, grouped qlinear math, full-tree rewrite,
engine decode, and the unfused-only contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.ops.quant import (
    dequantize_weight,
    is_quantized,
    qlinear,
    quantize_llama_params,
    quantize_weight_int4,
)


pytestmark = pytest.mark.slow


def test_int4_roundtrip_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48), jnp.float32)
    qw = quantize_weight_int4(w, group_size=16)
    assert qw["q4"].dtype == jnp.uint8 and qw["q4"].shape == (32, 48)
    assert qw["scale"].shape == (4, 48)
    deq = np.asarray(dequantize_weight(qw, jnp.float32))
    # symmetric RTN: |err| <= scale/2 elementwise, scale = group absmax / 7
    scale = np.repeat(np.asarray(qw["scale"]), 16, axis=0)
    assert np.all(np.abs(deq - np.asarray(w)) <= scale / 2 + 1e-7)


def test_int4_pack_layout():
    # split-half per group: byte row i of group j = (row j*g+i, row j*g+g/2+i)
    w = jnp.arange(-8, 8, dtype=jnp.float32).reshape(16, 1) / 2.0  # one column
    qw = quantize_weight_int4(w, group_size=8)
    assert qw["q4"].shape == (8, 1) and qw["scale"].shape == (2, 1)
    deq = np.asarray(dequantize_weight(qw, jnp.float32))[:, 0]
    want = np.asarray(w)[:, 0]
    scale = np.repeat(np.asarray(qw["scale"])[:, 0], 8)
    assert np.all(np.abs(deq - want) <= scale / 2 + 1e-7)  # order preserved


def test_int4_qlinear_matches_dequant_matmul():
    k = jax.random.PRNGKey(1)
    w = jax.random.normal(k, (64, 40), jnp.float32)
    qw = quantize_weight_int4(w, group_size=32)
    deq = dequantize_weight(qw, jnp.float32)
    # both row regimes: grouped einsum (<=64 rows) and the dequantize-once
    # matmul route (prefill rows)
    for shape in ((3, 5, 64), (2, 48, 64)):
        x = jax.random.normal(jax.random.fold_in(k, shape[-2]), shape, jnp.float32)
        want = x @ deq
        got = qlinear(x, qw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_int4_pallas_kernel_parity():
    # interpret-mode (CPU) parity of the packed-nibble VMEM-unpack kernel vs
    # the dequantized dense matmul, spanning multiple group/out blocks and a
    # gemv plus a matmul shape
    from llama32mm_tpu.ops.pallas.quant_matmul import int4_matmul_pallas

    k = jax.random.PRNGKey(2)
    w = jax.random.normal(k, (256, 384), jnp.float32)
    qw = quantize_weight_int4(w, group_size=32)
    deq = dequantize_weight(qw, jnp.float32)
    for rows in (1, 9, 130):
        x = jax.random.normal(jax.random.fold_in(k, rows), (rows, 256), jnp.float32)
        want = np.asarray(x @ deq)
        got = np.asarray(int4_matmul_pallas(x, qw["q4"], qw["scale"]))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_int4_not_divisible_raises():
    w = jnp.ones((60, 8), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        quantize_weight_int4(w, group_size=32)


def test_quantize_llama_params_bits4_and_engine_decode():
    from llama32mm_tpu.inference.engine import InferenceEngine

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    q4 = quantize_llama_params(params, bits=4, group_size=32)

    blocks = q4["language_model"]["model"]["blocks"]
    wq = blocks["att"]["W_query"]["weight"]
    assert is_quantized(wq) and wq["q4"].dtype == jnp.uint8
    L, H, O = params["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"].shape
    assert wq["q4"].shape == (L, H // 2, O)
    assert wq["scale"].shape == (L, H // 32, O)
    # vision tower untouched
    assert not is_quantized(q4["vision_model"]["embeddings"]["patch_embedding"]["weight"])

    # int4 logits track a model running on explicitly dequantized weights
    # (quantized leaves replaced the {"weight": ...} node for stacked linears
    # and sit under "weight" for lm_head — rebuild handles both)
    def rebuild(node):
        if is_quantized(node):
            return dequantize_weight(node, jnp.float32)
        if isinstance(node, dict):
            return {k: rebuild(v) for k, v in node.items()}
        return node

    deq_tree = rebuild(q4)

    ids = jax.random.randint(jax.random.PRNGKey(3), (1, 10), 0, cfg.vocab_size - 10)
    ids = ids.at[:, :4].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 28, 28))

    e4 = InferenceEngine(q4, cfg, max_cache_length=32)
    ed = InferenceEngine(deq_tree, cfg, max_cache_length=32)
    r4 = e4.generate(ids, px, max_new_tokens=5, temperature=0.0, eos_token_id=-1)
    rd = ed.generate(ids, px, max_new_tokens=5, temperature=0.0, eos_token_id=-1)
    # same quantized weights either way — only the grouped-matmul reduction
    # order differs, so prefill logits agree tightly and tokens match
    np.testing.assert_allclose(
        np.asarray(r4.prefill_logits), np.asarray(rd.prefill_logits), atol=1e-3, rtol=1e-3
    )
    np.testing.assert_array_equal(np.asarray(r4.tokens), np.asarray(rd.tokens))


def test_int4_rejects_fused_layout():
    from llama32mm_tpu.models.fuse import fuse_decoder_params

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    fused = fuse_decoder_params(params, cfg.text_config)
    with pytest.raises(ValueError, match="unfused"):
        quantize_llama_params(fused, bits=4, group_size=32)
    q4 = quantize_llama_params(params, bits=4, group_size=32)
    with pytest.raises(ValueError, match="unfused"):
        fuse_decoder_params(q4, cfg.text_config)


def test_int4_sharded_forward_matches(cpu_devices):
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual devices")
    from llama32mm_tpu.models.vlm import vlm_forward
    from llama32mm_tpu.parallel import create_mesh, shard_params

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    q4 = quantize_llama_params(params, bits=4, group_size=32)

    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 10), 0, cfg.vocab_size - 10)
    ids = ids.at[:, :4].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(6), (2, 3, 28, 28))

    want = vlm_forward(q4, cfg, input_ids=ids, pixel_values=px, impl="xla").logits
    mesh = create_mesh(dp=1, tp=2)
    sharded = shard_params(q4, cfg, mesh)
    got = vlm_forward(sharded, cfg, input_ids=ids, pixel_values=px, impl="xla").logits
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)
