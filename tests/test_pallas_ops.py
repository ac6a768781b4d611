"""Pallas kernel parity tests (interpret mode on CPU — the sanitizer-equivalent
run per SURVEY §5). Each kernel is checked against the XLA fallback (which the
reference-parity tests already pin to the oracle), including gradients against
``jax.grad`` of the naive composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu.ops.attention import (
    AttnMask,
    dense_from_structured,
    gqa_attention,
)
from llama32mm_tpu.ops.pallas.attention import flash_gqa_attention
from llama32mm_tpu.ops.pallas.rmsnorm import fused_add_rmsnorm_pallas
from llama32mm_tpu.ops.pallas.swiglu import fused_swiglu_pallas, swiglu_down_pallas
from llama32mm_tpu.ops.rmsnorm import _rmsnorm_xla
from llama32mm_tpu.ops.swiglu import _swiglu_xla

ATOL = 1e-5


# ---------------------------------------------------------------------------
# fused Add-RMSNorm
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(4, 7, 64), (2, 160), (3, 9, 256)])
def test_rmsnorm_forward_parity(shape):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(keys[0], shape, jnp.float32)
    res = jax.random.normal(keys[1], shape, jnp.float32)
    w = jax.random.normal(keys[2], shape[-1:], jnp.float32) + 1.0
    eps = 1e-5
    got = fused_add_rmsnorm_pallas(x, w, res, eps)
    want = _rmsnorm_xla(x, w, eps, res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL, rtol=1e-5)


def test_rmsnorm_grad_parity():
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    shape = (6, 96)
    x = jax.random.normal(keys[0], shape, jnp.float32)
    res = jax.random.normal(keys[1], shape, jnp.float32)
    w = jax.random.normal(keys[2], (96,), jnp.float32) + 1.0
    eps = 1e-5

    def loss_pallas(x, w, res):
        return jnp.sum(jnp.sin(fused_add_rmsnorm_pallas(x, w, res, eps)))

    def loss_xla(x, w, res):
        return jnp.sum(jnp.sin(_rmsnorm_xla(x, w, eps, res)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, res)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, res)
    for a, b, name in zip(gp, gx, ("dx", "dw", "dres")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-5,
                                   err_msg=name)


def test_rmsnorm_grad_symmetric_in_x_and_residual():
    # (x, residual) enter only as x+residual → gradients must be identical
    # (SURVEY §2.9 #13).
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(keys[0], (5, 64))
    res = jax.random.normal(keys[1], (5, 64))
    w = jnp.ones((64,))

    g = jax.grad(lambda x, res: jnp.sum(fused_add_rmsnorm_pallas(x, w, res, 1e-6) ** 2),
                 argnums=(0, 1))(x, res)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(g[1]), atol=1e-6)


# ---------------------------------------------------------------------------
# fused SwiGLU
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("r,h,i", [(16, 64, 128), (10, 96, 200), (33, 128, 384)])
def test_swiglu_forward_parity(r, h, i):
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(keys[0], (r, h), jnp.float32)
    wg = jax.random.normal(keys[1], (h, i), jnp.float32) * 0.1
    wu = jax.random.normal(keys[2], (h, i), jnp.float32) * 0.1
    got = fused_swiglu_pallas(x, wg, wu)
    want = _swiglu_xla(x, wg, wu, None, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL, rtol=1e-4)


def test_swiglu_grad_parity():
    keys = jax.random.split(jax.random.PRNGKey(4), 3)
    r, h, i = 12, 64, 160
    x = jax.random.normal(keys[0], (r, h), jnp.float32)
    wg = jax.random.normal(keys[1], (h, i), jnp.float32) * 0.1
    wu = jax.random.normal(keys[2], (h, i), jnp.float32) * 0.1

    def lp(x, wg, wu):
        return jnp.sum(jnp.tanh(fused_swiglu_pallas(x, wg, wu)))

    def lx(x, wg, wu):
        return jnp.sum(jnp.tanh(_swiglu_xla(x, wg, wu, None, None)))

    gp = jax.grad(lp, argnums=(0, 1, 2))(x, wg, wu)
    gx = jax.grad(lx, argnums=(0, 1, 2))(x, wg, wu)
    for a, b, name in zip(gp, gx, ("dx", "dwg", "dwu")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5,
                                   err_msg=name)


def test_swiglu_batched_shape():
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 7, 64))
    wg = jax.random.normal(jax.random.PRNGKey(6), (64, 128)) * 0.1
    wu = jax.random.normal(jax.random.PRNGKey(7), (64, 128)) * 0.1
    out = fused_swiglu_pallas(x, wg, wu)
    assert out.shape == (2, 7, 128)


@pytest.mark.parametrize("r,h,i", [(16, 64, 128), (9, 96, 200)])
def test_swiglu_down_parity(r, h, i):
    keys = jax.random.split(jax.random.PRNGKey(8), 4)
    x = jax.random.normal(keys[0], (r, h), jnp.float32)
    wg = jax.random.normal(keys[1], (h, i), jnp.float32) * 0.1
    wu = jax.random.normal(keys[2], (h, i), jnp.float32) * 0.1
    wd = jax.random.normal(keys[3], (i, h), jnp.float32) * 0.1
    got = swiglu_down_pallas(x, wg, wu, wd)
    want = jnp.matmul(_swiglu_xla(x, wg, wu, None, None), wd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# flash GQA attention
# ---------------------------------------------------------------------------


def _attn_case(b, nq, nkv, tq, tk, hd, seed=0, pad_tail=0, q_offset=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(keys[0], (b, nq, tq, hd), jnp.float32)
    k = jax.random.normal(keys[1], (b, nkv, tk, hd), jnp.float32)
    v = jax.random.normal(keys[2], (b, nkv, tk, hd), jnp.float32)
    kv_valid = np.ones((b, tk), np.int32)
    if pad_tail:
        kv_valid[:, -pad_tail:] = 0
    structured = AttnMask(jnp.asarray(kv_valid), jnp.asarray(q_offset, jnp.int32))
    return q, k, v, structured


@pytest.mark.parametrize(
    "b,nq,nkv,tq,tk,hd",
    [
        (1, 4, 2, 16, 16, 32),
        (2, 4, 4, 24, 24, 64),   # MHA
        (1, 8, 2, 40, 40, 32),   # group=4
    ],
)
def test_flash_matches_dense_causal(b, nq, nkv, tq, tk, hd):
    q, k, v, structured = _attn_case(b, nq, nkv, tq, tk, hd)
    dense = dense_from_structured(structured, tq, tk, jnp.float32)
    want = gqa_attention(q, k, v, mask=dense, impl="xla")
    got = flash_gqa_attention(q, k, v, structured.kv_valid, structured.q_offset)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_flash_cache_prefill_with_tail():
    # queries over the first 12 slots of a 32-slot cache; tail invalid
    b, nq, nkv, tq, tk, hd = 1, 4, 2, 12, 32, 32
    q, k, v, _ = _attn_case(b, nq, nkv, tq, tk, hd, seed=2)
    kv_valid = np.zeros((b, tk), np.int32)
    kv_valid[:, :tq] = 1
    structured = AttnMask(jnp.asarray(kv_valid), jnp.asarray(0, jnp.int32))
    dense = dense_from_structured(structured, tq, tk, jnp.float32)
    want = gqa_attention(q, k, v, mask=dense, impl="xla")
    got = flash_gqa_attention(q, k, v, structured.kv_valid, structured.q_offset)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_flash_nonzero_q_offset():
    # chunked prefill: queries at absolute positions 8..15 over 24 cached keys
    b, nq, nkv, tq, tk, hd = 1, 4, 2, 8, 24, 32
    q, k, v, _ = _attn_case(b, nq, nkv, tq, tk, hd, seed=3)
    kv_valid = np.zeros((b, tk), np.int32)
    kv_valid[:, :16] = 1
    structured = AttnMask(jnp.asarray(kv_valid), jnp.asarray(8, jnp.int32))
    dense = dense_from_structured(structured, tq, tk, jnp.float32)
    want = gqa_attention(q, k, v, mask=dense, impl="xla")
    got = flash_gqa_attention(q, k, v, structured.kv_valid, structured.q_offset)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_flash_multi_kv_block_accumulation():
    # force > 1 KV block to exercise the online-softmax accumulation
    b, nq, nkv, tq, tk, hd = 1, 2, 1, 8, 300, 32
    q, k, v, structured = _attn_case(b, nq, nkv, tq, tk, hd, seed=4, pad_tail=20)
    dense = dense_from_structured(structured, tq, tk, jnp.float32)
    want = gqa_attention(q, k, v, mask=dense, impl="xla")
    got = flash_gqa_attention(
        q, k, v, structured.kv_valid, structured.q_offset, block_k=128
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# end-to-end: tiny model, pallas vs xla impl
# ---------------------------------------------------------------------------


def test_tiny_model_pallas_matches_xla():
    from llama32mm_tpu import init_vlm_params, tiny_mllama_config
    from llama32mm_tpu.models.vlm import vlm_forward

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size - 10)
    ids = ids.at[:, :4].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 28, 28))

    out_x = vlm_forward(params, cfg, input_ids=ids, pixel_values=px, impl="xla")
    out_p = vlm_forward(params, cfg, input_ids=ids, pixel_values=px, impl="pallas")
    np.testing.assert_allclose(
        np.asarray(out_p.logits), np.asarray(out_x.logits), atol=5e-5, rtol=5e-5
    )


def test_tiny_model_pallas_engine_decode_matches_xla():
    import os

    from llama32mm_tpu import init_vlm_params, tiny_mllama_config
    from llama32mm_tpu.inference.engine import InferenceEngine

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab_size - 10)
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))

    eng_x = InferenceEngine(params, cfg, max_cache_length=48, impl="xla")
    eng_p = InferenceEngine(params, cfg, max_cache_length=48, impl="pallas")
    res_x = eng_x.generate(ids, px, max_new_tokens=8, eos_token_id=-1)
    res_p = eng_p.generate(ids, px, max_new_tokens=8, eos_token_id=-1)
    np.testing.assert_array_equal(np.asarray(res_x.tokens), np.asarray(res_p.tokens))


# ---------------------------------------------------------------------------
# flash GQA attention — custom VJP (VERDICT r1 #2: the reference ships
# backward kernels for its fused ops; grads must span multiple K blocks)
# ---------------------------------------------------------------------------


def _flash_grad_case(causal, tq, tk, q_offset, seed=3):
    b, nq, nkv, hd = 2, 4, 2, 16
    keys = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(keys[0], (b, nq, tq, hd), jnp.float32)
    k = jax.random.normal(keys[1], (b, nkv, tk, hd), jnp.float32)
    v = jax.random.normal(keys[2], (b, nkv, tk, hd), jnp.float32)
    ct = jax.random.normal(keys[3], (b, nq, tq, hd), jnp.float32)  # cotangent
    kv_valid = np.ones((b, tk), np.int32)
    # block interior + tail slots (never slot 0: causal q0 must attend itself)
    for col in (3, tk // 2, tk - 1):
        kv_valid[:, col] = 0
    kvv = jnp.asarray(kv_valid)
    structured = AttnMask(kvv, jnp.asarray(q_offset, jnp.int32))
    return q, k, v, ct, kvv, structured


@pytest.mark.parametrize(
    "causal,tq,tk,q_offset,bq,bk",
    [
        (True, 20, 280, 260, 8, 128),   # decode-style: ragged q + 3 K blocks
        (True, 48, 48, 0, 16, 128),     # training prefill, multiple q blocks
        (False, 40, 40, 0, 8, 128),     # vision (non-causal)
    ],
)
def test_flash_vjp_grad_parity(causal, tq, tk, q_offset, bq, bk):
    """jax.grad through the Pallas flash path matches the dense-XLA
    composition's gradient, spanning multiple K blocks (like
    test_swiglu_grad_parity)."""
    q, k, v, ct, kvv, structured = _flash_grad_case(causal, tq, tk, q_offset)
    dense = dense_from_structured(structured, tq, tk, jnp.float32, causal=causal)

    def f_flash(q, k, v):
        out = flash_gqa_attention(
            q, k, v, kvv, structured.q_offset, causal=causal, block_q=bq, block_k=bk
        )
        return jnp.sum(out * ct)

    def f_dense(q, k, v):
        from llama32mm_tpu.ops.attention import _gqa_attention_xla

        return jnp.sum(_gqa_attention_xla(q, k, v, dense) * ct)

    # value parity first
    np.testing.assert_allclose(float(f_flash(q, k, v)), float(f_dense(q, k, v)),
                               rtol=2e-5, atol=2e-5)
    got = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(f_dense, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-4,
                                   err_msg=name)


def test_flash_vjp_under_jit_and_second_call():
    """The VJP composes with jit and reuses across calls (no trace leaks)."""
    q, k, v, ct, kvv, structured = _flash_grad_case(True, 16, 144, 128)

    @jax.jit
    def g(q, k, v):
        out = flash_gqa_attention(q, k, v, kvv, structured.q_offset,
                                  causal=True, block_q=8, block_k=128)
        return jax.grad(lambda q: jnp.sum(flash_gqa_attention(
            q, k, v, kvv, structured.q_offset, causal=True, block_q=8, block_k=128
        ) * ct))(q)

    d1 = g(q, k, v)
    d2 = g(q + 0.1, k, v)
    assert np.all(np.isfinite(np.asarray(d1))) and np.all(np.isfinite(np.asarray(d2)))


@pytest.mark.slow
def test_lora_train_step_forced_pallas_matches_xla():
    """A full LoRA train step with impl='pallas' (flash attention everywhere,
    incl. the non-causal ViT) produces gradients matching impl='xla'."""
    from llama32mm_tpu import init_vlm_params, tiny_mllama_config
    from llama32mm_tpu.models.vlm import vlm_forward
    from llama32mm_tpu.train.lora import init_lora_params

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora_params(jax.random.PRNGKey(1), cfg.text_config, rank=4)
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 12), 0, cfg.vocab_size - 10)
    ids = ids.at[:, :4].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 28, 28))
    labels = ids.at[:, :4].set(-100)

    def loss(lora, impl):
        return vlm_forward(params, cfg, input_ids=ids, pixel_values=px,
                           labels=labels, lora=lora, impl=impl).loss

    l_p, g_p = jax.value_and_grad(lambda l: loss(l, "pallas"))(lora)
    l_x, g_x = jax.value_and_grad(lambda l: loss(l, "xla"))(lora)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=1e-4)

    def check(path, gp, gx):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=5e-3, atol=5e-4,
                                   err_msg=jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(check, g_p, g_x)
