"""int8 KV cache serving mode: per-position symmetric quantization with the
scale algebra folded into attention (scores x k_scale before the mask,
weights x v_scale before the PV product — ops/attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.inference.engine import InferenceEngine
from llama32mm_tpu.utils.kvcache import init_kv_cache, quantize_kv

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_quantize_kv_roundtrip_exact_for_grid_values():
    """Values already on the symmetric int8 grid round-trip exactly."""
    scale = 0.5
    x = (jnp.arange(-127, 128, dtype=jnp.float32) * scale).reshape(1, 1, 255)
    # pad head_dim to something realistic
    q, s = quantize_kv(x)
    np.testing.assert_allclose(
        np.asarray(q, np.float32) * np.asarray(s)[..., None], np.asarray(x), atol=1e-6
    )


def test_quantize_kv_relative_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 64))
    q, s = quantize_kv(x)
    deq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    err = np.abs(deq - np.asarray(x))
    # symmetric absmax quantization: |err| <= scale/2 per position
    assert np.all(err <= np.asarray(s)[..., None] * 0.5 + 1e-7)


def test_int8_cache_attention_close_to_float(tiny):
    """Full forward with an int8 cache tracks the float-cache forward."""
    from llama32mm_tpu.models.vlm import vlm_forward

    cfg, params = tiny
    tc = cfg.text_config
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size - 10)
    px = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 28, 28))
    mask = jnp.ones((2, 12), jnp.int32)

    cache_f = init_kv_cache(tc, 2, max_length=32, dtype=jnp.float32)
    cache_q = init_kv_cache(tc, 2, max_length=32, dtype=jnp.int8)
    assert cache_q.quantized and not cache_f.quantized

    out_f = vlm_forward(params, cfg, input_ids=ids, pixel_values=px,
                        attention_mask=mask, kv_cache=cache_f)
    out_q = vlm_forward(params, cfg, input_ids=ids, pixel_values=px,
                        attention_mask=mask, kv_cache=cache_q)
    f = np.asarray(out_f.logits)
    qv = np.asarray(out_q.logits)
    # lossy but close; and the cache really holds int8
    assert out_q.kv_cache.k.dtype == jnp.int8
    rel = np.abs(qv - f) / (np.abs(f).max() + 1e-9)
    assert rel.max() < 0.05, rel.max()
    # top-1 predictions preserved on a tiny random model
    assert (np.argmax(qv[:, -1], -1) == np.argmax(f[:, -1], -1)).all()


def test_int8_kv_engine_generates(tiny):
    cfg, params = tiny
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab_size - 10)
    ids = ids.at[:, :4].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    kw = dict(max_new_tokens=8, temperature=0.0, eos_token_id=-1, rng=jax.random.PRNGKey(0))

    ref = InferenceEngine(params, cfg, max_cache_length=64).generate(ids, px, **kw)
    q8 = InferenceEngine(params, cfg, max_cache_length=64, kv_dtype="int8").generate(
        ids, px, **kw
    )
    # greedy decode under mild quantization noise: most tokens agree on a
    # tiny random model; require the first few to match
    a, b = np.asarray(ref.tokens)[0], np.asarray(q8.tokens)[0]
    assert (a[:3] == b[:3]).all(), (a, b)


def test_flash_kernel_with_kv_scales_matches_xla():
    """The flash kernel folds int8-KV per-position scales identically to the
    dense XLA path (interpret mode on CPU)."""
    from llama32mm_tpu.ops.attention import AttnMask, gqa_attention
    from llama32mm_tpu.ops.pallas.attention import flash_gqa_attention

    b, nq, nkv, tq, tk, hd = 2, 4, 2, 16, 32, 16
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, nq, tq, hd))
    kf = jax.random.normal(jax.random.fold_in(key, 1), (b, nkv, tk, hd))
    vf = jax.random.normal(jax.random.fold_in(key, 2), (b, nkv, tk, hd))
    from llama32mm_tpu.utils.kvcache import quantize_kv

    kq, ks = quantize_kv(kf)
    vq, vs = quantize_kv(vf)
    kv_valid = jnp.ones((b, tk), jnp.int32).at[:, -4:].set(0)
    structured = AttnMask(kv_valid=kv_valid, q_offset=jnp.asarray(tk - tq - 4, jnp.int32))

    want = gqa_attention(
        q, kq.astype(q.dtype), vq.astype(q.dtype), structured=structured,
        impl="xla", k_scale=ks, v_scale=vs,
    )
    got = flash_gqa_attention(
        q, kq, vq, kv_valid, structured.q_offset, causal=True,
        k_scale=ks, v_scale=vs,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)
