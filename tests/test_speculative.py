"""Prompt-lookup speculative decoding: greedy-exactness is the contract —
spec_lookup must produce byte-identical tokens to the standard engine for any
prompt, eos placement, and budget clamp, while taking <= as many loop
iterations (strictly fewer once the continuation develops repeats)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.inference.engine import InferenceEngine


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _prompt(cfg, s, key=1):
    n_img = cfg.text_config.num_image_tokens
    ids = jax.random.randint(jax.random.PRNGKey(key), (1, s), 0, cfg.vocab_size - 10)
    return ids.at[:, :n_img].set(cfg.image_token_index)


def _px():
    return jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))


def _run(cfg, params, ids, px, max_new, eos=-1, spec=0, buckets=None):
    eng = InferenceEngine(
        params, cfg, max_cache_length=96, spec_lookup=spec, prompt_buckets=buckets
    )
    res = eng.generate(ids, px, max_new_tokens=max_new, temperature=0.0, eos_token_id=eos)
    n = int(res.num_generated[0])
    return np.asarray(res.tokens)[0, :n], res


@pytest.mark.parametrize("max_new", [1, 5, 24])
def test_spec_matches_greedy(tiny, max_new):
    cfg, params = tiny
    ids, px = _prompt(cfg, 11), _px()
    want, _ = _run(cfg, params, ids, px, max_new)
    got, res = _run(cfg, params, ids, px, max_new, spec=3)
    np.testing.assert_array_equal(got, want)
    assert int(res.steps) <= max_new


def test_spec_accepts_on_cyclic_continuation(tiny):
    # tiny random models fall into greedy cycles; once the output repeats,
    # the bigram lookup drafts the cycle and whole chunks verify — strictly
    # fewer loop iterations than tokens.
    cfg, params = tiny
    ids, px = _prompt(cfg, 9, key=5), _px()
    want, _ = _run(cfg, params, ids, px, 40)
    got, res = _run(cfg, params, ids, px, 40, spec=4)
    np.testing.assert_array_equal(got, want)
    assert int(res.num_generated[0]) == 40
    assert int(res.steps) < 40, f"no drafts accepted in {int(res.steps)} steps"


def test_spec_eos_mid_chunk(tiny):
    cfg, params = tiny
    ids, px = _prompt(cfg, 11), _px()
    ref, _ = _run(cfg, params, ids, px, 24)
    # choose an eos that greedy emits mid-stream so the spec path must cut a
    # verified chunk at the right position
    eos = int(ref[min(4, len(ref) - 1)])
    want, _ = _run(cfg, params, ids, px, 24, eos=eos)
    got, res = _run(cfg, params, ids, px, 24, eos=eos, spec=3)
    np.testing.assert_array_equal(got, want)
    assert got[-1] == eos


def test_spec_bucketed_prompt_matches(tiny):
    # bucket padding shifts cache slots but not RoPE positions or the lookup
    # buffer — tokens must be identical to the unbucketed run
    cfg, params = tiny
    ids, px = _prompt(cfg, 11), _px()
    want, _ = _run(cfg, params, ids, px, 16)
    got, _ = _run(cfg, params, ids, px, 16, spec=3, buckets=(16,))
    np.testing.assert_array_equal(got, want)


def test_spec_rejects_sampling_and_batch(tiny):
    cfg, params = tiny
    ids, px = _prompt(cfg, 11), _px()
    eng = InferenceEngine(params, cfg, max_cache_length=96, spec_lookup=3)
    with pytest.raises(ValueError, match="greedy-only"):
        eng.generate(ids, px, max_new_tokens=4, temperature=0.7)
    ids2 = jnp.concatenate([ids, ids], axis=0)
    px2 = jnp.concatenate([px, px], axis=0)
    with pytest.raises(ValueError, match="batch size 1"):
        eng.generate(ids2, px2, max_new_tokens=4, temperature=0.0)


def test_spec_composes_with_int8_serving(tiny):
    # spec_lookup through int8 weights + int8 KV must equal the int8 engine's
    # greedy output (the multi-token verify step quantizes K+1 cache entries
    # at once; stale-slot masking must still hold)
    from llama32mm_tpu.ops.quant import quantize_llama_params

    cfg, params = tiny
    q8 = quantize_llama_params(params)
    ids, px = _prompt(cfg, 11), _px()
    eng = InferenceEngine(q8, cfg, max_cache_length=96, kv_dtype="int8")
    res = eng.generate(ids, px, max_new_tokens=20, temperature=0.0, eos_token_id=-1)
    want = np.asarray(res.tokens)[0, : int(res.num_generated[0])]

    eng_s = InferenceEngine(q8, cfg, max_cache_length=96, kv_dtype="int8", spec_lookup=3)
    res_s = eng_s.generate(ids, px, max_new_tokens=20, temperature=0.0, eos_token_id=-1)
    got = np.asarray(res_s.tokens)[0, : int(res_s.num_generated[0])]
    np.testing.assert_array_equal(got, want)


def test_spec_auto_bucket_reserves_headroom(tiny):
    """Auto-bucketing must leave spec_lookup slots of cache headroom: a
    prompt that fits unbucketed (s + max_new + K <= cache) must not be
    rejected after padding (regression: _bucketed_len was called without the
    +K, padding into the verify-write headroom)."""
    cfg, params = tiny
    cache, max_new, K = 128, 6, 2
    s = cache - max_new - K  # fits exactly unbucketed
    ids = jax.random.randint(jax.random.PRNGKey(9), (1, s), 0, cfg.vocab_size - 10)
    eng = InferenceEngine(
        params, cfg, max_cache_length=cache, spec_lookup=K, prompt_buckets="auto"
    )
    res = eng.generate(ids, None, max_new_tokens=max_new, temperature=0.0,
                       eos_token_id=-1)
    got = np.asarray(res.tokens)[0, : int(res.num_generated[0])]
    ref = InferenceEngine(params, cfg, max_cache_length=cache).generate(
        ids, None, max_new_tokens=max_new, temperature=0.0, eos_token_id=-1
    )
    want = np.asarray(ref.tokens)[0, : int(ref.num_generated[0])]
    np.testing.assert_array_equal(got, want)
