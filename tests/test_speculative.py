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

pytestmark = pytest.mark.slow


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


def test_spec_rejects_batch(tiny):
    # spec × SAMPLING composes since the rejection-sampling verify (round 3):
    # temperature > 0 must run, not raise (see test_spec_sampling_* below);
    # multi-row batches still go through the batched server, not the engine.
    cfg, params = tiny
    ids, px = _prompt(cfg, 11), _px()
    eng = InferenceEngine(params, cfg, max_cache_length=96, spec_lookup=3)
    out = eng.generate(ids, px, max_new_tokens=4, temperature=0.7,
                       rng=jax.random.PRNGKey(0))
    assert int(out.num_generated[0]) == 4
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


# ---------------------------------------------------------------------------
# spec × sampling (rejection-sampling verification, round 3)
# ---------------------------------------------------------------------------


def test_spec_verify_greedy_rows_are_argmax():
    """T=0 rows of spec_verify_tokens are bit-exact argmax regardless of the
    rng — the greedy-equivalence regression for the rejection sampler."""
    from llama32mm_tpu.utils.sampling import spec_verify_tokens

    B, K, V = 3, 4, 32
    logits = jax.random.normal(jax.random.PRNGKey(0), (B, K + 1, V)) * 3.0
    drafts = jax.random.randint(jax.random.PRNGKey(1), (B, K), 0, V)
    t = jnp.asarray([0.0, 0.0, 0.0])
    nxt, acc = spec_verify_tokens(
        logits, drafts, jax.random.PRNGKey(7), t,
        jnp.full((B,), 0.9), jnp.full((B,), 50, jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(nxt), np.argmax(np.asarray(logits), -1))
    np.testing.assert_array_equal(
        np.asarray(acc), np.asarray(drafts) == np.argmax(np.asarray(logits), -1)[:, :K]
    )


def test_spec_verify_committed_token_distribution():
    """The FIRST committed token of a verify step must be distributed exactly
    per the row's filtered sampling distribution p — the defining property of
    rejection-sampling speculative decoding (accept draft d w.p. p(d), else
    resample from the renormalized residual). Empirical TV distance over many
    rngs must be small, for drafts both likely and unlikely under p."""
    from llama32mm_tpu.utils.sampling import filter_logits_traced, spec_verify_tokens

    V, K, N = 16, 1, 4000
    logits = jax.random.normal(jax.random.PRNGKey(3), (1, K + 1, V)) * 2.0
    temp = jnp.asarray([0.8])
    top_p = jnp.asarray([0.95])
    top_k = jnp.asarray([12], jnp.int32)

    filt = filter_logits_traced(logits[:, 0], temp, top_p, top_k)
    p = np.asarray(jax.nn.softmax(filt, axis=-1))[0]

    for draft_tok in (int(np.argmax(p)), int(np.argmin(p))):
        drafts = jnp.asarray([[draft_tok]], jnp.int32)

        def one(key):
            nxt, _ = spec_verify_tokens(logits, drafts, key, temp, top_p, top_k)
            return nxt[0, 0]

        toks = np.asarray(jax.vmap(one)(jax.random.split(jax.random.PRNGKey(11), N)))
        emp = np.bincount(toks, minlength=V) / N
        tv = 0.5 * np.abs(emp - p).sum()
        assert tv < 0.05, (draft_tok, tv)
        # filtered-out tokens must never be committed
        assert set(np.unique(toks)) <= set(np.where(p > 0)[0].tolist())


def test_spec_sampled_generation_runs_and_respects_budget(tiny):
    cfg, params = tiny
    ids, px = _prompt(cfg, 11), _px()
    eng = InferenceEngine(params, cfg, max_cache_length=96, spec_lookup=3)
    res = eng.generate(ids, px, max_new_tokens=9, temperature=0.9, top_p=0.85,
                       top_k=7, rng=jax.random.PRNGKey(5))
    assert int(res.num_generated[0]) == 9
    toks = np.asarray(res.tokens)[0, :9]
    assert ((0 <= toks) & (toks < cfg.vocab_size)).all()
