"""Speculative decoding in the continuous-batching server: per-slot
prompt-lookup drafts verified in one batched (K+1)-token forward must stay
greedy-exact — token-identical to the offline engine — across ragged slots,
admissions mid-decode, int8-KV, chunked admission, and prefix caching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.inference.engine import InferenceEngine
from llama32mm_tpu.inference.server import ContinuousBatchingServer

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _repetitive_prompt(cfg, s, key=1, period=4):
    """A prompt with a repeating token pattern so bigram drafts actually hit."""
    base = jax.random.randint(jax.random.PRNGKey(key), (period,), 0, cfg.vocab_size - 10)
    return np.asarray(jnp.tile(base, s // period + 1)[:s])


def _engine_tokens(cfg, params, ids, px, max_new, kv_dtype=None):
    eng = InferenceEngine(
        params, cfg, max_cache_length=64, prompt_buckets=None, kv_dtype=kv_dtype
    )
    out = eng.generate(
        ids[None], px, max_new_tokens=max_new, temperature=0.0, eos_token_id=-1
    )
    return np.asarray(out.tokens)[0, : int(out.num_generated[0])]


@pytest.mark.parametrize("kv_dtype", [None, "int8"])
def test_spec_server_matches_engine_staggered(tiny, kv_dtype):
    cfg, params = tiny
    prompts = [
        _repetitive_prompt(cfg, 9, key=1),
        _repetitive_prompt(cfg, 12, key=2, period=3),
        np.asarray(
            jax.random.randint(jax.random.PRNGKey(3), (10,), 0, cfg.vocab_size - 10)
        ),  # non-repetitive: drafts mostly rejected, must still be exact
    ]
    maxes = [8, 10, 6]
    want = [
        _engine_tokens(cfg, params, p, None, mn, kv_dtype)
        for p, mn in zip(prompts, maxes)
    ]

    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=None,
        kv_dtype=kv_dtype, steps_per_sync=2, eos_token_id=-1, spec_lookup=3,
    )
    rids = [srv.submit(p, None, max_new_tokens=mn) for p, mn in zip(prompts, maxes)]
    results = srv.run()
    for i, rid in enumerate(rids):
        np.testing.assert_array_equal(
            results[rid], want[i], err_msg=f"spec request {i} diverged"
        )
    st = srv.stats()
    assert st["spec_lookup"] == 3 and st["spec_tokens_per_step"] >= 1.0


def test_spec_with_chunked_admission_and_prefix(tiny):
    cfg, params = tiny
    prefix = _repetitive_prompt(cfg, 8, key=7)
    prompt = np.concatenate([prefix, _repetitive_prompt(cfg, 6, key=8, period=3)])
    want = _engine_tokens(cfg, params, prompt, None, 7)

    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=None,
        steps_per_sync=2, eos_token_id=-1, spec_lookup=2, prefill_chunk=4,
    )
    srv.register_prefix(prefix)
    rid = srv.submit(prompt, None, max_new_tokens=7)
    results = srv.run()
    np.testing.assert_array_equal(results[rid], want)


def test_spec_mid_decode_admission(tiny):
    cfg, params = tiny
    p0 = _repetitive_prompt(cfg, 10, key=11)
    p1 = _repetitive_prompt(cfg, 8, key=12, period=5)
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, prompt_buckets=None,
        steps_per_sync=1, eos_token_id=-1, spec_lookup=3,
    )
    r0 = srv.submit(p0, None, max_new_tokens=9)
    srv.step()
    assert len(srv.tokens_so_far(r0)) >= 1
    r1 = srv.submit(p1, None, max_new_tokens=5)  # waits for the single slot
    results = srv.run()
    np.testing.assert_array_equal(results[r0], _engine_tokens(cfg, params, p0, None, 9))
    np.testing.assert_array_equal(results[r1], _engine_tokens(cfg, params, p1, None, 5))


def test_spec_validation(tiny):
    cfg, params = tiny
    # spec × sampling COMPOSE since the rejection-sampling verify (round 3);
    # the old greedy-only constructor guard must be gone.
    ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, spec_lookup=3, temperature=0.7,
    )
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, spec_lookup=4, eos_token_id=-1,
    )
    ids = np.arange(10, dtype=np.int32)
    with pytest.raises(ValueError, match="spec headroom"):
        srv.submit(ids, None, max_new_tokens=64 - 10 - 2)  # K=4 headroom missing


def test_spec_stats_count_only_kept_tokens(tiny):
    """spec_tokens_per_step must reflect tokens requests actually kept:
    verify steps after a request's budget/EOS produce commits _emit discards,
    which previously inflated the acceptance stat."""
    cfg, params = tiny
    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=96, prompt_buckets=(16,),
        steps_per_sync=4, eos_token_id=-1, spec_lookup=2,
    )
    ids = jax.random.randint(jax.random.PRNGKey(40), (1, 9), 0, cfg.vocab_size - 10)
    # max_new=5 is NOT a multiple of the (K+1)=3 commits/step: the final
    # chunk overshoots and the overshoot must not be counted
    r1 = srv.submit(ids[0], None, max_new_tokens=5)
    r2 = srv.submit(ids[0], None, max_new_tokens=7)
    res = srv.run()
    # each request's FIRST token is sampled by the admission prefill, not a
    # spec verify step — decode-committed tokens are the rest
    kept = (len(res[r1]) - 1) + (len(res[r2]) - 1)
    assert srv._spec_tokens == kept, (srv._spec_tokens, kept)
    assert 0 < srv.stats()["spec_tokens_per_step"] <= srv.spec_lookup + 1
