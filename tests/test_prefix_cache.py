"""Prefix caching in the continuous-batching server: requests sharing a
registered prompt prefix skip its prefill (admission copies the cached KV and
prefills only the suffix at q_offset = prefix_len) and must stay
token-identical to uncached serving. SURVEY §2.8: no serving layer exists in
the reference at all — this is net-new capability."""

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


def _engine_tokens(cfg, params, ids, px, max_new, kv_dtype=None):
    eng = InferenceEngine(
        params, cfg, max_cache_length=64, prompt_buckets=None, kv_dtype=kv_dtype
    )
    out = eng.generate(ids, px, max_new_tokens=max_new, temperature=0.0, eos_token_id=-1)
    return np.asarray(out.tokens)[0, : int(out.num_generated[0])]


def _text_ids(cfg, s, key):
    return np.asarray(
        jax.random.randint(jax.random.PRNGKey(key), (s,), 0, cfg.vocab_size - 10)
    )


@pytest.mark.parametrize("kv_dtype", [None, "int8"])
def test_text_prefix_auto_match_token_identical(tiny, kv_dtype):
    cfg, params = tiny
    prefix = _text_ids(cfg, 8, key=11)
    suffixes = [_text_ids(cfg, 5, key=12), _text_ids(cfg, 9, key=13)]
    prompts = [np.concatenate([prefix, sfx]) for sfx in suffixes]
    want = [
        _engine_tokens(cfg, params, jnp.asarray(p)[None], None, 6, kv_dtype)
        for p in prompts
    ]

    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=None,
        kv_dtype=kv_dtype, steps_per_sync=3, eos_token_id=-1,
    )
    pid = srv.register_prefix(prefix)
    rids = [srv.submit(p, None, max_new_tokens=6) for p in prompts]
    results = srv.run()
    for i, rid in enumerate(rids):
        np.testing.assert_array_equal(
            results[rid], want[i], err_msg=f"prefixed request {i} diverged"
        )
    assert srv._prefixes[pid].hits == 2
    st = srv.stats()
    assert st["prefixes"] == 1 and st["prefix_hits"] == 2
    srv.drop_prefix(pid)
    assert "prefixes" not in srv.stats()


def test_prefix_with_chunked_admission(tiny):
    # prefix + Sarathi-style chunked suffix prefill compose: the admission
    # starts at off=prefix_len and chunks only the suffix
    cfg, params = tiny
    prefix = _text_ids(cfg, 10, key=21)
    prompt = np.concatenate([prefix, _text_ids(cfg, 7, key=22)])
    want = _engine_tokens(cfg, params, jnp.asarray(prompt)[None], None, 5)

    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, prompt_buckets=None,
        steps_per_sync=2, eos_token_id=-1, prefill_chunk=4,
    )
    srv.register_prefix(prefix)
    rid = srv.submit(prompt, None, max_new_tokens=5)
    srv.step()
    # only the 7-token suffix (chunk-aligned to 8) prefills: 4/8 after chunk 1
    st = srv.stats()
    assert st.get("admitting") == rid and st["admit_progress"] == "14/18"
    results = srv.run()
    np.testing.assert_array_equal(results[rid], want)


def test_image_prefix_explicit_id(tiny):
    # the image + instruction template as a prefix: the request carries only
    # the suffix ids appended to the prefix ids and NO pixel_values
    cfg, params = tiny
    n_img = cfg.text_config.num_image_tokens
    px = jax.random.normal(jax.random.PRNGKey(2), (3, 28, 28))
    head = _text_ids(cfg, n_img + 6, key=31).copy()
    head[:n_img] = cfg.image_token_index
    full = np.concatenate([head, _text_ids(cfg, 5, key=32)])
    want = _engine_tokens(cfg, params, jnp.asarray(full)[None], jnp.asarray(px)[None], 6)

    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, prompt_buckets=None,
        steps_per_sync=3, eos_token_id=-1,
    )
    pid = srv.register_prefix(head, pixel_values=px)
    rid = srv.submit(full, None, max_new_tokens=6, prefix_id=pid)
    results = srv.run()
    np.testing.assert_array_equal(results[rid], want)
    assert srv._prefixes[pid].hits == 1


def test_longest_prefix_wins_and_nonmatch_ignored(tiny):
    cfg, params = tiny
    p_short = _text_ids(cfg, 4, key=41)
    p_long = np.concatenate([p_short, _text_ids(cfg, 5, key=42)])
    other = _text_ids(cfg, 12, key=43)

    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, prompt_buckets=None,
        steps_per_sync=3, eos_token_id=-1,
    )
    srv.register_prefix(p_short)
    pid_long = srv.register_prefix(p_long)

    prompt = np.concatenate([p_long, _text_ids(cfg, 3, key=44)])
    want = _engine_tokens(cfg, params, jnp.asarray(prompt)[None], None, 4)
    r0 = srv.submit(prompt, None, max_new_tokens=4)
    r1 = srv.submit(other, None, max_new_tokens=4)  # no prefix matches
    results = srv.run()
    np.testing.assert_array_equal(results[r0], want)
    np.testing.assert_array_equal(
        results[r1], _engine_tokens(cfg, params, jnp.asarray(other)[None], None, 4)
    )
    assert srv._prefixes[pid_long].hits == 1
    assert srv._results[r1].prefix is None


def test_prefix_validation_errors(tiny):
    cfg, params = tiny
    px = jax.random.normal(jax.random.PRNGKey(2), (3, 28, 28))
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, prompt_buckets=None, eos_token_id=-1,
    )
    prefix = _text_ids(cfg, 6, key=51)
    pid = srv.register_prefix(prefix)

    with pytest.raises(ValueError, match="extend past the prefix"):
        srv.submit(prefix, None, max_new_tokens=4, prefix_id=pid)
    with pytest.raises(ValueError, match="does not start with"):
        srv.submit(_text_ids(cfg, 9, key=52), None, max_new_tokens=4, prefix_id=pid)
    with pytest.raises(ValueError, match="auto-match"):
        srv.register_prefix(prefix, pixel_values=px, auto_match=True)
    img_pid = srv.register_prefix(
        np.full(cfg.text_config.num_image_tokens + 2, cfg.image_token_index),
        pixel_values=px,
    )
    bad = np.concatenate(
        [np.full(cfg.text_config.num_image_tokens + 2, cfg.image_token_index),
         _text_ids(cfg, 3, key=53)]
    )
    with pytest.raises(ValueError, match="already carries the image"):
        srv.submit(bad, px, max_new_tokens=4, prefix_id=img_pid)
