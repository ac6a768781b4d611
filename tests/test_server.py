"""Continuous-batching server: staggered requests in a shared slot pool must
reproduce the offline engine's tokens exactly (greedy), across ragged prompt
lengths, admissions mid-decode, slot reuse, and the int8-KV serving mode."""

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


def _prompt(cfg, s, key=1):
    n_img = cfg.text_config.num_image_tokens
    ids = jax.random.randint(jax.random.PRNGKey(key), (1, s), 0, cfg.vocab_size - 10)
    return ids.at[:, :n_img].set(cfg.image_token_index)


def _engine_tokens(cfg, params, ids, px, max_new, buckets, kv_dtype=None):
    eng = InferenceEngine(
        params, cfg, max_cache_length=64, prompt_buckets=buckets, kv_dtype=kv_dtype
    )
    out = eng.generate(ids, px, max_new_tokens=max_new, temperature=0.0, eos_token_id=-1)
    return np.asarray(out.tokens)[0, : int(out.num_generated[0])]


@pytest.mark.parametrize("kv_dtype", [None, "int8"])
def test_staggered_requests_match_offline_engine(tiny, kv_dtype):
    cfg, params = tiny
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    buckets = (16, 24)

    # 3 ragged requests through 2 slots: r0+r1 admitted together, r2 must
    # wait for a slot to free (continuous batching: admitted mid-decode of
    # the survivor), exercising slot reuse after r0/r1 finish.
    specs = [(9, 1, 6), (12, 5, 10), (14, 7, 4)]  # (prompt_len, seed, max_new)
    want = {
        i: _engine_tokens(
            cfg, params, _prompt(cfg, s, key), px, mn, buckets, kv_dtype
        )
        for i, (s, key, mn) in enumerate(specs)
    }

    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=buckets,
        kv_dtype=kv_dtype, steps_per_sync=3, eos_token_id=-1,
    )
    rids = [
        srv.submit(_prompt(cfg, s, key)[0], px[0], max_new_tokens=mn)
        for (s, key, mn) in specs
    ]
    results = srv.run()

    for i, rid in enumerate(rids):
        np.testing.assert_array_equal(
            results[rid], want[i], err_msg=f"request {i} diverged from engine"
        )


@pytest.mark.parametrize("kv_dtype", [None, "int8"])
def test_chunked_admission_matches_offline_engine(tiny, kv_dtype):
    # prefill_chunk smaller than every prompt → each admission spans several
    # step() calls with decode dispatches of the live slots in between; the
    # tokens must still be byte-identical to solo engine runs
    cfg, params = tiny
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    specs = [(9, 1, 6), (12, 5, 10), (14, 7, 4)]
    want = {
        i: _engine_tokens(cfg, params, _prompt(cfg, s, key), px, mn, None, kv_dtype)
        for i, (s, key, mn) in enumerate(specs)
    }

    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=None,
        kv_dtype=kv_dtype, steps_per_sync=3, eos_token_id=-1, prefill_chunk=4,
    )
    rids = [
        srv.submit(_prompt(cfg, s, key)[0], px[0], max_new_tokens=mn)
        for (s, key, mn) in specs
    ]
    results = srv.run()
    for i, rid in enumerate(rids):
        np.testing.assert_array_equal(
            results[rid], want[i], err_msg=f"request {i} diverged (chunked admission)"
        )
    # chunk-aligned buckets: one chunk executable serves all three prompts
    assert len(srv._chunk_jit) == 1


def test_chunked_text_only_and_progress_stats(tiny):
    cfg, params = tiny
    ids = jax.random.randint(jax.random.PRNGKey(9), (1, 10), 0, cfg.vocab_size - 10)
    want = _engine_tokens(cfg, params, ids, None, 5, None)
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, prompt_buckets=None,
        eos_token_id=-1, prefill_chunk=3,
    )
    rid = srv.submit(ids[0], None, max_new_tokens=5)
    srv.step()  # first chunk only
    st = srv.stats()
    assert st["admitting"] == rid and st["admit_progress"] == "3/12"
    results = srv.run()
    np.testing.assert_array_equal(results[rid], want)


def test_int4_params_serve_through_server(tiny):
    # capacity mode (docs/serving.md): int4-packed weights through the full
    # continuous-batching path, token-equal to the offline int4 engine
    from llama32mm_tpu.ops.quant import quantize_llama_params

    cfg, params = tiny
    q4 = quantize_llama_params(params, bits=4, group_size=32)
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    buckets = (16,)
    ids = _prompt(cfg, 11, key=3)
    want = _engine_tokens(cfg, q4, ids, px, 6, buckets, kv_dtype="int8")

    srv = ContinuousBatchingServer(
        q4, cfg, slots=2, max_cache_length=64, prompt_buckets=buckets,
        kv_dtype="int8", steps_per_sync=3, eos_token_id=-1,
    )
    rid = srv.submit(ids[0], px[0], max_new_tokens=6)
    results = srv.run()
    np.testing.assert_array_equal(results[rid], want)


def test_mid_decode_admission_and_program_reuse(tiny):
    cfg, params = tiny
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=(16,),
        steps_per_sync=2, eos_token_id=-1,
    )
    r0 = srv.submit(_prompt(cfg, 9, 1)[0], px[0], max_new_tokens=9)
    srv.step()  # admit r0, decode a chunk
    assert not srv.is_finished(r0) and len(srv.tokens_so_far(r0)) >= 1

    # second request arrives while r0 is mid-generation
    r1 = srv.submit(_prompt(cfg, 11, 3)[0], px[0], max_new_tokens=5)
    results = srv.run()

    np.testing.assert_array_equal(
        results[r0], _engine_tokens(cfg, params, _prompt(cfg, 9, 1), px, 9, (16,))
    )
    np.testing.assert_array_equal(
        results[r1], _engine_tokens(cfg, params, _prompt(cfg, 11, 3), px, 5, (16,))
    )
    # one prefill program (both prompts share the 16-bucket), decode programs
    # keyed only by chunk length — slot/arrival patterns reuse executables
    assert set(srv._prefill_jit) == {(16, True)}
    (pf,) = srv._prefill_jit.values()
    assert pf._cache_size() == 1


def test_eos_frees_slot(tiny):
    cfg, params = tiny
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    # discover a token the greedy path actually emits, then declare it EOS
    toks = _engine_tokens(cfg, params, _prompt(cfg, 9, 1), px, 6, (16,))
    eos = int(toks[2])

    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, prompt_buckets=(16,),
        steps_per_sync=4, eos_token_id=eos,
    )
    rid = srv.submit(_prompt(cfg, 9, 1)[0], px[0], max_new_tokens=6)
    results = srv.run()
    got = results[rid]
    assert got[-1] == eos and len(got) <= 3
    np.testing.assert_array_equal(got, toks[: len(got)])
    assert srv._by_slot == [None]


def test_text_only_requests(tiny):
    cfg, params = tiny
    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=(16,),
        steps_per_sync=4, eos_token_id=-1,
    )
    ids = jax.random.randint(jax.random.PRNGKey(9), (1, 10), 0, cfg.vocab_size - 10)
    rid = srv.submit(ids[0], None, max_new_tokens=5)
    results = srv.run()

    eng = InferenceEngine(params, cfg, max_cache_length=64, prompt_buckets=(16,))
    want = eng.generate(ids, None, max_new_tokens=5, temperature=0.0, eos_token_id=-1)
    np.testing.assert_array_equal(results[rid], np.asarray(want.tokens)[0, :5])


def test_cancel_request(tiny):
    cfg, params = tiny
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, prompt_buckets=(16,),
        steps_per_sync=2, eos_token_id=-1,
    )
    ids = jax.random.randint(jax.random.PRNGKey(20), (1, 10), 0, cfg.vocab_size - 10)
    # cancel while queued (no slot yet: r0 occupies the single slot)
    r0 = srv.submit(ids[0], None, max_new_tokens=8)
    r1 = srv.submit(ids[0], None, max_new_tokens=8)
    srv.step()
    assert srv.cancel(r1) and srv.is_finished(r1)
    # cancel mid-decode: slot frees for the next request
    assert not srv.is_finished(r0)
    assert srv.cancel(r0) and srv._by_slot == [None]
    assert not srv.cancel(r0)  # already finished
    r2 = srv.submit(ids[0], None, max_new_tokens=4)
    results = srv.run()
    assert len(results[r2]) == 4
    np.testing.assert_array_equal(
        results[r2], _engine_tokens(cfg, params, ids, None, 4, (16,))
    )


def test_decode_chunk_ladder_bounds_executables(tiny):
    """Varying max_new_tokens must NOT mint a decode executable per distinct
    tail length: chunk sizes are quantized to powers of two <= steps_per_sync
    (a fresh compile mid-serving is tens of seconds on a tunneled backend),
    and warmup() pre-builds the whole ladder."""
    cfg, params = tiny
    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=(16,),
        steps_per_sync=8, eos_token_id=-1,
    )
    srv.warmup()
    assert set(srv._decode_jit) == {1, 2, 4, 8}
    ids = jax.random.randint(jax.random.PRNGKey(21), (1, 10), 0, cfg.vocab_size - 10)
    rids = [srv.submit(ids[0], None, max_new_tokens=m) for m in (1, 3, 5, 7, 11, 13)]
    results = srv.run()
    assert set(srv._decode_jit) == {1, 2, 4, 8}  # no new programs compiled
    for rid, m in zip(rids, (1, 3, 5, 7, 11, 13)):
        want = _engine_tokens(cfg, params, ids, None, m, (16,))
        np.testing.assert_array_equal(results[rid], want[:m])


def test_warmup_is_noop_mid_serving(tiny):
    cfg, params = tiny
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, prompt_buckets=(16,),
        steps_per_sync=2, eos_token_id=-1,
    )
    ids = jax.random.randint(jax.random.PRNGKey(22), (1, 10), 0, cfg.vocab_size - 10)
    rid = srv.submit(ids[0], None, max_new_tokens=6)
    srv.step()  # request now live in a slot
    srv.warmup()  # must not advance or corrupt the live slot
    results = srv.run()
    np.testing.assert_array_equal(
        results[rid], _engine_tokens(cfg, params, ids, None, 6, (16,))
    )


def test_per_request_sampling(tiny):
    """A batch mixing greedy and sampled requests: greedy rows stay token
    equal to the offline engine; sampled rows are reproducible for a fixed
    server rng and differ from greedy; no extra executables are compiled for
    new sampler settings (they are traced arguments)."""
    cfg, params = tiny

    def make():
        return ContinuousBatchingServer(
            params, cfg, slots=2, max_cache_length=64, prompt_buckets=(16,),
            steps_per_sync=2, eos_token_id=-1, rng=jax.random.PRNGKey(7),
        )

    ids = jax.random.randint(jax.random.PRNGKey(30), (1, 10), 0, cfg.vocab_size - 10)
    srv = make()
    g = srv.submit(ids[0], None, max_new_tokens=8)  # default greedy
    s = srv.submit(ids[0], None, max_new_tokens=8, temperature=0.8, top_k=10)
    res = srv.run()
    n_exec = len(srv._decode_jit)
    np.testing.assert_array_equal(
        res[g], _engine_tokens(cfg, params, ids, None, 8, (16,))
    )
    assert not np.array_equal(res[s], res[g])  # sampled row deviates
    # reproducible under the same server rng
    srv2 = make()
    g2 = srv2.submit(ids[0], None, max_new_tokens=8)
    s2 = srv2.submit(ids[0], None, max_new_tokens=8, temperature=0.8, top_k=10)
    res2 = srv2.run()
    np.testing.assert_array_equal(res[s], res2[s2])
    # a third sampler setting reuses the same executables
    srv3 = make()
    srv3._decode_jit = srv._decode_jit
    srv3._prefill_jit = srv._prefill_jit
    srv3.submit(ids[0], None, max_new_tokens=4, temperature=1.7, top_p=0.5, top_k=3)
    srv3.run()
    assert len(srv3._decode_jit) == n_exec


def test_slot_hygiene_on_free_and_release(tiny):
    """Freed slots return to greedy sampler settings (a stale temperature>0
    would permanently defeat the all-greedy decode fast path), request
    payloads (prompt/image host arrays) are dropped at admission, and
    release() evicts only finished records."""
    cfg, params = tiny
    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=(16,),
        steps_per_sync=2, eos_token_id=-1, rng=jax.random.PRNGKey(7),
    )
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    rid = srv.submit(_prompt(cfg, 10, 3)[0], px[0], max_new_tokens=4,
                     temperature=0.9)
    req = srv._results[rid]
    srv.step()  # admission happens here
    assert req.input_ids is None and req.pixel_values is None
    srv.run()
    assert all(s[0] == 0.0 for s in srv._slot_sampler)
    assert srv.release(rid) and rid not in srv._results
    ids = jax.random.randint(jax.random.PRNGKey(31), (1, 10), 0, cfg.vocab_size - 10)
    rid2 = srv.submit(ids[0], None, max_new_tokens=4)
    assert not srv.release(rid2)  # still queued/running: refused
    srv.run()
    assert srv.release(rid2) and rid2 not in srv._results
