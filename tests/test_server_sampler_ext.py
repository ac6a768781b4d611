"""min-p / repetition-penalty through the continuous-batching server: the
per-slot traced sampler must reproduce the offline engine exactly (greedy +
penalty is deterministic), across the plain, speculative, and
chunked-admission serving paths, in one executable per path."""

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


def _drain(srv, rids):
    results = srv.run()
    return {r: list(results[r]) for r in rids}


def _engine_tokens(cfg, params, ids, px, max_new, pen=1.0, buckets=(16, 24)):
    eng = InferenceEngine(params, cfg, max_cache_length=64, prompt_buckets=buckets)
    out = eng.generate(ids, px, max_new_tokens=max_new, repetition_penalty=pen,
                       eos_token_id=-1)
    return list(np.asarray(out.tokens)[0, : int(out.num_generated[0])])


def test_server_penalized_greedy_matches_engine(tiny):
    """Two slots, one penalized + one plain request decoding TOGETHER: each
    must match its own offline-engine run (per-slot penalties are traced)."""
    cfg, params = tiny
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    ids_a, ids_b = _prompt(cfg, 9, 1), _prompt(cfg, 12, 5)
    want_a = _engine_tokens(cfg, params, ids_a, px, 8, pen=1.5)
    want_b = _engine_tokens(cfg, params, ids_b, px, 8, pen=1.0)
    assert want_a != _engine_tokens(cfg, params, ids_a, px, 8, pen=1.0)

    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=(16, 24),
        steps_per_sync=3, eos_token_id=-1,
    )
    ra = srv.submit(ids_a[0], px[0], max_new_tokens=8, repetition_penalty=1.5)
    rb = srv.submit(ids_b[0], px[0], max_new_tokens=8)
    got = _drain(srv, [ra, rb])
    assert got[ra] == want_a
    assert got[rb] == want_b


def test_server_spec_penalized_greedy_matches_engine(tiny):
    """Penalty composes exactly with server-side prompt-lookup speculation."""
    cfg, params = tiny
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    ids = _prompt(cfg, 10, 3)
    want = _engine_tokens(cfg, params, ids, px, 10, pen=1.4)

    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=(16, 24),
        steps_per_sync=3, eos_token_id=-1, spec_lookup=2,
    )
    r = srv.submit(ids[0], px[0], max_new_tokens=10, repetition_penalty=1.4)
    got = _drain(srv, [r])
    assert got[r] == want


def test_server_chunked_admission_penalized_matches_engine(tiny):
    """The chunked-admission splice samples the FIRST token with the prompt's
    presence too."""
    cfg, params = tiny
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    ids = _prompt(cfg, 14, 7)
    want = _engine_tokens(cfg, params, ids, px, 6, pen=1.6)

    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=(16, 24),
        steps_per_sync=3, eos_token_id=-1, prefill_chunk=8,
    )
    r = srv.submit(ids[0], px[0], max_new_tokens=6, repetition_penalty=1.6)
    got = _drain(srv, [r])
    assert got[r] == want


def test_server_min_p_one_forces_greedy(tiny):
    """min_p=1.0 leaves only the argmax in the nucleus: a sampled request
    must emit the greedy tokens."""
    cfg, params = tiny
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    ids = _prompt(cfg, 9, 1)
    want = _engine_tokens(cfg, params, ids, px, 8)

    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=(16, 24),
        steps_per_sync=3, eos_token_id=-1,
    )
    r = srv.submit(ids[0], px[0], max_new_tokens=8, temperature=0.9,
                   min_p=1.0, top_p=1.0, top_k=0)
    got = _drain(srv, [r])
    assert got[r] == want


def test_submit_rejects_bad_penalty(tiny):
    cfg, params = tiny
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, eos_token_id=-1,
    )
    with pytest.raises(ValueError, match="repetition_penalty"):
        srv.submit(_prompt(cfg, 9)[0], None, max_new_tokens=4,
                   repetition_penalty=0.0)


def test_server_staggered_completion_slot_reset(tiny):
    """One request finishes while the other keeps decoding: the freed slot's
    sampler must be reset with the FULL 5-tuple (T, top_p, top_k, min_p,
    rep_penalty) — _slot_samp_args indexes s[3]/s[4] on the next rebuild, so
    a 3-tuple reset crashes the serving loop (ADVICE r3, high). Surviving
    request must still match its offline-engine run."""
    cfg, params = tiny
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    ids_a, ids_b = _prompt(cfg, 9, 1), _prompt(cfg, 12, 5)
    want_a = _engine_tokens(cfg, params, ids_a, px, 3)
    want_b = _engine_tokens(cfg, params, ids_b, px, 10)

    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=(16, 24),
        steps_per_sync=3, eos_token_id=-1,
    )
    ra = srv.submit(ids_a[0], px[0], max_new_tokens=3)
    rb = srv.submit(ids_b[0], px[0], max_new_tokens=10)
    got = _drain(srv, [ra, rb])
    assert got[ra] == want_a
    assert got[rb] == want_b


def test_submit_rejects_bad_min_p(tiny):
    """min_p outside [0, 1] masks every token (threshold above the argmax
    prob) — reject like HF does (ADVICE r3, low)."""
    cfg, params = tiny
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, eos_token_id=-1,
    )
    for bad in (-0.1, 1.5):
        with pytest.raises(ValueError, match="min_p"):
            srv.submit(_prompt(cfg, 9)[0], None, max_new_tokens=4,
                       temperature=0.5, min_p=bad)
