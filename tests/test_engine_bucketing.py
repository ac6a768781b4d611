"""Prompt-length bucketing + ragged-batch decode positions (VERDICT r1 #3,
ADVICE r1: per-row positions from the true prompt length)."""

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


def test_bucketed_matches_unbucketed_and_reuses_executable(tiny):
    cfg, params = tiny
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))

    exact = InferenceEngine(params, cfg, max_cache_length=64)
    bucketed = InferenceEngine(params, cfg, max_cache_length=64, prompt_buckets=(16, 32))

    for s, key in ((9, 1), (12, 5), (14, 7)):
        ids = _prompt(cfg, s, key)
        want = np.asarray(
            exact.generate(ids, px, max_new_tokens=6, temperature=0.0, eos_token_id=-1).tokens
        )
        got = np.asarray(
            bucketed.generate(ids, px, max_new_tokens=6, temperature=0.0, eos_token_id=-1).tokens
        )
        np.testing.assert_array_equal(got, want, err_msg=f"s={s}")

    # all three prompt lengths land in the 16-bucket → ONE traced executable
    (fn,) = bucketed._generate_jit.values()
    assert fn._cache_size() == 1, fn._cache_size()
    # the exact engine traced one program per shape
    (fn_exact,) = exact._generate_jit.values()
    assert fn_exact._cache_size() == 3


def test_auto_buckets_pad_to_128_lanes(tiny):
    cfg, params = tiny
    eng = InferenceEngine(params, cfg, max_cache_length=512, prompt_buckets="auto")
    assert eng._bucketed_len(9, 16) == 128
    assert eng._bucketed_len(129, 16) == 256
    assert eng._bucketed_len(500, 16) == 500  # no room: falls back to exact
    ex = InferenceEngine(params, cfg, max_cache_length=512, prompt_buckets=(64, 480))
    assert ex._bucketed_len(30, 64) == 64
    assert ex._bucketed_len(470, 64) == 470  # 480 + 64 > 512 → exact


def test_ragged_batch_rows_match_single_row_runs(tiny):
    """Right-padded ragged batch: each row's tokens equal the same prompt run
    unpadded at batch 1 (decode RoPE positions continue the TRUE length)."""
    cfg, params = tiny
    px1 = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    short = _prompt(cfg, 7, key=11)
    long = _prompt(cfg, 12, key=13)

    eng = InferenceEngine(params, cfg, max_cache_length=64)
    want_short = np.asarray(
        eng.generate(short, px1, max_new_tokens=6, temperature=0.0, eos_token_id=-1).tokens
    )[0]
    want_long = np.asarray(
        eng.generate(long, px1, max_new_tokens=6, temperature=0.0, eos_token_id=-1).tokens
    )[0]

    ids = jnp.concatenate([jnp.pad(short, ((0, 0), (0, 5))), long], axis=0)
    mask = jnp.asarray([[1] * 7 + [0] * 5, [1] * 12], jnp.int32)
    px2 = jnp.broadcast_to(px1, (2, 3, 28, 28))
    got = np.asarray(
        eng.generate(
            ids, px2, attention_mask=mask, max_new_tokens=6, temperature=0.0, eos_token_id=-1
        ).tokens
    )
    np.testing.assert_array_equal(got[0], want_short)
    np.testing.assert_array_equal(got[1], want_long)
