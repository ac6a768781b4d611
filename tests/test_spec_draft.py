"""Draft-MODEL speculative decoding (engine ``spec_draft=K`` + a small
causal LM): greedy output is byte-identical to the standard engine for any
draft (correctness never depends on draft quality — rejection verification
is the same exact sampler the prompt-lookup path uses, and drafts are a
deterministic function of the committed prefix, independent of the
verification rng), while a draft that AGREES with the target turns loop
iterations into ~(K+1)-token commits."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.configs import LLAMA32Config
from llama32mm_tpu.inference.engine import InferenceEngine
from llama32mm_tpu.models.language import init_causal_lm_params

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def draft(tiny):
    """An independent smaller LM over the same vocab."""
    cfg, _ = tiny
    tc = cfg.text_config
    dcfg = LLAMA32Config(
        vocab_size=tc.vocab_size, hidden_size=32, n_heads=2, n_layers=1,
        hidden_dim=48, n_kv_groups=1, dtype=tc.dtype,
        max_cache_length=tc.max_cache_length,
    )
    return init_causal_lm_params(jax.random.PRNGKey(42), dcfg), dcfg


def _prompt(cfg, s, key=1, image=True):
    n_img = cfg.text_config.num_image_tokens
    ids = jax.random.randint(jax.random.PRNGKey(key), (1, s), 0, cfg.vocab_size - 10)
    return ids.at[:, :n_img].set(cfg.image_token_index) if image else ids


def _px():
    return jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))


def _run(cfg, params, ids, px, max_new, eos=-1, spec_draft=0, dp=None, dc=None,
         temperature=0.0, rng=None):
    eng = InferenceEngine(
        params, cfg, max_cache_length=96, spec_draft=spec_draft,
        draft_params=dp, draft_config=dc,
    )
    res = eng.generate(ids, px, max_new_tokens=max_new, temperature=temperature,
                       eos_token_id=eos, rng=rng)
    n = int(res.num_generated[0])
    return np.asarray(res.tokens)[0, :n], res


@pytest.mark.parametrize("max_new", [1, 6, 20])
def test_draft_spec_matches_greedy_image(tiny, draft, max_new):
    cfg, params = tiny
    dp, dc = draft
    ids, px = _prompt(cfg, 11), _px()
    want, _ = _run(cfg, params, ids, px, max_new)
    got, res = _run(cfg, params, ids, px, max_new, spec_draft=3, dp=dp, dc=dc)
    np.testing.assert_array_equal(got, want)
    assert int(res.steps) <= max_new


def test_draft_spec_matches_greedy_text(tiny, draft):
    cfg, params = tiny
    dp, dc = draft
    ids = _prompt(cfg, 13, key=3, image=False)
    want, _ = _run(cfg, params, ids, None, 16)
    got, res = _run(cfg, params, ids, None, 16, spec_draft=2, dp=dp, dc=dc)
    np.testing.assert_array_equal(got, want)


def test_self_draft_accepts_nearly_everything(tiny):
    """Draft == the target's own language model → greedy drafts agree with
    the verifier almost always → ~(K+1)-token commits per iteration."""
    cfg, params = tiny
    tc = cfg.text_config
    dp = params["language_model"]
    ids = _prompt(cfg, 9, key=5, image=False)
    K, max_new = 4, 40
    want, _ = _run(cfg, params, ids, None, max_new)
    got, res = _run(cfg, params, ids, None, max_new, spec_draft=K, dp=dp, dc=tc)
    np.testing.assert_array_equal(got, want)
    steps = int(res.steps)
    floor = -(-(max_new - 1) // (K + 1))  # every chunk fully accepted
    assert steps <= 2 * floor, (steps, floor)  # near-full acceptance
    assert steps < max_new // 2


def test_draft_spec_eos_mid_chunk(tiny, draft):
    cfg, params = tiny
    dp, dc = draft
    ids, px = _prompt(cfg, 11), _px()
    ref, _ = _run(cfg, params, ids, px, 24)
    eos = int(ref[min(4, len(ref) - 1)])
    want, _ = _run(cfg, params, ids, px, 24, eos=eos)
    got, _ = _run(cfg, params, ids, px, 24, eos=eos, spec_draft=3, dp=dp, dc=dc)
    np.testing.assert_array_equal(got, want)


def test_draft_spec_sampled_runs_and_commits_valid(tiny):
    """T>0 path: tokens commit, count is consistent, and the run is
    reproducible per rng (distribution exactness is the verifier's property,
    pinned by the spec_verify_tokens TV test in test_speculative.py)."""
    cfg, params = tiny
    dp = params["language_model"]
    ids = _prompt(cfg, 9, key=7, image=False)
    a, ra = _run(cfg, params, ids, None, 12, spec_draft=2, dp=dp,
                 dc=cfg.text_config, temperature=0.8, rng=jax.random.PRNGKey(3))
    b, rb = _run(cfg, params, ids, None, 12, spec_draft=2, dp=dp,
                 dc=cfg.text_config, temperature=0.8, rng=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(a, b)
    assert len(a) == 12
    assert np.all((a >= 0) & (a < cfg.vocab_size))


def test_draft_spec_validation(tiny, draft):
    cfg, params = tiny
    dp, dc = draft
    with pytest.raises(ValueError, match="mutually exclusive"):
        InferenceEngine(params, cfg, spec_lookup=2, spec_draft=2,
                        draft_params=dp, draft_config=dc)
    with pytest.raises(ValueError, match="needs draft_params"):
        InferenceEngine(params, cfg, spec_draft=2)
    with pytest.raises(ValueError, match="batch size 1"):
        eng = InferenceEngine(params, cfg, max_cache_length=96, spec_draft=2,
                              draft_params=dp, draft_config=dc)
        two = jnp.concatenate([_prompt(cfg, 8, image=False)] * 2, axis=0)
        eng.generate(two, None, max_new_tokens=4)
