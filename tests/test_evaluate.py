"""Evaluation harness: windowed teacher-forced perplexity and cross-mode
agreement (the quality side of the quantized serving modes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.evaluate import agreement, perplexity

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _manual_nll(params, cfg, ids_np):
    """fp32 NLL computed directly from a full-context forward."""
    from llama32mm_tpu.models.language import causal_lm_forward

    logits, _ = causal_lm_forward(
        params["language_model"], cfg.text_config, input_ids=jnp.asarray(ids_np[None])
    )
    logp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)[0]
    tok = [-float(logp[t, ids_np[t + 1]]) for t in range(len(ids_np) - 1)]
    return float(np.sum(tok)), len(tok)


def test_perplexity_matches_manual_single_window(tiny):
    cfg, params = tiny
    ids = np.asarray(
        jax.random.randint(jax.random.PRNGKey(3), (24,), 0, cfg.vocab_size - 10)
    )
    res = perplexity(params, cfg, ids, window=24)
    nll, n = _manual_nll(params, cfg, ids)
    assert res["tokens"] == n == 23
    np.testing.assert_allclose(res["nll_per_token"], nll / n, rtol=1e-5)
    np.testing.assert_allclose(res["perplexity"], np.exp(nll / n), rtol=1e-5)


def test_perplexity_windowing_sums_ragged_tail(tiny):
    cfg, params = tiny
    ids = np.asarray(
        jax.random.randint(jax.random.PRNGKey(4), (37,), 0, cfg.vocab_size - 10)
    )
    # window 16 → pieces of 16, 16, 5 (independent windows, standard strided eval)
    res = perplexity(params, cfg, ids, window=16)
    want_nll, want_n = 0.0, 0
    for piece in (ids[:16], ids[16:32], ids[32:]):
        nll, n = _manual_nll(params, cfg, piece)
        want_nll += nll
        want_n += n
    assert res["tokens"] == want_n == 15 + 15 + 4
    np.testing.assert_allclose(res["nll_per_token"], want_nll / want_n, rtol=1e-5)


def test_agreement_self_is_perfect(tiny):
    cfg, params = tiny
    ids = np.asarray(
        jax.random.randint(jax.random.PRNGKey(5), (30,), 0, cfg.vocab_size - 10)
    )
    res = agreement(params, params, cfg, ids, window=16)
    assert res["top1_agreement"] == 1.0
    assert res["mean_abs_dlogit"] == 0.0
    assert res["tokens"] == 15 + 13


def test_agreement_quantized_mode(tiny):
    from llama32mm_tpu.ops.quant import quantize_llama_params

    cfg, params = tiny
    q = quantize_llama_params(params)
    ids = np.asarray(
        jax.random.randint(jax.random.PRNGKey(6), (24,), 0, cfg.vocab_size - 10)
    )
    res = agreement(params, q, cfg, ids, window=24)
    assert 0.0 <= res["top1_agreement"] <= 1.0
    assert res["mean_abs_dlogit"] > 0.0  # int8 is lossy
    # int8 should stay close on a tiny random model
    assert res["top1_agreement"] >= 0.8, res
