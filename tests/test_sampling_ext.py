"""min-p and repetition-penalty samplers, tested against the ``transformers``
logits processors as the oracle (the HF semantics these extend the reference
sampler — ``Inference/Inference.py:85-106`` — with)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu.utils.sampling import (
    apply_repetition_penalty,
    filter_logits,
    filter_logits_traced,
    presence_from_tokens,
    select_next_token_traced,
    spec_verify_tokens,
)

V = 97


def _rand_logits(key, b=3, v=V):
    return jax.random.normal(jax.random.PRNGKey(key), (b, v)) * 3.0


def test_repetition_penalty_matches_transformers():
    torch = pytest.importorskip("torch")
    from transformers import RepetitionPenaltyLogitsProcessor

    logits = _rand_logits(0)
    ids = jnp.asarray([[1, 5, 5, 9], [0, 2, 3, 4], [96, 96, 96, 96]])
    pres = presence_from_tokens(ids, jnp.asarray([4, 4, 4]), V)
    got = apply_repetition_penalty(logits, pres, 1.7)

    proc = RepetitionPenaltyLogitsProcessor(penalty=1.7)
    want = proc(torch.tensor(np.asarray(ids)), torch.tensor(np.asarray(logits)))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5, atol=1e-6)


def test_repetition_penalty_per_row_and_disabled():
    logits = _rand_logits(1)
    pres = jnp.ones((3, V), bool)
    pen = jnp.asarray([1.0, 2.0, 0.5])
    got = apply_repetition_penalty(logits, pres, pen)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(logits[0]), rtol=1e-6)
    l1 = np.asarray(logits[1])
    np.testing.assert_allclose(
        np.asarray(got[1]), np.where(l1 > 0, l1 / 2.0, l1 * 2.0), rtol=1e-5
    )


def test_min_p_matches_transformers():
    torch = pytest.importorskip("torch")
    from transformers import MinPLogitsWarper

    logits = _rand_logits(2)
    got = filter_logits(logits, temperature=1.0, top_p=1.0, top_k=0, min_p=0.2)
    warper = MinPLogitsWarper(min_p=0.2)
    want = warper(None, torch.tensor(np.asarray(logits), dtype=torch.float32))
    # same survivor set and same surviving values
    np.testing.assert_array_equal(
        np.isneginf(np.asarray(got)), np.isneginf(want.numpy())
    )
    keep = ~np.isneginf(np.asarray(got))
    np.testing.assert_allclose(
        np.asarray(got)[keep], want.numpy()[keep], rtol=1e-5
    )


def test_min_p_traced_matches_static():
    logits = _rand_logits(3)
    static = jnp.stack(
        [
            filter_logits(logits[i], temperature=t, top_p=p, top_k=k, min_p=m)
            for i, (t, p, k, m) in enumerate(
                [(0.7, 0.9, 50, 0.1), (1.3, 1.0, 0, 0.05), (1.0, 0.8, 5, 0.0)]
            )
        ]
    )
    traced = filter_logits_traced(
        logits,
        jnp.asarray([0.7, 1.3, 1.0]),
        jnp.asarray([0.9, 1.0, 0.8]),
        jnp.asarray([50, 0, 5]),
        jnp.asarray([0.1, 0.05, 0.0]),
    )
    np.testing.assert_allclose(
        np.where(np.isneginf(static), -1e30, np.asarray(static)),
        np.where(np.isneginf(traced), -1e30, np.asarray(traced)),
        rtol=1e-5, atol=1e-6,
    )


def test_presence_ignores_padding_and_oob():
    ids = jnp.asarray([[3, 7, 0, 0], [V, 2, 1, 1]])  # row 1: OOB image id
    pres = presence_from_tokens(ids, jnp.asarray([2, 3]), V)
    assert bool(pres[0, 3]) and bool(pres[0, 7]) and not bool(pres[0, 0])
    assert bool(pres[1, 2]) and bool(pres[1, 1])
    assert not bool(pres[1, V - 1])  # clipped OOB id must not leak presence


def test_traced_greedy_respects_penalty():
    # presence flips the argmax when the penalty is on; penalty=1 keeps it
    logits = jnp.asarray([[1.0, 0.9, -2.0]])
    pres = jnp.asarray([[True, False, False]])
    t = jnp.asarray([0.0])
    args = (t, jnp.asarray([1.0]), jnp.asarray([0]))
    tok_off = select_next_token_traced(
        logits, jax.random.PRNGKey(0), *args, None, pres, jnp.asarray([1.0])
    )
    tok_on = select_next_token_traced(
        logits, jax.random.PRNGKey(0), *args, None, pres, jnp.asarray([2.0])
    )
    assert int(tok_off[0]) == 0 and int(tok_on[0]) == 1


def test_spec_verify_penalty_matches_sequential_greedy():
    """Greedy + penalty through spec verification == committing one token at
    a time with the presence updated after each commit (the exactness
    argument: position j's cumulative-draft presence)."""
    key = jax.random.PRNGKey(7)
    B, K = 1, 3
    logits = jax.random.normal(key, (B, K + 1, V)) * 2.0
    pres0 = presence_from_tokens(
        jnp.asarray([[4, 9, 11]]), jnp.asarray([3]), V
    )
    pen = jnp.asarray([1.8])

    # sequential oracle: greedy over penalized logits, presence grows as
    # drafts commit
    pres = np.asarray(pres0).copy()
    seq_tok = []
    for j in range(K + 1):
        pl = apply_repetition_penalty(logits[:, j], jnp.asarray(pres), pen)
        seq_tok.append(int(jnp.argmax(pl[0])))
        pres[0, seq_tok[-1]] = True  # drafts == greedy chain: all accepted

    drafts = jnp.asarray([seq_tok[:K]])
    t0 = jnp.asarray([0.0])
    nxt, acc = spec_verify_tokens(
        logits, drafts, jax.random.PRNGKey(0), t0, jnp.asarray([1.0]),
        jnp.asarray([0]), None, pres0, pen,
    )
    assert list(np.asarray(nxt[0])) == seq_tok
    assert bool(jnp.all(acc))


# ---------------------------------------------------------------------------
# Engine integration: penalty/min-p through the compiled generate paths
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_engine_setup():
    from llama32mm_tpu import init_vlm_params, tiny_mllama_config

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    n_img = cfg.text_config.num_image_tokens
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 14), 0, cfg.vocab_size - 10)
    ids = ids.at[:, :n_img].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    return cfg, params, ids, px


@pytest.mark.slow
def test_engine_penalized_greedy_matches_manual(tiny_engine_setup):
    """Greedy + repetition penalty through the compiled while_loop engine ==
    a manual stepwise loop penalizing with the growing presence set."""
    from llama32mm_tpu import init_kv_cache
    from llama32mm_tpu.inference.engine import (
        InferenceEngine, build_decode_mask, build_prefill_mask,
    )
    from llama32mm_tpu.models.vlm import vlm_forward

    cfg, params, ids, px = tiny_engine_setup
    B, S, MAXLEN, NEW, PEN = 1, ids.shape[1], 64, 10, 1.5
    eng = InferenceEngine(params, cfg, max_cache_length=MAXLEN)
    res = eng.generate(ids, px, max_new_tokens=NEW, repetition_penalty=PEN,
                       eos_token_id=-1)

    V = cfg.text_config.vocab_size
    safe = jnp.where(ids == cfg.image_token_index, -1, ids)
    pres = presence_from_tokens(safe, jnp.asarray([S]), V)
    cache = init_kv_cache(cfg.text_config, B, max_length=MAXLEN, dtype=jnp.float32)
    out = vlm_forward(params, cfg, input_ids=ids, pixel_values=px,
                      attention_mask=build_prefill_mask(jnp.ones((B, S), jnp.int32), MAXLEN),
                      kv_cache=cache, impl="xla")
    manual = []
    logits = out.logits[:, -1]
    cache = out.kv_cache
    for i in range(NEW):
        tok = int(jnp.argmax(apply_repetition_penalty(logits, pres, PEN)[0]))
        manual.append(tok)
        pres = pres.at[0, tok].set(True)
        if i == NEW - 1:
            break
        m = build_decode_mask(jnp.ones((B, S), jnp.int32), jnp.asarray(S + i + 1), MAXLEN)
        out = vlm_forward(params, cfg, input_ids=jnp.asarray([[tok]]),
                          attention_mask=m, kv_cache=cache, impl="xla",
                          position_ids=jnp.asarray([[S + i]]))
        logits = out.logits[:, -1]
        cache = out.kv_cache

    assert list(np.asarray(res.tokens[0])) == manual
    # and the penalty actually changed the output vs the unpenalized run
    base = eng.generate(ids, px, max_new_tokens=NEW, eos_token_id=-1)
    assert list(np.asarray(base.tokens[0])) != manual


def test_spec_lookup_penalized_greedy_exact(tiny_engine_setup):
    """Penalty composes exactly with prompt-lookup speculation: identical
    tokens to the non-speculative penalized engine."""
    from llama32mm_tpu.inference.engine import InferenceEngine

    cfg, params, ids, px = tiny_engine_setup
    kw = dict(max_new_tokens=12, repetition_penalty=1.4, eos_token_id=-1)
    base = InferenceEngine(params, cfg, max_cache_length=96).generate(ids, px, **kw)
    spec = InferenceEngine(params, cfg, max_cache_length=96, spec_lookup=3).generate(
        ids, px, **kw
    )
    np.testing.assert_array_equal(np.asarray(base.tokens), np.asarray(spec.tokens))


@pytest.mark.slow
def test_spec_draft_penalized_greedy_exact(tiny_engine_setup):
    """Penalty composes exactly with draft-model speculation too."""
    from llama32mm_tpu.configs import LLAMA32Config
    from llama32mm_tpu.inference.engine import InferenceEngine
    from llama32mm_tpu.models.language import init_causal_lm_params

    cfg, params, ids, px = tiny_engine_setup
    tc = cfg.text_config
    dcfg = LLAMA32Config(
        vocab_size=tc.vocab_size, hidden_size=32, n_heads=2, n_layers=1,
        hidden_dim=48, n_kv_groups=1, dtype=tc.dtype,
        max_cache_length=tc.max_cache_length,
    )
    dparams = init_causal_lm_params(jax.random.PRNGKey(42), dcfg)
    kw = dict(max_new_tokens=10, repetition_penalty=1.4, eos_token_id=-1)
    base = InferenceEngine(params, cfg, max_cache_length=96).generate(ids, px, **kw)
    spec = InferenceEngine(
        params, cfg, max_cache_length=96, spec_draft=2,
        draft_params=dparams, draft_config=dcfg,
    ).generate(ids, px, **kw)
    np.testing.assert_array_equal(np.asarray(base.tokens), np.asarray(spec.tokens))


def test_engine_min_p_sampling_smoke(tiny_engine_setup):
    """min_p through the compiled engine: runs, and min_p=1.0 forces the
    sampled path to collapse to the per-step argmax (only the top token
    survives the ratio test)."""
    from llama32mm_tpu.inference.engine import InferenceEngine

    cfg, params, ids, px = tiny_engine_setup
    eng = InferenceEngine(params, cfg, max_cache_length=64)
    greedy = eng.generate(ids, px, max_new_tokens=8, eos_token_id=-1)
    forced = eng.generate(ids, px, max_new_tokens=8, temperature=0.8,
                          min_p=1.0, top_p=1.0, top_k=0, eos_token_id=-1)
    np.testing.assert_array_equal(np.asarray(greedy.tokens), np.asarray(forced.tokens))


def test_min_p_with_top_p_matches_transformers():
    """min_p>0 composed with top_p<1 (+top_k) in HF warper order
    (temperature → top_k → top_p → min_p): top-p's nucleus cumsum must run
    over probabilities NOT renormalized by a prior min-p mask (ADVICE r3,
    medium). Oracle: the transformers warpers chained in generation order."""
    torch = pytest.importorskip("torch")
    from transformers import MinPLogitsWarper, TopKLogitsWarper, TopPLogitsWarper

    for key, top_p, top_k, min_p in [(7, 0.8, 20, 0.15), (8, 0.6, 0, 0.3),
                                     (9, 0.95, 40, 0.02)]:
        logits = _rand_logits(key)
        got = np.asarray(
            filter_logits(logits, temperature=1.0, top_p=top_p, top_k=top_k,
                          min_p=min_p)
        )
        x = torch.tensor(np.asarray(logits), dtype=torch.float32)
        warpers = ([TopKLogitsWarper(top_k=top_k)] if top_k > 0 else []) + [
            TopPLogitsWarper(top_p=top_p),
            MinPLogitsWarper(min_p=min_p),
        ]
        for w in warpers:
            x = w(None, x)
        want = x.numpy()
        np.testing.assert_array_equal(np.isneginf(got), np.isneginf(want))
        keep = ~np.isneginf(got)
        np.testing.assert_allclose(got[keep], want[keep], rtol=1e-5)
