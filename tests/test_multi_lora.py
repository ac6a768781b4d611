"""Multi-LoRA serving: each request in the continuous-batching pool decodes
with ITS OWN adapter in the same batched forward (per-row A/B einsums over an
adapter bank). The reference ships ``Linear_LORA`` for one adapter at a time
(``Model/model.py:107-121``); serving many fine-tunes concurrently over one
weight stream is net-new capability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.inference.engine import InferenceEngine
from llama32mm_tpu.inference.server import ContinuousBatchingServer
from llama32mm_tpu.train.lora import (
    init_lora_params,
    merge_lora_into_params,
    stack_adapter_bank,
    zero_lora_params,
)


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def bank_and_merged(tiny):
    cfg, params = tiny
    identity = zero_lora_params(cfg.text_config, rank=4)
    adapters = [identity]
    merged = [params]
    for i in (1, 2):
        a = init_lora_params(jax.random.PRNGKey(100 + i), cfg.text_config, rank=4)
        a = jax.tree.map(lambda x: x + 0.02 * i, a)  # nonzero B → real deltas
        adapters.append(a)
        merged.append(merge_lora_into_params(params, a))
    return stack_adapter_bank(adapters), merged


def _ids(cfg, s, key):
    return np.asarray(
        jax.random.randint(jax.random.PRNGKey(key), (s,), 0, cfg.vocab_size - 10)
    )


def _engine_tokens(cfg, params, ids, max_new):
    eng = InferenceEngine(params, cfg, max_cache_length=64, prompt_buckets=None)
    out = eng.generate(
        ids[None], None, max_new_tokens=max_new, temperature=0.0, eos_token_id=-1
    )
    return np.asarray(out.tokens)[0, : int(out.num_generated[0])]


def test_concurrent_adapters_match_merged_engines(tiny, bank_and_merged):
    """Three requests with adapters 0/1/2 decode CONCURRENTLY in one pool;
    each must match the offline engine running that adapter merged into the
    base weights."""
    cfg, params = tiny
    bank, merged = bank_and_merged
    prompts = [_ids(cfg, 9, 1), _ids(cfg, 12, 2), _ids(cfg, 10, 3)]
    want = [
        _engine_tokens(cfg, merged[aid], p, 6)
        for aid, p in zip((0, 1, 2), prompts)
    ]

    srv = ContinuousBatchingServer(
        params, cfg, slots=3, max_cache_length=64, prompt_buckets=None,
        steps_per_sync=2, eos_token_id=-1, adapter_bank=bank,
    )
    rids = [
        srv.submit(p, None, max_new_tokens=6, adapter_id=aid)
        for aid, p in zip((0, 1, 2), prompts)
    ]
    results = srv.run()
    for i, rid in enumerate(rids):
        np.testing.assert_array_equal(
            results[rid], want[i], err_msg=f"adapter {i} diverged from merged engine"
        )
    assert srv.stats()["adapters"] == 3


def test_identity_adapter_is_exact_base(tiny, bank_and_merged):
    cfg, params = tiny
    bank, _ = bank_and_merged
    p = _ids(cfg, 11, 5)
    want = _engine_tokens(cfg, params, p, 7)
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, prompt_buckets=None,
        steps_per_sync=3, eos_token_id=-1, adapter_bank=bank,
    )
    rid = srv.submit(p, None, max_new_tokens=7)  # adapter_id defaults to 0
    results = srv.run()
    np.testing.assert_array_equal(results[rid], want)


def test_adapters_compose_with_spec_and_chunked(tiny, bank_and_merged):
    cfg, params = tiny
    bank, merged = bank_and_merged
    base = _ids(cfg, 4, 7)
    p = np.tile(base, 4)[:14]  # repetitive so drafts hit
    want = _engine_tokens(cfg, merged[2], p, 6)
    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=64, prompt_buckets=None,
        steps_per_sync=2, eos_token_id=-1, adapter_bank=bank,
        spec_lookup=2, prefill_chunk=4,
    )
    rid = srv.submit(p, None, max_new_tokens=6, adapter_id=2)
    results = srv.run()
    np.testing.assert_array_equal(results[rid], want)


def test_adapter_specific_prefix(tiny, bank_and_merged):
    """Prefix KV is adapter-specific: auto-match only hits prefixes computed
    with the request's adapter; a pinned mismatch errors."""
    cfg, params = tiny
    bank, merged = bank_and_merged
    prefix = _ids(cfg, 8, 9)
    prompt = np.concatenate([prefix, _ids(cfg, 5, 10)])
    want = _engine_tokens(cfg, merged[1], prompt, 5)

    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, prompt_buckets=None,
        steps_per_sync=3, eos_token_id=-1, adapter_bank=bank,
    )
    pid1 = srv.register_prefix(prefix, adapter_id=1)
    with pytest.raises(ValueError, match="adapter-specific"):
        srv.submit(prompt, None, max_new_tokens=5, prefix_id=pid1, adapter_id=2)
    rid = srv.submit(prompt, None, max_new_tokens=5, adapter_id=1)  # auto-match
    results = srv.run()
    np.testing.assert_array_equal(results[rid], want)
    assert srv._prefixes[pid1].hits == 1
    # a request with a different adapter must NOT auto-match this prefix
    r2 = srv.submit(prompt, None, max_new_tokens=5, adapter_id=2)
    srv.run()
    assert srv._results[r2].prefix is None


def test_adapter_validation(tiny, bank_and_merged):
    cfg, params = tiny
    bank, _ = bank_and_merged
    srv = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, adapter_bank=bank, eos_token_id=-1,
    )
    with pytest.raises(ValueError, match="out of range"):
        srv.submit(_ids(cfg, 8, 11), None, max_new_tokens=4, adapter_id=3)
    srv_plain = ContinuousBatchingServer(
        params, cfg, slots=1, max_cache_length=64, eos_token_id=-1,
    )
    with pytest.raises(ValueError, match="no adapter_bank"):
        srv_plain.submit(_ids(cfg, 8, 12), None, max_new_tokens=4, adapter_id=1)
