"""Training input pipeline (train/data.py) + gradient accumulation
(train/accum.py): packing correctness, deterministic resumable iteration,
device prefetch, and accumulated updates exactly equal to big-batch updates.
The reference ships no trainer at all (SURVEY §3.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.train import (
    DataState,
    PackedBatchIterator,
    make_lora_train_step,
    make_train_step,
    pack_documents,
    prefetch_to_device,
)
from llama32mm_tpu.train.lora import init_lora_params

pytestmark = pytest.mark.slow

EOS = 2


def _docs(n=23, seed=0, lo=3, hi=40):
    rng = np.random.default_rng(seed)
    return [list(rng.integers(10, 200, size=int(rng.integers(lo, hi)))) for _ in range(n)]


def test_pack_documents_covers_every_token_once():
    docs = _docs()
    out = pack_documents(docs, seq_len=16, eos_id=EOS, pad_id=0)
    ids, labels = out["input_ids"], out["labels"]
    assert ids.shape == labels.shape and ids.shape[1] == 16
    flat = ids.reshape(-1)
    want = []
    for d in docs:
        want.extend(d)
        want.append(EOS)
    # the stream is intact and in order; the tail is padding
    np.testing.assert_array_equal(flat[: len(want)], np.asarray(want))
    assert np.all(flat[len(want):] == 0)
    # labels: ignore_index exactly at each document start + the padding tail
    lab = labels.reshape(-1)
    starts, pos = [], 0
    for d in docs:
        starts.append(pos)
        pos += len(d) + 1
    for s in starts:
        assert lab[s] == -100
    assert np.all(lab[len(want):] == -100)
    # everything else matches input_ids
    mask = np.ones(len(flat), bool)
    mask[starts] = False
    mask[len(want):] = False
    np.testing.assert_array_equal(lab[mask], flat[mask])


def test_iterator_deterministic_and_epochs_reshuffle():
    docs = _docs()
    a = PackedBatchIterator(docs, batch_size=2, seq_len=16, eos_id=EOS, seed=7)
    b = PackedBatchIterator(docs, batch_size=2, seq_len=16, eos_id=EOS, seed=7)
    for _ in range(12):
        x, y = next(a), next(b)
        np.testing.assert_array_equal(x["input_ids"], y["input_ids"])
        np.testing.assert_array_equal(x["labels"], y["labels"])
    # a different seed gives a different epoch order
    c = PackedBatchIterator(docs, batch_size=2, seq_len=16, eos_id=EOS, seed=8)
    assert not np.array_equal(
        next(c)["input_ids"],
        next(PackedBatchIterator(docs, batch_size=2, seq_len=16, eos_id=EOS, seed=7))["input_ids"],
    )
    # epochs reshuffle: run iterator 'a' across its epoch boundary and check
    # the epoch-1 first batch differs from epoch-0's (permutation reseeded)
    e0 = PackedBatchIterator(docs, batch_size=2, seq_len=16, eos_id=EOS, seed=7)
    first = next(e0)["input_ids"]
    while int(e0.state.epoch) == 0:
        nxt = next(e0)
    assert not np.array_equal(first, nxt["input_ids"])


def test_iterator_state_resume_exact():
    docs = _docs()
    it = PackedBatchIterator(docs, batch_size=2, seq_len=16, eos_id=EOS, seed=3)
    for _ in range(9):  # cross an epoch boundary with these sizes
        next(it)
    st = it.state
    # round-trip the state through jax scalars, as a checkpoint would store it
    st = DataState(*(jnp.asarray(x) for x in st))
    it2 = PackedBatchIterator.from_state(docs, 2, 16, EOS, st)
    for _ in range(6):
        x, y = next(it), next(it2)
        np.testing.assert_array_equal(x["input_ids"], y["input_ids"])
        np.testing.assert_array_equal(x["labels"], y["labels"])


def test_prefetch_to_device_matches_and_places():
    docs = _docs()
    host = [next(PackedBatchIterator(docs, 2, 16, EOS, seed=1)) for _ in range(4)]

    def gen():
        yield from host

    got = list(prefetch_to_device(gen(), size=2))
    assert len(got) == 4
    for h, d in zip(host, got):
        assert isinstance(d["input_ids"], jax.Array)
        np.testing.assert_array_equal(np.asarray(d["input_ids"]), h["input_ids"])


def test_prefetch_propagates_inner_error():
    def gen():
        yield {"input_ids": np.zeros((1, 4), np.int32)}
        raise RuntimeError("boom")

    it = prefetch_to_device(gen(), size=2)
    next(it)
    with pytest.raises(RuntimeError, match="boom"):
        next(it)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _text_batch(cfg, b, s, seed=0, ragged=False):
    ids = jax.random.randint(jax.random.PRNGKey(seed), (b, s), 0, cfg.vocab_size - 10)
    labels = np.asarray(ids).copy()
    if ragged:  # different padding per row → unweighted accumulation would differ
        labels[0, s // 2:] = -100
        labels[-1, 2:] = -100
    return {"input_ids": ids, "labels": jnp.asarray(labels)}


def test_lora_accum_equals_big_batch(tiny):
    cfg, params = tiny
    lora = init_lora_params(jax.random.PRNGKey(1), cfg.text_config, rank=2)
    big = _text_batch(cfg, 4, 12, ragged=True)
    micro = {k: v.reshape(2, 2, *v.shape[1:]) for k, v in big.items()}

    init1, step1 = make_lora_train_step(cfg, learning_rate=1e-2)
    initA, stepA = make_lora_train_step(cfg, learning_rate=1e-2, accum_steps=2)
    s1, sA = init1(lora), initA(lora)
    s1, l1 = jax.jit(step1)(params, s1, big, jax.random.PRNGKey(2))
    sA, lA = jax.jit(stepA)(params, sA, micro, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(l1), float(lA), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.lora), jax.tree.leaves(sA.lora)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)


def test_full_accum_equals_big_batch(tiny):
    cfg, params = tiny
    big = _text_batch(cfg, 4, 12, ragged=True)
    micro = {k: v.reshape(2, 2, *v.shape[1:]) for k, v in big.items()}

    init1, step1 = make_train_step(cfg, learning_rate=1e-3, max_grad_norm=None)
    initA, stepA = make_train_step(
        cfg, learning_rate=1e-3, max_grad_norm=None, accum_steps=2
    )
    s1, sA = init1(params), initA(params)
    s1, l1 = jax.jit(step1)(s1, big, jax.random.PRNGKey(2))
    sA, lA = jax.jit(stepA)(sA, micro, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(l1), float(lA), rtol=1e-6)
    # exact in exact arithmetic; fp32 reassociation (per-microbatch partial
    # sums) is amplified by Adam's rsqrt normalization at step 1, where
    # update ≈ sign(grad) — near-zero grads see the largest relative wiggle
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sA.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-6)


def test_accum_rejects_missing_microbatch_axis(tiny):
    cfg, params = tiny
    lora = init_lora_params(jax.random.PRNGKey(1), cfg.text_config, rank=2)
    initA, stepA = make_lora_train_step(cfg, learning_rate=1e-2, accum_steps=2)
    sA = initA(lora)
    with pytest.raises(ValueError, match="microbatch axis"):
        stepA(params, sA, _text_batch(cfg, 4, 12), jax.random.PRNGKey(0))


def test_pipeline_end_to_end_loss_decreases(tiny):
    """Packed iterator → prefetch → accumulated LoRA steps: the whole input
    pipeline drives real training."""
    cfg, params = tiny
    lora = init_lora_params(jax.random.PRNGKey(1), cfg.text_config, rank=2)
    rng = np.random.default_rng(0)
    docs = [list(rng.integers(10, cfg.vocab_size - 10, size=30)) for _ in range(12)]
    it = PackedBatchIterator(docs, batch_size=4, seq_len=16, eos_id=EOS, seed=0)
    init_state, step = make_lora_train_step(cfg, learning_rate=5e-2, accum_steps=2)
    jstep = jax.jit(step)
    state = init_state(lora)
    losses = []
    stream = prefetch_to_device(it, size=2)
    for i in range(8):
        b = next(stream)
        micro = {k: v.reshape(2, 2, *v.shape[1:]) for k, v in b.items()}
        state, loss = jstep(params, state, micro, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(it.state.row) >= 0  # state remains checkpointable mid-stream
