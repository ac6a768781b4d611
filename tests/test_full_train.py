"""Full-parameter fine-tuning: loss decreases, frozen subtrees stay frozen
(and cost no optimizer memory), mixed precision keeps fp32 masters, and under
GSPMD the Adam moments inherit the parameter shardings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.models.vlm import vlm_forward
from llama32mm_tpu.train import make_train_step

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _batch(cfg, key=1, s=12):
    n_img = cfg.text_config.num_image_tokens
    ids = jax.random.randint(jax.random.PRNGKey(key), (2, s), 0, cfg.vocab_size - 10)
    ids = ids.at[:, :n_img].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(key + 1), (2, 3, 28, 28))
    labels = jnp.where(ids == cfg.image_token_index, -100, ids)
    return {"input_ids": ids, "pixel_values": px, "labels": labels}


def test_loss_decreases(tiny):
    cfg, params = tiny
    init_state, step = make_train_step(cfg, learning_rate=5e-3, max_grad_norm=None)
    step = jax.jit(step)
    state = init_state(params)
    batch = _batch(cfg)
    losses = []
    for i in range(6):
        state, loss = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 6


def test_freeze_vision(tiny):
    cfg, params = tiny
    init_state, step = make_train_step(cfg, learning_rate=1e-2, freeze_vision=True)
    step = jax.jit(step)
    state = init_state(params)
    assert "vision_model" in state.frozen and "vision_model" not in state.params
    # no optimizer slots exist for the frozen tower
    flat = jax.tree.leaves(state.opt_state)
    n_trainable = len(jax.tree.leaves(state.params))
    adam_m_leaves = sum(
        1 for _ in jax.tree.leaves(state.opt_state)
    )  # (m, v) per trainable leaf + counts
    assert adam_m_leaves <= 2 * n_trainable + 4
    before = jax.tree.map(np.asarray, state.frozen)
    state, loss = step(state, _batch(cfg), jax.random.PRNGKey(0))
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state.frozen)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # language params DID move
    moved = any(
        not np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(
            jax.tree.leaves(state.params),
            jax.tree.leaves({k: v for k, v in tiny[1].items() if k != "vision_model"}),
        )
    )
    assert moved
    # reassembled tree still runs inference
    out = vlm_forward(state.full_params(), cfg, input_ids=_batch(cfg)["input_ids"],
                      pixel_values=_batch(cfg)["pixel_values"])
    assert np.isfinite(np.asarray(out.logits)).all()


def test_mixed_precision_masters_stay_fp32(tiny):
    cfg, params = tiny
    init_state, step = make_train_step(
        cfg, learning_rate=1e-3, compute_dtype="bfloat16"
    )
    step = jax.jit(step)
    state = init_state(params)
    state, loss = step(state, _batch(cfg), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(state.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32  # masters never downcast


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_moments_inherit_param_sharding(tiny):
    from llama32mm_tpu.parallel import create_mesh, shard_params

    cfg, params = tiny
    mesh = create_mesh(dp=2, tp=4)
    sharded = shard_params(params, cfg, mesh)
    init_state, step = make_train_step(cfg, learning_rate=1e-3)
    state = init_state(sharded)  # eager: moments inherit input shardings
    # a tp-sharded weight's Adam moments carry the SAME sharding: every
    # opt-state leaf shaped like the stacked W_query must share its sharding
    w = sharded["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"]
    assert not w.sharding.is_fully_replicated

    want_path = ("language_model", "model", "blocks", "att", "W_query", "weight")

    def moment_leaves(opt_state):
        out = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(opt_state)[0]:
            keys = tuple(
                p.key for p in path if isinstance(p, jax.tree_util.DictKey)
            )
            if keys[-len(want_path):] == want_path and hasattr(leaf, "sharding"):
                out.append(leaf)
        return out

    moments = moment_leaves(state.opt_state)
    assert len(moments) >= 2  # adam mu + nu
    for m in moments:
        assert m.sharding.is_equivalent_to(w.sharding, m.ndim), (
            m.sharding, w.sharding)
    state, loss = jax.jit(step)(state, _batch(cfg), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    for m in moment_leaves(state.opt_state):
        assert m.sharding.is_equivalent_to(w.sharding, m.ndim)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("masters", [False, True])
def test_zero1_partitions_moments_and_matches_unsharded(tiny, masters):
    """ZeRO-1 (zero1_params=...): Adam moments carry the param sharding
    EXTENDED over dp, and N steps produce the same params as the TP-only
    layout (the reduce-scatter/all-gather dataflow is numerics-neutral)."""
    from llama32mm_tpu.parallel import create_mesh, shard_params, zero1_shardings

    cfg, params = tiny
    mesh = create_mesh(dp=2, tp=4)
    sharded = shard_params(params, cfg, mesh)

    init0, step0 = make_train_step(cfg, learning_rate=1e-3)
    init1, step1 = make_train_step(
        cfg, learning_rate=1e-3, zero1_params=sharded, zero1_masters=masters
    )
    s0, s1 = init0(sharded), init1(sharded)

    w = sharded["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"]
    z1 = zero1_shardings({"w": w})["w"]
    assert not z1.is_equivalent_to(w.sharding, w.ndim)  # dp really extends it

    want_path = ("language_model", "model", "blocks", "att", "W_query", "weight")

    def moment_leaves(opt_state):
        out = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(opt_state)[0]:
            keys = tuple(
                p.key for p in path if isinstance(p, jax.tree_util.DictKey)
            )
            if keys[-len(want_path):] == want_path and hasattr(leaf, "sharding"):
                out.append(leaf)
        return out

    for m in moment_leaves(s1.opt_state):
        assert m.sharding.is_equivalent_to(z1, m.ndim), (m.sharding, z1)
    if masters:
        w1 = s1.params["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"]
        assert w1.sharding.is_equivalent_to(z1, w1.ndim)

    batch = _batch(cfg)
    j0, j1 = jax.jit(step0), jax.jit(step1)
    for i in range(3):
        s0, l0 = j0(s0, batch, jax.random.PRNGKey(i))
        s1, l1 = j1(s1, batch, jax.random.PRNGKey(i))
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-5)
    # moments STAY partitioned across steps
    for m in moment_leaves(s1.opt_state):
        assert m.sharding.is_equivalent_to(z1, m.ndim)
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s1.params)):
        # reduce-scatter/all-gather changes the fp32 reduction order slightly
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=2e-4
        )


def test_save_resume_roundtrip(tiny, tmp_path):
    cfg, params = tiny
    from llama32mm_tpu.train.full import (
        load_full_train_state,
        save_full_train_state,
    )

    init_state, step = make_train_step(cfg, learning_rate=1e-3, freeze_vision=True)
    step = jax.jit(step)
    state = init_state(params)
    state, _ = step(state, _batch(cfg), jax.random.PRNGKey(0))
    path = str(tmp_path / "state.safetensors")
    save_full_train_state(path, state)

    resumed = load_full_train_state(path, init_state(params))
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # training continues identically from the restored state
    s1, l1 = step(state, _batch(cfg, key=9), jax.random.PRNGKey(1))
    s2, l2 = step(resumed, _batch(cfg, key=9), jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert int(s1.step) == int(s2.step) == 2
