"""Distributed sharded checkpointing (io/distributed.py): GSPMD train states
save per-shard and restore to ANY mesh layout — the scale path the HF-layout
writer (which host-gathers every leaf) cannot take at 90B. The reference is
load-only (Model/utils.py:149-166); this subsystem is net-new."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.io import ShardedCheckpointer, TrainCheckpointManager, abstract_state
from llama32mm_tpu.train import make_train_step

pytestmark = pytest.mark.slow

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


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


def _trees_equal(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        assert jnp.asarray(x).dtype == jnp.asarray(y).dtype
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@needs8
def test_sharded_train_state_exact_resume(tiny, tmp_path):
    """Save a ZeRO-1-sharded full-FT state mid-run; the restored run's next
    steps produce bit-identical losses and params to the uninterrupted run."""
    from llama32mm_tpu.parallel import create_mesh, shard_params

    cfg, params = tiny
    mesh = create_mesh(dp=2, tp=4)
    sharded = shard_params(params, cfg, mesh)
    init_state, step = make_train_step(
        cfg, learning_rate=1e-3, zero1_params=sharded, zero1_masters=True
    )
    jstep = jax.jit(step)
    state = init_state(sharded)
    batch = _batch(cfg)
    for i in range(2):
        state, _ = jstep(state, batch, jax.random.PRNGKey(i))

    ck = ShardedCheckpointer()
    ck.save(str(tmp_path / "mid"), state)

    # uninterrupted continuation
    ref_state, ref_losses = state, []
    for i in range(2, 4):
        ref_state, loss = jstep(ref_state, batch, jax.random.PRNGKey(i))
        ref_losses.append(float(loss))

    restored = ck.restore(str(tmp_path / "mid"), abstract_state(state))
    _trees_equal(restored.params, state.params)
    _trees_equal(restored.opt_state, state.opt_state)
    assert int(restored.step) == int(state.step)
    # restored leaves land on the template shardings
    w = restored.params["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"]
    w0 = state.params["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"]
    assert w.sharding.is_equivalent_to(w0.sharding, w.ndim)

    got_losses = []
    for i in range(2, 4):
        restored, loss = jstep(restored, batch, jax.random.PRNGKey(i))
        got_losses.append(float(loss))
    assert got_losses == ref_losses
    _trees_equal(restored.params, ref_state.params)
    ck.close()


@needs8
def test_restore_onto_different_mesh(tiny, tmp_path):
    """The resharding restore: a checkpoint saved under dp=2×tp=4 restores
    directly into a dp=4×tp=2 layout (new mesh, new PartitionSpecs) with no
    host gather — values identical, placement = the new mesh's."""
    from llama32mm_tpu.parallel import create_mesh, shard_params

    cfg, params = tiny
    mesh_a = create_mesh(dp=2, tp=4)
    sharded_a = shard_params(params, cfg, mesh_a)
    ck = ShardedCheckpointer()
    ck.save(str(tmp_path / "a"), sharded_a)

    mesh_b = create_mesh(dp=4, tp=2)
    sharded_b_layout = shard_params(params, cfg, mesh_b)
    template = abstract_state(sharded_b_layout)
    restored = ck.restore(str(tmp_path / "a"), template)

    _trees_equal(restored, sharded_a)
    w = restored["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"]
    wb = sharded_b_layout["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"]
    assert w.sharding.is_equivalent_to(wb.sharding, w.ndim)
    assert w.sharding.mesh.shape["tp"] == 2
    ck.close()


@needs8
def test_async_save_overlaps_training(tiny, tmp_path):
    """save(wait=False) snapshots the state at call time: training two more
    steps while the write is in flight does not change what lands on disk."""
    from llama32mm_tpu.parallel import create_mesh, shard_params

    cfg, params = tiny
    mesh = create_mesh(dp=2, tp=4)
    sharded = shard_params(params, cfg, mesh)
    init_state, step = make_train_step(cfg, learning_rate=1e-3, zero1_params=sharded)
    jstep = jax.jit(step)
    state = init_state(sharded)
    batch = _batch(cfg)
    state, _ = jstep(state, batch, jax.random.PRNGKey(0))
    snapshot = jax.tree.map(np.asarray, state.params)

    ck = ShardedCheckpointer()
    ck.save(str(tmp_path / "async"), state, wait=False)
    for i in range(1, 3):  # keep training while serialization runs
        state, _ = jstep(state, batch, jax.random.PRNGKey(i))
    ck.wait()

    restored = ck.restore(str(tmp_path / "async"), abstract_state(state))
    _trees_equal(restored.params, snapshot)
    # and the live state really did move on
    moved = any(
        not np.array_equal(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(snapshot))
    )
    assert moved
    ck.close()


@needs8
def test_quantized_base_roundtrips_sharded(tiny, tmp_path):
    """The int8-quantized frozen base (QLoRA serving/training tree) is an
    ordinary pytree to the sharded writer: int8 payloads + fp32 scales
    round-trip bit-exact with their shardings."""
    from llama32mm_tpu.ops.quant import quantize_llama_params
    from llama32mm_tpu.parallel import create_mesh, shard_params

    cfg, params = tiny
    mesh = create_mesh(dp=2, tp=4)
    qparams = quantize_llama_params(shard_params(params, cfg, mesh))

    ck = ShardedCheckpointer()
    ck.save(str(tmp_path / "q"), qparams)
    restored = ck.restore(str(tmp_path / "q"), abstract_state(qparams))
    _trees_equal(restored, qparams)
    kinds = {jnp.asarray(x).dtype for x in jax.tree.leaves(restored)}
    assert np.dtype("int8") in kinds
    ck.close()


@needs8
def test_manager_rotates_and_restores_latest(tiny, tmp_path):
    """TrainCheckpointManager: max_to_keep prunes old steps, latest_step()
    tracks the head, restore() with no step resumes it."""
    from llama32mm_tpu.parallel import create_mesh, shard_params

    cfg, params = tiny
    mesh = create_mesh(dp=2, tp=4)
    sharded = shard_params(params, cfg, mesh)
    init_state, step = make_train_step(cfg, learning_rate=1e-3, zero1_params=sharded)
    jstep = jax.jit(step)
    state = init_state(sharded)
    batch = _batch(cfg)

    mgr = TrainCheckpointManager(str(tmp_path / "run"), max_to_keep=2)
    states = {}
    for i in range(4):
        state, _ = jstep(state, batch, jax.random.PRNGKey(i))
        s = int(state.step)
        assert mgr.save(s, state, force=True)
        states[s] = jax.tree.map(np.asarray, state.params)
    mgr.wait()

    assert mgr.latest_step() == 4
    assert mgr.all_steps() == [3, 4]

    restored = mgr.restore(abstract_state(state))
    _trees_equal(restored.params, states[4])
    restored3 = mgr.restore(abstract_state(state), step=3)
    _trees_equal(restored3.params, states[3])
    mgr.close()
