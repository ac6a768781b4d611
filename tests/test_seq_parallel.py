"""Sequence/context parallelism (`sp` mesh axis) over the virtual 8-device
CPU mesh.

The reference has no distributed layer at all (SURVEY §2.8); long-context
scaling here comes from sharding the TOKEN axis of activations over ``sp``:
GSPMD propagates the seq sharding through embeds/norms/linears/RoPE, and the
flash kernel's custom_partitioning rules (ops/pallas/attention.py) keep q
seq-sharded — each shard runs its contiguous q chunk with a shifted causal
``q_offset``, K/V are all-gathered, and backward psums dk/dv over ``sp``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from llama32mm_tpu.parallel import create_mesh, seq_data_sharding

pytestmark = pytest.mark.slow


def _flash_inputs(tq=64, tk=64, b=2, nq=4, nkv=2, hd=8):
    q = jax.random.normal(jax.random.PRNGKey(0), (b, nq, tq, hd), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, nkv, tk, hd), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, nkv, tk, hd), jnp.float32)
    kv_valid = jnp.ones((b, tk), jnp.int32).at[:, tk - 4 :].set(0)
    return q, k, v, kv_valid


def test_flash_seq_sharded_forward_and_grad_match_single_device():
    from llama32mm_tpu.ops.pallas.attention import flash_gqa_attention

    mesh = create_mesh(dp=1, tp=2, sp=4)
    q, k, v, kv_valid = _flash_inputs()

    def f(q, k, v):
        return flash_gqa_attention(q, k, v, kv_valid, 0, block_q=8, block_k=16)

    def loss(q, k, v):
        return jnp.sum(f(q, k, v) ** 2)

    ref = jax.jit(f)(q, k, v)
    gref = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)

    qs = jax.device_put(q, NamedSharding(mesh, P(None, "tp", "sp", None)))
    ks = jax.device_put(k, NamedSharding(mesh, P(None, "tp", None, None)))
    vs = jax.device_put(v, NamedSharding(mesh, P(None, "tp", None, None)))

    out = jax.jit(f)(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # the rule must KEEP q seq-sharded (no all-gather of activations)
    assert "sp" in str(out.sharding.spec), out.sharding.spec

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks, vs)
    for got, want in zip(g, gref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    assert "sp" in str(g[0].sharding.spec), g[0].sharding.spec


def test_flash_seq_sharded_nonzero_offset():
    """Chunked/cached prefill: q rows start at a nonzero absolute position;
    each sp shard must shift its causal offset by shard_index·local_Tq on top."""
    from llama32mm_tpu.ops.pallas.attention import flash_gqa_attention

    mesh = create_mesh(dp=1, tp=1, sp=4)
    q, k, v, kv_valid = _flash_inputs(tq=32, tk=64)
    q_offset = 17

    def f(q, k, v):
        return flash_gqa_attention(q, k, v, kv_valid, q_offset, block_q=8, block_k=16)

    ref = jax.jit(f)(q, k, v)
    qs = jax.device_put(q, NamedSharding(mesh, P(None, None, "sp", None)))
    out = jax.jit(f)(qs, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_seq_sharded_int8_kv():
    """The int8-KV serving path (per-position scales) under seq sharding."""
    from llama32mm_tpu.ops.pallas.attention import flash_gqa_attention

    mesh = create_mesh(dp=1, tp=2, sp=2)
    q, k, v, kv_valid = _flash_inputs()
    b, nkv, tk = k.shape[0], k.shape[1], k.shape[2]
    k_scale = jnp.abs(jax.random.normal(jax.random.PRNGKey(3), (b, nkv, tk))) + 0.5
    v_scale = jnp.abs(jax.random.normal(jax.random.PRNGKey(4), (b, nkv, tk))) + 0.5

    def f(q, k, v):
        return flash_gqa_attention(
            q, k, v, kv_valid, 0, block_q=8, block_k=16,
            k_scale=k_scale, v_scale=v_scale,
        )

    ref = jax.jit(f)(q, k, v)
    qs = jax.device_put(q, NamedSharding(mesh, P(None, "tp", "sp", None)))
    ks = jax.device_put(k, NamedSharding(mesh, P(None, "tp", None, None)))
    vs = jax.device_put(v, NamedSharding(mesh, P(None, "tp", None, None)))
    out = jax.jit(f)(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    assert "sp" in str(out.sharding.spec), out.sharding.spec


def _tiny_cfg():
    from llama32mm_tpu.configs import LLAMA32Config, MLLAMAConfig, VisionEncoderConfig

    return MLLAMAConfig(
        vision_config=VisionEncoderConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=14,
        ),
        text_config=LLAMA32Config(
            vocab_size=512, hidden_size=64, n_heads=4, n_layers=2,
            hidden_dim=128, n_kv_groups=2, dtype="float32", max_cache_length=128,
        ),
        image_token_index=500,
        vocab_size=512,
        projection_dim=64,
        hidden_size=64,
    )


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_seq_parallel_lora_train_step_matches_single_device(impl):
    """Full context-parallel training step: batch fed with ``P(dp, sp)`` on
    the token axis; loss and updated adapters must match the single-device
    run on both the dense-XLA and flash attention paths."""
    from llama32mm_tpu.models.vlm import init_vlm_params
    from llama32mm_tpu.parallel import shard_params
    from llama32mm_tpu.train.lora import init_lora_params, make_lora_train_step

    cfg = _tiny_cfg()
    mesh = create_mesh(dp=2, tp=2, sp=2)

    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora_params(jax.random.PRNGKey(1), cfg.text_config, rank=4)

    b, s = 2, 32
    ids = jax.random.randint(jax.random.PRNGKey(2), (b, s), 0, cfg.vocab_size - 20)
    ids = ids.at[:, : cfg.text_config.num_image_tokens].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(3), (b, 3, 28, 28), jnp.float32)
    labels = ids.at[:, : cfg.text_config.num_image_tokens].set(-100)

    init_state, step = make_lora_train_step(cfg, learning_rate=1e-3, impl=impl)
    state = init_state(lora)

    batch = {"input_ids": ids, "pixel_values": px, "labels": labels}
    ref_state, ref_loss = jax.jit(step)(params, state, batch, jax.random.PRNGKey(4))

    sp_batch = {
        "input_ids": jax.device_put(ids, seq_data_sharding(mesh, 2)),
        "pixel_values": jax.device_put(px, NamedSharding(mesh, P("dp", None, None, None))),
        "labels": jax.device_put(labels, seq_data_sharding(mesh, 2)),
    }
    sp_params = shard_params(params, cfg, mesh)
    sp_state, sp_loss = jax.jit(step)(sp_params, state, sp_batch, jax.random.PRNGKey(4))

    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        sp_state.lora,
        ref_state.lora,
    )
