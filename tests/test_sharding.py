"""GSPMD sharding tests on 8 virtual CPU devices (SURVEY §4 'Distributed':
the TPU analog of multi-node-without-a-cluster)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.models.vlm import vlm_forward
from llama32mm_tpu.parallel import (
    create_mesh,
    data_sharding,
    param_shardings,
    shard_params,
)
from llama32mm_tpu.train.lora import init_lora_params, make_lora_train_step

pytestmark = [pytest.mark.slow, pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")]


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def batch(tiny):
    cfg, _ = tiny
    ids = jax.random.randint(jax.random.PRNGKey(1), (4, 12), 0, cfg.vocab_size - 10)
    ids = ids.at[:, :4].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(2), (4, 3, 28, 28))
    labels = ids.at[:, :4].set(-100)
    return {"input_ids": ids, "pixel_values": px, "labels": labels}


def test_mesh_creation():
    mesh = create_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "pp": 1, "sp": 1, "tp": 4}
    with pytest.raises(ValueError, match="needs"):
        create_mesh(dp=4, tp=4)
    with pytest.raises(ValueError, match="needs"):
        create_mesh(dp=2, tp=4, sp=2)


def test_param_sharding_placement(tiny):
    cfg, params = tiny
    mesh = create_mesh(dp=2, tp=2)
    sharded = shard_params(params, cfg, mesh)
    wq = sharded["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"]
    # out axis split over tp=2
    shard_shapes = {s.data.shape for s in wq.addressable_shards}
    L, H, O = params["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"].shape
    assert shard_shapes == {(L, H, O // 2)}
    # vision replicated
    pe = sharded["vision_model"]["embeddings"]["patch_embedding"]["weight"]
    assert all(s.data.shape == pe.shape for s in pe.addressable_shards)


def test_sharded_forward_matches_single_device(tiny, batch):
    cfg, params = tiny
    out_ref = vlm_forward(params, cfg, input_ids=batch["input_ids"],
                          pixel_values=batch["pixel_values"], impl="xla")

    mesh = create_mesh(dp=2, tp=2)
    sharded = shard_params(params, cfg, mesh)
    ids = jax.device_put(batch["input_ids"], data_sharding(mesh, 2))
    px = jax.device_put(batch["pixel_values"], data_sharding(mesh, 4))

    @jax.jit
    def fwd(p, ids, px):
        return vlm_forward(p, cfg, input_ids=ids, pixel_values=px, impl="xla").logits

    logits = fwd(sharded, ids, px)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(out_ref.logits),
                               atol=2e-4, rtol=2e-4)


def test_vision_tp_forward_matches_single_device(tiny, batch):
    """vision_tp=True shards the ViT tower (MHSA heads + MLP intermediate
    over tp) instead of replicating it — the TTFT lever at 11B/90B scale
    where the 32-layer ViT-H is pure replicated latency per image. Logits
    must match the replicated layout."""
    cfg, params = tiny
    out_ref = vlm_forward(params, cfg, input_ids=batch["input_ids"],
                          pixel_values=batch["pixel_values"], impl="xla")

    mesh = create_mesh(dp=2, tp=2)
    sharded = shard_params(params, cfg, mesh, vision_tp=True)
    # the tower is really sharded: q_proj out-dim and fc1 inter-dim split
    qw = sharded["vision_model"]["layers"]["self_attn"]["q_proj"]["weight"]
    L, D, O = params["vision_model"]["layers"]["self_attn"]["q_proj"]["weight"].shape
    assert {s.data.shape for s in qw.addressable_shards} == {(L, D, O // 2)}
    f1b = sharded["vision_model"]["layers"]["mlp"]["fc1"]["bias"]
    assert {s.data.shape for s in f1b.addressable_shards} == {(L, f1b.shape[1] // 2)}

    ids = jax.device_put(batch["input_ids"], data_sharding(mesh, 2))
    px = jax.device_put(batch["pixel_values"], data_sharding(mesh, 4))

    @jax.jit
    def fwd(p, ids, px):
        return vlm_forward(p, cfg, input_ids=ids, pixel_values=px, impl="xla").logits

    logits = fwd(sharded, ids, px)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(out_ref.logits),
                               atol=2e-4, rtol=2e-4)


def test_sharded_lora_train_step_matches_single_device(tiny, batch):
    cfg, params = tiny
    lora = init_lora_params(jax.random.PRNGKey(3), cfg.text_config, rank=4)
    init_state, step = make_lora_train_step(cfg, learning_rate=1e-2, impl="xla")

    # single device
    state0 = init_state(lora)
    _, loss_ref = step(params, state0, batch, jax.random.PRNGKey(0))

    # sharded
    mesh = create_mesh(dp=2, tp=2)
    sharded_params = shard_params(params, cfg, mesh)
    sharded_batch = {
        "input_ids": jax.device_put(batch["input_ids"], data_sharding(mesh, 2)),
        "pixel_values": jax.device_put(batch["pixel_values"], data_sharding(mesh, 4)),
        "labels": jax.device_put(batch["labels"], data_sharding(mesh, 2)),
    }
    jit_step = jax.jit(step)
    state = init_state(lora)
    new_state, loss = jit_step(sharded_params, state, sharded_batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-4, rtol=1e-4)
    assert int(new_state.step) == 1


def test_tp4_forward_matches(tiny, batch):
    """Pure TP over 4 devices (dims in the tiny config divide by 4 except the
    kv-head axis, which GSPMD handles by replicating that product dim)."""
    cfg, params = tiny
    out_ref = vlm_forward(params, cfg, input_ids=batch["input_ids"],
                          pixel_values=batch["pixel_values"], impl="xla")
    mesh = create_mesh(dp=1, tp=4)
    sharded = shard_params(params, cfg, mesh)

    @jax.jit
    def fwd(p, ids, px):
        return vlm_forward(p, cfg, input_ids=ids, pixel_values=px, impl="xla").logits

    logits = fwd(sharded, batch["input_ids"], batch["pixel_values"])
    np.testing.assert_allclose(np.asarray(logits), np.asarray(out_ref.logits),
                               atol=2e-4, rtol=2e-4)


def test_sharded_engine_generate_matches(tiny):
    """End-to-end sharded serving: InferenceEngine over TP-sharded params
    produces identical tokens to single-device."""
    from llama32mm_tpu.inference.engine import InferenceEngine

    cfg, params = tiny
    ids = jax.random.randint(jax.random.PRNGKey(9), (1, 10), 0, cfg.vocab_size - 10)
    ids = ids.at[:, :4].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(10), (1, 3, 28, 28))

    eng = InferenceEngine(params, cfg, max_cache_length=32, impl="xla")
    ref = eng.generate(ids, px, max_new_tokens=6, eos_token_id=-1)

    mesh = create_mesh(dp=1, tp=2)
    sharded = shard_params(params, cfg, mesh)
    eng_s = InferenceEngine(sharded, cfg, max_cache_length=32, impl="xla")
    got = eng_s.generate(ids, px, max_new_tokens=6, eos_token_id=-1)
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))


def test_sharded_int8_forward_matches(tiny, batch):
    """TP-sharded int8 params produce the same logits as unsharded int8."""
    from llama32mm_tpu.ops.quant import quantize_llama_params

    cfg, params = tiny
    qparams = quantize_llama_params(
        jax.tree.map(lambda x: x, params)  # copy-safe
    )
    out_ref = vlm_forward(qparams, cfg, input_ids=batch["input_ids"],
                          pixel_values=batch["pixel_values"], impl="xla")
    mesh = create_mesh(dp=1, tp=2)
    sharded = shard_params(qparams, cfg, mesh)

    @jax.jit
    def fwd(p, ids, px):
        return vlm_forward(p, cfg, input_ids=ids, pixel_values=px, impl="xla").logits

    logits = fwd(sharded, batch["input_ids"], batch["pixel_values"])
    np.testing.assert_allclose(np.asarray(logits), np.asarray(out_ref.logits),
                               atol=2e-4, rtol=2e-4)


def test_90b_layout_shards_evenly():
    """BASELINE config #5: every decoder weight of the real 90B config must
    divide evenly over the v5p-16 (dp=2, tp=8) TP layout — eval_shape only,
    no memory. Catches axis/size mismatches in the sharding rules."""
    import jax
    from jax.sharding import NamedSharding

    from llama32mm_tpu.configs import llama32_90b_vision_config
    from llama32mm_tpu.models.vlm import init_vlm_params
    from llama32mm_tpu.parallel.mesh import create_mesh
    from llama32mm_tpu.parallel.sharding import param_shardings

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = llama32_90b_vision_config()
    shapes = jax.eval_shape(
        lambda k: init_vlm_params(k, cfg, tie_weights=False), jax.random.PRNGKey(0)
    )
    mesh = create_mesh(dp=1, tp=8)
    tree = param_shardings(cfg, mesh, params_like=shapes)

    def walk(s_node, p_node, path):
        for k, p in p_node.items():
            s = s_node[k] if isinstance(s_node, dict) else s_node
            q = f"{path}.{k}"
            if isinstance(p, dict):
                walk(s, p, q)
            elif p is not None and isinstance(s, NamedSharding):
                spec = tuple(s.spec) + (None,) * (len(p.shape) - len(tuple(s.spec)))
                for dim, axis in zip(p.shape, spec):
                    if axis is None:
                        continue
                    size = mesh.shape[axis] if isinstance(axis, str) else 1
                    assert dim % size == 0, f"{q}: dim {dim} not divisible by {axis}={size}"

    walk(tree, shapes, "")

    # fused serving layout too (tp must divide heads/kv/intermediate)
    tc = cfg.text_config
    assert tc.n_heads % 8 == 0 and tc.n_kv_groups % 8 == 0 and tc.hidden_dim % 8 == 0


def test_sharded_int8_kv_engine_decode_matches(tiny):
    """Full int8 serving mode (int8 weights + int8 KV cache) over a dp×tp
    mesh: the engine's while_loop decode produces tokens identical to the
    single-device int8 run (VERDICT r1 #5 — executed, not layout-checked)."""
    from llama32mm_tpu.inference.engine import InferenceEngine
    from llama32mm_tpu.ops.quant import quantize_llama_params

    cfg, params = tiny
    ids = jax.random.randint(jax.random.PRNGKey(21), (2, 10), 0, cfg.vocab_size - 10)
    ids = ids.at[:, :4].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(22), (2, 3, 28, 28))

    qparams = quantize_llama_params(params)
    ref = InferenceEngine(qparams, cfg, max_cache_length=32, kv_dtype="int8").generate(
        ids, px, max_new_tokens=6, eos_token_id=-1
    )

    mesh = create_mesh(dp=2, tp=2)
    sharded = shard_params(qparams, cfg, mesh)
    got = InferenceEngine(sharded, cfg, max_cache_length=32, kv_dtype="int8").generate(
        jax.device_put(ids, data_sharding(mesh, 2)),
        jax.device_put(px, data_sharding(mesh, 4)),
        max_new_tokens=6, eos_token_id=-1,
    )
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))


def test_sharded_continuous_batching_server_matches(tiny):
    """Continuous-batching slot pool over TP-sharded params: staggered
    admissions + per-slot scatter cache writes compile and run under GSPMD,
    token-equal to the unsharded server."""
    from llama32mm_tpu.inference.server import ContinuousBatchingServer

    cfg, params = tiny
    px = jax.random.normal(jax.random.PRNGKey(30), (1, 3, 28, 28))

    def prompt(s, key):
        ids = jax.random.randint(jax.random.PRNGKey(key), (s,), 0, cfg.vocab_size - 10)
        return ids.at[:4].set(cfg.image_token_index)

    def run(p):
        srv = ContinuousBatchingServer(
            p, cfg, slots=2, max_cache_length=64, prompt_buckets=(16,),
            steps_per_sync=3, eos_token_id=-1, impl="xla",
        )
        srv.submit(prompt(9, 31), px[0], max_new_tokens=6)
        srv.submit(prompt(12, 32), px[0], max_new_tokens=8)
        srv.submit(prompt(11, 33), px[0], max_new_tokens=4)  # waits for a slot
        return srv.run()

    want = run(params)
    mesh = create_mesh(dp=1, tp=2)
    got = run(shard_params(params, cfg, mesh))
    for rid in want:
        np.testing.assert_array_equal(got[rid], want[rid], err_msg=f"request {rid}")


def test_sharded_continuous_batching_server(tiny):
    """Multi-chip serving: the continuous-batching scheduler's compiled
    programs (chunked admission + per-slot batched decode) run unchanged over
    TP-sharded params on the virtual mesh, token-equal to the unsharded
    server."""
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual devices")
    from llama32mm_tpu.inference.server import ContinuousBatchingServer

    cfg, params = tiny
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    n_img = cfg.text_config.num_image_tokens
    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 11), 0, cfg.vocab_size - 10)
    ids = ids.at[:, :n_img].set(cfg.image_token_index)

    def serve(p):
        srv = ContinuousBatchingServer(
            p, cfg, slots=2, max_cache_length=64, prompt_buckets=None,
            eos_token_id=-1, steps_per_sync=3, prefill_chunk=4,
        )
        r0 = srv.submit(ids[0], px[0], max_new_tokens=6)
        r1 = srv.submit(ids[0, :9], px[0], max_new_tokens=5)
        out = srv.run()
        return out[r0], out[r1]

    want = serve(params)
    mesh = create_mesh(dp=1, tp=2)
    got = serve(shard_params(params, cfg, mesh))
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_flash_kernel_partitions_over_heads(tiny):
    """The flash custom call declares SPMD rules (custom_partitioning):
    head-sharded q/k/v stay sharded through the kernel — the partitioner must
    not replicate them (the failure mode of an unannotated pallas_call) —
    and gradients flow through the partitioned backward."""
    if len(jax.devices()) < 2:
        pytest.skip("needs virtual devices")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from llama32mm_tpu.ops.pallas.attention import flash_gqa_attention

    mesh = create_mesh(dp=1, tp=2)
    b, nq, nkv, tq, tk, hd = 1, 4, 2, 16, 32, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, nq, tq, hd), jnp.float32)
    k = jax.random.normal(ks[1], (b, nkv, tk, hd), jnp.float32)
    v = jax.random.normal(ks[2], (b, nkv, tk, hd), jnp.float32)
    kvv = jnp.ones((b, tk), jnp.int32)

    def loss(q, k, v):
        return jnp.sum(
            flash_gqa_attention(q, k, v, kvv, 16, block_q=8, block_k=16) ** 2
        )

    want = loss(q, k, v)
    want_g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    qs = jax.device_put(q, NamedSharding(mesh, P(None, "tp", None, None)))
    ksh = jax.device_put(k, NamedSharding(mesh, P(None, "tp", None, None)))
    vsh = jax.device_put(v, NamedSharding(mesh, P(None, "tp", None, None)))

    out = jax.jit(lambda q, k, v: flash_gqa_attention(q, k, v, kvv, 16, block_q=8, block_k=16))(qs, ksh, vsh)
    # forward output keeps the head sharding (no replication)
    assert "tp" in str(out.sharding.spec), out.sharding
    got = jax.jit(loss)(qs, ksh, vsh)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    got_g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ksh, vsh)
    for g, w in zip(got_g, want_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4, rtol=1e-4)
