"""Pipeline parallelism (``pp`` mesh axis, parallel/pipeline.py).

The reference has no distributed layer (SURVEY §2.8); pp completes the
classic parallelism menu next to dp/sp/tp. The schedule is GPipe over
microbatches: stages = slices of the stacked ``[L, ...]`` block params
(``NamedSharding(P('pp'))`` on the layer axis), activations hop stages via
``lax.ppermute`` inside ``shard_map``, and ``jax.grad`` of the pipelined
loss IS the pipeline backward (scan/ppermute transposes). These tests pin
numeric equality with the unpipelined model — loss, gradients, and training
steps — on the virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu.configs import LLAMA32Config
from llama32mm_tpu.models.language import (
    init_causal_lm_params,
    llama_forward,
    lm_head_apply,
)
from llama32mm_tpu.models.vlm import shifted_cross_entropy
from llama32mm_tpu.parallel import (
    create_mesh,
    make_pipeline_train_step,
    pipeline_causal_lm_loss,
    pipeline_shard_params,
)


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    tc = LLAMA32Config(
        vocab_size=256, hidden_size=64, n_heads=4, n_layers=4,
        hidden_dim=128, n_kv_groups=2, dtype="float32",
    )
    params = init_causal_lm_params(jax.random.PRNGKey(0), tc)
    B, T = 4, 16
    ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, tc.vocab_size - 1)
    return tc, params, ids


def _ref_loss(params, tc, ids):
    out = llama_forward(params["model"], tc, input_ids=ids, impl="xla")
    logits = lm_head_apply(params, tc, out.hidden_states, impl="xla")
    return shifted_cross_entropy(logits.astype(jnp.float32), ids, -100)


def _staged(params, mesh):
    return {"model": pipeline_shard_params(params["model"], mesh),
            "lm_head": params["lm_head"]}


@pytest.mark.parametrize("layout,mb", [((2, 2), 2), ((1, 4), 4)],
                         ids=["dp2_pp2", "pp4"])
def test_pipeline_loss_matches_unpipelined(tiny, layout, mb):
    tc, params, ids = tiny
    dp, pp = layout
    mesh = create_mesh(dp=dp, pp=pp)
    want = float(_ref_loss(params, tc, ids))

    pparams = _staged(params, mesh)
    # stage placement is real: each device holds L/pp layers of the stack
    w = pparams["model"]["blocks"]["att"]["W_query"]["weight"]
    assert w.addressable_shards[0].data.shape[0] == tc.n_layers // pp

    got = jax.jit(
        lambda p: pipeline_causal_lm_loss(p, tc, ids, ids, mesh, n_microbatches=mb)
    )(pparams)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_pipeline_grads_match_unpipelined(tiny):
    tc, params, ids = tiny
    mesh = create_mesh(dp=2, pp=2)
    g_ref = jax.grad(lambda p: _ref_loss(p, tc, ids))(params)
    g_pp = jax.jit(jax.grad(
        lambda p: pipeline_causal_lm_loss(p, tc, ids, ids, mesh, n_microbatches=2)
    ))(_staged(params, mesh))
    flat_ref = jax.tree.leaves(g_ref)
    flat_pp = jax.tree.leaves(g_pp)
    assert len(flat_ref) == len(flat_pp)
    for a, b in zip(flat_ref, flat_pp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6
        )


def test_pipeline_remat_exact(tiny):
    """remat recomputes stage internals — numerics identical."""
    tc, params, ids = tiny
    mesh = create_mesh(dp=1, pp=2)
    pparams = _staged(params, mesh)
    plain = jax.jit(jax.grad(
        lambda p: pipeline_causal_lm_loss(p, tc, ids, ids, mesh, n_microbatches=2)
    ))(pparams)
    lean = jax.jit(jax.grad(
        lambda p: pipeline_causal_lm_loss(p, tc, ids, ids, mesh,
                                          n_microbatches=2, remat=True)
    ))(pparams)
    for a, b in zip(jax.tree.leaves(plain), jax.tree.leaves(lean)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_pipeline_train_step_matches_unpipelined(tiny):
    """Three full-param Adam steps through the pipeline == three steps
    through the plain model (same lr, same batch)."""
    import optax

    tc, params, ids = tiny
    mesh = create_mesh(dp=2, pp=2)
    batch = {"input_ids": ids, "labels": ids}

    init_state, step = make_pipeline_train_step(tc, mesh, n_microbatches=2,
                                                learning_rate=1e-3)
    state = init_state(_staged(params, mesh))
    jstep = jax.jit(step)
    pp_losses = []
    for i in range(3):
        state, loss = jstep(state, batch, jax.random.PRNGKey(i))
        pp_losses.append(float(loss))

    tx = optax.adam(1e-3)
    ref_p, opt = params, tx.init(params)
    ref_losses = []
    for i in range(3):
        loss, grads = jax.value_and_grad(lambda p: _ref_loss(p, tc, ids))(ref_p)
        updates, opt = tx.update(grads, opt, ref_p)
        ref_p = optax.apply_updates(ref_p, updates)
        ref_losses.append(float(loss))

    np.testing.assert_allclose(pp_losses, ref_losses, rtol=1e-4)
    assert pp_losses[-1] < pp_losses[0]
    # optimizer moments inherit the stage placement (no replicated Adam state)
    m = state["opt"][0].mu["model"]["blocks"]["att"]["W_query"]["weight"]
    assert "pp" in str(m.sharding.spec)


def test_pipeline_3d_pp_tp_dp(tiny):
    """Full 3D composition: pp stages × tp-sharded stage bodies × dp batch.
    Only pp is manual inside the shard_map; tp/dp stay GSPMD auto axes, so
    each stage's matmuls run tensor-parallel with their usual all-reduces.
    Loss and grads must equal the unpipelined model, and grads must keep
    the combined (pp, tp) placement."""
    tc, params, ids = tiny
    mesh = create_mesh(dp=2, pp=2, tp=2)
    pparams = {"model": pipeline_shard_params(params["model"], mesh, tp=True),
               "lm_head": params["lm_head"]}
    wq = pparams["model"]["blocks"]["att"]["W_query"]["weight"]
    L, H, O = params["model"]["blocks"]["att"]["W_query"]["weight"].shape
    assert {s.data.shape for s in wq.addressable_shards} == {(L // 2, H, O // 2)}

    want = float(_ref_loss(params, tc, ids))
    loss_fn = lambda p: pipeline_causal_lm_loss(p, tc, ids, ids, mesh, 2)  # noqa: E731
    got = jax.jit(loss_fn)(pparams)
    np.testing.assert_allclose(float(got), want, rtol=1e-5)

    g = jax.jit(jax.grad(loss_fn))(pparams)
    g_ref = jax.grad(lambda p: _ref_loss(p, tc, ids))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-6)
    assert str(g["model"]["blocks"]["ff"]["swiglu"]["w_gate"].sharding.spec) == \
        "PartitionSpec('pp', None, 'tp')"


def test_pipeline_chunked_ce_matches_full(tiny):
    """loss_chunk streams lm_head+softmax in chunks — numerics equal to the
    full-logits loss (required at real vocab: [B,T,V] cannot materialize)."""
    tc, params, ids = tiny
    mesh = create_mesh(dp=1, pp=2)
    pparams = _staged(params, mesh)
    full = jax.jit(
        lambda p: pipeline_causal_lm_loss(p, tc, ids, ids, mesh, n_microbatches=2)
    )(pparams)
    chunked = jax.jit(
        lambda p: pipeline_causal_lm_loss(p, tc, ids, ids, mesh, n_microbatches=2,
                                          loss_chunk=4)
    )(pparams)
    np.testing.assert_allclose(float(full), float(chunked), rtol=1e-6)


def test_pipeline_over_quantized_base(tiny):
    """Quantized (int8) block stacks stage over pp unchanged — the layer
    axis is axis 0 of both the int8 tensor and its scales, so the same
    P('pp') placement applies and the stage scan streams int8 weights."""
    from llama32mm_tpu.ops.quant import quantize_llama_params

    tc, params, ids = tiny
    qp = quantize_llama_params({"language_model": params},
                               quantize_lm_head=False)["language_model"]
    want = float(_ref_loss(qp, tc, ids))
    mesh = create_mesh(dp=2, pp=2)
    got = jax.jit(
        lambda p: pipeline_causal_lm_loss(p, tc, ids, ids, mesh, n_microbatches=2)
    )(_staged(qp, mesh))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_pipeline_qlora_matches_unpipelined(tiny):
    """QLoRA × pp: adapters (and their Adam moments) live stage-local next
    to their frozen int8 base layers. Loss and a 2-step adapter-training
    trajectory must equal the unpipelined LoRA path."""
    import optax

    from llama32mm_tpu.models.language import llama_forward
    from llama32mm_tpu.ops.quant import quantize_llama_params
    from llama32mm_tpu.parallel import (
        make_pipeline_lora_train_step, pipeline_shard_lora,
    )
    from llama32mm_tpu.train.lora import init_lora_params

    tc, params, ids = tiny
    qp = quantize_llama_params({"language_model": params},
                               quantize_lm_head=False)["language_model"]
    lora = init_lora_params(jax.random.PRNGKey(7), tc, rank=4)
    mesh = create_mesh(dp=2, pp=2)
    batch = {"input_ids": ids, "labels": ids}

    def ref_lora_loss(lo):
        # llama_forward takes the FULL adapter dict (pulls .get("blocks"))
        out = llama_forward(qp["model"], tc, input_ids=ids, lora=lo, impl="xla")
        logits = lm_head_apply(qp, tc, out.hidden_states, lora=lo.get("lm_head"),
                               impl="xla")
        return shifted_cross_entropy(logits.astype(jnp.float32), ids, -100)

    init_state, step = make_pipeline_lora_train_step(
        tc, mesh, n_microbatches=2, learning_rate=1e-2
    )
    staged_base = _staged(qp, mesh)
    state = init_state(pipeline_shard_lora(lora, mesh))
    jstep = jax.jit(step)

    tx = optax.adam(1e-2)
    ref_lo, ref_opt = lora, tx.init(lora)
    for i in range(2):
        state, loss = jstep(staged_base, state, batch, jax.random.PRNGKey(i))
        ref_loss, ref_g = jax.value_and_grad(ref_lora_loss)(ref_lo)
        up, ref_opt = tx.update(ref_g, ref_opt, ref_lo)
        ref_lo = optax.apply_updates(ref_lo, up)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)

    got_b = state["lora"]["blocks"]["W_query"]["lora_b"]
    np.testing.assert_allclose(
        np.asarray(got_b), np.asarray(ref_lo["blocks"]["W_query"]["lora_b"]),
        rtol=5e-5, atol=1e-7,
    )
    # adapters and their moments really live on the stage placement
    assert "pp" in str(got_b.sharding.spec)
    assert "pp" in str(state["opt"][0].mu["blocks"]["W_query"]["lora_b"].sharding.spec)


def test_pipeline_validation(tiny):
    tc, params, ids = tiny
    mesh = create_mesh(dp=1, pp=4)  # 4 does not divide... n_layers=4 ok; use pp=3? not a mesh
    # n_layers % pp: build a 3-layer config against pp=2
    tc3 = LLAMA32Config(vocab_size=64, hidden_size=32, n_heads=2, n_layers=3,
                        hidden_dim=64, n_kv_groups=1, dtype="float32")
    p3 = init_causal_lm_params(jax.random.PRNGKey(0), tc3)
    mesh2 = create_mesh(dp=1, pp=2)
    with pytest.raises(ValueError, match="divisible"):
        pipeline_causal_lm_loss(p3, tc3, ids[:, :8], ids[:, :8], mesh2, 2)
    with pytest.raises(ValueError, match="divide"):
        pipeline_causal_lm_loss(params, tc, ids[:3], ids[:3], mesh, 2)
