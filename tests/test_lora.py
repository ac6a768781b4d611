"""LoRA fine-tune path tests (Linear_LORA parity, train step, merge, save)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.models.vlm import vlm_forward
from llama32mm_tpu.train.lora import (
    Linear_LORA,
    init_lora_params,
    load_lora_adapters,
    make_lora_train_step,
    merge_lora_into_params,
    save_lora_adapters,
)


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.fixture(scope="module")
def batch(tiny):
    cfg, _ = tiny
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, cfg.vocab_size - 10)
    ids = ids.at[:, :4].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 28, 28))
    labels = ids.at[:, :4].set(-100)
    return {"input_ids": ids, "pixel_values": px, "labels": labels}


def test_zero_b_lora_is_identity(tiny, batch):
    cfg, params = tiny
    lora = init_lora_params(jax.random.PRNGKey(3), cfg.text_config, rank=4)
    out_base = vlm_forward(params, cfg, input_ids=batch["input_ids"],
                           pixel_values=batch["pixel_values"], impl="xla")
    out_lora = vlm_forward(params, cfg, input_ids=batch["input_ids"],
                           pixel_values=batch["pixel_values"], lora=lora, impl="xla")
    np.testing.assert_allclose(np.asarray(out_lora.logits), np.asarray(out_base.logits),
                               atol=1e-6)


def test_train_step_decreases_loss(tiny, batch):
    cfg, params = tiny
    lora = init_lora_params(jax.random.PRNGKey(3), cfg.text_config, rank=4)
    init_state, step = make_lora_train_step(cfg, learning_rate=5e-2, impl="xla")
    step = jax.jit(step)
    state = init_state(lora)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(5):
        state, loss = step(params, state, batch, jax.random.fold_in(rng, i))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 5


def test_merged_params_match_lora_forward(tiny, batch):
    cfg, params = tiny
    lora = init_lora_params(jax.random.PRNGKey(4), cfg.text_config, rank=4)
    # make B nonzero so the merge is nontrivial
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    out_lora = vlm_forward(params, cfg, input_ids=batch["input_ids"],
                           pixel_values=batch["pixel_values"], lora=lora, impl="xla")
    merged = merge_lora_into_params(params, lora)
    out_merged = vlm_forward(merged, cfg, input_ids=batch["input_ids"],
                             pixel_values=batch["pixel_values"], impl="xla")
    np.testing.assert_allclose(np.asarray(out_merged.logits), np.asarray(out_lora.logits),
                               atol=1e-4, rtol=1e-4)


def test_linear_lora_formula():
    m = Linear_LORA(8, 6, rank=2, alpha=4.0, dropout=0.0, key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 8))
    got = m(x)
    want = x @ m.weight + (4.0 / 2) * (x @ m.lora_a @ m.lora_b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_adapter_save_load_roundtrip(tiny, tmp_path):
    cfg, _ = tiny
    lora = init_lora_params(jax.random.PRNGKey(5), cfg.text_config, rank=4)
    p = str(tmp_path / "adapters.safetensors")
    save_lora_adapters(p, lora)
    loaded = load_lora_adapters(p)
    for name, ad in lora["blocks"].items():
        for leaf in ("lora_a", "lora_b", "scaling"):
            np.testing.assert_array_equal(np.asarray(ad[leaf]),
                                          np.asarray(loaded["blocks"][name][leaf]))


def test_grads_flow_only_to_adapters(tiny, batch):
    """value_and_grad over the lora tree only — base params enter as a
    constant; gradient structure matches the adapter tree."""
    cfg, params = tiny
    lora = init_lora_params(jax.random.PRNGKey(6), cfg.text_config, rank=4)

    def loss_fn(lora):
        return vlm_forward(params, cfg, input_ids=batch["input_ids"],
                           pixel_values=batch["pixel_values"], labels=batch["labels"],
                           lora=lora, impl="xla").loss

    grads = jax.grad(loss_fn)(lora)
    # B starts at zero → dL/dA must be zero only if up/down symmetric... not
    # generally; but dL/dB must be nonzero.
    gb = grads["blocks"]["W_query"]["lora_b"]
    assert float(jnp.max(jnp.abs(gb))) > 0.0
    assert jax.tree.structure(grads) == jax.tree.structure(lora)


def test_lm_head_adapter_grads_flow(tiny, batch):
    """The README recipe wraps every language_model linear incl. lm_head
    (reference Model/model.py:349-364): head adapter exists by default and
    receives gradients."""
    cfg, params = tiny
    lora = init_lora_params(jax.random.PRNGKey(7), cfg.text_config, rank=4)
    assert "lm_head" in lora
    assert lora["lm_head"]["lora_a"].shape == (cfg.text_config.hidden_size, 4)
    assert lora["lm_head"]["lora_b"].shape == (4, cfg.text_config.vocab_size)

    def loss_fn(lora):
        return vlm_forward(params, cfg, input_ids=batch["input_ids"],
                           pixel_values=batch["pixel_values"], labels=batch["labels"],
                           lora=lora, impl="xla").loss

    grads = jax.grad(loss_fn)(lora)
    assert float(jnp.max(jnp.abs(grads["lm_head"]["lora_b"]))) > 0.0
    # zero-B head adapter is identity at init
    out_base = vlm_forward(params, cfg, input_ids=batch["input_ids"],
                           pixel_values=batch["pixel_values"], impl="xla")
    out_lora = vlm_forward(params, cfg, input_ids=batch["input_ids"],
                           pixel_values=batch["pixel_values"], lora=lora, impl="xla")
    np.testing.assert_allclose(np.asarray(out_lora.logits), np.asarray(out_base.logits),
                               atol=1e-6)


def test_lm_head_and_projector_merge(tiny, batch):
    cfg, params = tiny
    lora = init_lora_params(jax.random.PRNGKey(9), cfg, rank=4, include_projector=True)
    assert "projector" in lora
    lora = jax.tree.map(lambda x: x + 0.01, lora)  # nonzero B everywhere
    out_lora = vlm_forward(params, cfg, input_ids=batch["input_ids"],
                           pixel_values=batch["pixel_values"], lora=lora, impl="xla")
    merged = merge_lora_into_params(params, lora)
    out_merged = vlm_forward(merged, cfg, input_ids=batch["input_ids"],
                             pixel_values=batch["pixel_values"], impl="xla")
    np.testing.assert_allclose(np.asarray(out_merged.logits), np.asarray(out_lora.logits),
                               atol=1e-4, rtol=1e-4)


def test_lm_head_merge_unties_tied_head(tiny, batch):
    """Merging a head adapter into a tied-head model materializes an untied
    lm_head equal to tok_emb.T + s·A@B."""
    cfg, _ = tiny
    from llama32mm_tpu import init_vlm_params as init_p

    params = init_p(jax.random.PRNGKey(11), cfg, tie_weights=True)
    assert params["language_model"]["lm_head"]["weight"] is None
    lora = init_lora_params(jax.random.PRNGKey(12), cfg.text_config, rank=4)
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    merged = merge_lora_into_params(params, lora)
    w = merged["language_model"]["lm_head"]["weight"]
    assert w is not None and w.shape == (cfg.text_config.hidden_size, cfg.vocab_size)
    out_lora = vlm_forward(params, cfg, input_ids=batch["input_ids"],
                           pixel_values=batch["pixel_values"], lora=lora, impl="xla")
    out_merged = vlm_forward(merged, cfg, input_ids=batch["input_ids"],
                             pixel_values=batch["pixel_values"], impl="xla")
    np.testing.assert_allclose(np.asarray(out_merged.logits), np.asarray(out_lora.logits),
                               atol=1e-4, rtol=1e-4)


def test_adapter_save_load_includes_flat_adapters(tiny, tmp_path):
    cfg, _ = tiny
    lora = init_lora_params(jax.random.PRNGKey(13), cfg, rank=4, include_projector=True)
    p = str(tmp_path / "adapters_full.safetensors")
    save_lora_adapters(p, lora)
    loaded = load_lora_adapters(p)
    for extra in ("lm_head", "projector"):
        for leaf in ("lora_a", "lora_b", "scaling"):
            np.testing.assert_array_equal(np.asarray(lora[extra][leaf]),
                                          np.asarray(loaded[extra][leaf]))


def test_train_state_save_resume(tiny, batch, tmp_path):
    """Training resumed from a saved state continues identically."""
    from llama32mm_tpu.train.lora import load_train_state, save_train_state

    cfg, params = tiny
    lora = init_lora_params(jax.random.PRNGKey(8), cfg.text_config, rank=4)
    init_state, step = make_lora_train_step(cfg, learning_rate=1e-2, impl="xla")
    step = jax.jit(step)
    rng = jax.random.PRNGKey(0)

    state = init_state(lora)
    for i in range(3):
        state, _ = step(params, state, batch, jax.random.fold_in(rng, i))

    # extension-less path: save appends .npz, load must find the same file
    p = str(tmp_path / "train_state")
    save_train_state(p, state)
    restored = load_train_state(p, init_state(lora))
    assert int(restored.step) == 3

    state_a, loss_a = step(params, state, batch, jax.random.fold_in(rng, 3))
    state_b, loss_b = step(params, restored, batch, jax.random.fold_in(rng, 3))
    np.testing.assert_allclose(float(loss_a), float(loss_b), atol=1e-6)
    la = jax.tree.leaves(state_a.lora)
    lb = jax.tree.leaves(state_b.lora)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_remat_train_step_matches_no_remat(tiny, batch, impl):
    """Scan-over-remat (jax.checkpoint on the layer body) must not change the
    math: loss and updated adapters equal with and without rematerialization,
    on both attention paths."""
    from llama32mm_tpu.train.lora import make_lora_train_step

    cfg, params = tiny
    lora = init_lora_params(jax.random.PRNGKey(1), cfg.text_config, rank=4)

    init_state, step = make_lora_train_step(cfg, learning_rate=1e-3, impl=impl)
    _, step_r = make_lora_train_step(cfg, learning_rate=1e-3, impl=impl, remat=True)
    state = init_state(lora)
    s0, l0 = jax.jit(step)(params, state, batch, jax.random.PRNGKey(4))
    s1, l1 = jax.jit(step_r)(params, state, batch, jax.random.PRNGKey(4))
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6, err_msg=impl)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, err_msg=impl
        ),
        s1.lora,
        s0.lora,
    )


def test_chunked_ce_loss_and_grads_match_full_logits(tiny, batch):
    """loss_chunk streams positions through lm_head+CE under a remat scan —
    the full [B, T, vocab] logits never exist; loss and updated adapters must
    match the full-logits path (incl. the lm_head adapter's gradient)."""
    from llama32mm_tpu.models.vlm import vlm_forward
    from llama32mm_tpu.train.lora import make_lora_train_step

    cfg, params = tiny
    out_full = vlm_forward(params, cfg, input_ids=batch["input_ids"],
                           pixel_values=batch["pixel_values"], labels=batch["labels"])
    out_chunk = vlm_forward(params, cfg, input_ids=batch["input_ids"],
                            pixel_values=batch["pixel_values"],
                            labels=batch["labels"], loss_chunk=5)
    assert out_chunk.logits is None
    np.testing.assert_allclose(float(out_chunk.loss), float(out_full.loss), rtol=1e-6)

    lora = init_lora_params(jax.random.PRNGKey(3), cfg.text_config, rank=4)
    init_state, step = make_lora_train_step(cfg, learning_rate=1e-3)
    _, step_c = make_lora_train_step(cfg, learning_rate=1e-3, remat=True, loss_chunk=5)
    state = init_state(lora)
    s0, l0 = jax.jit(step)(params, state, batch, jax.random.PRNGKey(4))
    s1, l1 = jax.jit(step_c)(params, state, batch, jax.random.PRNGKey(4))
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6),
        s1.lora, s0.lora,
    )
