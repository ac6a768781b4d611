"""QLoRA: LoRA fine-tuning over a QUANTIZED frozen base (int8 / int4 weights).

The reference ships LoRA for an fp16/bf16 base only (``Model/model.py:107-121``,
README "LoRA fine-tuning"); adapters over a quantized base are what make the
11B north-star shapes fine-tunable on ONE v5e chip (int8 weights ~9.3 GB +
adapter optimizer state + remat activations fit 16 GB HBM — the QLoRA recipe,
TPU-native: the base streams through the same int8 decode/prefill path,
adapters train in fp32 on top).

The forward already routes quantized weights through ``qlinear`` and applies
LoRA on the dequantized output (``models/language.py::_linear``); these tests
pin the TRAINING path end-to-end: gradients flow through frozen quantized
matmuls into the adapters, remat + chunked-CE compose with a quantized base,
and trained adapters serve through the continuous-batching adapter bank over
the SAME quantized base they were trained on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu import init_vlm_params, tiny_mllama_config
from llama32mm_tpu.inference.engine import InferenceEngine
from llama32mm_tpu.inference.server import ContinuousBatchingServer
from llama32mm_tpu.ops.quant import quantize_llama_params
from llama32mm_tpu.train.lora import (
    init_lora_params,
    load_lora_adapters,
    make_lora_train_step,
    save_lora_adapters,
    stack_adapter_bank,
    zero_lora_params,
)


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _text_batch(cfg, b=2, s=24, key=7):
    ids = jax.random.randint(
        jax.random.PRNGKey(key), (b, s), 0, cfg.vocab_size - 10
    )
    return {"input_ids": ids, "labels": ids}


def _train(cfg, base_params, steps=6, lr=5e-2, **step_kw):
    init_state, step = make_lora_train_step(cfg, learning_rate=lr, **step_kw)
    state = init_state(init_lora_params(jax.random.PRNGKey(1), cfg.text_config, rank=4))
    batch = _text_batch(cfg)
    jstep = jax.jit(step)
    losses = []
    for i in range(steps):
        state, loss = jstep(base_params, state, batch, jax.random.PRNGKey(10 + i))
        losses.append(float(loss))
    return state, losses


@pytest.mark.parametrize(
    "quant_kw",
    [dict(), dict(bits=4, group_size=32)],
    ids=["int8", "int4"],
)
def test_qlora_step_learns_over_quantized_base(tiny, quant_kw):
    """Adapters receive real gradients through the frozen quantized matmuls:
    loss falls and both A and B matrices move after a few steps."""
    cfg, params = tiny
    qparams = quantize_llama_params(params, **quant_kw)
    state, losses = _train(cfg, qparams)
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0] - 0.05, f"no learning over quantized base: {losses}"
    blk = state.lora["blocks"]["W_query"]
    assert float(jnp.abs(blk["lora_a"]).max()) > 0.0
    assert float(jnp.abs(blk["lora_b"]).max()) > 0.0


def test_qlora_remat_losschunk_match_plain(tiny):
    """remat + chunked-CE (the long-context memory levers) are numerics-exact
    over an int8 base — QLoRA at 8k context uses the same path."""
    cfg, params = tiny
    qparams = quantize_llama_params(params)
    _, plain = _train(cfg, qparams, steps=3)
    _, lean = _train(cfg, qparams, steps=3, remat=True, loss_chunk=8)
    np.testing.assert_allclose(plain, lean, rtol=2e-5, atol=2e-5)


def test_qlora_train_then_serve_on_quantized_base(tiny, tmp_path):
    """The full QLoRA lifecycle: train adapters over the int8 base →
    save → load → serve through the adapter bank on the SAME int8 base.
    Adapter 0 (identity) must stay engine-exact; the trained adapter must
    actually change generation."""
    cfg, params = tiny
    qparams = quantize_llama_params(params)
    state, _ = _train(cfg, qparams, steps=6)

    path = str(tmp_path / "qlora_adapters")
    save_lora_adapters(path, state.lora)
    trained = load_lora_adapters(path)

    bank = stack_adapter_bank([zero_lora_params(cfg.text_config, rank=4), trained])
    prompt = np.asarray(
        jax.random.randint(jax.random.PRNGKey(3), (10,), 0, cfg.vocab_size - 10)
    )

    eng = InferenceEngine(qparams, cfg, max_cache_length=64, prompt_buckets=None)
    base_tok = np.asarray(
        eng.generate(prompt[None], None, max_new_tokens=8, temperature=0.0,
                     eos_token_id=-1).tokens
    )[0, :8]

    srv = ContinuousBatchingServer(
        qparams, cfg, slots=2, max_cache_length=64, prompt_buckets=None,
        steps_per_sync=2, eos_token_id=-1, adapter_bank=bank,
    )
    rid0 = srv.submit(prompt, None, max_new_tokens=8, adapter_id=0)
    rid1 = srv.submit(prompt, None, max_new_tokens=8, adapter_id=1)
    results = srv.run()

    np.testing.assert_array_equal(
        results[rid0], base_tok,
        err_msg="identity adapter over int8 base diverged from the plain int8 engine",
    )
    assert not np.array_equal(results[rid1], base_tok), (
        "trained QLoRA adapter had no effect on generation"
    )

    # determinism: a fresh server over the same quantized base + bank replays
    # the trained-adapter generation exactly
    srv2 = ContinuousBatchingServer(
        qparams, cfg, slots=1, max_cache_length=64, prompt_buckets=None,
        steps_per_sync=4, eos_token_id=-1, adapter_bank=bank,
    )
    rid = srv2.submit(prompt, None, max_new_tokens=8, adapter_id=1)
    np.testing.assert_array_equal(srv2.run()[rid], results[rid1])


def test_qlora_int4_mixed_recipe_trains(tiny):
    """The shipped mixed int4/int8 quality recipe (quant.INT4_MIXED_RECIPE)
    is also a valid QLoRA base."""
    from llama32mm_tpu.ops.quant import INT4_MIXED_RECIPE

    cfg, params = tiny
    qparams = quantize_llama_params(
        params, bits=4, group_size=32, recipe=INT4_MIXED_RECIPE
    )
    _, losses = _train(cfg, qparams, steps=6, lr=1e-2)
    assert all(np.isfinite(losses)) and losses[-1] < losses[0]
