"""Golden-logits test against a vendored trace of the reference CPU-fallback
path (SURVEY §4) — runs without the reference mount. The trace
(tests/golden/tiny_vlm_trace.npz) holds the oracle's weights (converted to
this framework's layout), inputs, logits, and loss for the tiny fp32 config;
regenerate with ``python scripts/make_golden_trace.py`` (needs the reference
mount) if the tiny config changes."""

import os

import jax
import numpy as np
import pytest

from llama32mm_tpu import tiny_mllama_config
from llama32mm_tpu.models.vlm import init_vlm_params, vlm_forward

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_vlm_trace.npz")


@pytest.fixture(scope="module")
def trace():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden trace missing")
    return np.load(GOLDEN)


def _params_from_trace(trace, cfg):
    import jax.numpy as jnp

    struct = jax.eval_shape(
        lambda k: init_vlm_params(k, cfg, tie_weights=False), jax.random.PRNGKey(0)
    )
    flat, treedef = jax.tree.flatten(struct)
    leaves = [jnp.asarray(trace[f"param_{i}"]) for i in range(len(flat))]
    for want, got in zip(flat, leaves):
        assert tuple(want.shape) == tuple(got.shape), (want.shape, got.shape)
    return jax.tree.unflatten(treedef, leaves)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_golden_logits(trace, impl):
    import jax.numpy as jnp

    cfg = tiny_mllama_config()
    params = _params_from_trace(trace, cfg)
    out = vlm_forward(
        params,
        cfg,
        input_ids=jnp.asarray(trace["input_ids"]),
        pixel_values=jnp.asarray(trace["pixel_values"]),
        attention_mask=jnp.asarray(trace["attention_mask"]),
        labels=jnp.asarray(trace["labels"]),
        impl=impl,
    )
    np.testing.assert_allclose(np.asarray(out.logits), trace["logits"], atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(float(out.loss), float(trace["loss"]), atol=1e-4)
