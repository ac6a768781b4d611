"""AWQ-style activation-aware equalization + mixed int4/int8 recipes
(VERDICT r2 #5: make int4 a real capability).

The folding identities must be EXACT in float (norm gammas / w_up columns
absorb the scales), the mixed recipe must place bits per weight class, and
on a briefly-trained net (structured weights — where quantization quality is
meaningful, unlike the random-init 0.000 floor) int4 agreement must be high
and AWQ must not hurt.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama32mm_tpu.configs import LLAMA32Config, MLLAMAConfig, VisionEncoderConfig
from llama32mm_tpu.models.vlm import init_vlm_params, vlm_forward
from llama32mm_tpu.ops.awq import awq_equalize, calibrate_stats
from llama32mm_tpu.ops.quant import INT4_MIXED_RECIPE, quantize_llama_params

pytestmark = pytest.mark.slow


def tiny_cfg():
    return MLLAMAConfig(
        vision_config=VisionEncoderConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=1,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
        text_config=LLAMA32Config(
            vocab_size=256, hidden_size=96, n_heads=4, n_layers=3,
            hidden_dim=192, n_kv_groups=2, dtype="float32",
        ),
        projection_dim=96, hidden_size=96, image_token_index=255,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, tie_weights=False)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 24), 0, 250)
    return cfg, params, ids


def _logits(params, cfg, ids):
    return np.asarray(vlm_forward(params, cfg, input_ids=ids).logits.astype(jnp.float32))


class TestCalibration:
    def test_stats_shapes(self, setup):
        cfg, params, ids = setup
        stats = calibrate_stats(params, cfg, ids)
        tc = cfg.text_config
        assert stats["norm1_absmean"].shape == (tc.n_layers, tc.hidden_size)
        assert stats["norm2_absmean"].shape == (tc.n_layers, tc.hidden_size)
        assert stats["inter_absmean"].shape == (tc.n_layers, tc.hidden_dim)
        assert all(float(jnp.min(v)) > 0 for v in stats.values())

    def test_default_forward_has_no_stats(self, setup):
        cfg, params, ids = setup
        out = vlm_forward(params, cfg, input_ids=ids)
        assert out.stats is None


class TestEqualize:
    def test_fold_is_numerics_identical(self, setup):
        """The three foldings (norm1↔qkv, norm2↔gate/up, w_up↔w_down) are
        exact reparameterizations in fp32."""
        cfg, params, ids = setup
        stats = calibrate_stats(params, cfg, ids)
        eq = awq_equalize(params, stats, alpha=0.5)
        ref = _logits(params, cfg, ids)
        got = _logits(eq, cfg, ids)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_scales_actually_changed_weights(self, setup):
        cfg, params, ids = setup
        stats = calibrate_stats(params, cfg, ids)
        eq = awq_equalize(params, stats, alpha=0.5)
        w0 = params["language_model"]["model"]["blocks"]["ff"]["swiglu"]["w_gate"]
        w1 = eq["language_model"]["model"]["blocks"]["ff"]["swiglu"]["w_gate"]
        assert float(jnp.max(jnp.abs(w0 - w1))) > 0


class TestMixedRecipe:
    def test_recipe_places_bits(self, setup):
        cfg, params, ids = setup
        qp = quantize_llama_params(params, bits=4, group_size=32, recipe=INT4_MIXED_RECIPE)
        blocks = qp["language_model"]["model"]["blocks"]
        assert "q4" in blocks["ff"]["swiglu"]["w_gate"]  # int4
        assert "q" in blocks["ff"]["w_down"]["weight"]  # int8
        assert "q" in blocks["att"]["W_query"]["weight"]  # int8
        assert "q4" in qp["language_model"]["lm_head"]["weight"]  # int4

    def test_recipe_rejects_bad_bits(self, setup):
        cfg, params, ids = setup
        with pytest.raises(ValueError):
            quantize_llama_params(params, bits=4, recipe={"w_gate": 3})

    def test_mixed_beats_full_int4(self, setup):
        """On any weights, keeping attention + w_down at int8 must reduce
        logit error vs all-int4."""
        cfg, params, ids = setup
        ref = _logits(params, cfg, ids)
        full4 = _logits(quantize_llama_params(params, bits=4, group_size=32), cfg, ids)
        mixed = _logits(
            quantize_llama_params(params, bits=4, group_size=32, recipe=INT4_MIXED_RECIPE),
            cfg, ids,
        )
        assert np.mean(np.abs(mixed - ref)) < np.mean(np.abs(full4 - ref))


class TestTrainedNetQuality:
    @pytest.fixture(scope="class")
    def trained(self):
        """Briefly fine-tune the tiny net on a deterministic next-token map so
        the weights carry structure (quantization quality on random init is
        meaningless — 28 layers of RTN noise decorrelate any random net)."""
        from llama32mm_tpu.train.full import make_train_step

        cfg = tiny_cfg()
        params = init_vlm_params(jax.random.PRNGKey(0), cfg, tie_weights=False)

        def make_batch(key, b=8, t=32):
            first = jax.random.randint(key, (b, 1), 0, 240)

            def step(c, _):
                n = (7 * c + 3) % 240
                return n, n

            _, rest = jax.lax.scan(step, first, None, length=t - 1)
            return jnp.concatenate([first, rest[:, :, 0].T], axis=1)

        init_state, step = make_train_step(cfg, learning_rate=3e-3, freeze_vision=True)
        state = init_state(params)
        jstep = jax.jit(step)
        for i in range(250):
            ids = make_batch(jax.random.PRNGKey(100 + i))
            state, loss = jstep(state, {"input_ids": ids, "labels": ids}, jax.random.PRNGKey(i))
        trained = {**state.frozen, **state.params}
        eval_ids = make_batch(jax.random.PRNGKey(9999), b=4)
        return cfg, trained, eval_ids, float(loss)

    def test_int4_mixed_agreement_high_on_trained_net(self, trained):
        cfg, params, eval_ids, loss = trained
        assert loss < 2.5, f"tiny task failed to train, loss {loss}"
        ref = _logits(params, cfg, eval_ids)[:, 4:-1]
        stats = calibrate_stats(params, cfg, eval_ids)
        eq = awq_equalize(params, stats, alpha=0.5)

        def agree(src, **kw):
            got = _logits(quantize_llama_params(src, **kw), cfg, eval_ids)[:, 4:-1]
            return float(np.mean(ref.argmax(-1) == got.argmax(-1)))

        a8 = agree(params, bits=8)
        a4m = agree(params, bits=4, group_size=32, recipe=INT4_MIXED_RECIPE)
        a4m_awq = agree(eq, bits=4, group_size=32, recipe=INT4_MIXED_RECIPE)
        assert a8 >= 0.95
        assert a4m >= 0.75, f"mixed int4 agreement {a4m} on a trained net"
        assert a4m_awq >= a4m - 0.05, f"AWQ hurt: {a4m_awq} vs {a4m}"
