"""Decode gemv routing (VERDICT r2 #1): kernel parity + route-on/off equality.

The large-block Pallas gemv kernels (``ops/pallas/gemv.py``) replace XLA's
decode gemv schedule on the measured-winner shapes. These tests pin:

- each kernel variant against the plain jnp composition (interpret mode on
  CPU, compiled on TPU — the sanitizer-equivalent strategy of SURVEY §5);
- ``split_gemv_weights`` bookkeeping (stacked leaves leave the scan, slice
  leaves stay);
- end-to-end: an engine generate with routes on is token-identical to routes
  off (fp32 CPU — the kernels accumulate in fp32 exactly like XLA's matmul).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llama32mm_tpu.configs import LLAMA32Config, MLLAMAConfig, VisionEncoderConfig
from llama32mm_tpu.models.language import split_gemv_weights
from llama32mm_tpu.models.vlm import init_vlm_params
from llama32mm_tpu.ops.pallas.gemv import (
    default_decode_routes,
    gemv_pallas,
    gemv_stacked_pallas,
    gemv_t_pallas,
    int8_gemv_pallas,
    int8_gemv_stacked_pallas,
)


pytestmark = pytest.mark.slow


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, jnp.float32, -0.5, 0.5).astype(dtype)


class TestKernels:
    def test_gemv_matches_matmul(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = _rand(k1, (1, 256))
        w = _rand(k2, (256, 384))
        got = gemv_pallas(x, w, block_bytes=128 * 1024)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w), rtol=1e-4, atol=1e-6)

    def test_gemv_batched_rows(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        x = _rand(k1, (4, 3, 128))  # [B, t, K] decode-chunk shape
        w = _rand(k2, (128, 256))
        got = gemv_pallas(x, w, block_bytes=64 * 1024)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w), rtol=1e-4, atol=1e-6)

    def test_gemv_stacked_indexes_layer(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        x = _rand(k1, (2, 128))
        w = _rand(k2, (3, 128, 320))
        for l in range(3):
            got = gemv_stacked_pallas(x, w, jnp.asarray(l), block_bytes=64 * 1024)
            np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w[l]), rtol=1e-4, atol=1e-6)

    def test_gemv_stacked_traced_index(self):
        """Layer index arrives traced (as inside the model's lax.scan)."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        x = _rand(k1, (1, 128))
        w = _rand(k2, (4, 128, 256))

        @jax.jit
        def run(x, w):
            def body(c, l):
                return c, gemv_stacked_pallas(x, w, l, block_bytes=64 * 1024)

            _, ys = jax.lax.scan(body, 0, jnp.arange(4, dtype=jnp.int32))
            return ys

        got = run(x, w)
        want = jnp.stack([x @ w[l] for l in range(4)])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6)

    def test_gemv_t_matches_transposed(self):
        """Tied-lm_head orientation: weight stored [N, K] (embedding table)."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(4))
        x = _rand(k1, (1, 192))
        w_t = _rand(k2, (512, 192))
        got = gemv_t_pallas(x, w_t, block_bytes=64 * 1024)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w_t.T), rtol=1e-4, atol=1e-6)

    def test_int8_gemv(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(5))
        x = _rand(k1, (1, 128))
        q = jax.random.randint(k2, (128, 256), -127, 128, jnp.int32).astype(jnp.int8)
        scale = jnp.full((256,), 0.01, jnp.float32)
        got = int8_gemv_pallas(x, q, scale, block_bytes=64 * 1024)
        want = (x @ q.astype(x.dtype)).astype(jnp.float32) * scale
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-6)

    def test_int8_gemv_stacked(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(6))
        x = _rand(k1, (1, 128))
        q = jax.random.randint(k2, (3, 128, 256), -127, 128, jnp.int32).astype(jnp.int8)
        scale = jnp.linspace(0.005, 0.02, 3 * 256).reshape(3, 256).astype(jnp.float32)
        for l in range(3):
            got = int8_gemv_stacked_pallas(x, q, scale, jnp.asarray(l), block_bytes=64 * 1024)
            want = (x @ q[l].astype(x.dtype)).astype(jnp.float32) * scale[l]
            np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-6)

    def test_int4_gemv(self):
        """Single-weight int4 gemv vs the dequantized matmul (per-group
        scales, ng=4)."""
        from llama32mm_tpu.ops.pallas.gemv import int4_gemv_pallas
        from llama32mm_tpu.ops.quant import dequantize_weight, quantize_weight_int4

        k1, k2 = jax.random.split(jax.random.PRNGKey(8))
        x = _rand(k1, (1, 128))
        qw = quantize_weight_int4(_rand(k2, (128, 256)), group_size=32)
        got = int4_gemv_pallas(x, qw["q4"], qw["scale"], block_bytes=64 * 1024)
        want = x @ dequantize_weight(qw, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5)

    def test_int4_gemv_per_channel(self):
        """ng=1 (per-channel) exercises the huge-group sub-chunking branch."""
        from llama32mm_tpu.ops.pallas.gemv import int4_gemv_pallas
        from llama32mm_tpu.ops.quant import dequantize_weight, quantize_weight_int4

        k1, k2 = jax.random.split(jax.random.PRNGKey(9))
        x = _rand(k1, (2, 256))
        qw = quantize_weight_int4(_rand(k2, (256, 128)), group_size=256)
        got = int4_gemv_pallas(x, qw["q4"], qw["scale"], block_bytes=64 * 1024)
        want = x @ dequantize_weight(qw, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5)

    def test_int4_variants_agree(self):
        """All unpack variants (pre / post / post-cat) match the dequantized
        matmul; the post variants (fp32 per-group post-scale) are strictly
        tighter than pre (bf16 premultiplied scales)."""
        from llama32mm_tpu.ops.pallas.gemv import int4_gemv_stacked_pallas
        from llama32mm_tpu.ops.quant import dequantize_weight, quantize_weight_int4

        k1, k2 = jax.random.split(jax.random.PRNGKey(21))
        x = _rand(k1, (2, 256))
        w = _rand(k2, (2, 256, 192))
        for gs in (64, 256):  # grouped and per-channel (sub-chunk branch)
            qw = quantize_weight_int4(w, group_size=gs)
            one = {"q4": qw["q4"][1], "scale": qw["scale"][1]}
            want = np.asarray(x @ dequantize_weight(one, jnp.float32))
            errs = {}
            for v in ("pre", "post", "post-cat"):
                got = int4_gemv_stacked_pallas(
                    x, qw["q4"], qw["scale"], jnp.asarray(1),
                    block_bytes=64 * 1024, variant=v,
                )
                np.testing.assert_allclose(
                    np.asarray(got), want, rtol=2e-2, atol=2e-2
                )
                errs[v] = float(np.max(np.abs(np.asarray(got, np.float32) - want)))
            assert errs["post"] <= errs["pre"] + 1e-6
            assert errs["post-cat"] <= errs["pre"] + 1e-6

    def test_int4_w4a8_exact_on_int8_grid(self):
        """The w4a8 variant's ONLY numerics change is the per-row int8
        activation quantization: with x already on an exact int8 grid
        (x = m·i, i ∈ [-127,127]) the kernel must match the dequantized
        matmul to fp32 accumulation tolerance — the nibble algebra
        (16·u_hi−128 top-bit flip, offset folding) is exact by construction."""
        from llama32mm_tpu.ops.pallas.gemv import int4_gemv_stacked_pallas
        from llama32mm_tpu.ops.quant import dequantize_weight, quantize_weight_int4

        k1, k2 = jax.random.split(jax.random.PRNGKey(33))
        ints = jax.random.randint(k1, (2, 256), -127, 128, jnp.int32)
        x = (ints.astype(jnp.float32) * 0.0173).astype(jnp.float32)
        w = _rand(k2, (2, 256, 192))
        for gs in (64, 256):  # grouped and per-channel (sub-chunk branch)
            qw = quantize_weight_int4(w, group_size=gs)
            one = {"q4": qw["q4"][1], "scale": qw["scale"][1]}
            want = np.asarray(x @ dequantize_weight(one, jnp.float32))
            for v in ("w4a8", "w4a8b"):
                got = int4_gemv_stacked_pallas(
                    x, qw["q4"], qw["scale"], jnp.asarray(1),
                    block_bytes=64 * 1024, variant=v,
                )
                np.testing.assert_allclose(
                    np.asarray(got, np.float32), want, rtol=1e-4, atol=1e-4
                )

    def test_int4_w4a8_generic_activation_error(self):
        """Generic (non-grid) activations: w4a8 differs from the dequant
        matmul only by the per-row int8 rounding — bounded, small relative
        error on well-scaled inputs."""
        from llama32mm_tpu.ops.pallas.gemv import int4_gemv_stacked_pallas
        from llama32mm_tpu.ops.quant import dequantize_weight, quantize_weight_int4

        k1, k2 = jax.random.split(jax.random.PRNGKey(34))
        x = _rand(k1, (2, 256))
        w = _rand(k2, (2, 256, 192))
        qw = quantize_weight_int4(w, group_size=64)
        one = {"q4": qw["q4"][0], "scale": qw["scale"][0]}
        want = np.asarray(x @ dequantize_weight(one, jnp.float32))
        got = np.asarray(int4_gemv_stacked_pallas(
            x, qw["q4"], qw["scale"], jnp.asarray(0),
            block_bytes=64 * 1024, variant="w4a8",
        ), np.float32)
        scale = np.maximum(np.abs(want), 1.0)
        assert np.max(np.abs(got - want) / scale) < 0.05

    def test_int4_gemv_stacked(self):
        """Stacked int4 gemv indexes the right layer, incl. under a traced
        scan index."""
        from llama32mm_tpu.ops.pallas.gemv import int4_gemv_stacked_pallas
        from llama32mm_tpu.ops.quant import dequantize_weight, quantize_weight_int4

        k1, k2 = jax.random.split(jax.random.PRNGKey(10))
        x = _rand(k1, (1, 128))
        w = _rand(k2, (3, 128, 192))
        qw = quantize_weight_int4(w, group_size=64)
        for l in range(3):
            got = int4_gemv_stacked_pallas(
                x, qw["q4"], qw["scale"], jnp.asarray(l), block_bytes=64 * 1024
            )
            one = {"q4": qw["q4"][l], "scale": qw["scale"][l]}
            want = x @ dequantize_weight(one, jnp.float32)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-5)

        def body(c, l):
            return c, int4_gemv_stacked_pallas(
                x, qw["q4"], qw["scale"], l, block_bytes=64 * 1024
            )

        _, outs = jax.lax.scan(body, 0, jnp.arange(3))
        for l in range(3):
            one = {"q4": qw["q4"][l], "scale": qw["scale"][l]}
            want = x @ dequantize_weight(one, jnp.float32)
            np.testing.assert_allclose(np.asarray(outs[l]), np.asarray(want), rtol=1e-3, atol=1e-5)

    def test_ragged_last_block(self):
        """N not a multiple of the block width exercises the partial block."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        x = _rand(k1, (1, 128))
        w = _rand(k2, (128, 200))  # block 128 cols → last block ragged
        got = gemv_pallas(x, w, block_bytes=128 * 128 * 4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w), rtol=1e-4, atol=1e-6)


class TestSplit:
    def _blocks(self, L=3, h=64, inter=128, quantized=False):
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)

        def leaf(k, shape):
            w = _rand(k, shape)
            if quantized:
                from llama32mm_tpu.ops.quant import quantize_weight

                return quantize_weight(w)
            return w

        return {
            "norm1": {"weight": jnp.ones((L, h))},
            "norm2": {"weight": jnp.ones((L, h))},
            "att": {
                "W_query": {"weight": leaf(ks[0], (L, h, h))},
                "W_key": {"weight": leaf(ks[1], (L, h, h // 2))},
                "W_value": {"weight": leaf(ks[2], (L, h, h // 2))},
                "out_proj": {"weight": leaf(ks[3], (L, h, h))},
            },
            "ff": {
                "swiglu": {
                    "w_gate": leaf(ks[4], (L, h, inter)),
                    "w_up": leaf(ks[5], (L, h, inter)),
                },
                "w_down": {"weight": leaf(ks[6], (L, inter, h))},
            },
        }

    def test_stacked_removed_slice_kept(self):
        blocks = self._blocks()
        routes = {"w_down": ("stacked", None), "W_key": ("slice", None)}
        out, ctx = split_gemv_weights(blocks, routes)
        assert "w_down" not in out["ff"]
        assert "W_key" in out["att"]  # slice mode stays in the scan
        assert ctx["w_down"][0] == "stacked" and ctx["W_key"][0] == "slice"
        # untouched leaves unchanged
        assert out["att"]["W_query"] is blocks["att"]["W_query"]

    def test_int4_routed_stacked(self):
        """int4 leaves route like int8/bf16 now that the packed-nibble gemv
        kernel exists (round 4): stacked mode pulls the leaf out of the scan."""
        from llama32mm_tpu.ops.quant import quantize_weight_int4

        blocks = self._blocks()
        blocks["ff"]["w_down"]["weight"] = quantize_weight_int4(
            _rand(jax.random.PRNGKey(9), (3, 128, 64)), group_size=64
        )
        out, ctx = split_gemv_weights(blocks, {"w_down": None})
        assert ctx is not None and ctx["w_down"][0] == "stacked"
        assert "w_down" not in out["ff"]

    def test_int4_route_names_extraction(self):
        """int4_route_names finds exactly the int4 leaves (mixed recipe) and
        flags the int4 head."""
        from llama32mm_tpu.models.language import int4_route_names
        from llama32mm_tpu.ops.quant import INT4_MIXED_RECIPE, quantize_llama_params

        cfg = tiny_cfg(tie=False)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg, tie_weights=False)
        qp = quantize_llama_params(params, bits=8, group_size=32,
                                   recipe=INT4_MIXED_RECIPE)
        routes = int4_route_names(qp)
        assert set(routes) == {"w_gate", "w_up", "lm_head"}
        assert routes["w_gate"] == ("stacked", None)
        assert isinstance(routes["lm_head"], int)
        # all-int8 tree → no int4 routes
        assert int4_route_names(quantize_llama_params(params, bits=8)) == {}

    def test_default_routes_shape(self):
        # Only ablation-verified winners ship as defaults: int8 lm_head (the
        # one route that wins IN the engine); bf16 has none.
        assert default_decode_routes(quantized=False) is None
        assert "lm_head" in default_decode_routes(quantized=True)


def tiny_cfg(dtype="float32", tie=True):
    return MLLAMAConfig(
        vision_config=VisionEncoderConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
        text_config=LLAMA32Config(
            vocab_size=256, hidden_size=64, n_heads=4, n_layers=3,
            hidden_dim=96, n_kv_groups=2, dtype=dtype, max_cache_length=64,
        ),
        projection_dim=64,
        hidden_size=64,
        image_token_index=255,
    )


class TestEngineRoutes:
    def test_generate_routes_token_identical(self):
        """Routes on vs off: same greedy tokens + logits (fp32 CPU: the Pallas
        kernels accumulate in fp32 exactly like XLA's matmul)."""
        from llama32mm_tpu.inference.engine import InferenceEngine

        cfg = tiny_cfg()
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, 250)
        routes = {
            "w_down": ("stacked", 64 * 1024),
            "out_proj": ("stacked", 64 * 1024),
            "W_key": ("slice", 64 * 1024),
            "W_value": ("slice", 64 * 1024),
            "lm_head": 64 * 1024,
        }
        base = InferenceEngine(params, cfg, gemv_routes=None)
        routed = InferenceEngine(params, cfg, gemv_routes=routes)
        r0 = base.generate(ids, max_new_tokens=6, temperature=0.0)
        r1 = routed.generate(ids, max_new_tokens=6, temperature=0.0)
        np.testing.assert_array_equal(np.asarray(r0.tokens), np.asarray(r1.tokens))
        np.testing.assert_allclose(
            np.asarray(r0.prefill_logits), np.asarray(r1.prefill_logits), rtol=1e-4, atol=1e-6
        )

    def test_generate_routes_untied_head(self):
        from llama32mm_tpu.inference.engine import InferenceEngine

        cfg = tiny_cfg(tie=False)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg, tie_weights=False)
        ids = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 250)
        base = InferenceEngine(params, cfg, gemv_routes=None)
        routed = InferenceEngine(
            params, cfg, gemv_routes={"lm_head": 64 * 1024, "w_down": ("stacked", None)}
        )
        r0 = base.generate(ids, max_new_tokens=5, temperature=0.0)
        r1 = routed.generate(ids, max_new_tokens=5, temperature=0.0)
        np.testing.assert_array_equal(np.asarray(r0.tokens), np.asarray(r1.tokens))

    def test_generate_routes_int8(self):
        from llama32mm_tpu.inference.engine import InferenceEngine
        from llama32mm_tpu.ops.quant import quantize_llama_params

        cfg = tiny_cfg()
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        qparams = quantize_llama_params(params)
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, 250)
        routes = default_decode_routes(quantized=True)
        # shrink blocks to toy scale
        routes = {
            k: (("slice", 64 * 1024) if isinstance(v, tuple) and v[0] == "slice"
                else ("stacked", 64 * 1024) if isinstance(v, tuple)
                else 64 * 1024)
            for k, v in routes.items()
        }
        base = InferenceEngine(qparams, cfg, gemv_routes=None)
        routed = InferenceEngine(qparams, cfg, gemv_routes=routes)
        r0 = base.generate(ids, max_new_tokens=6, temperature=0.0)
        r1 = routed.generate(ids, max_new_tokens=6, temperature=0.0)
        np.testing.assert_array_equal(np.asarray(r0.tokens), np.asarray(r1.tokens))

    def test_generate_routes_int4(self):
        """All-int4 decode with the int4 gemv routes is token-identical to
        the unrouted qlinear path (routes from int4_route_names, toy blocks)."""
        from llama32mm_tpu.inference.engine import InferenceEngine
        from llama32mm_tpu.models.language import int4_route_names
        from llama32mm_tpu.ops.quant import quantize_llama_params

        cfg = tiny_cfg(tie=False)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg, tie_weights=False)
        qparams = quantize_llama_params(params, bits=4, group_size=32)
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, 250)
        routes = int4_route_names(qparams)
        assert set(routes) >= {"W_query", "w_down", "w_gate", "w_up", "lm_head"}
        # toy block sizes
        routes = {
            k: (("stacked", 64 * 1024) if isinstance(v, tuple) else 64 * 1024)
            for k, v in routes.items()
        }
        base = InferenceEngine(qparams, cfg, gemv_routes=None)
        routed = InferenceEngine(qparams, cfg, gemv_routes=routes)
        r0 = base.generate(ids, max_new_tokens=6, temperature=0.0)
        r1 = routed.generate(ids, max_new_tokens=6, temperature=0.0)
        np.testing.assert_array_equal(np.asarray(r0.tokens), np.asarray(r1.tokens))

    def test_generate_routes_int4_w4a8(self):
        """End-to-end int4 decode through the w4a8 kernel variant (module
        default flipped for the trace): greedy tokens must match the exact
        unrouted qlinear path on a net whose margins dominate the activation-
        quant noise — here the same tiny random net, short horizon."""
        from llama32mm_tpu.inference.engine import InferenceEngine
        from llama32mm_tpu.models.language import int4_route_names
        from llama32mm_tpu.ops.pallas import gemv as gemv_mod
        from llama32mm_tpu.ops.quant import quantize_llama_params

        cfg = tiny_cfg(tie=False)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg, tie_weights=False)
        qparams = quantize_llama_params(params, bits=4, group_size=32)
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, 250)
        routes = {
            k: (("stacked", 64 * 1024) if isinstance(v, tuple) else 64 * 1024)
            for k, v in int4_route_names(qparams).items()
        }
        base = InferenceEngine(qparams, cfg, gemv_routes=None)
        r0 = base.generate(ids, max_new_tokens=6, temperature=0.0)
        prev = gemv_mod._INT4_VARIANT
        gemv_mod._INT4_VARIANT = "w4a8"
        try:
            routed = InferenceEngine(qparams, cfg, gemv_routes=routes)
            r1 = routed.generate(ids, max_new_tokens=6, temperature=0.0)
        finally:
            gemv_mod._INT4_VARIANT = prev
        np.testing.assert_array_equal(np.asarray(r0.tokens), np.asarray(r1.tokens))

    def test_spec_decode_with_routes(self):
        from llama32mm_tpu.inference.engine import InferenceEngine

        cfg = tiny_cfg()
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        ids = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0, 250)
        routes = {"w_down": ("stacked", 64 * 1024), "lm_head": 64 * 1024}
        base = InferenceEngine(params, cfg, gemv_routes=None)
        spec = InferenceEngine(params, cfg, spec_lookup=3, gemv_routes=routes)
        r0 = base.generate(ids, max_new_tokens=8, temperature=0.0)
        r1 = spec.generate(ids, max_new_tokens=8, temperature=0.0)
        n = int(r0.num_generated[0])
        np.testing.assert_array_equal(
            np.asarray(r0.tokens[0])[:n], np.asarray(r1.tokens[0])[:n]
        )

    def test_prefill_not_routed(self):
        """Routes must not apply at prefill shapes (t > 32): same executable
        semantics regardless — pin by comparing a long-prompt prefill's logits
        with routes requested."""
        from llama32mm_tpu.inference.engine import InferenceEngine

        cfg = tiny_cfg()
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        ids = jax.random.randint(jax.random.PRNGKey(3), (1, 40), 0, 250)
        base = InferenceEngine(params, cfg, gemv_routes=None)
        routed = InferenceEngine(params, cfg, gemv_routes={"w_down": None, "lm_head": None})
        r0 = base.generate(ids, max_new_tokens=3, temperature=0.0)
        r1 = routed.generate(ids, max_new_tokens=3, temperature=0.0)
        np.testing.assert_allclose(
            np.asarray(r0.prefill_logits), np.asarray(r1.prefill_logits), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(r0.tokens), np.asarray(r1.tokens))


class TestServerRoutes:
    def test_server_decode_with_routes_matches(self):
        """Batched server with routes on = routes off, token-for-token."""
        from llama32mm_tpu.inference.server import ContinuousBatchingServer

        cfg = tiny_cfg()
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        ids = np.asarray(
            jax.random.randint(jax.random.PRNGKey(4), (1, 10), 0, 250)
        )
        routes = {
            "w_down": ("stacked", 64 * 1024),
            "W_key": ("slice", 64 * 1024),
            "lm_head": 64 * 1024,
        }

        def run(gr):
            srv = ContinuousBatchingServer(
                params, cfg, slots=2, max_cache_length=32,
                prompt_buckets=(16,), gemv_routes=gr, steps_per_sync=4,
                eos_token_id=-1,
            )
            rid = srv.submit(ids[0], max_new_tokens=8)
            return srv.run()[rid]

        np.testing.assert_array_equal(run(None), run(routes))
