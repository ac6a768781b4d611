"""Round-5 helper coverage: bench byte models, optimizer option, and the
checkpoint-drill hubify rewrite (header-only safetensors key rename)."""

import importlib.util
import json
import os
import struct
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_module(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REPO, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def benchmod():
    return _load_module("bench.py", "bench_for_tests")


class TestInt4DecodeStepBytes:
    def test_untied_q4_tree(self, benchmod):
        from llama32mm_tpu.configs import tiny_mllama_config

        cfg = tiny_mllama_config()
        tc = cfg.text_config
        L, h, inter = tc.n_layers, tc.hidden_size, tc.hidden_dim
        nq, nkv, hd = tc.n_heads, tc.n_kv_groups, tc.head_dim
        V = tc.vocab_size

        def q4leaf(ci, co, lead=None):
            shape = ((lead,) if lead else ()) + (ci // 2, co)
            sshape = ((lead,) if lead else ()) + (max(1, ci // 128), co)
            return {"q4": jnp.zeros(shape, jnp.uint8),
                    "scale": jnp.zeros(sshape, jnp.float32)}

        blocks = {
            "norm1": {"weight": jnp.ones((L, h), jnp.bfloat16)},
            "att": {
                "W_query": {"weight": q4leaf(h, nq * hd, L)},
                "W_key": {"weight": q4leaf(h, nkv * hd, L)},
                "W_value": {"weight": q4leaf(h, nkv * hd, L)},
                "out_proj": {"weight": q4leaf(nq * hd, h, L)},
            },
            "norm2": {"weight": jnp.ones((L, h), jnp.bfloat16)},
            "ff": {
                "swiglu": {"w_gate": q4leaf(h, inter, L), "w_up": q4leaf(h, inter, L)},
                "w_down": {"weight": q4leaf(inter, h, L)},
            },
        }
        params = {"language_model": {
            "model": {"tok_emb": {"weight": jnp.zeros((V, h), jnp.bfloat16)},
                      "blocks": blocks,
                      "final_norm": {"weight": jnp.ones((h,), jnp.bfloat16)}},
            "lm_head": {"weight": q4leaf(h, V)},
        }}
        got = benchmod.int4_decode_step_bytes(params, cfg, mean_ctx=64)
        expect_stream = sum(
            x.nbytes for x in jax.tree.leaves(
                {"b": blocks, "f": {"weight": jnp.ones((h,), jnp.bfloat16)},
                 "h": params["language_model"]["lm_head"]}
            )
        )
        kv = L * 2 * nkv * hd * 64 + L * 2 * nkv * 64 * 4
        assert got == pytest.approx(expect_stream + kv)

    def test_tied_head_counts_embedding(self, benchmod):
        from llama32mm_tpu.configs import tiny_mllama_config
        from llama32mm_tpu.models.vlm import init_vlm_params

        cfg = tiny_mllama_config()
        params = init_vlm_params(jax.random.PRNGKey(0), cfg, tie_weights=True)
        got = benchmod.int4_decode_step_bytes(params, cfg, mean_ctx=32)
        emb = params["language_model"]["model"]["tok_emb"]["weight"].nbytes
        # the tied head's stream must include the embedding bytes
        assert got > emb


class TestBatchedRoofline:
    def test_amortization_math(self, benchmod):
        from llama32mm_tpu.configs import tiny_mllama_config

        cfg = tiny_mllama_config()
        w = benchmod.decode_step_bytes(cfg, 0)
        kv = benchmod.decode_step_bytes(cfg, 100) - w
        got = benchmod.batched_decode_roofline(cfg, 8, 100, hbm_gbps=819.0)
        assert got == pytest.approx(8 * 819e9 / (w + 8 * kv))
        # aggregate ceiling grows with batch (weights amortize)
        assert got > benchmod.batched_decode_roofline(cfg, 1, 100, 819.0) * 4


class TestOptimizerOption:
    def test_bad_name_raises(self):
        from llama32mm_tpu.train.full import make_optimizer

        with pytest.raises(ValueError, match="adamw.*adafactor|adafactor"):
            make_optimizer(optimizer="sgd")

    def test_adafactor_state_is_small(self):
        import optax

        from llama32mm_tpu.train.full import make_optimizer

        params = {"w": jnp.zeros((256, 512), jnp.float32)}
        st_af = make_optimizer(optimizer="adafactor").init(params)
        st_adam = make_optimizer(optimizer="adamw").init(params)
        nbytes = lambda t: sum(  # noqa: E731
            x.nbytes for x in jax.tree.leaves(t) if hasattr(x, "nbytes")
        )
        # factored moments: O(m+n) per matrix vs adam's O(2·m·n)
        assert nbytes(st_af) < nbytes(st_adam) / 100


class TestHubifyCrossAttn:
    def test_rename_preserves_bytes(self, tmp_path, monkeypatch):
        from safetensors.numpy import load_file, save_file

        drill = _load_module("scripts/drill_checkpoint_11b.py", "drill_for_tests")
        rng = np.random.default_rng(0)
        tensors = {}
        for i in (2, 3):  # layer 3 is a cross-attn layer, 2 is not
            for leaf in ("q_proj", "k_proj", "v_proj", "o_proj"):
                tensors[f"language_model.model.layers.{i}.self_attn.{leaf}.weight"] = (
                    rng.random((4, 8), dtype=np.float32)
                )
        tensors["language_model.model.layers.3.mlp.gate_proj.weight"] = (
            rng.random((4, 8), dtype=np.float32)
        )
        save_file(tensors, str(tmp_path / "model.safetensors"))
        with open(tmp_path / "model.safetensors.index.json", "w") as f:
            json.dump({"weight_map": {k: "model.safetensors" for k in tensors}}, f)

        n = drill._hubify_cross_attn(str(tmp_path))
        assert n == 4  # only layer 3's four attention weights

        out = load_file(str(tmp_path / "model.safetensors"))
        assert set(out) == (
            set(tensors)
            - {f"language_model.model.layers.3.self_attn.{p}.weight"
               for p in ("q_proj", "k_proj", "v_proj", "o_proj")}
            | {f"language_model.model.layers.3.cross_attn.{p}.weight"
               for p in ("q_proj", "k_proj", "v_proj", "o_proj")}
        )
        np.testing.assert_array_equal(
            out["language_model.model.layers.3.cross_attn.q_proj.weight"],
            tensors["language_model.model.layers.3.self_attn.q_proj.weight"],
        )
        np.testing.assert_array_equal(
            out["language_model.model.layers.2.self_attn.q_proj.weight"],
            tensors["language_model.model.layers.2.self_attn.q_proj.weight"],
        )
        idx = json.load(open(tmp_path / "model.safetensors.index.json"))
        assert ("language_model.model.layers.3.cross_attn.q_proj.weight"
                in idx["weight_map"])
