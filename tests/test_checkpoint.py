"""Checkpoint loader tests: key translation + a synthetic HF-style safetensors
round-trip whose loaded params must reproduce the reference oracle's logits."""

import json
import os

import numpy as np
import pytest

from llama32mm_tpu.io.checkpoint import (
    build_config_from_hf,
    load_checkpoint_params,
    translate_hf_key,
)


def test_translate_text_keys():
    path, idx, kind = translate_hf_key("language_model.model.layers.3.self_attn.q_proj.weight")
    assert path == ("language_model", "model", "blocks", "att", "W_query", "weight")
    assert idx == 3 and kind == "t"
    path, idx, kind = translate_hf_key("language_model.model.embed_tokens.weight")
    assert path == ("language_model", "model", "tok_emb", "weight") and idx is None

    assert translate_hf_key("language_model.model.layers.0.mlp.gate_proj.weight")[0][-1] == "w_gate"
    assert translate_hf_key("language_model.model.norm.weight")[0][-2:] == ("final_norm", "weight")


def test_translate_drops_unsupported():
    # reference unsupported subsystems (Model/utils.py:111-119)
    assert translate_hf_key("vision_model.global_transformer.layers.0.mlp.fc1.weight") is None
    assert translate_hf_key("vision_model.vision_model.tile_positional_embedding.weight") is None
    assert translate_hf_key("vision_model.vision_model.gated_positional_embedding.embedding") is None
    assert translate_hf_key("language_model.model.layers.3.cross_attn.q_proj.weight") is None
    assert translate_hf_key("language_model.model.rotary_emb.inv_freq") is None


def test_translate_vision_keys():
    path, idx, kind = translate_hf_key(
        "vision_model.vision_model.encoder.layers.7.self_attn.out_proj.bias"
    )
    assert path == ("vision_model", "layers", "self_attn", "out_proj", "bias")
    assert idx == 7 and kind == "raw"
    path, _, kind = translate_hf_key("vision_model.vision_model.patch_embedding.weight")
    assert kind == "conv"


def test_build_config_from_hf():
    cfg = build_config_from_hf(
        {
            "text_config": {
                "vocab_size": 128256, "hidden_size": 4096, "num_attention_heads": 32,
                "num_hidden_layers": 40, "intermediate_size": 14336,
                "num_key_value_heads": 8, "rope_theta": 500000.0,
                "max_position_embeddings": 131072,
            },
            "vision_config": {
                "hidden_size": 1280, "intermediate_size": 5120, "num_hidden_layers": 32,
                "num_attention_heads": 16, "image_size": 560, "patch_size": 14,
            },
            "image_token_index": 128256,
        },
        pad_token_id=0,
    )
    assert cfg.text_config.n_kv_groups == 8
    assert cfg.text_config.num_image_tokens == 1600
    assert cfg.vision_config.num_patches == 1600


# ---------------------------------------------------------------------------
# Synthetic round-trip against the reference oracle
# ---------------------------------------------------------------------------

from reference_oracle import build_reference_tiny, import_reference, reference_available

LOCAL_TO_HF = [
    # (reference local state-dict prefix → HF checkpoint naming)
    ("language_model.model.tok_emb", "language_model.model.embed_tokens"),
    ("language_model.model.trf_blocks", "language_model.model.layers"),
    ("att.W_query", "self_attn.q_proj"),
    ("att.W_key", "self_attn.k_proj"),
    ("att.W_value", "self_attn.v_proj"),
    ("att.out_proj", "self_attn.o_proj"),
    ("norm1.weight", "input_layernorm.weight"),
    ("norm2.weight", "post_attention_layernorm.weight"),
    ("ff.swiglu.w_gate", "mlp.gate_proj.weight"),
    ("ff.swiglu.w_up", "mlp.up_proj.weight"),
    ("ff.w_down", "mlp.down_proj"),
    ("language_model.model.final_norm", "language_model.model.norm"),
    ("vision_model.embeddings.patch_embedding", "vision_model.vision_model.patch_embedding"),
    ("vision_model.embeddings.position_embedding", "vision_model.vision_model.position_embedding"),
    ("vision_model.encoder.layers", "vision_model.vision_model.encoder.layers"),
    ("layernorm1", "layer_norm1"),
    ("layernorm2", "layer_norm2"),
    ("vision_model.post_layernorm", "vision_model.vision_model.post_layernorm"),
    ("multi_modal_projector.linear", "multi_modal_projector.linear_1"),
]


def _local_key_to_hf(key: str) -> str:
    for src, dst in LOCAL_TO_HF:
        key = key.replace(src, dst)
    return key


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_checkpoint_roundtrip_logits_parity(tmp_path):
    torch = pytest.importorskip("torch")
    from safetensors.numpy import save_file

    ref_model_mod = import_reference()
    torch.manual_seed(0)
    ref_cfg, ref_m = build_reference_tiny(ref_model_mod, torch)

    # Write the oracle's weights as an HF-style safetensors checkpoint.
    tensors = {}
    for k, v in ref_m.state_dict().items():
        hf_key = _local_key_to_hf(k)
        tensors[hf_key] = v.detach().cpu().numpy()
    save_file(tensors, str(tmp_path / "model.safetensors"))
    hf_config = {
        "text_config": {
            "vocab_size": 256, "hidden_size": 64, "num_attention_heads": 4,
            "num_hidden_layers": 2, "intermediate_size": 128, "num_key_value_heads": 2,
            "rope_theta": 500000.0, "max_position_embeddings": 2048,
        },
        "vision_config": {
            "hidden_size": 32, "intermediate_size": 64, "num_hidden_layers": 2,
            "num_attention_heads": 4, "image_size": 28, "patch_size": 14,
            "projection_dim": 64,
        },
        "image_token_index": 250,
        "vocab_size": 256,
    }
    (tmp_path / "config.json").write_text(json.dumps(hf_config))

    import jax.numpy as jnp

    from llama32mm_tpu.models.vlm import vlm_forward

    config = build_config_from_hf(hf_config, pad_token_id=None, dtype="float32")
    params = load_checkpoint_params(str(tmp_path), config, verbose=False)

    g = torch.Generator().manual_seed(11)
    ids = torch.randint(0, 240, (1, 10), generator=g)
    ids[:, :3] = 250
    px = torch.randn(1, 3, 28, 28, generator=g)
    mask = torch.ones(1, 10, dtype=torch.long)
    with torch.no_grad():
        ref_out = ref_m(input_ids=ids, pixel_values=px, attention_mask=mask)

    out = vlm_forward(
        params,
        config,
        input_ids=jnp.asarray(ids.numpy()),
        pixel_values=jnp.asarray(px.numpy()),
        attention_mask=jnp.asarray(mask.numpy()),
        impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(out.logits), ref_out["logits"].numpy(), atol=2e-4, rtol=2e-4
    )


def test_save_load_roundtrip(tmp_path):
    """save_checkpoint_params → load_checkpoint_params reproduces the tree."""
    import jax
    import jax.numpy as jnp

    from llama32mm_tpu import init_vlm_params, tiny_mllama_config
    from llama32mm_tpu.io.checkpoint import save_checkpoint_params

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(7), cfg, tie_weights=False)
    save_checkpoint_params(str(tmp_path), params, cfg)

    loaded = load_checkpoint_params(str(tmp_path), cfg, verbose=False)

    def check(a, b, path=""):
        for k in a:
            if isinstance(a[k], dict):
                check(a[k], b[k], path + "/" + k)
            elif a[k] is None:
                assert b[k] is None or b[k] is not None  # tied head re-inits
            else:
                np.testing.assert_allclose(
                    np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                    atol=1e-6, err_msg=path + "/" + k,
                )

    # lm_head exists in both (untied); compare whole tree
    check(params, loaded)


def test_tied_head_roundtrip_forward(tmp_path):
    """A TIED tree (lm_head weight None — the normal 1B/3B HF layout omits
    lm_head) round-trips to the canonical None representation, and the loaded
    tree's forward matches the original (regression: the loader used to
    back-fill the raw [vocab, hidden] embedding, transposed vs the local
    [hidden, vocab] head layout, which broke lm_head_apply)."""
    import jax
    import jax.numpy as jnp

    from llama32mm_tpu import init_vlm_params, tiny_mllama_config, vlm_forward
    from llama32mm_tpu.io.checkpoint import save_checkpoint_params

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(9), cfg)  # tied: lm_head None
    assert params["language_model"]["lm_head"]["weight"] is None
    save_checkpoint_params(str(tmp_path), params, cfg)
    loaded = load_checkpoint_params(str(tmp_path), cfg, verbose=False)
    assert loaded["language_model"]["lm_head"]["weight"] is None

    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, cfg.vocab_size - 10)
    a = vlm_forward(params, cfg, input_ids=ids)
    b = vlm_forward(loaded, cfg, input_ids=ids)
    np.testing.assert_allclose(
        np.asarray(a.logits, np.float32), np.asarray(b.logits, np.float32), atol=1e-6
    )


def test_streaming_load_matches_host_load(tmp_path):
    """streaming=True (per-tensor device placement, donated row writes) loads
    bit-identical params to the host-staged path."""
    import jax

    from llama32mm_tpu import init_vlm_params, tiny_mllama_config
    from llama32mm_tpu.io.checkpoint import save_checkpoint_params

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(3), cfg, tie_weights=False)
    save_checkpoint_params(str(tmp_path), params, cfg)

    host = load_checkpoint_params(str(tmp_path), cfg, verbose=False)
    streamed = load_checkpoint_params(str(tmp_path), cfg, verbose=False, streaming=True)

    h_leaves = {".".join(map(str, p)): l for p, l in _flat(host)}
    s_leaves = {".".join(map(str, p)): l for p, l in _flat(streamed)}
    assert h_leaves.keys() == s_leaves.keys()
    for k in h_leaves:
        np.testing.assert_array_equal(
            np.asarray(h_leaves[k], np.float32), np.asarray(s_leaves[k], np.float32),
            err_msg=k,
        )


def test_streaming_load_sharded(tmp_path):
    """streaming=True under a dict sharding tree places each target directly
    in its GSPMD layout (8 virtual CPU devices)."""
    import jax
    from jax.sharding import NamedSharding

    from llama32mm_tpu import init_vlm_params, tiny_mllama_config
    from llama32mm_tpu.io.checkpoint import save_checkpoint_params
    from llama32mm_tpu.parallel.mesh import create_mesh
    from llama32mm_tpu.parallel.sharding import param_shardings

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(3), cfg, tie_weights=False)
    save_checkpoint_params(str(tmp_path), params, cfg)

    mesh = create_mesh(dp=1, tp=2)
    shard_tree = param_shardings(cfg, mesh, params_like=params)
    streamed = load_checkpoint_params(
        str(tmp_path), cfg, shardings=shard_tree, verbose=False, streaming=True
    )

    w = streamed["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"]
    assert isinstance(w.sharding, NamedSharding)
    assert w.sharding.spec == shard_tree["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"].spec

    host = load_checkpoint_params(str(tmp_path), cfg, verbose=False)
    np.testing.assert_array_equal(
        np.asarray(w, np.float32),
        np.asarray(host["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"], np.float32),
    )


def test_streaming_quantized_load_sharded(tmp_path):
    """streaming int8 quantization under a sharding tree: the q buffers take
    the float weight's GSPMD placement and scales keep the (layer, out)
    axes — not silently unsharded on one device (the 90B path)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from llama32mm_tpu import init_vlm_params, tiny_mllama_config
    from llama32mm_tpu.io.checkpoint import save_checkpoint_params
    from llama32mm_tpu.ops.quant import dequantize_weight
    from llama32mm_tpu.parallel.mesh import create_mesh
    from llama32mm_tpu.parallel.sharding import param_shardings

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(3), cfg, tie_weights=False)
    save_checkpoint_params(str(tmp_path), params, cfg)

    mesh = create_mesh(dp=1, tp=2)
    shard_tree = param_shardings(cfg, mesh, params_like=params)
    streamed = load_checkpoint_params(
        str(tmp_path), cfg, shardings=shard_tree, verbose=False,
        streaming=True, quantize_int8=True,
    )
    leaf = streamed["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"]
    want_sh = shard_tree["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"]
    assert isinstance(leaf["q"].sharding, NamedSharding)
    assert leaf["q"].sharding.spec == want_sh.spec
    # scale [L, out] keeps the layer axis + the weight's out axis
    assert tuple(leaf["scale"].sharding.spec) == (want_sh.spec[0], want_sh.spec[-1])
    # values match the unsharded quantized load
    plain = load_checkpoint_params(
        str(tmp_path), cfg, verbose=False, streaming=True, quantize_int8=True
    )
    np.testing.assert_allclose(
        np.asarray(dequantize_weight(leaf, jnp.float32)),
        np.asarray(dequantize_weight(
            plain["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"],
            jnp.float32,
        )),
        atol=1e-6,
    )


def _flat(tree, path=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flat(v, path + (k,))
        elif v is not None:
            yield path + (k,), v


def test_save_rejects_quantized_and_fused_trees(tmp_path):
    """ADVICE r1 (medium): saving a serving-transformed tree must raise, not
    silently drop every decoder linear."""
    import jax
    import pytest as _pytest

    from llama32mm_tpu import init_vlm_params, tiny_mllama_config
    from llama32mm_tpu.io.checkpoint import save_checkpoint_params
    from llama32mm_tpu.models.fuse import fuse_decoder_params
    from llama32mm_tpu.ops.quant import quantize_llama_params

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, tie_weights=False)

    qparams = quantize_llama_params(params)
    with _pytest.raises(ValueError, match="quantized"):
        save_checkpoint_params(str(tmp_path / "q"), qparams, cfg)

    fused = fuse_decoder_params(params, cfg.text_config, tp=1)
    with _pytest.raises(ValueError, match="fused"):
        save_checkpoint_params(str(tmp_path / "f"), fused, cfg)


def test_sharded_save_writes_index_and_roundtrips(tmp_path):
    """max_shard_bytes below the model size → HF-style shard files + index
    json; the loader (globbing *.safetensors) reproduces the tree."""
    import json
    import os

    import jax

    from llama32mm_tpu import init_vlm_params, tiny_mllama_config
    from llama32mm_tpu.io.checkpoint import save_checkpoint_params

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(7), cfg, tie_weights=False)
    save_checkpoint_params(str(tmp_path), params, cfg, max_shard_bytes=256 * 1024)

    files = sorted(os.listdir(tmp_path))
    shard_files = [f for f in files if f.endswith(".safetensors")]
    assert len(shard_files) > 1, files
    assert "model.safetensors" not in files
    assert "model.safetensors.index.json" in files
    with open(tmp_path / "model.safetensors.index.json") as f:
        index = json.load(f)
    assert set(index["weight_map"].values()) == set(shard_files)
    assert index["metadata"]["total_size"] > 0

    loaded = load_checkpoint_params(str(tmp_path), cfg, verbose=False)

    def check(a, b, path=""):
        for k in a:
            if isinstance(a[k], dict):
                check(a[k], b[k], path + "/" + k)
            elif a[k] is not None:
                np.testing.assert_allclose(
                    np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                    atol=1e-6, err_msg=path + "/" + k,
                )

    check(params, loaded)


def test_streaming_quantized_load_matches_post_quantize(tmp_path):
    """streaming + quantize_int8 loads decoder linears directly as int8+scale
    identical to loading float then quantize_llama_params (the 11B-on-16GB
    serving path — no bf16 stack ever exists on device)."""
    import jax

    from llama32mm_tpu import init_vlm_params, tiny_mllama_config
    from llama32mm_tpu.io.checkpoint import save_checkpoint_params
    from llama32mm_tpu.ops.quant import is_quantized, quantize_llama_params

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(3), cfg, tie_weights=False)
    save_checkpoint_params(str(tmp_path), params, cfg)

    want = quantize_llama_params(
        load_checkpoint_params(str(tmp_path), cfg, verbose=False)
    )
    got = load_checkpoint_params(
        str(tmp_path), cfg, verbose=False, streaming=True, quantize_int8=True
    )

    blocks_w = want["language_model"]["model"]["blocks"]
    blocks_g = got["language_model"]["model"]["blocks"]
    for path in (
        ("att", "W_query", "weight"), ("att", "out_proj", "weight"),
        ("ff", "swiglu", "w_gate"), ("ff", "w_down", "weight"),
    ):
        w, g = blocks_w, blocks_g
        for k in path:
            w, g = w[k], g[k]
        assert is_quantized(g), path
        np.testing.assert_array_equal(np.asarray(w["q"]), np.asarray(g["q"]))
        np.testing.assert_allclose(np.asarray(w["scale"]), np.asarray(g["scale"]),
                                   rtol=1e-6)
    head = got["language_model"]["lm_head"]["weight"]
    assert is_quantized(head)
    # embeddings / vision / norms stay float
    assert not is_quantized(got["language_model"]["model"]["tok_emb"]["weight"])
    assert not is_quantized(blocks_g["norm1"]["weight"])

    # and the quantized tree actually serves
    from llama32mm_tpu.inference.engine import InferenceEngine

    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 10), 0, cfg.vocab_size - 10)
    ids = ids.at[:, :4].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 28, 28))
    res_w = InferenceEngine(want, cfg, max_cache_length=32, kv_dtype="int8").generate(
        ids, px, max_new_tokens=4, eos_token_id=-1)
    res_g = InferenceEngine(got, cfg, max_cache_length=32, kv_dtype="int8").generate(
        ids, px, max_new_tokens=4, eos_token_id=-1)
    np.testing.assert_array_equal(np.asarray(res_w.tokens), np.asarray(res_g.tokens))


@pytest.mark.slow
def test_streaming_int4_load_matches_post_quantize(tmp_path):
    """streaming + quantize_int4 = the only route from a checkpoint to the
    packed-int4 serving form at scales where the bf16 stack cannot exist;
    must be bit-identical to float-load-then-quantize(bits=4)."""
    import jax

    from llama32mm_tpu import init_vlm_params, tiny_mllama_config
    from llama32mm_tpu.io.checkpoint import save_checkpoint_params
    from llama32mm_tpu.ops.quant import is_quantized, quantize_llama_params

    cfg = tiny_mllama_config()
    params = init_vlm_params(jax.random.PRNGKey(3), cfg, tie_weights=False)
    save_checkpoint_params(str(tmp_path), params, cfg)

    want = quantize_llama_params(
        load_checkpoint_params(str(tmp_path), cfg, verbose=False),
        bits=4, group_size=32,
    )
    got = load_checkpoint_params(
        str(tmp_path), cfg, verbose=False, streaming=True,
        quantize_int4=True, int4_group_size=32,
    )

    blocks_w = want["language_model"]["model"]["blocks"]
    blocks_g = got["language_model"]["model"]["blocks"]
    for path in (
        ("att", "W_query", "weight"), ("ff", "w_down", "weight"),
    ):
        w, g = blocks_w, blocks_g
        for k in path:
            w, g = w[k], g[k]
        assert is_quantized(g) and "q4" in g, path
        np.testing.assert_array_equal(np.asarray(w["q4"]), np.asarray(g["q4"]))
        np.testing.assert_allclose(np.asarray(w["scale"]), np.asarray(g["scale"]),
                                   rtol=1e-6)
    head = got["language_model"]["lm_head"]["weight"]
    assert is_quantized(head) and "q4" in head
    assert not is_quantized(got["language_model"]["model"]["tok_emb"]["weight"])

    # serves through the engine identically to the post-quantized tree
    from llama32mm_tpu.inference.engine import InferenceEngine

    ids = jax.random.randint(jax.random.PRNGKey(4), (1, 10), 0, cfg.vocab_size - 10)
    ids = ids.at[:, :4].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 28, 28))
    res_w = InferenceEngine(want, cfg, max_cache_length=32, kv_dtype="int8").generate(
        ids, px, max_new_tokens=4, eos_token_id=-1)
    res_g = InferenceEngine(got, cfg, max_cache_length=32, kv_dtype="int8").generate(
        ids, px, max_new_tokens=4, eos_token_id=-1)
    np.testing.assert_array_equal(np.asarray(res_w.tokens), np.asarray(res_g.tokens))


def test_quantize_int8_requires_streaming(tmp_path):
    import pytest as _pytest

    from llama32mm_tpu import tiny_mllama_config

    with _pytest.raises(ValueError, match="streaming"):
        load_checkpoint_params(str(tmp_path), tiny_mllama_config(), quantize_int8=True)
