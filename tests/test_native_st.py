"""Native zero-copy safetensors reader tests (builds libstreader.so with g++
on demand; skips if no toolchain)."""

import numpy as np
import pytest

from llama32mm_tpu.io.native_st import (
    NativeSafetensors,
    bf16_bits_to_float32,
    ensure_built,
    iter_tensors,
    native_available,
)

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not ensure_built(), reason="g++ unavailable")]


@pytest.fixture()
def shard(tmp_path):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.normal(size=(17, 33)).astype(np.float32),
        "b.bias": rng.normal(size=(64,)).astype(np.float32),
        "c.emb": rng.integers(-5, 5, (4, 8, 2)).astype(np.int32),
        "d.half": rng.normal(size=(5, 5)).astype(np.float16),
    }
    path = str(tmp_path / "model.safetensors")
    save_file(tensors, path, metadata={"format": "pt"})
    return path, tensors


def test_native_reader_roundtrip(shard):
    path, tensors = shard
    with NativeSafetensors(path) as f:
        assert set(f.keys()) == set(tensors.keys())
        for name, want in tensors.items():
            got, st_dtype = f.get_tensor(name)
            np.testing.assert_array_equal(np.array(got), want)
            del got  # views must be released before the reader closes


def test_native_reader_missing_key(shard):
    path, _ = shard
    with NativeSafetensors(path) as f:
        with pytest.raises(KeyError):
            f.get_tensor("nope")


def test_native_reader_bad_file(tmp_path):
    p = tmp_path / "junk.safetensors"
    p.write_bytes(b"\xff" * 100)
    with pytest.raises((OSError, ValueError)):
        NativeSafetensors(str(p))


def test_iter_tensors_matches_python(shard):
    path, tensors = shard
    assert native_available()
    got = dict(iter_tensors(path))
    assert set(got) == set(tensors)
    np.testing.assert_array_equal(got["a.weight"], tensors["a.weight"])
    # f16 promoted to f32 by iter_tensors
    np.testing.assert_allclose(got["d.half"], tensors["d.half"].astype(np.float32))


def test_bf16_bits_conversion():
    vals = np.array([1.0, -2.5, 0.15625, 3.0e38], np.float32)
    bits = (vals.view(np.uint32) >> 16).astype(np.uint16)  # truncate to bf16
    back = bf16_bits_to_float32(bits)
    np.testing.assert_allclose(back, vals, rtol=1e-2)


def test_checkpoint_loader_uses_native(tmp_path):
    """End-to-end: loader path with the native reader active."""
    from safetensors.numpy import save_file

    from llama32mm_tpu.io.checkpoint import build_config_from_hf, load_checkpoint_params

    rng = np.random.default_rng(1)
    h, heads, kv, inter, vocab = 32, 4, 2, 64, 128
    hd = h // heads
    tensors = {}
    for i in range(2):
        p = f"language_model.model.layers.{i}."
        tensors[p + "self_attn.q_proj.weight"] = rng.normal(size=(heads * hd, h)).astype(np.float32)
        tensors[p + "self_attn.k_proj.weight"] = rng.normal(size=(kv * hd, h)).astype(np.float32)
        tensors[p + "self_attn.v_proj.weight"] = rng.normal(size=(kv * hd, h)).astype(np.float32)
        tensors[p + "self_attn.o_proj.weight"] = rng.normal(size=(h, heads * hd)).astype(np.float32)
        tensors[p + "input_layernorm.weight"] = np.ones(h, np.float32)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        tensors[p + "mlp.gate_proj.weight"] = rng.normal(size=(inter, h)).astype(np.float32)
        tensors[p + "mlp.up_proj.weight"] = rng.normal(size=(inter, h)).astype(np.float32)
        tensors[p + "mlp.down_proj.weight"] = rng.normal(size=(h, inter)).astype(np.float32)
    tensors["language_model.model.embed_tokens.weight"] = rng.normal(size=(vocab, h)).astype(np.float32)
    tensors["language_model.model.norm.weight"] = np.ones(h, np.float32)
    save_file(tensors, str(tmp_path / "model.safetensors"))

    cfg = build_config_from_hf(
        {
            "text_config": {
                "vocab_size": vocab, "hidden_size": h, "num_attention_heads": heads,
                "num_hidden_layers": 2, "intermediate_size": inter,
                "num_key_value_heads": kv,
            },
            "vision_config": {
                "hidden_size": 16, "intermediate_size": 32, "num_hidden_layers": 1,
                "num_attention_heads": 2, "image_size": 28, "patch_size": 14,
            },
            "image_token_index": vocab,
        },
        pad_token_id=None,
        dtype="float32",
    )
    params = load_checkpoint_params(str(tmp_path), cfg, verbose=False)
    wq = params["language_model"]["model"]["blocks"]["att"]["W_query"]["weight"]
    np.testing.assert_allclose(
        np.asarray(wq[0]),
        tensors["language_model.model.layers.0.self_attn.q_proj.weight"].T,
        atol=1e-6,
    )


def test_retained_view_fails_loudly(shard):
    """copy=False contract guard (VERDICT r1 #10): a view retained past the
    generator's lifetime raises RuntimeError at reader close instead of
    silently reading unmapped pages."""
    path, tensors = shard
    if not native_available():
        pytest.skip("native reader unavailable")
    leaked = []
    with pytest.raises(RuntimeError, match="outlived"):
        for name, arr in iter_tensors(path, copy=False):
            if name == "a.weight":
                leaked.append(arr)  # F32 → raw view; retaining it is misuse
    assert leaked  # the guard fired because of this reference


def test_last_tensor_is_safe_to_retain(shard):
    """The final yield is a copy, so a normal `for name, t in iter_tensors`
    loop (whose loop variable survives the loop) never trips the guard."""
    path, tensors = shard
    if not native_available():
        pytest.skip("native reader unavailable")
    name, arr = None, None
    for name, arr in iter_tensors(path, copy=False):
        pass
    assert name is not None
    _ = float(np.sum(arr))  # readable after the reader closed


def test_direct_reader_close_guard(shard):
    path, _ = shard
    if not native_available():
        pytest.skip("native reader unavailable")
    r = NativeSafetensors(path)
    view, _dt = r.get_tensor("a.weight")
    with pytest.raises(RuntimeError, match="outlived"):
        r.close()
    del view
    r.close()  # now clean
