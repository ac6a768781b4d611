"""Real-tokenizer end-to-end (VERDICT r2 #8 / Missing #4).

Every other test drives the processor through ``FakeTokenizer``; these run
the ACTUAL ``AutoTokenizer`` path (reference ``Model/utils.py:153``) against
the vendored tiny trained BPE (``tests/assets/tiny_tokenizer/``, built by
``scripts/make_tiny_tokenizer.py``): checkpoint-dir load → MllamaImageProcessor
(special-token registration on a real tokenizer) → generate → decode, plus
the HTTP ``{prompt}`` text surface's BOS handling.
"""

import os
import shutil

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from llama32mm_tpu.configs import LLAMA32Config, MLLAMAConfig, VisionEncoderConfig
from llama32mm_tpu.models.vlm import init_vlm_params

pytestmark = pytest.mark.slow

ASSET = os.path.join(os.path.dirname(__file__), "assets", "tiny_tokenizer")


def tiny_cfg(vocab=1280, image_token_index=1024):
    return MLLAMAConfig(
        vision_config=VisionEncoderConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
        text_config=LLAMA32Config(
            vocab_size=vocab, hidden_size=64, n_heads=4, n_layers=2,
            hidden_dim=96, n_kv_groups=2, dtype="float32", max_cache_length=96,
        ),
        projection_dim=64,
        hidden_size=64,
        image_token_index=image_token_index,
        vocab_size=vocab,
    )


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    """A full HF-style checkpoint dir: safetensors + config.json + the REAL
    trained tokenizer files."""
    from llama32mm_tpu.io.checkpoint import save_checkpoint_params

    tmp = tmp_path_factory.mktemp("ckpt")
    cfg = tiny_cfg()
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, tie_weights=False)
    save_checkpoint_params(str(tmp), params, cfg)
    for f in os.listdir(ASSET):
        shutil.copy(os.path.join(ASSET, f), tmp / f)
    return tmp


def test_asset_is_a_real_trained_tokenizer():
    from transformers import AutoTokenizer, PreTrainedTokenizerFast

    tok = AutoTokenizer.from_pretrained(ASSET)
    assert isinstance(tok, PreTrainedTokenizerFast)
    assert tok.vocab_size == 1024
    ids = tok("decode tokens per second", add_special_tokens=False)["input_ids"]
    # trained (not byte-fallback): common corpus words merge into few tokens
    assert 1 <= len(ids) <= 10
    assert tok.decode(ids) == "decode tokens per second"
    assert tok.bos_token_id is not None and tok.pad_token_id is not None


def test_load_hf_model_real_autotokenizer(checkpoint_dir):
    from llama32mm_tpu.io.checkpoint import load_hf_model

    model, tokenizer = load_hf_model(str(checkpoint_dir), dtype="float32")
    assert tokenizer.vocab_size == 1024
    assert model.config.text_config.vocab_size == 1280
    ids = tokenizer("serving decode", return_tensors="np")["input_ids"]
    assert ids.ndim == 2


def test_processor_generate_decode_end_to_end(checkpoint_dir):
    """load → preprocess (real tokenization + template) → generate → decode."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from llama32mm_tpu.inference.engine import InferenceEngine
    from llama32mm_tpu.io.checkpoint import load_hf_model
    from llama32mm_tpu.preprocess.processor import MllamaImageProcessor

    model, tokenizer = load_hf_model(str(checkpoint_dir), dtype="float32")
    cfg = model.config
    proc = MllamaImageProcessor(
        tokenizer,
        num_image_token=cfg.text_config.num_image_tokens,
        image_size=cfg.vision_config.image_size,
    )
    # the real tokenizer assigns <image> the first added id == base vocab
    assert proc.image_token_id == 1024 == cfg.image_token_index

    img = Image.fromarray(
        (np.linspace(0, 255, 28 * 28 * 3).reshape(28, 28, 3)).astype(np.uint8)
    )
    out = proc(text=["what is in this image?"], images=[img], padding="longest")
    input_ids = np.asarray(out["input_ids"])
    px = np.asarray(out["pixel_values"], dtype=np.float32)
    # template: image placeholders BEFORE bos (reference quirk, SURVEY §2.9)
    n_img = cfg.text_config.num_image_tokens
    assert (input_ids[0, :n_img] == proc.image_token_id).all()
    assert input_ids[0, n_img] == tokenizer.bos_token_id

    eng = InferenceEngine(model.params, cfg, max_cache_length=96)
    res = eng.generate(
        jnp.asarray(input_ids), jnp.asarray(px),
        attention_mask=jnp.asarray(np.asarray(out["attention_mask"])),
        max_new_tokens=6, temperature=0.0, eos_token_id=tokenizer.eos_token_id,
    )
    text = eng.decode_tokens(tokenizer, res)
    assert isinstance(text, str)
    # deterministic across runs
    res2 = eng.generate(
        jnp.asarray(input_ids), jnp.asarray(px),
        attention_mask=jnp.asarray(np.asarray(out["attention_mask"])),
        max_new_tokens=6, temperature=0.0, eos_token_id=tokenizer.eos_token_id,
    )
    assert eng.decode_tokens(tokenizer, res2) == text


def test_http_text_surface_real_tokenizer(checkpoint_dir):
    """The ServingFrontend {prompt} path: real tokenization + BOS handling
    (the advisor's double-BOS finding: encode_request itself must suppress
    the tokenizer's auto-BOS)."""
    from transformers import AutoTokenizer

    from llama32mm_tpu.inference.http_server import ServingFrontend
    from llama32mm_tpu.inference.server import ContinuousBatchingServer
    from llama32mm_tpu.io.checkpoint import load_hf_model

    model, tokenizer = load_hf_model(str(checkpoint_dir), dtype="float32")
    srv = ContinuousBatchingServer(
        model.params, model.config, slots=2, max_cache_length=96,
        prompt_buckets=(32,), steps_per_sync=4, eos_token_id=tokenizer.eos_token_id,
    )
    fe = ServingFrontend(srv, tokenizer=tokenizer)
    try:
        ids, px = fe.encode_request({"prompt": "decode tokens per second"})
        assert px is None
        ids_l = [int(t) for t in ids]
        assert ids_l[0] == tokenizer.bos_token_id
        assert ids_l.count(tokenizer.bos_token_id) == 1  # no double-BOS
        rid = fe.submit(ids, None, max_new_tokens=5)
        assert fe.wait(rid, timeout=120)
        out, done = fe.tokens_so_far(rid)
        assert done and len(out) >= 1
        # decoded text through the real tokenizer
        text = tokenizer.decode([int(t) for t in out])
        assert isinstance(text, str)
    finally:
        fe.shutdown()
