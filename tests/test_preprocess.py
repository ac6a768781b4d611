"""Preprocessing pipeline + processor tests."""

import numpy as np
import pytest

from llama32mm_tpu.preprocess.image import (
    IMAGENET_STANDARD_MEAN,
    IMAGENET_STANDARD_STD,
    normalize,
    preprocess_image_device,
    process_images,
    rescale,
)
from llama32mm_tpu.preprocess.processor import MllamaImageProcessor, add_image_tokens_to_prompts


class FakeTokenizer:
    """Minimal tokenizer double implementing the interface the processor uses."""

    bos_token = "<bos>"
    eos_token_id = 2

    def __init__(self):
        self.vocab = {"<bos>": 1}
        self.added = []
        self.add_bos_token = True
        self.add_eos_token = True

    def add_special_tokens(self, d):
        for t in d.get("additional_special_tokens", []):
            self.vocab.setdefault(t, 100 + len(self.added))
            self.added.append(t)

    def add_tokens(self, toks):
        for t in toks:
            self.vocab.setdefault(t, 1000 + len(self.vocab))
            self.added.append(t)

    def convert_tokens_to_ids(self, t):
        return self.vocab.get(t, 0)

    def __call__(self, strings, return_tensors, padding, truncation):
        # crude whitespace-free tokenization: <image> runs → ids, rest → bytes
        ids_batch = []
        for s in strings:
            ids = []
            i = 0
            while i < len(s):
                if s.startswith("<image>", i):
                    ids.append(self.vocab["<image>"])
                    i += len("<image>")
                elif s.startswith("<bos>", i):
                    ids.append(self.vocab["<bos>"])
                    i += 5
                else:
                    ids.append(ord(s[i]) % 90 + 3)
                    i += 1
            ids_batch.append(ids)
        maxlen = max(len(x) for x in ids_batch)
        arr = np.zeros((len(ids_batch), maxlen), np.int64)
        mask = np.zeros_like(arr)
        for j, ids in enumerate(ids_batch):
            arr[j, : len(ids)] = ids
            mask[j, : len(ids)] = 1
        return {"input_ids": arr, "attention_mask": mask}


def _fake_image(h=40, w=30):
    from PIL import Image

    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))


def test_prompt_template():
    s = add_image_tokens_to_prompts("hi", "<bos>", 3, "<image>")
    assert s == "<image><image><image><bos>hi\n"


def test_process_images_pipeline():
    im = _fake_image()
    out = process_images(
        [im],
        size=(16, 16),
        resample=None,
        rescale_factor=1 / 255.0,
        image_mean=IMAGENET_STANDARD_MEAN,
        image_std=IMAGENET_STANDARD_STD,
    )
    assert len(out) == 1 and out[0].shape == (3, 16, 16)
    assert out[0].dtype == np.float32
    # normalization applied: roughly zero-centered
    assert abs(out[0].mean()) < 3.0


def test_rescale_normalize_math():
    img = np.full((2, 2, 3), 255, np.uint8)
    r = rescale(img, 1 / 255.0)
    assert np.allclose(r, 1.0)
    n = normalize(r, IMAGENET_STANDARD_MEAN, IMAGENET_STANDARD_STD)
    expected = (1.0 - np.array(IMAGENET_STANDARD_MEAN)) / np.array(IMAGENET_STANDARD_STD)
    assert np.allclose(n[0, 0], expected, atol=1e-6)


def test_processor_call_contract():
    tok = FakeTokenizer()
    proc = MllamaImageProcessor(tok, num_image_token=4, image_size=16)
    assert not tok.add_bos_token and not tok.add_eos_token
    assert "<image>" in tok.vocab
    assert "<seg000>" in tok.vocab and "<seg127>" in tok.vocab
    assert "<loc0000>" not in tok.vocab  # loc list overwritten in reference (§2.9 #14)

    out = proc(["describe"], [_fake_image()], padding=True)
    assert out["pixel_values"].shape == (1, 3, 16, 16)
    assert "pixel_value" in out  # reference-compat alias
    ids = out["input_ids"][0]
    img_id = tok.vocab["<image>"]
    assert list(ids[:4]) == [img_id] * 4  # image tokens before BOS
    assert ids[4] == tok.vocab["<bos>"]


def test_processor_asserts_single_image():
    tok = FakeTokenizer()
    proc = MllamaImageProcessor(tok, 4, 16)
    with pytest.raises(AssertionError):
        proc(["a", "b"], [_fake_image()], padding=True)


def test_device_preprocess_matches_host_when_no_resize():
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    raw = rng.integers(0, 255, (2, 16, 16, 3), dtype=np.uint8)
    dev = np.asarray(preprocess_image_device(jnp.asarray(raw), 16))
    host = (raw.astype(np.float32) / 255.0 - np.array(IMAGENET_STANDARD_MEAN, np.float32)) / np.array(
        IMAGENET_STANDARD_STD, np.float32
    )
    host = host.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(dev, host, atol=1e-6)
