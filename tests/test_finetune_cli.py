"""Fine-tune CLI (train/finetune.py) end-to-end over the packed-text path:
real checkpoint-dir load, packed corpus, gradient accumulation, rotating
run-dir checkpoints, and exact resume — interrupted-and-resumed training
lands on the same adapters as an uninterrupted run."""

import os
import shutil

import jax
import numpy as np
import pytest

from llama32mm_tpu.configs import LLAMA32Config, MLLAMAConfig, VisionEncoderConfig
from llama32mm_tpu.models.vlm import init_vlm_params
from llama32mm_tpu.train.finetune import main

pytestmark = pytest.mark.slow

ASSET = os.path.join(os.path.dirname(__file__), "assets", "tiny_tokenizer")


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    from llama32mm_tpu.io.checkpoint import save_checkpoint_params

    cfg = MLLAMAConfig(
        vision_config=VisionEncoderConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
        text_config=LLAMA32Config(
            vocab_size=1280, hidden_size=64, n_heads=4, n_layers=2,
            hidden_dim=96, n_kv_groups=2, dtype="float32", max_cache_length=96,
        ),
        projection_dim=64, hidden_size=64,
        image_token_index=1024, vocab_size=1280,
    )
    tmp = tmp_path_factory.mktemp("cli_ckpt")
    params = init_vlm_params(jax.random.PRNGKey(0), cfg, tie_weights=False)
    save_checkpoint_params(str(tmp), params, cfg)
    for f in os.listdir(ASSET):
        shutil.copy(os.path.join(ASSET, f), tmp / f)
    return tmp


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    p = tmp_path_factory.mktemp("corpus") / "docs.txt"
    rng = np.random.default_rng(0)
    lines = [
        " ".join(rng.choice(["the", "cat", "sat", "on", "a", "mat", "dog ran"],
                            size=int(rng.integers(8, 30))))
        for _ in range(24)
    ]
    p.write_text("\n".join(lines), encoding="utf-8")
    return p


def _adapters(path):
    from safetensors.numpy import load_file

    return load_file(path)


def _run(ckpt, corpus, save, run_dir=None, steps=6, seq=32):
    argv = [
        "--hf-weights", str(ckpt), "--text-data", str(corpus),
        "--batch-size", "2", "--accum-steps", "2", "--max-seq-len", str(seq),
        "--rank", "2", "--lr", "1e-2", "--steps", str(steps),
        "--save", str(save), "--save-every", "2", "--log-every", "100",
    ]
    if run_dir is not None:
        argv += ["--run-dir", str(run_dir)]
    main(argv)


def test_packed_cli_resume_matches_uninterrupted(checkpoint_dir, corpus, tmp_path, capsys):
    # uninterrupted 6-step run
    _run(checkpoint_dir, corpus, tmp_path / "a.safetensors", steps=6)
    # interrupted: 3 steps with a run dir, then rerun to 6 (auto-resume)
    _run(checkpoint_dir, corpus, tmp_path / "b3.safetensors",
         run_dir=tmp_path / "run", steps=3)
    _run(checkpoint_dir, corpus, tmp_path / "b6.safetensors",
         run_dir=tmp_path / "run", steps=6)
    out = capsys.readouterr().out
    assert "Resumed" in out and "at step" in out

    a = _adapters(tmp_path / "a.safetensors")
    b = _adapters(tmp_path / "b6.safetensors")
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-7, err_msg=k)
    # and the interrupted half really was partial
    b3 = _adapters(tmp_path / "b3.safetensors")
    assert any(not np.allclose(a[k], b3[k]) for k in a)


def test_packed_cli_rotates_checkpoints(checkpoint_dir, corpus, tmp_path):
    from llama32mm_tpu.io import TrainCheckpointManager

    _run(checkpoint_dir, corpus, tmp_path / "c.safetensors",
         run_dir=tmp_path / "run2", steps=8)
    mgr = TrainCheckpointManager(str(tmp_path / "run2"), max_to_keep=3)
    assert mgr.latest_step() == 8
    assert len(mgr.all_steps()) <= 3
    mgr.close()
