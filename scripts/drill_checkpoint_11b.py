"""11B checkpoint load drill (VERDICT r1 #6).

Three phases, one per invocation:

  python scripts/drill_checkpoint_11b.py write   # host: random 11B-shape checkpoint → shards + index
  python scripts/drill_checkpoint_11b.py load    # TPU: load_hf_model(streaming=True, quantize_int8=True) + serve
  python scripts/drill_checkpoint_11b.py plan90b # CPU virtual mesh: 90B GSPMD placement budget

Measurements (wall time, peak host RSS, HBM in use, load GB/s) are printed and
recorded in docs/checkpoints.md. The reference's whole purpose is
``load_hf_model(path) → captioning`` (/root/reference/Model/utils.py:149-166);
this drill proves that path at the north-star scale: 11B bf16 (21.3 GB) does
not fit a 16 GB v5e, so the streaming loader quantizes each decoder linear to
int8 on device as its rows arrive — no bf16 stack ever exists.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CKPT_DIR = os.environ.get("DRILL_CKPT_DIR", "/root/ckpt_11b")
RECORD = os.path.join(os.path.dirname(__file__), "..", "docs", "DRILL_11B.jsonl")


def record(obj):
    """Print the phase result and append it to the committed artifact."""
    line = json.dumps(obj)
    print(line, flush=True)
    with open(RECORD, "a") as f:
        f.write(line + "\n")


def write_checkpoint():
    import jax
    import ml_dtypes
    import numpy as np

    from llama32mm_tpu.configs import llama32_11b_vision_config
    from llama32mm_tpu.io.checkpoint import save_checkpoint_params
    from llama32mm_tpu.models.vlm import init_vlm_params

    cfg = llama32_11b_vision_config()
    shapes = jax.eval_shape(
        lambda k: init_vlm_params(k, cfg, tie_weights=False), jax.random.PRNGKey(0)
    )
    rng = np.random.default_rng(0)
    # Every tensor is a VIEW into one shared random block (the drill measures
    # the save/load IO path, not the values; per-element RNG over 10.7B params
    # and 21 GB of host copies would dominate the wall time on this host).
    max_elems = max(
        int(np.prod(l.shape)) for l in jax.tree.leaves(shapes) if l is not None
    )
    block = ((rng.random(max_elems, np.float32) * 0.02) - 0.01).astype(ml_dtypes.bfloat16)

    def fill(leaf):
        if leaf is None:
            return None
        n = int(np.prod(leaf.shape))
        return block[:n].reshape(leaf.shape)

    t0 = time.time()
    tree = jax.tree.map(fill, shapes)
    t_gen = time.time() - t0
    t0 = time.time()
    save_checkpoint_params(CKPT_DIR, tree, cfg)
    t_save = time.time() - t0
    nbytes = sum(
        os.path.getsize(os.path.join(CKPT_DIR, f))
        for f in os.listdir(CKPT_DIR)
        if f.endswith(".safetensors")
    )
    files = sorted(f for f in os.listdir(CKPT_DIR) if f.endswith(".safetensors"))
    record({
        "phase": "write",
        "gen_s": round(t_gen, 1),
        "save_s": round(t_save, 1),
        "total_gb": round(nbytes / 1e9, 2),
        "shards": files,
        "index": os.path.exists(os.path.join(CKPT_DIR, "model.safetensors.index.json")),
        "peak_rss_gb": round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
    })
    # minimal tokenizer so load_hf_model's AutoTokenizer step works offline
    _write_minimal_tokenizer(CKPT_DIR)


def _write_minimal_tokenizer(path):
    """A tiny self-contained fast tokenizer (WordLevel over bytes) — enough
    for AutoTokenizer.from_pretrained on an air-gapped machine."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace

    vocab = {"<|pad|>": 0, "<|begin_of_text|>": 1, "<|end_of_text|>": 2}
    for i in range(256):
        vocab[f"tok{i}"] = 3 + i
    tok = Tokenizer(WordLevel(vocab, unk_token="tok0"))
    tok.pre_tokenizer = Whitespace()
    tok.save(os.path.join(path, "tokenizer.json"))
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "bos_token": "<|begin_of_text|>",
            "eos_token": "<|end_of_text|>",
            "pad_token": "<|pad|>",
        }, f)


def _hbm_stats(dev):
    try:
        ms = dev.memory_stats()
        return {
            "hbm_in_use_gb": round(ms.get("bytes_in_use", 0) / 1e9, 2),
            "hbm_limit_gb": round(ms.get("bytes_limit", 0) / 1e9, 2),
        }
    except Exception:
        return {}


def load_and_serve():
    import gc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from llama32mm_tpu.inference.engine import InferenceEngine
    from llama32mm_tpu.io.checkpoint import load_hf_model

    dev = jax.devices()[0]
    t0 = time.time()
    model, tokenizer = load_hf_model(
        CKPT_DIR, streaming=True, quantize_int8=True, max_cache_length=1792
    )
    t_load = time.time() - t0
    nbytes = sum(
        os.path.getsize(os.path.join(CKPT_DIR, f))
        for f in os.listdir(CKPT_DIR)
        if f.endswith(".safetensors")
    )
    record({
        "phase": "load",
        "backend": jax.default_backend(),
        "device": getattr(dev, "device_kind", "?"),
        "checkpoint_gb": round(nbytes / 1e9, 2),
        "load_s": round(t_load, 1),
        "load_gbps": round(nbytes / 1e9 / t_load, 2),
        "peak_rss_gb": round(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6, 2),
        **_hbm_stats(dev),
    })

    # Drop the loader's compiled programs (alloc/write_qrow executables and
    # any donated-buffer references they pin) before serving.
    gc.collect()
    jax.clear_caches()

    # HBM headroom probe: largest contiguous chunk still allocatable after
    # ~300 streamed leaf writes (axon exposes no memory_stats; distinguishes
    # fragmentation from a genuine budget miss when serving OOMs).
    headroom = 0
    for gb in (4.0, 3.0, 2.0, 1.5, 1.0, 0.5, 0.25):
        try:
            probe = jnp.zeros((int(gb * 1e9 / 4),), jnp.float32)
            probe.block_until_ready()
            headroom = gb
            del probe
            break
        except Exception:
            pass

    # prove it serves: single-image captioning-shaped generate (int8 KV)
    cfg = model.config
    tc = cfg.text_config
    n_img = tc.num_image_tokens

    def attempt(text_len, cache_len):
        s = n_img + text_len
        ids = jax.random.randint(jax.random.PRNGKey(1), (1, s), 0, tc.vocab_size - 10)
        ids = ids.at[:, :n_img].set(cfg.image_token_index)
        px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 560, 560), tc.jnp_dtype)
        engine = InferenceEngine(model.params, cfg, max_cache_length=cache_len,
                                 kv_dtype="int8")
        t0 = time.time()
        res = engine.generate(ids, px, max_new_tokens=8, temperature=0.0,
                              eos_token_id=-1)
        toks = np.asarray(res.tokens)
        return toks, time.time() - t0, engine

    for text_len, cache_len in ((32, 1792), (8, 1664)):
        try:
            toks, t_gen, engine = attempt(text_len, cache_len)
        except Exception as e:
            record({"phase": "serve_attempt_failed", "prompt": n_img + text_len,
                    "cache": cache_len, "headroom_probe_gb": headroom,
                    "error": f"{type(e).__name__}: {str(e)[:120]}"})
            gc.collect()
            jax.clear_caches()
            continue
        record({
            "phase": "serve",
            "prompt": n_img + text_len,
            "cache": cache_len,
            "headroom_probe_gb": headroom,
            "first_tokens": toks[0].tolist(),
            "serve_compile_plus_8tok_s": round(t_gen, 1),
            **_hbm_stats(dev),
        })
        break


def plan_90b():
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=16"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from llama32mm_tpu.configs import llama32_90b_vision_config
    from llama32mm_tpu.models.vlm import init_vlm_params
    from llama32mm_tpu.parallel import create_mesh
    from llama32mm_tpu.parallel.sharding import param_shardings

    cfg = llama32_90b_vision_config()
    mesh = create_mesh(dp=1, tp=16)  # v5p-16 TP layout
    shapes = jax.eval_shape(
        lambda k: init_vlm_params(k, cfg, tie_weights=False), jax.random.PRNGKey(0)
    )
    shard_tree = param_shardings(cfg, mesh, params_like=shapes)

    per_dev = 0
    total = 0
    leaves = jax.tree_util.tree_leaves_with_path(shapes)
    shard_leaves = dict(jax.tree_util.tree_leaves_with_path(shard_tree))
    for path, leaf in leaves:
        sh = shard_leaves.get(path)
        nbytes = int(np.prod(leaf.shape)) * 2  # bf16
        total += nbytes
        nshards = 1
        if sh is not None and hasattr(sh, "spec"):
            for axis in sh.spec:
                if axis is not None:
                    nshards *= mesh.shape[axis] if isinstance(axis, str) else 1
        per_dev += nbytes // nshards
    kv = cfg.text_config.n_layers * 2 * 8 * cfg.text_config.head_dim * 8192 * 2  # 8k ctx bf16
    record({
        "phase": "plan90b",
        "mesh": "tp=16 (v5p-16)",
        "total_param_gb": round(total / 1e9, 2),
        "per_device_param_gb": round(per_dev / 1e9, 2),
        "kv_8k_total_gb": round(kv / 1e9, 2),
        "v5p_hbm_per_chip_gb": 95,
        "fits": per_dev / 1e9 + kv / 16 / 1e9 < 95,
    })


if __name__ == "__main__":
    {"write": write_checkpoint, "load": load_and_serve, "plan90b": plan_90b}[sys.argv[1]]()
