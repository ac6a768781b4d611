"""Measure the memory/time trade of scan-over-remat (jax.checkpoint on the
decoder layer body) for a long-context LoRA train step on the real chip.

Run: python -u scripts/bench_remat.py [seq_len] [remat|noremat|both]
(default 8192 both). Run the modes in SEPARATE processes on the tunneled
backend — a failed compile can poison the session for subsequent compiles.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import bench_config
from llama32mm_tpu.models.vlm import init_vlm_params
from llama32mm_tpu.train.lora import init_lora_params, make_lora_train_step


def peak_mb():
    st = jax.local_devices()[0].memory_stats() or {}
    return st.get("peak_bytes_in_use", 0) / 1e6


def run(cfg, params, lora, batch, **kw):
    init_state, step = make_lora_train_step(cfg, learning_rate=1e-3, **kw)
    state = init_state(lora)
    jit_step = jax.jit(step)
    t0 = time.perf_counter()
    out = jit_step(params, state, batch, jax.random.PRNGKey(4))
    jax.block_until_ready(out)
    print(f"  compile+first step: {time.perf_counter() - t0:.0f} s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(jit_step(params, state, batch, jax.random.PRNGKey(5)))
        ts.append(time.perf_counter() - t0)
    return float(out[1]), float(np.median(ts)), peak_mb()


def main():
    seq = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    mode = sys.argv[2] if len(sys.argv) > 2 else "full"
    kw = {
        "noremat": {},
        "remat": {"remat": True},
        "chunkce": {"loss_chunk": 512},
        "full": {"remat": True, "loss_chunk": 512},
    }[mode]
    cfg = bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
    tc = cfg.text_config
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    lora = init_lora_params(jax.random.PRNGKey(1), tc, rank=16)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, seq), 0, tc.vocab_size - 10)
    batch = {"input_ids": ids, "labels": ids}

    try:
        loss, t, peak = run(cfg, params, lora, batch, **kw)
        print(
            f"seq={seq} mode={mode}: step {t*1e3:.0f} ms, loss {loss:.4f}, "
            f"peak HBM {peak:.0f} MB"
        )
    except Exception as e:
        print(f"seq={seq} mode={mode}: FAILED ({type(e).__name__}: {str(e)[:200]})")


if __name__ == "__main__":
    main()
