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


def run(cfg, params, lora, batch, **kw):
    init_state, step = make_lora_train_step(cfg, learning_rate=1e-3, **kw)
    state = init_state(lora)
    jit_step = jax.jit(step)
    # compile-time memory analysis: XLA's own temp-buffer requirement is the
    # activation-memory number remat changes (device memory_stats() hangs on
    # the tunneled backend, and block_until_ready is a no-op there — force
    # completion via the host transfer of the loss instead)
    compiled = jit_step.lower(params, state, batch, jax.random.PRNGKey(4)).compile()
    ma = compiled.memory_analysis()
    temp_mb = getattr(ma, "temp_size_in_bytes", 0) / 1e6
    print(f"  XLA temp buffers: {temp_mb:.0f} MB", flush=True)
    t0 = time.perf_counter()
    loss = float(jit_step(params, state, batch, jax.random.PRNGKey(4))[1])
    print(f"  first step (incl. transfer): {time.perf_counter() - t0:.1f} s", flush=True)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        float(jit_step(params, state, batch, jax.random.PRNGKey(5))[1])
        ts.append(time.perf_counter() - t0)
        print(f"  rep {i}: {ts[-1]:.2f} s", flush=True)
    return loss, float(np.median(ts)), temp_mb


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
        loss, t, temp_mb = run(cfg, params, lora, batch, **kw)
        print(
            f"seq={seq} mode={mode}: step {t*1e3:.0f} ms, loss {loss:.4f}, "
            f"XLA temp {temp_mb:.0f} MB"
        )
    except Exception as e:
        print(f"seq={seq} mode={mode}: FAILED ({type(e).__name__}: {str(e)[:200]})")


if __name__ == "__main__":
    main()
