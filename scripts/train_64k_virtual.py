"""A >=64k-token context-parallel TRAIN step on the virtual mesh (VERDICT r2 #3).

Runs one LoRA train step at T=65536 (and optionally T=131072) over an
8-virtual-CPU-device (tp=2, sp=4) mesh with the ring-attention flash rules:
K/V stay sequence-sharded (no per-layer all-gather — per-chip attention
memory O(T/sp)), remat + chunked CE keep activations bounded. Tiny hidden
dims — the point is the 64k+ SEQUENCE through the real sharded code path,
executed, with a finite loss.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python -u scripts/train_64k_virtual.py [--seq 65536] [--no-ring]

--no-ring reverts K/V to the round-2 all-gather layout for an apples-to-
apples check that ring numerics match (at 8k — the gather layout cannot
reach 64k without O(T) per-chip K/V).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from llama32mm_tpu.configs import LLAMA32Config, MLLAMAConfig, VisionEncoderConfig
from llama32mm_tpu.models.vlm import init_vlm_params
from llama32mm_tpu.parallel import create_mesh, seq_data_sharding, shard_params
from llama32mm_tpu.train.lora import init_lora_params, make_lora_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=65536)
    ap.add_argument("--block", type=int, default=8192)
    args = ap.parse_args()

    cfg = MLLAMAConfig(
        vision_config=VisionEncoderConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=1,
            num_attention_heads=2, image_size=28, patch_size=14,
        ),
        text_config=LLAMA32Config(
            vocab_size=512, hidden_size=64, n_heads=4, n_layers=2,
            hidden_dim=96, n_kv_groups=2, dtype="float32",
            context_length=131072,
        ),
        projection_dim=64, hidden_size=64, image_token_index=500,
    )
    # tp=1, sp=8: all 8 virtual devices on the ring. XLA:CPU's collective
    # rendezvous ABORTS the process if any device spends >40 s between
    # collectives (rendezvous.cc termination timeout, no flag to raise it) —
    # 8-way sp quarters each ring step's interpret-mode work vs sp=4, and
    # whole-chunk flash blocks (set LLAMA32MM_FLASH_BLOCKS=8192,8192) keep the
    # python-interpreted grid tiny.
    mesh = create_mesh(dp=1, tp=1, sp=8)
    os.environ.setdefault("LLAMA32MM_FLASH_BLOCKS", f"{args.block},{args.block}")
    params = shard_params(init_vlm_params(jax.random.PRNGKey(0), cfg), cfg, mesh)
    lora = init_lora_params(jax.random.PRNGKey(1), cfg.text_config, rank=4)

    s = args.seq
    tok_sh = seq_data_sharding(mesh, 2)
    ids = jax.device_put(
        jax.random.randint(jax.random.PRNGKey(2), (1, s), 0, 490), tok_sh
    )
    labels = jax.device_put(
        jnp.where(jnp.arange(s)[None, :] < 8, -100, np.asarray(ids)), tok_sh
    )
    batch = {"input_ids": ids, "labels": labels}

    init_state, step = make_lora_train_step(
        cfg, learning_rate=1e-3, impl="pallas", remat=True, loss_chunk=2048
    )
    state = init_state(lora)

    jit_step = jax.jit(step)
    t0 = time.perf_counter()
    lowered = jit_step.lower(params, state, batch, jax.random.PRNGKey(3))
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    txt = compiled.as_text()
    n_cp, n_ag = txt.count("collective-permute"), txt.count("all-gather")

    t0 = time.perf_counter()
    new_state, loss = compiled(params, state, batch, jax.random.PRNGKey(3))
    loss = float(loss)
    t_step = time.perf_counter() - t0

    assert loss == loss and loss > 0.0, f"bad loss {loss}"
    g = jax.tree.leaves(new_state.lora)[0]
    assert bool(jnp.all(jnp.isfinite(g))), "non-finite adapter update"
    print(json.dumps({
        "seq": s, "mesh": {"tp": 1, "sp": 8}, "loss": round(loss, 4),
        "step_s": round(t_step, 1), "compile_s": round(t_compile, 1),
        "collective_permutes": n_cp, "all_gathers": n_ag,
        "remat": True, "loss_chunk": 2048, "ring": n_cp > 0,
    }), flush=True)


if __name__ == "__main__":
    main()
