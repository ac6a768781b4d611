"""QLoRA at north-star scale: fine-tune 11B-Vision shapes on ONE v5e chip.

The reference's whole fine-tuning story is LoRA adapters over an fp16 base
(``Model/model.py:107-121`` + README "LoRA fine-tuning") — at 11B that base
alone is ~22 GB and needs multiple devices. QLoRA makes the north-star model
fine-tunable on a single 16 GB v5e: the frozen base streams through the SAME
int8 path serving uses (~10.6 GB incl. the bf16 vision tower + embeddings),
gradients flow through the quantized matmuls into fp32 rank-r adapters, and
remat + chunked-CE keep activation memory flat in sequence length
(tests/test_qlora.py pins the numerics; this probe measures the real chip).

Prints one JSON line per (seq_len) with step time, tokens/s, and per-chip
peak HBM from the runtime's own memory stats.

``--model 3b`` probes the complementary regime: the int8 3B base is only
~3.4 GB, so the freed HBM buys trainable **context depth** instead of model
scale — long-context QLoRA (8k/16k/32k) on the same single chip where the
bf16 3B base + plain (unchunked, unremat) activations cannot compile past 4k
(``scripts/bench_remat.py``).

Run: python -u scripts/bench_qlora_11b.py [--seq 2048,4096] [--rank 16]
     python -u scripts/bench_qlora_11b.py --model 3b --seq 8192,16384,32768
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", default="2048,4096")
    ap.add_argument("--model", default="11b", choices=["11b", "3b"])
    ap.add_argument("--rank", type=int, default=16)
    ap.add_argument("--loss-chunk", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3, help="timed steps per shape")
    ap.add_argument("--tiny", action="store_true", help="tiny config (CPU smoke)")
    args = ap.parse_args()

    from bench import random_int8_vlm_params

    from llama32mm_tpu.configs import llama32_11b_vision_config, tiny_mllama_config
    from llama32mm_tpu.train.lora import init_lora_params, make_lora_train_step

    if args.tiny:
        cfg = tiny_mllama_config()
        seqs = [64]
        loss_chunk = 16
    elif args.model == "3b":
        from bench import bench_config

        cfg = bench_config()
        seqs = [int(s) for s in args.seq.split(",")]
        loss_chunk = args.loss_chunk
    else:
        cfg = llama32_11b_vision_config()
        seqs = [int(s) for s in args.seq.split(",")]
        loss_chunk = args.loss_chunk
    tc = cfg.text_config

    print("[qlora11b] drawing int8 11B params directly on device", flush=True)
    qparams = random_int8_vlm_params(cfg)
    jax.block_until_ready(qparams)
    base_gb = sum(x.nbytes for x in jax.tree.leaves(qparams)) / 1e9
    print(f"[qlora11b] frozen base: {base_gb:.2f} GB on chip", flush=True)

    lora = init_lora_params(jax.random.PRNGKey(1), tc, rank=args.rank)
    lora_mb = sum(x.nbytes for x in jax.tree.leaves(lora)) / 1e6

    init_state, step = make_lora_train_step(
        cfg, learning_rate=1e-4, remat=True, loss_chunk=loss_chunk
    )
    state = init_state(lora)
    # no donation: a failed (OOM) dispatch would invalidate the donated state
    # and poison the next shape's attempt; adapter state is only ~0.9 GB total
    jstep = jax.jit(step)

    for S in seqs:
        ids = jax.random.randint(jax.random.PRNGKey(2), (1, S), 0, tc.vocab_size - 10)
        batch = {"input_ids": ids, "labels": ids}

        t0 = time.perf_counter()
        try:
            new_state, loss = jstep(qparams, state, batch, jax.random.PRNGKey(3))
            loss = float(loss)  # host transfer = completion barrier
            state = new_state
        except Exception as e:  # noqa: BLE001 — per-shape OOM is a result, not a crash
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            print(json.dumps({"probe": f"qlora_{args.model}_one_chip", "seq": S,
                              "oom": True, "loss_chunk": loss_chunk}), flush=True)
            continue
        compile_s = time.perf_counter() - t0

        ts = []
        for i in range(args.steps):
            t0 = time.perf_counter()
            state, loss = jstep(qparams, state, batch, jax.random.PRNGKey(4 + i))
            loss = float(loss)
            ts.append(time.perf_counter() - t0)
        sec = float(np.median(ts))

        stats = jax.devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", 0) / 1e9
        print(json.dumps({
            "probe": f"qlora_{args.model}_one_chip",
            "seq": S,
            "rank": args.rank,
            "base_gb": round(base_gb, 2),
            "adapters_mb": round(lora_mb, 1),
            "step_s": round(sec, 2),
            "tok_per_s": round(S / sec, 1),
            "loss": round(loss, 4),
            "compile_s": round(compile_s, 1),
            "chip_peak_gb": round(peak, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
