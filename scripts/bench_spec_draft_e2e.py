"""End-to-end draft-model speculation at the flagship 11B-int8 shapes, with
acceptance PINNED at both extremes so the full cost structure is measured on
chip (VERDICT r3 Weak #3 — the feature shipped with zero measured tokens/s on
any config).

No trained checkpoints exist in this environment, so organic acceptance is
unmeasurable (random-init draft/target agree ~never at a 128k vocab). Both
extremes ARE measurable with every cost real:

- α≈0 (adversarial): random-init 11B-int8 target + random-init 1B bf16 draft.
  Every iteration drafts K, verifies, rejects all, commits 1.
- α=1.0 (by construction): zero both models' final RMSNorm weight → logits
  are identically 0 → both always argmax token 0, so every draft is accepted.
  Every decoder weight byte of both models still streams each step; only the
  final-norm scale changed.

The real-checkpoint operating point lies between these measured endpoints at
the (text-dependent) true acceptance; the break-even α* falls out of the two
measurements directly.

Run: python -u scripts/bench_spec_draft_e2e.py [--k 4] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def draft_1b_config(dtype="bfloat16", cache=1792):
    from llama32mm_tpu.configs import LLAMA32Config

    # Llama-3.2-1B text shapes
    return LLAMA32Config(
        vocab_size=128256, hidden_size=2048, n_heads=32, n_layers=16,
        hidden_dim=8192, n_kv_groups=8, dtype=dtype, max_cache_length=cache,
    )


def zero_final_norm_vlm(params):
    lm = dict(params["language_model"])
    model = dict(lm["model"])
    model["final_norm"] = {"weight": jnp.zeros_like(model["final_norm"]["weight"])}
    lm["model"] = model
    return {**params, "language_model": lm}


def zero_final_norm_lm(dparams):
    model = dict(dparams["model"])
    model["final_norm"] = {"weight": jnp.zeros_like(model["final_norm"]["weight"])}
    return {**dparams, "model": model}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--int4", action="store_true",
                    help="int4 packed target weights (the fastest 11B mode "
                    "since the shift-free unpack kernel) instead of int8")
    args = ap.parse_args()
    K = args.k

    from bench import (
        CACHE_LEN,
        engine_decode_rate,
        make_inputs,
        random_int4_vlm_params,
        random_int8_vlm_params,
    )

    from llama32mm_tpu.configs import llama32_11b_vision_config
    from llama32mm_tpu.inference.engine import InferenceEngine
    from llama32mm_tpu.models.language import init_causal_lm_params
    from llama32mm_tpu.preprocess.image import preprocess_image_device

    cfg = llama32_11b_vision_config(max_cache_length=CACHE_LEN)
    tc = cfg.text_config
    dtc = draft_1b_config(cache=CACHE_LEN)

    wmode = "int4" if args.int4 else "int8"
    print(f"[spec_e2e] init 11B-{wmode} target + 1B bf16 draft on device", flush=True)
    params = random_int4_vlm_params(cfg) if args.int4 else random_int8_vlm_params(cfg)
    dparams = jax.jit(lambda k: init_causal_lm_params(k, dtc))(jax.random.PRNGKey(1))
    jax.block_until_ready(dparams)

    ids, raw, s = make_inputs(cfg, seed=5)
    px = jax.jit(
        lambda r: preprocess_image_device(r, cfg.vision_config.image_size, tc.jnp_dtype)
    )(raw)

    out = {"k": K,
           "config": f"11B-vision {wmode}+int8KV target, 1B bf16 draft, 1 chip"}

    def rate(engine, label):
        tps, spread = engine_decode_rate(engine, ids, px, reps=args.reps,
                                         max_new=128, short=16)
        r = engine.generate(ids, px, max_new_tokens=128, temperature=0.0,
                            eos_token_id=-1, rng=jax.random.PRNGKey(0))
        steps = int(np.asarray(r.steps)) if r.steps is not None else 128
        commits = float(np.asarray(r.num_generated)[0]) / max(steps, 1)
        out[label] = round(tps, 2)
        out[label + "_spread"] = round(spread, 2)
        out[label + "_commits_per_iter"] = round(commits, 3)
        print(f"[spec_e2e] {label}: {tps:.2f} tok/s "
              f"(spread {spread:.2f}, {commits:.2f} commits/iter)", flush=True)

    print("[spec_e2e] baseline target-only decode", flush=True)
    eng = InferenceEngine(params, cfg, max_cache_length=CACHE_LEN, kv_dtype="int8")
    rate(eng, "target_only_tps")
    del eng

    print("[spec_e2e] spec_draft alpha~0 (random pair)", flush=True)
    eng0 = InferenceEngine(params, cfg, max_cache_length=CACHE_LEN, kv_dtype="int8",
                           spec_draft=K, draft_params=dparams, draft_config=dtc)
    rate(eng0, "spec_alpha0_tps")
    del eng0

    print("[spec_e2e] spec_draft alpha=1 (final norms zeroed)", flush=True)
    eng1 = InferenceEngine(
        zero_final_norm_vlm(params), cfg, max_cache_length=CACHE_LEN,
        kv_dtype="int8", spec_draft=K,
        draft_params=zero_final_norm_lm(dparams), draft_config=dtc,
    )
    rate(eng1, "spec_alpha1_tps")
    del eng1

    # break-even: expected commits/iteration at acceptance α is
    # E(α) = sum_{i=0..K} α^i (accepted prefix + bonus); iteration time is
    # measured directly at both ends and is α-independent (same work either
    # way), so t_iter = 128-token window time from either spec run.
    t_iter = (K + 1) / out["spec_alpha1_tps"]  # s per iteration (α=1 commits K+1)
    t0 = 1.0 / out["target_only_tps"]
    # E(α*) = t_iter / t0  →  solve sum α^i = t_iter/t0 numerically
    need = t_iter / t0
    lo, hi = 0.0, 1.0
    for _ in range(60):
        mid = (lo + hi) / 2
        e = sum(mid ** i for i in range(K + 1))
        lo, hi = (mid, hi) if e < need else (lo, mid)
    out["break_even_acceptance"] = round((lo + hi) / 2, 3)
    out["iter_time_ms"] = round(t_iter * 1e3, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
