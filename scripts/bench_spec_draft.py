"""Draft-model speculative decoding: measured cost structure on the chip.

Acceptance is weight/data-dependent (random-init nets accept ~nothing), so
this probe measures what is measurable without trained checkpoints:

1. the plain decode step time at 3B-target shapes (the baseline),
2. the full spec_draft iteration time with a 1B-shape draft at K drafts
   (K+1 cheap draft forwards + ONE (K+1)-token target verify) — acceptance
   ~0, so every iteration commits exactly 1 token = the WORST case,
3. from (1)+(2): the implied tokens/s at acceptance rates α (expected
   commits per iteration = Σ_{i=0..K} α^i plus the bonus token) and the
   break-even α where draft-model speculation beats plain decoding.

Run: python -u scripts/bench_spec_draft.py [--k 4] [--steps 64]
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


def draft_1b_config(dtype="bfloat16"):
    from llama32mm_tpu.configs import LLAMA32Config

    # Llama-3.2-1B text shapes
    return LLAMA32Config(
        vocab_size=128256, hidden_size=2048, n_heads=32, n_layers=16,
        hidden_dim=8192, n_kv_groups=8, dtype=dtype, max_cache_length=1792,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--steps", type=int, default=64, help="decode budget per timing run")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from bench import CACHE_LEN, bench_config

    from llama32mm_tpu.inference.engine import InferenceEngine
    from llama32mm_tpu.models.language import init_causal_lm_params
    from llama32mm_tpu.models.vlm import init_vlm_params

    cfg = bench_config("bfloat16")
    dtc = draft_1b_config()
    K = args.k

    print("[spec_draft] init 3B target + 1B draft on device", flush=True)
    params = jax.jit(lambda k: init_vlm_params(k, cfg))(jax.random.PRNGKey(0))
    dparams = jax.jit(lambda k: init_causal_lm_params(k, dtc))(jax.random.PRNGKey(1))
    jax.block_until_ready((params, dparams))
    gb = sum(x.nbytes for x in jax.tree.leaves((params, dparams))) / 1e9
    print(f"[spec_draft] {gb:.2f} GB total on chip", flush=True)

    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 128), 0, 128000)

    def timed(eng, tag):
        def run():
            r = eng.generate(ids, max_new_tokens=args.steps, temperature=0.0,
                             eos_token_id=-1, rng=jax.random.PRNGKey(0))
            # device→host fetch is the sync point: block_until_ready can
            # return early through the axon tunnel (see bench.py header)
            np.asarray(r.tokens)
            return r

        r = run()  # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            r = run()
            ts.append(time.perf_counter() - t0)
        sec = float(np.median(ts))
        iters = int(r.steps) if r.steps is not None else args.steps
        print(f"[spec_draft] {tag}: {sec:.3f}s for {args.steps} tokens "
              f"({iters} loop iterations)", flush=True)
        return sec, iters

    plain = InferenceEngine(params, cfg, max_cache_length=CACHE_LEN)
    t_plain, _ = timed(plain, "plain decode")
    t_step = t_plain / args.steps

    spec = InferenceEngine(
        params, cfg, max_cache_length=CACHE_LEN, spec_draft=K,
        draft_params=dparams, draft_config=dtc,
    )
    t_spec, iters = timed(spec, f"spec_draft K={K} (random draft, accept~0)")
    commits = args.steps
    t_iter = t_spec / iters
    accept_per_iter = commits / iters  # ~1 with random nets

    # expected commits per iteration at per-token acceptance alpha:
    # sum_{i=1..K} alpha^i (accepted drafts) + 1 (bonus/corrected)
    def commits_at(alpha):
        return sum(alpha ** i for i in range(1, K + 1)) + 1.0

    implied = {
        f"implied_tok_s_alpha_{a}": round(commits_at(a) / t_iter, 1)
        for a in (0.5, 0.7, 0.9)
    }
    # break-even: commits_at(alpha)/t_iter == 1/t_step
    lo, hi = 0.0, 1.0
    for _ in range(60):
        mid = (lo + hi) / 2
        if commits_at(mid) / t_iter >= 1.0 / t_step:
            hi = mid
        else:
            lo = mid
    print(json.dumps({
        "probe": "spec_draft_cost",
        "k": K,
        "target": "3B bf16 shapes",
        "draft": "1B bf16 shapes",
        "plain_tok_s": round(1.0 / t_step, 1),
        "spec_iter_ms": round(t_iter * 1e3, 2),
        "spec_tok_s_accept0": round(accept_per_iter / t_iter, 1),
        "draft_overhead_x": round(t_iter / t_step, 2),
        "breakeven_alpha": round(hi, 3),
        **implied,
    }), flush=True)


if __name__ == "__main__":
    main()
