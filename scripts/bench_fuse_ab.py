"""A/B the serving fusion end-to-end: fused vs unfused engines, decode rate
via the two-length difference method.

Run: python -u scripts/bench_fuse_ab.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import CACHE_LEN, MAX_NEW, PROMPT_TEXT_LEN, SHORT_NEW, bench_config
from llama32mm_tpu.inference.engine import InferenceEngine
from llama32mm_tpu.models.fuse import fuse_decoder_params
from llama32mm_tpu.models.vlm import init_vlm_params


def measure(engine, ids, px):
    def run(max_new):
        return np.asarray(
            engine.generate(
                ids, px, max_new_tokens=max_new, temperature=0.0, eos_token_id=-1,
                rng=jax.random.PRNGKey(0),
            ).tokens
        )

    run(SHORT_NEW)
    run(MAX_NEW)
    run(1)

    def p50(max_new, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(max_new)
            ts.append(time.perf_counter() - t0)
        return float(np.percentile(ts, 50))

    ttft = p50(1)
    ts, tl = p50(SHORT_NEW), p50(MAX_NEW)
    return (MAX_NEW - SHORT_NEW) / max(tl - ts, 1e-9), ttft


def main():
    cfg = bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
    tc = cfg.text_config
    params = jax.device_put(init_vlm_params(jax.random.PRNGKey(0), cfg))

    n_img = tc.num_image_tokens
    s = n_img + PROMPT_TEXT_LEN
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, s), 0, tc.vocab_size - 10)
    ids = ids.at[:, :n_img].set(cfg.image_token_index)
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 560, 560), tc.jnp_dtype)

    # interleave A/B twice to separate drift from the treatment
    eng_u = InferenceEngine(params, cfg, max_cache_length=CACHE_LEN)
    fused = fuse_decoder_params(params, tc)
    eng_f = InferenceEngine(fused, cfg, max_cache_length=CACHE_LEN)
    for rnd in range(2):
        tps_u, ttft_u = measure(eng_u, ids, px)
        tps_f, ttft_f = measure(eng_f, ids, px)
        print(
            f"round {rnd}: unfused {tps_u:6.1f} tok/s ttft {ttft_u * 1e3:5.1f} ms | "
            f"fused {tps_f:6.1f} tok/s ttft {ttft_f * 1e3:5.1f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
