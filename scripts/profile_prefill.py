"""Split TTFT into phases on the real chip by differencing engine-level
programs (a lax.scan over N whole-tower iterations takes >20 min in the
remote compile service — engine-style programs compile in minutes):

- P: jitted on-device preprocess alone      = resize+rescale+normalize+CHW
- A: generate(max_new=1) with image         = preprocess+ViT+proj+prefill+lm1
- B: generate(max_new=1) without image      = prefill+lm1
- A - B ≈ vision tower + projector (+ image-feature splice, ~0).
- C: full generate(max_new=64): decode steady state.

Ceilings for each phase come from scripts/bench_prefill_sol.py (the same
shapes' bare-GEMM floor on this chip).

Timing: p50 of repeats, device→host fetch as the sync point (block_until_ready
can return early through the axon tunnel).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/profile_prefill.py
           [--m11b] [--json]
--m11b profiles the flagship 11B-Vision shapes (int8 weights + int8 KV, the
BENCH m11b_* configuration) instead of the 3B bf16 bench config.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import CACHE_LEN, PROMPT_TEXT_LEN, bench_config
from llama32mm_tpu.inference.engine import InferenceEngine
from llama32mm_tpu.models.vlm import init_vlm_params
from llama32mm_tpu.preprocess.image import preprocess_image_device

REPS = 7


def p50(f):
    f()  # compile/warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50))


def main():
    m11b = "--m11b" in sys.argv
    if m11b:
        from bench import random_int8_vlm_params
        from llama32mm_tpu.configs import llama32_11b_vision_config

        cfg = llama32_11b_vision_config(max_cache_length=CACHE_LEN)
        params = random_int8_vlm_params(cfg)
        engine = InferenceEngine(params, cfg, max_cache_length=CACHE_LEN,
                                 kv_dtype="int8")
        label = "11B-vision int8+int8KV"
    else:
        cfg = bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
        params = jax.device_put(init_vlm_params(jax.random.PRNGKey(0), cfg))
        engine = InferenceEngine(params, cfg, max_cache_length=CACHE_LEN)
        label = "3B bf16"
    tc = cfg.text_config

    n_img = tc.num_image_tokens
    s = n_img + PROMPT_TEXT_LEN
    size = cfg.vision_config.image_size
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, s), 0, tc.vocab_size - 10)
    ids_img = ids.at[:, :n_img].set(cfg.image_token_index)
    raw = jax.random.randint(
        jax.random.PRNGKey(2), (1, size, size, 3), 0, 255, jnp.int32
    ).astype(jnp.uint8)

    pre = jax.jit(lambda r: preprocess_image_device(r, size, tc.jnp_dtype))
    t_pre = p50(lambda: np.asarray(pre(raw)))

    def gen(use_img, max_new):
        px = pre(raw) if use_img else None
        r = engine.generate(
            ids_img if use_img else ids, px, max_new_tokens=max_new,
            temperature=0.0, eos_token_id=-1, rng=jax.random.PRNGKey(0),
        )
        np.asarray(r.tokens)

    t_img1 = p50(lambda: gen(True, 1))
    t_txt1 = p50(lambda: gen(False, 1))
    t_full = p50(lambda: gen(True, 64))
    per_tok = (t_full - t_img1) / 63

    rec = {
        "config": label,
        "prompt_len": s,
        "preprocess_ms": round(t_pre * 1e3, 1),
        "ttft_ms": round(t_img1 * 1e3, 1),
        "text_prefill_plus_head_ms": round(t_txt1 * 1e3, 1),
        "vision_tower_plus_proj_ms": round((t_img1 - t_txt1) * 1e3, 1),
        "decode_ms_per_tok": round(per_tok * 1e3, 2),
        "backend": jax.default_backend(),
    }
    if "--json" in sys.argv:
        print(json.dumps(rec))
        return

    print(f"[{label}] prompt_len={s}")
    print(f"P: on-device preprocess    {t_pre * 1e3:8.1f} ms", flush=True)
    print(f"A: image prefill TTFT      {t_img1 * 1e3:8.1f} ms", flush=True)
    print(f"B: text-only prefill       {t_txt1 * 1e3:8.1f} ms", flush=True)
    print(f"A-B: vision tower+proj     {(t_img1 - t_txt1) * 1e3:8.1f} ms", flush=True)
    print(f"C: decode                  {per_tok * 1e3:8.2f} ms/tok ({1 / per_tok:.1f} tok/s)", flush=True)


if __name__ == "__main__":
    main()
