"""Per-route ablation of the decode gemv routing INSIDE the real engine.

The shape-isolated A/B (bench_gemv_ab.py) showed Pallas wins per matmul, but
the full routed engine regressed (109.9 → 103.7 tok/s) — the isolated wins
don't compose with the engine's surrounding ops. This measures each route
alone, in the real decode loop, to find which (if any) survive composition.

Run: python -u scripts/bench_route_ablation.py [--model 3b|11b-int8]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

_MB = 1024 * 1024


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="3b", choices=["3b", "11b-int8"])
    ap.add_argument("--max-new", type=int, default=96)
    ap.add_argument("--short", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import bench as B
    from llama32mm_tpu.inference.engine import InferenceEngine
    from llama32mm_tpu.models.vlm import init_vlm_params
    from llama32mm_tpu.preprocess.image import preprocess_image_device

    cfg = B.bench_config("bfloat16")
    tc = cfg.text_config
    print("[ablation] init params on device", flush=True)
    if args.model == "3b":
        params = jax.jit(lambda k: init_vlm_params(k, cfg))(jax.random.PRNGKey(0))
        kv_dtype = None
        configs = {
            "none": None,
            "w_down_st14": {"w_down": ("stacked", 14 * _MB)},
            "w_down_st8": {"w_down": ("stacked", 8 * _MB)},
            "out_proj_st8": {"out_proj": ("stacked", 8 * _MB)},
            "wk_wv_slice8": {"W_key": ("slice", 8 * _MB), "W_value": ("slice", 8 * _MB)},
            "lm_head14": {"lm_head": 14 * _MB},
            "full_default": "auto",
        }
    else:
        from llama32mm_tpu.configs import llama32_11b_vision_config

        cfg = llama32_11b_vision_config(max_cache_length=B.CACHE_LEN)
        tc = cfg.text_config
        params = B.random_int8_vlm_params(cfg)
        kv_dtype = "int8"
        configs = {
            "none": None,
            "lm_head8": {"lm_head": 8 * _MB},
            "wk_wv_slice8": {"W_key": ("slice", 8 * _MB), "W_value": ("slice", 8 * _MB)},
            "w_down_st8": {"w_down": ("stacked", 8 * _MB)},
            "full_default": "auto",
        }
    jax.block_until_ready(params)

    ids, raw, s = B.make_inputs(cfg)
    px = jax.jit(
        lambda r: preprocess_image_device(r, cfg.vision_config.image_size, tc.jnp_dtype)
    )(raw)

    for name, routes in configs.items():
        eng = InferenceEngine(
            params, cfg, max_cache_length=B.CACHE_LEN, kv_dtype=kv_dtype,
            gemv_routes=routes,
        )
        try:
            tps, spread = B.engine_decode_rate(
                eng, ids, px, reps=args.reps, max_new=args.max_new, short=args.short
            )
            print(f"  {name:16s} {tps:7.2f} tok/s  (IQR {spread:.2f})", flush=True)
        except Exception as e:
            print(f"  {name:16s} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)
        del eng


if __name__ == "__main__":
    main()
