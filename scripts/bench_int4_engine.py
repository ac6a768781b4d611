"""Engine-level int4 serving measurement at 3B bench shapes (1 chip).

Reports decode tok/s (int4 weights + int8 KV), TTFT, and quality vs the bf16
model (teacher-forced top-1 agreement + mean |Δlogit| over the bf16 greedy
continuation — the same method as bench.py's int8 quality section).

Run: python -u scripts/bench_int4_engine.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import (
    CACHE_LEN,
    MAX_NEW,
    QUALITY_SPAN,
    bench_config,
    decode_roofline_tokens_per_sec,
    engine_decode_rate,
    make_inputs,
    teacher_forced_logits,
    timed_median,
)
from llama32mm_tpu.inference.engine import InferenceEngine
from llama32mm_tpu.models.vlm import init_vlm_params
from llama32mm_tpu.ops.quant import quantize_llama_params
from llama32mm_tpu.preprocess.image import preprocess_image_device


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--recipe", default="rtn", choices=["rtn", "mixed"],
                    help="rtn: all-int4 g=128; mixed: INT4_MIXED_RECIPE "
                         "(gate/up int4 g=64, attn+w_down int8 — the shipped "
                         "quality recipe, docs/serving.md)")
    args = ap.parse_args()
    cfg = bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
    tc = cfg.text_config
    params = jax.device_put(init_vlm_params(jax.random.PRNGKey(0), cfg))
    ids, raw, s = make_inputs(cfg)

    @jax.jit
    def preprocess(raw):
        return preprocess_image_device(raw, cfg.vision_config.image_size, tc.jnp_dtype)

    px = preprocess(raw)

    # bf16 greedy continuation + teacher-forced logits (quality reference)
    engine = InferenceEngine(params, cfg, max_cache_length=CACHE_LEN)
    bf16_tokens = np.asarray(
        engine.generate(
            ids, px, max_new_tokens=MAX_NEW, temperature=0.0, eos_token_id=-1,
            rng=jax.random.PRNGKey(0),
        ).tokens
    )[:, :QUALITY_SPAN]
    ext_ids = jnp.concatenate([ids, jnp.asarray(bf16_tokens)], axis=1)
    logits_bf16 = teacher_forced_logits(params, cfg, ext_ids, px, QUALITY_SPAN)
    del engine

    if args.recipe == "mixed":
        from llama32mm_tpu.ops.quant import INT4_MIXED_RECIPE

        q4 = quantize_llama_params(params, free_originals=True, bits=4,
                                   group_size=64, recipe=INT4_MIXED_RECIPE)
    else:
        q4 = quantize_llama_params(params, free_originals=True, bits=4)
    params = None
    jax.clear_caches()

    logits_int4 = teacher_forced_logits(q4, cfg, ext_ids, px, QUALITY_SPAN)
    logits_int4kv = teacher_forced_logits(
        q4, cfg, ext_ids, px, QUALITY_SPAN, kv_dtype="int8"
    )

    def quality(a, b):
        return (
            float(np.mean(np.argmax(a, -1) == np.argmax(b, -1))),
            float(np.mean(np.abs(a - b))),
        )

    int4_top1, int4_dlogit = quality(logits_bf16, logits_int4)
    int4kv_top1, int4kv_dlogit = quality(logits_bf16, logits_int4kv)

    qengine = InferenceEngine(q4, cfg, max_cache_length=CACHE_LEN, kv_dtype="int8")

    def run(n):
        return np.asarray(
            qengine.generate(
                ids, px, max_new_tokens=n, temperature=0.0, eos_token_id=-1,
                rng=jax.random.PRNGKey(0),
            ).tokens
        )

    run(1)
    ttft, _ = timed_median(lambda: run(1), 5)
    tps, spread = engine_decode_rate(qengine, ids, px, reps=5)

    mean_ctx = s + MAX_NEW // 2
    # int4 roofline: 0.5 B/weight + fp32 scales every group of 128
    roofline_int8 = decode_roofline_tokens_per_sec(
        cfg, mean_ctx, 819.0, weight_bytes=1, kv_bytes=1, head_bytes=1
    )

    print(json.dumps({
        "int4_decode_tokens_per_sec": round(tps, 2),
        "int4_decode_spread": round(spread, 2),
        "int4_ttft_p50_ms": round(ttft * 1e3, 1),
        "int8_roofline_for_reference": round(roofline_int8, 2),
        "int4_top1_agreement": round(int4_top1, 4),
        "int4_mean_abs_dlogit": round(int4_dlogit, 4),
        "int4kv_top1_agreement": round(int4kv_top1, 4),
        "int4kv_mean_abs_dlogit": round(int4kv_dlogit, 4),
        "config": ("3B bench shapes, int4 weights (g=128) + int8 KV"
                   if args.recipe == "rtn" else
                   "3B bench shapes, MIXED int4(g=64 gate/up)+int8(attn,w_down) + int8 KV"),
        "weights_gb": round(sum(
            x.nbytes for x in jax.tree.leaves(q4)) / 1e9, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
