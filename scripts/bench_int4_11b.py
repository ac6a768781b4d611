"""11B north-star shapes in int4 capacity mode on one chip.

Random weights generated HOST-side directly in the packed-uint8 int4 format
(the bf16/int8 stacks never exist — the point of the mode), then a
captioning-shaped decode is measured, along with the weight HBM footprint
(the capacity story vs int8).

Run: python -u scripts/bench_int4_11b.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import (
    CACHE_LEN,
    engine_decode_rate,
    make_inputs,
    timed_median,
)
from llama32mm_tpu.configs import llama32_11b_vision_config
from llama32mm_tpu.inference.engine import InferenceEngine
from llama32mm_tpu.preprocess.image import preprocess_image_device

GROUP = 128


def random_int4_vlm_params(cfg):
    """Like bench.random_int8_vlm_params but decoder linears packed int4."""
    import ml_dtypes

    from bench import random_int8_vlm_params

    tc = cfg.text_config
    rng = np.random.default_rng(0)

    def q4leaf(shape):
        *lead, ci, co = shape
        packed = rng.integers(0, 256, (*lead, ci // 2, co), dtype=np.uint8)
        scale = np.full((*lead, ci // GROUP, co), 0.008, np.float32)
        return {"q4": jax.device_put(packed), "scale": jax.device_put(scale)}

    params = random_int8_vlm_params(cfg)
    h, hd, nq, nkv, inter, L = (
        tc.hidden_size, tc.head_dim, tc.n_heads, tc.n_kv_groups, tc.hidden_dim,
        tc.n_layers,
    )
    blocks = params["language_model"]["model"]["blocks"]
    blocks["att"]["W_query"]["weight"] = q4leaf((L, h, nq * hd))
    blocks["att"]["W_key"]["weight"] = q4leaf((L, h, nkv * hd))
    blocks["att"]["W_value"]["weight"] = q4leaf((L, h, nkv * hd))
    blocks["att"]["out_proj"]["weight"] = q4leaf((L, nq * hd, h))
    blocks["ff"]["swiglu"]["w_gate"] = q4leaf((L, h, inter))
    blocks["ff"]["swiglu"]["w_up"] = q4leaf((L, h, inter))
    blocks["ff"]["w_down"]["weight"] = q4leaf((L, inter, h))
    params["language_model"]["lm_head"]["weight"] = q4leaf((h, tc.vocab_size))
    return params


def main():
    cfg = llama32_11b_vision_config(max_cache_length=CACHE_LEN)
    tc = cfg.text_config
    params = random_int4_vlm_params(cfg)

    def leaf_bytes(t):
        return sum(x.nbytes for x in jax.tree.leaves(t))

    weights_gb = leaf_bytes(params) / 1e9

    ids, raw, s = make_inputs(cfg, seed=5)

    @jax.jit
    def preprocess(raw):
        return preprocess_image_device(raw, cfg.vision_config.image_size, tc.jnp_dtype)

    px = preprocess(raw)
    engine = InferenceEngine(params, cfg, max_cache_length=CACHE_LEN, kv_dtype="int8")

    def run(n):
        return np.asarray(
            engine.generate(ids, px, max_new_tokens=n, temperature=0.0,
                            eos_token_id=-1, rng=jax.random.PRNGKey(0)).tokens
        )

    run(1)
    ttft, _ = timed_median(lambda: run(1), 5)
    tps, spread = engine_decode_rate(engine, ids, px, reps=5, max_new=64, short=16)

    print(json.dumps({
        "m11b_int4_decode_tokens_per_sec": round(tps, 2),
        "m11b_int4_decode_spread": round(spread, 2),
        "m11b_int4_ttft_p50_ms": round(ttft * 1e3, 1),
        "m11b_int4_weights_gb": round(weights_gb, 2),
        "m11b_int4_config": "llama3.2-11B-Vision shapes, int4 packed weights "
                            "(g=128) + int8 KV, 1 chip",
    }), flush=True)


if __name__ == "__main__":
    main()
