"""int4 quality levers, measured (VERDICT r2 #5 / Weak #2).

Round 2's int4 quality evidence was a 0.000 top-1 agreement floor at bench
scale (symmetric RTN, g=128, every decoder linear + head at 4 bits — on a
random-init 28-layer net the ~6% per-weight RTN noise compounds to total
logit decorrelation). This sweeps the levers against the same teacher-forced
metric (last-64-position top-1 agreement + mean |Δlogit| vs the bf16 model):

  group size (128 → 64 → 32), and the MIXED recipe (gate/up + lm_head int4,
  attention + w_down int8 — int4 on ~2/3 of the bytes, int8 where the
  residual stream accumulates error directly).

Run: python -u scripts/bench_int4_quality.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench as B
from llama32mm_tpu.models.vlm import init_vlm_params
from llama32mm_tpu.ops.awq import awq_equalize, calibrate_stats
from llama32mm_tpu.ops.quant import INT4_MIXED_RECIPE, quantize_llama_params


def metrics(ref, got):
    agree = float(np.mean(ref.argmax(-1) == got.argmax(-1)))
    dl = float(np.mean(np.abs(ref - got)))
    return agree, dl


def main():
    cfg = B.bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
    tc = cfg.text_config
    print("[int4q] init bench params on device", file=sys.stderr, flush=True)
    params = jax.jit(lambda k: init_vlm_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    ids, raw, s = B.make_inputs(cfg)
    from llama32mm_tpu.preprocess.image import preprocess_image_device

    px = jax.jit(
        lambda r: preprocess_image_device(r, cfg.vision_config.image_size, tc.jnp_dtype)
    )(raw)
    # teacher-forced positions: extend the prompt with random continuation
    ext = jax.random.randint(jax.random.PRNGKey(7), (1, B.QUALITY_SPAN + 1), 0, tc.vocab_size - 10)
    ext_ids = jnp.concatenate([ids, ext], axis=1)

    ref = B.teacher_forced_logits(params, cfg, ext_ids, px, B.QUALITY_SPAN)

    print("[int4q] calibrating activation stats (one forward)", file=sys.stderr, flush=True)
    stats = jax.jit(
        lambda p, i, x: calibrate_stats(p, cfg, i, x)
    )(params, ext_ids, px)

    variants = {
        "int8": dict(bits=8),
        "int4_g128": dict(bits=4, group_size=128),
        "int4_g64": dict(bits=4, group_size=64),
        "int4_g32": dict(bits=4, group_size=32),
        "int4_mixed_g64": dict(bits=4, group_size=64, recipe=INT4_MIXED_RECIPE),
        "int4_mixed_g32": dict(bits=4, group_size=32, recipe=INT4_MIXED_RECIPE),
        # isolate contributors: gate/up alone vs head alone at int4
        "int4_gateup_only_g64": dict(
            bits=8, group_size=64,
            recipe={**{k: 8 for k in INT4_MIXED_RECIPE}, "w_gate": 4, "w_up": 4},
        ),
        "int4_head_only_g64": dict(
            bits=8, group_size=64,
            recipe={**{k: 8 for k in INT4_MIXED_RECIPE}, "lm_head": 4},
        ),
    }

    def run_variant(name, src, kw):
        qp = quantize_llama_params(src, **kw)
        got = B.teacher_forced_logits(qp, cfg, ext_ids, px, B.QUALITY_SPAN)
        agree, dl = metrics(ref, got)
        print(json.dumps({
            "variant": name, "top1_agreement": round(agree, 4),
            "mean_abs_dlogit": round(dl, 3),
        }), flush=True)
        del qp, got

    for name, kw in variants.items():
        run_variant(name, params, kw)

    # activation-aware (AWQ-style fold, ops/awq.py) phase: the equalized tree
    # REPLACES the original (2 x 6.4 GB of bf16 weights don't fit next to the
    # eval state on a 16 GB chip)
    print("[int4q] equalizing (AWQ fold)", file=sys.stderr, flush=True)
    eq = jax.jit(lambda p, st: awq_equalize(p, st, alpha=0.5),
                 donate_argnums=(0,))(params, stats)
    del params
    jax.block_until_ready(eq)
    for name, kw in {
        "int4_g64_awq": dict(bits=4, group_size=64),
        "int4_mixed_g64_awq": dict(bits=4, group_size=64, recipe=INT4_MIXED_RECIPE),
    }.items():
        run_variant(name, eq, kw)


if __name__ == "__main__":
    main()
