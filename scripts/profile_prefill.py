"""Split TTFT into phases on the real chip by differencing engine-level
programs (a lax.scan over N whole-tower iterations takes >20 min in the
remote compile service — engine-style programs compile in minutes):

- A: generate(max_new=1) with image           = preprocess+ViT+proj+prefill+lm1
- B: generate(max_new=1) without image        = prefill+lm1
- A - B ≈ vision tower + projector.
- C: full generate(max_new=64): decode steady state.

Timing: p50 of repeats, device→host fetch as the sync point (block_until_ready
can return early through the axon tunnel).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/profile_prefill.py
"""

from __future__ import annotations

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
    cfg = bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
    tc = cfg.text_config
    params = jax.device_put(init_vlm_params(jax.random.PRNGKey(0), cfg))
    engine = InferenceEngine(params, cfg, max_cache_length=CACHE_LEN)

    n_img = tc.num_image_tokens
    s = n_img + PROMPT_TEXT_LEN
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, s), 0, tc.vocab_size - 10)
    ids_img = ids.at[:, :n_img].set(cfg.image_token_index)
    raw = jax.random.randint(
        jax.random.PRNGKey(2), (1, 560, 560, 3), 0, 255, jnp.int32
    ).astype(jnp.uint8)

    pre = jax.jit(lambda r: preprocess_image_device(r, 560, tc.jnp_dtype))

    def gen(use_img, max_new):
        px = pre(raw) if use_img else None
        r = engine.generate(
            ids_img if use_img else ids, px, max_new_tokens=max_new,
            temperature=0.0, eos_token_id=-1, rng=jax.random.PRNGKey(0),
        )
        np.asarray(r.tokens)

    t_img1 = p50(lambda: gen(True, 1))
    print(f"A: image prefill TTFT      {t_img1 * 1e3:8.1f} ms", flush=True)
    t_txt1 = p50(lambda: gen(False, 1))
    print(f"B: text-only prefill       {t_txt1 * 1e3:8.1f} ms", flush=True)
    print(f"A-B: vision tower+proj     {(t_img1 - t_txt1) * 1e3:8.1f} ms", flush=True)

    t_full = p50(lambda: gen(True, 64))
    per_tok = (t_full - t_img1) / 63
    print(f"C: decode                  {per_tok * 1e3:8.2f} ms/tok ({1 / per_tok:.1f} tok/s)", flush=True)

    # compute-bound estimates (v5e ≈ 197 bf16 TFLOP/s dense)
    vit_flops = 32 * (4 * 1600 * 1280**2 + 4 * 1600**2 * 1280 + 4 * 1600 * 1280 * 5120) * 2 / 2
    text_params = tc.n_layers * (
        tc.hidden_size * (tc.n_heads + 2 * tc.n_kv_groups) * tc.head_dim
        + tc.n_heads * tc.head_dim * tc.hidden_size
        + 3 * tc.hidden_size * tc.hidden_dim
    )
    pre_flops = 2 * s * text_params
    print(
        f"\ncompute-bound @197T: vit ≈ {vit_flops / 197e12 * 1e3:.1f} ms, "
        f"decoder prefill ≈ {pre_flops / 197e12 * 1e3:.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
