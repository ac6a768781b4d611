"""Split TTFT into phases on the real chip: ViT tower, decoder prefill,
lm_head, and one decode step — each timed as a lax.scan of N iterations inside
ONE jit (per-call dispatch through the axon tunnel costs ~100s of ms, and
block_until_ready can return early; a device→host fetch is the sync point).

Usage: python scripts/profile_prefill.py [N_ITERS]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import bench_config, PROMPT_TEXT_LEN, CACHE_LEN
from llama32mm_tpu.inference.engine import structured_prefill_mask
from llama32mm_tpu.models.language import llama_forward, lm_head_apply
from llama32mm_tpu.models.vlm import encode_image, init_vlm_params
from llama32mm_tpu.utils.kvcache import init_kv_cache

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def timed(name, fn, *args):
    out = fn(*args)  # compile
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / N
    print(f"{name:26s} {dt * 1e3:8.2f} ms/iter")
    return dt


def scanned(f):
    """f(x) -> array; returns jit'd N-iteration scan with a data dependency."""

    @jax.jit
    def run(x):
        def body(c, _):
            y = f(x + c.astype(x.dtype) * 0)  # fold carry in: no CSE across iters
            return jnp.sum(y).astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return c

    return run


def main():
    cfg = bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
    tc = cfg.text_config
    params = jax.device_put(init_vlm_params(jax.random.PRNGKey(0), cfg))

    n_img = tc.num_image_tokens
    s = n_img + PROMPT_TEXT_LEN
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, s), 0, tc.vocab_size - 10)
    px = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 560, 560), tc.jnp_dtype)
    padding = jnp.ones((1, s), jnp.int32)

    # Phase 1: vision tower + projector
    t_vit = timed("vision+projector", scanned(lambda x: encode_image(params, cfg, x)), px)

    # Phase 2: decoder prefill (embeds precomputed, fresh cache per iter)
    embeds = params["language_model"]["model"]["tok_emb"]["weight"][ids].astype(tc.jnp_dtype)
    mask = structured_prefill_mask(padding, CACHE_LEN)

    @jax.jit
    def prefill_loop(embeds):
        def body(c, _):
            cache = init_kv_cache(tc, 1, max_length=CACHE_LEN, dtype=tc.jnp_dtype)
            out = llama_forward(
                params["language_model"]["model"], tc,
                input_embeds=embeds + c.astype(embeds.dtype) * 0,
                attention_mask=mask, kv_cache=cache,
            )
            return jnp.sum(out.hidden_states[:, -1]).astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return c

    t_pre = timed("decoder prefill", prefill_loop, embeds)

    # Phase 3: lm_head over ONE position vs all positions
    h1 = jax.random.normal(jax.random.PRNGKey(3), (1, 1, tc.hidden_size), tc.jnp_dtype)
    hS = jax.random.normal(jax.random.PRNGKey(4), (1, s, tc.hidden_size), tc.jnp_dtype)
    t_lm1 = timed("lm_head [1 pos]", scanned(lambda x: lm_head_apply(params["language_model"], tc, x)), h1)
    t_lmS = timed(f"lm_head [{s} pos]", scanned(lambda x: lm_head_apply(params["language_model"], tc, x)), hS)

    print(
        f"\nsum(vit + prefill + lm1) = {(t_vit + t_pre + t_lm1) * 1e3:.1f} ms "
        f"(full-logits prefill would add {(t_lmS - t_lm1) * 1e3:.1f} ms)"
    )


if __name__ == "__main__":
    main()
