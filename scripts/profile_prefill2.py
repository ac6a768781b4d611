"""Bisect the decoder-prefill MFU gap (measured 138 ms vs ~47 ms compute
bound at 1632 tokens): compile variant programs and time each.

Variants:
  full/pallas    llama_forward, impl auto (pallas kernels), with cache
  full/xla       llama_forward, impl xla, with cache
  nocache        llama_forward, impl auto, kv_cache=None
  ffn-tower      scan over 28 layers of ONLY rmsnorm+swiglu+down
  attn-tower     scan over 28 layers of ONLY rmsnorm+qkv+flash+out (no cache)

Run: PYTHONPATH=/root/repo:$PYTHONPATH python -u scripts/profile_prefill2.py
(no output piping through grep — it block-buffers.)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import CACHE_LEN, PROMPT_TEXT_LEN, bench_config
from llama32mm_tpu.inference.engine import structured_prefill_mask
from llama32mm_tpu.models.language import llama_forward
from llama32mm_tpu.models.vlm import init_vlm_params
from llama32mm_tpu.ops.attention import gqa_attention
from llama32mm_tpu.ops.rmsnorm import fused_add_rmsnorm
from llama32mm_tpu.ops.swiglu import fused_swiglu
from llama32mm_tpu.utils.kvcache import init_kv_cache

REPS = 5


def p50(f):
    f()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50)) * 1e3


def main():
    cfg = bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
    tc = cfg.text_config
    params = jax.device_put(init_vlm_params(jax.random.PRNGKey(0), cfg))
    lm = params["language_model"]["model"]

    s = tc.num_image_tokens + PROMPT_TEXT_LEN
    embeds = jax.random.normal(jax.random.PRNGKey(1), (1, s, tc.hidden_size), tc.jnp_dtype)
    padding = jnp.ones((1, s), jnp.int32)
    mask = structured_prefill_mask(padding, CACHE_LEN)

    def forward(impl, with_cache):
        # params as jit ARGUMENTS: captured device trees are serialized as
        # constants through the remote-compile tunnel (5.6 GB per program).
        @jax.jit
        def run(lm, embeds):
            cache = (
                init_kv_cache(tc, 1, max_length=CACHE_LEN, dtype=tc.jnp_dtype)
                if with_cache
                else None
            )
            out = llama_forward(
                lm, tc, input_embeds=embeds, attention_mask=mask,
                kv_cache=cache, impl=impl,
            )
            return out.hidden_states[:, -1]

        return lambda: np.asarray(run(lm, embeds))

    import sys
    only = sys.argv[1] if len(sys.argv) > 1 else "all"
    if only in ("all", "full"):
        print(f"full/pallas+cache   {p50(forward('pallas', True)):8.1f} ms", flush=True)
        print(f"full/xla+cache      {p50(forward('xla', True)):8.1f} ms", flush=True)
        print(f"full/pallas nocache {p50(forward('pallas', False)):8.1f} ms", flush=True)

    blocks = lm["blocks"]

    def ffn_tower(impl):
        @jax.jit
        def run(blocks, x):
            def layer(h, lp):
                normed = fused_add_rmsnorm(h, lp["norm2"]["weight"], eps=tc.rms_norm_eps, impl=impl)
                y = fused_swiglu(
                    normed, lp["ff"]["swiglu"]["w_gate"], lp["ff"]["swiglu"]["w_up"], impl=impl
                )
                return h + jnp.matmul(y, lp["ff"]["w_down"]["weight"]), None

            h, _ = jax.lax.scan(layer, x, blocks)
            return h[:, -1]

        return lambda: np.asarray(run(blocks, embeds))

    if only in ("all", "ffn"):
        print(f"ffn-tower/pallas    {p50(ffn_tower('pallas')):8.1f} ms", flush=True)
        print(f"ffn-tower/xla       {p50(ffn_tower('xla')):8.1f} ms", flush=True)

    def attn_tower(impl):
        nq, nkv, hd = tc.n_heads, tc.n_kv_groups, tc.head_dim

        @jax.jit
        def run(blocks, x):
            def layer(h, lp):
                normed = fused_add_rmsnorm(h, lp["norm1"]["weight"], eps=tc.rms_norm_eps, impl=impl)
                b, t, _ = normed.shape
                q = jnp.matmul(normed, lp["att"]["W_query"]["weight"]).reshape(b, t, nq, hd).transpose(0, 2, 1, 3)
                k = jnp.matmul(normed, lp["att"]["W_key"]["weight"]).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
                v = jnp.matmul(normed, lp["att"]["W_value"]["weight"]).reshape(b, t, nkv, hd).transpose(0, 2, 1, 3)
                ctx = gqa_attention(q, k, v, structured=mask._replace(kv_valid=mask.kv_valid[:, :t]), impl=impl)
                ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, nq * hd)
                return h + jnp.matmul(ctx, lp["att"]["out_proj"]["weight"]), None

            h, _ = jax.lax.scan(layer, x, blocks)
            return h[:, -1]

        return lambda: np.asarray(run(blocks, embeds))

    if only in ("all", "attn"):
        print(f"attn-tower/pallas   {p50(attn_tower('pallas')):8.1f} ms", flush=True)
        print(f"attn-tower/xla      {p50(attn_tower('xla')):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
