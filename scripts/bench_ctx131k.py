"""Decode at the DECLARED context length: 64k and 131,072 tokens on one chip.

The reference declares ``context_length=131072`` (``Model/model.py:37``) but
materializes [T, T] scores and concat-grows its cache — it cannot run any of
it. This probe demonstrates the full declared context on the real chip at 3B
shapes (int8 weights + int8 KV — 131k bf16 KV alone is 15 GB and cannot fit
next to weights on a 16 GB v5e), extending docs/serving.md's 16k/32k table:

  1. the prompt prefills in 8192-token chunks through the flash kernel at
     ``q_offset`` (the server's chunked-admission pattern — one monolithic
     131k prefill would put ~3 GB of per-layer activations next to 12+ GB of
     weights+KV);
  2. decode steps run at full cache depth (structured mask over the whole
     131k window), timed warm via a scanned 32-step program.

Run: python -u scripts/bench_ctx131k.py [--ctx 16384,65536,131072] [--model 3b]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from llama32mm_tpu.models.language import causal_lm_forward, init_causal_lm_params, lm_head_apply, llama_forward
from llama32mm_tpu.ops.attention import AttnMask
from llama32mm_tpu.ops.quant import quantize_llama_params
from llama32mm_tpu.utils.kvcache import init_kv_cache

CHUNK = 8192
DECODE_STEPS = 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", default="16384,65536,131072")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chunk", type=int, default=CHUNK)
    ap.add_argument("--tiny", action="store_true", help="tiny config (CPU smoke)")
    args = ap.parse_args()
    ctxs = [int(c) for c in args.ctx.split(",")]
    chunk_len = args.chunk

    from bench import bench_config

    if args.tiny:
        from llama32mm_tpu.configs import LLAMA32Config

        tc = LLAMA32Config(vocab_size=512, hidden_size=128, n_heads=4, n_layers=2,
                           hidden_dim=256, n_kv_groups=2, dtype="float32")
    else:
        cfg = bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
        tc = cfg.text_config

    print("[ctx131k] drawing int8 3B text params directly on device", flush=True)
    # weights are random either way — draw int8 directly (bench.py's
    # random_int8_vlm_params technique): no bf16 original ever exists, so no
    # 6.5 GB transient and no fragmentation blocking the 3.8 GB cache arrays
    L, h, inter = tc.n_layers, tc.hidden_size, tc.hidden_dim
    nqh, nkvh = tc.n_heads * tc.head_dim, tc.n_kv_groups * tc.head_dim

    def qleaf(key, shape, out_dim):
        q = jax.random.randint(key, shape, -127, 128, jnp.int32).astype(jnp.int8)
        return {"q": q, "scale": jnp.full(shape[:-2] + (out_dim,), 0.01, jnp.float32)}

    @jax.jit
    def build(key):
        ks = jax.random.split(key, 10)
        emb = (jax.random.normal(ks[0], (tc.vocab_size, h), jnp.float32) * 0.02).astype(tc.jnp_dtype)
        return {
            "model": {
                "tok_emb": {"weight": emb},
                "blocks": {
                    "norm1": {"weight": jnp.ones((L, h), tc.jnp_dtype)},
                    "norm2": {"weight": jnp.ones((L, h), tc.jnp_dtype)},
                    "att": {
                        "W_query": {"weight": qleaf(ks[1], (L, h, nqh), nqh)},
                        "W_key": {"weight": qleaf(ks[2], (L, h, nkvh), nkvh)},
                        "W_value": {"weight": qleaf(ks[3], (L, h, nkvh), nkvh)},
                        "out_proj": {"weight": qleaf(ks[4], (L, nqh, h), h)},
                    },
                    "ff": {
                        "swiglu": {
                            "w_gate": qleaf(ks[5], (L, h, inter), inter),
                            "w_up": qleaf(ks[6], (L, h, inter), inter),
                        },
                        "w_down": {"weight": qleaf(ks[7], (L, inter, h), h)},
                    },
                },
                "final_norm": {"weight": jnp.ones((h,), tc.jnp_dtype)},
            },
            "lm_head": {"weight": qleaf(ks[8], (h, tc.vocab_size), tc.vocab_size)},
        }

    qparams = build(jax.random.PRNGKey(0))
    jax.block_until_ready(qparams)

    routes = {"lm_head": 8 * 1024 * 1024} if jax.default_backend() == "tpu" else None

    for S in ctxs:
        cache_len = S + DECODE_STEPS + 8
        n_chunks = -(-S // chunk_len)

        donate = (1,) if jax.default_backend() == "tpu" else ()

        @functools.partial(jax.jit, donate_argnums=donate)
        def prefill_chunk(qparams, cache, ids_chunk, pos):
            # kv valid: everything below pos + this chunk (built causally by
            # the flash kernel's q_offset)
            kvv = (jnp.arange(cache_len)[None, :] < pos + ids_chunk.shape[1]).astype(jnp.int32)
            mask = AttnMask(kv_valid=kvv, q_offset=pos)
            out = llama_forward(
                qparams["model"], tc, input_ids=ids_chunk,
                attention_mask=mask, kv_cache=cache._replace(pos=pos),
            )
            return out.kv_cache, out.hidden_states[:, -1:]

        @functools.partial(jax.jit, donate_argnums=donate)
        def decode_steps(qparams, cache, last, pos0):
            def one(carry, i):
                cache, last = carry
                pos = pos0 + i
                kvv = (jnp.arange(cache_len)[None, :] < pos + 1).astype(jnp.int32)
                mask = AttnMask(kv_valid=kvv, q_offset=pos)
                logits, cache = causal_lm_forward(
                    qparams, tc, input_ids=last,
                    attention_mask=mask, position_ids=pos[None, None] * 1,
                    kv_cache=cache._replace(pos=pos),
                    gemv_routes=routes,
                )
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
                return (cache, nxt), nxt

            (cache, last), toks = jax.lax.scan(
                one, (cache, last), jnp.arange(DECODE_STEPS, dtype=jnp.int32)
            )
            return cache, last, toks

        ids = jax.random.randint(jax.random.PRNGKey(1), (1, S), 0, tc.vocab_size - 10)
        cache = init_kv_cache(tc, 1, max_length=cache_len, dtype=jnp.int8)

        t0 = time.perf_counter()
        h_last = None
        for c in range(n_chunks):
            chunk = jax.lax.dynamic_slice(ids, (0, c * chunk_len), (1, min(chunk_len, S - c * chunk_len)))
            cache, h_last = prefill_chunk(qparams, cache, chunk, jnp.asarray(c * chunk_len, jnp.int32))
            # per-chunk barrier (np.asarray of a small output): (a) on the
            # tunneled backend block_until_ready can return before a program's
            # outputs exist; (b) letting all 16 chunk executions enqueue
            # async stacks ~0.8 GB of XLA temps PER QUEUED EXECUTION next to
            # the 12 GB working set -> ResourceExhausted at 131k
            np.asarray(h_last)
        t_prefill = time.perf_counter() - t0

        logits0 = lm_head_apply(qparams, tc, h_last)
        first = jnp.argmax(logits0[:, -1], axis=-1).astype(jnp.int32)[:, None]

        # warm decode program, then time it
        pos0 = jnp.asarray(S, jnp.int32)
        cache, _l, toks = decode_steps(qparams, cache, first, pos0)
        np.asarray(toks)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            cache, _l, toks = decode_steps(qparams, cache, first, pos0)
            np.asarray(toks)  # host transfer = real completion barrier
            ts.append((time.perf_counter() - t0) / DECODE_STEPS)
        del cache, _l, toks
        sec = float(np.median(ts))

        try:
            import jax.extend.backend as _b
            stats = jax.devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use", 0) / 1e9
        except Exception:
            peak = 0.0
        print(json.dumps({
            "ctx": S, "model": "3b-int8w-int8kv",
            "prefill_s": round(t_prefill, 1),
            "decode_tok_s": round(1.0 / sec, 2),
            "decode_ms_per_tok": round(sec * 1e3, 2),
            "chip_peak_gb": round(peak, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
