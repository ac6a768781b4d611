"""Prefill speed-of-light probe (VERDICT r3 #6): the exact matmul sequence of
the image-prefill TTFT path — ViT-H tower GEMMs at [1600, 1280] + decoder
prefill GEMMs at [s=1632, 3072] + causal attention einsums + the 1-position
lm_head — stripped of everything else (no norms/rope/softmax/masking/cache
writes/sampling). Prefill is compute-bound, so this measures the achievable
MXU floor for each TTFT phase on THIS chip (the nominal 197 bf16 TFLOP/s
never materializes at these batch-1 shapes; this probe gives the shape-true
ceiling the engine should be compared against).

Companion to scripts/bench_decode_sol.py (bandwidth-bound decode) — together
they give the ceiling argument for both north-star latency metrics.

Run: python -u scripts/bench_prefill_sol.py [--json]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import CACHE_LEN, PROMPT_TEXT_LEN, bench_config

REPS = 7


def _p50(f):
    f()  # compile + warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        f()
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50))


def main():
    cfg = bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
    tc, vc = cfg.text_config, cfg.vision_config
    dt = tc.jnp_dtype
    k = jax.random.PRNGKey(0)

    def w(key, shape):
        return jax.random.normal(jax.random.fold_in(k, key), shape, dt) * 0.02

    # ---- ViT tower: N=1600 patches through 32 layers of qkv/o + fc1/fc2 +
    # full (non-causal) attention einsums ----
    N, d, vi, vL, vh = vc.num_patches, vc.hidden_size, vc.intermediate_size, \
        vc.num_hidden_layers, vc.num_attention_heads
    vhd = d // vh
    vit = {
        "wqkv": w(0, (vL, d, 3 * d)),
        "wo": w(1, (vL, d, d)),
        "w1": w(2, (vL, d, vi)),
        "w2": w(3, (vL, vi, d)),
    }

    @jax.jit
    def vit_sol(vit, y):
        def layer(y, xs):
            wqkv, wo, w1, w2 = xs
            qkv = y @ wqkv  # [N, 3d]
            q = qkv[:, :d].reshape(N, vh, vhd)
            kk = qkv[:, d:2 * d].reshape(N, vh, vhd)
            vv = qkv[:, 2 * d:].reshape(N, vh, vhd)
            att = jnp.einsum("nhd,mhd->hnm", q, kk) * (vhd ** -0.5)
            ctx = jnp.einsum("hnm,mhd->nhd", att, vv).reshape(N, d)
            y = y + ctx @ wo
            y = y + jnp.maximum(y @ w1, 0) @ w2
            return jnp.clip(y, -3.0, 3.0), None

        y, _ = jax.lax.scan(layer, y, (vit["wqkv"], vit["wo"], vit["w1"], vit["w2"]))
        return y

    y0 = jax.random.normal(jax.random.fold_in(k, 90), (N, d), dt)
    t_vit = _p50(lambda: np.asarray(vit_sol(vit, y0)))

    # ---- decoder prefill: s tokens through 28 layers + 1-position lm_head ----
    s = tc.num_image_tokens + PROMPT_TEXT_LEN
    h, hd, nq, nkv, inter, L, V = (
        tc.hidden_size, tc.head_dim, tc.n_heads, tc.n_kv_groups, tc.hidden_dim,
        tc.n_layers, tc.vocab_size,
    )
    dec = {
        "wq": w(10, (L, h, nq * hd)),
        "wk": w(11, (L, h, nkv * hd)),
        "wv": w(12, (L, h, nkv * hd)),
        "wo": w(13, (L, nq * hd, h)),
        "wg": w(14, (L, h, inter)),
        "wu": w(15, (L, h, inter)),
        "wd": w(16, (L, inter, h)),
    }
    head = w(17, (h, V))

    @jax.jit
    def dec_sol(dec, head, x):
        def layer(x, xs):
            wq, wk, wv, wo, wg, wu, wd = xs
            q = (x @ wq).reshape(s, nq, hd)
            kk = (x @ wk).reshape(s, nkv, hd)
            vv = (x @ wv).reshape(s, nkv, hd)
            g = nq // nkv
            qg = q.reshape(s, nkv, g, hd)
            att = jnp.einsum("skgd,tkd->kgst", qg, kk) * (hd ** -0.5)
            ctx = jnp.einsum("kgst,tkd->skgd", att, vv).reshape(s, nq * hd)
            x = x + ctx @ wo
            x = x + ((x @ wg) * (x @ wu)) @ wd * 1e-2
            return jnp.clip(x, -3.0, 3.0), None

        x, _ = jax.lax.scan(
            layer, x,
            (dec["wq"], dec["wk"], dec["wv"], dec["wo"], dec["wg"], dec["wu"], dec["wd"]),
        )
        return x[-1:] @ head  # lm_head at the sampled position only

    x0 = jax.random.normal(jax.random.fold_in(k, 91), (s, h), dt)
    t_dec = _p50(lambda: np.asarray(dec_sol(dec, head, x0)))

    # achieved TFLOP/s per phase (attention NOT causal-halved in the decoder
    # probe's einsum — it computes the full [s, s] score matrix like the
    # engine's flash kernel does per-block before skipping, so count it full)
    vit_flops = vL * (2 * N * d * 3 * d + 2 * N * d * d + 4 * N * d * vi
                      + 4 * N * N * d)
    dec_flops = L * (2 * s * h * (nq + 2 * nkv) * hd + 2 * s * nq * hd * h
                     + 6 * s * h * inter + 4 * s * s * nq * hd) + 2 * h * V

    rec = {
        "vit_sol_ms": round(t_vit * 1e3, 1),
        "vit_sol_tflops": round(vit_flops / t_vit / 1e12, 1),
        "decoder_prefill_sol_ms": round(t_dec * 1e3, 1),
        "decoder_prefill_sol_tflops": round(dec_flops / t_dec / 1e12, 1),
        "prompt_len": s,
        "backend": jax.default_backend(),
        "device_kind": getattr(jax.devices()[0], "device_kind", "unknown").lower(),
    }
    if "--json" in sys.argv:
        import json

        print(json.dumps(rec))
    else:
        for kk_, vv_ in rec.items():
            print(f"{kk_}: {vv_}")


if __name__ == "__main__":
    main()
