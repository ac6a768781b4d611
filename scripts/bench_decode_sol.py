"""Decode speed-of-light probe: the exact per-step HBM traffic of the bench
decode (stacked decoder gemvs + lm_head + KV read), stripped of everything
else (no norms/rope/softmax/cache writes/sampling/while_loop bookkeeping).

This is the achievable ceiling for the decode's *access pattern* on this
chip — tighter than both the nominal 819 GB/s roofline and the 610 GB/s
single-stream reduce (scripts/bench_hbm_peak.py), because interleaved gemv
weight streams prefetch differently than one giant reduction.

Run: python -u scripts/bench_decode_sol.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import CACHE_LEN, MAX_NEW, PROMPT_TEXT_LEN, bench_config, decode_step_bytes

N_STEPS = 112  # same window as the bench decode measurement


def main():
    cfg = bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
    tc = cfg.text_config
    h, hd, nq, nkv, inter, L, V = (
        tc.hidden_size, tc.head_dim, tc.n_heads, tc.n_kv_groups, tc.hidden_dim,
        tc.n_layers, tc.vocab_size,
    )
    dt = tc.jnp_dtype
    k = jax.random.PRNGKey(0)

    def w(key, shape):
        return jax.random.normal(jax.random.fold_in(k, key), shape, dt) * 0.02

    weights = {
        "wq": w(0, (L, h, nq * hd)),
        "wk": w(1, (L, h, nkv * hd)),
        "wv": w(2, (L, h, nkv * hd)),
        "wo": w(3, (L, nq * hd, h)),
        "wg": w(4, (L, h, inter)),
        "wu": w(5, (L, h, inter)),
        "wd": w(6, (L, inter, h)),
    }
    head = w(7, (h, V))
    kcache = w(8, (L, 1, nkv, CACHE_LEN, hd))
    vcache = w(9, (L, 1, nkv, CACHE_LEN, hd))

    @jax.jit
    def sol(weights, head, kcache, vcache, x0):
        def step(x, _):
            def layer(x, xs):
                wq, wk, wv, wo, wg, wu, wd, kc, vc = xs
                q = x @ wq  # [1, nq*hd]
                kk = x @ wk
                vv = x @ wv
                # touch every KV byte the way attention does (dot over slots)
                att = jnp.einsum("bnsd,bd->bns", kc, q[:, :hd])
                ctx = jnp.einsum("bns,bnsd->bd", att, vc)  # [1, hd]
                x = x + (q @ wo) * 1e-2 + jnp.sum(ctx) * 1e-6 + jnp.sum(kk + vv) * 1e-9
                x = x + ((x @ wg) * (x @ wu)) @ wd * 1e-2
                return jnp.clip(x, -1.0, 1.0), None

            x, _ = jax.lax.scan(
                layer, x,
                (weights["wq"], weights["wk"], weights["wv"], weights["wo"],
                 weights["wg"], weights["wu"], weights["wd"], kcache, vcache),
            )
            logits = x @ head
            # fold the step output back so nothing is dead-code eliminated
            return jnp.clip(x * 0.999 + logits[:, :h] * 1e-6, -1.0, 1.0), None

        x, _ = jax.lax.scan(step, x0, None, length=N_STEPS)
        return x

    x0 = jax.random.normal(jax.random.fold_in(k, 99), (1, h), dt)
    out = np.asarray(sol(weights, head, kcache, vcache, x0))
    assert np.isfinite(out.astype(np.float32)).all()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(sol(weights, head, kcache, vcache, x0))
        ts.append(time.perf_counter() - t0)
    t = float(np.percentile(ts, 50))
    tok_s = N_STEPS / t
    bytes_per_step = decode_step_bytes(cfg, CACHE_LEN)  # probe touches full cache
    if "--json" in sys.argv:
        import json

        dev = jax.devices()[0]
        print(json.dumps({
            "sol_steps_per_sec": round(tok_s, 3),
            "effective_gbps": round(bytes_per_step * tok_s / 1e9, 1),
            "backend": jax.default_backend(),
            "device_kind": getattr(dev, "device_kind", "unknown").lower(),
        }))
    else:
        print(
            f"decode-SoL: {tok_s:.2f} steps/s  ({bytes_per_step * tok_s / 1e9:.1f} GB/s "
            f"effective over {bytes_per_step/1e9:.2f} GB/step)"
        )


if __name__ == "__main__":
    main()
