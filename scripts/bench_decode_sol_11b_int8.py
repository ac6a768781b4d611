"""Decode speed-of-light probe at the 11B north-star shapes in int8 serving
form: the exact per-step HBM traffic of the 11B int8+int8KV decode (int8
decoder gemvs dequantized through XLA's convert-into-dot fusion, fp32
per-channel scales, int8 KV + per-position fp32 scales, int8 lm_head),
stripped of everything else — no norms/rope/softmax/cache writes/sampling/
while_loop bookkeeping.

Companion to scripts/bench_decode_sol.py (3B bf16): tells whether the 11B
int8 engine rate (m11b_int8_* in bench.py) is software overhead or the
chip's achievable stream rate for int8-gemv-shaped traffic.

Run: python -u scripts/bench_decode_sol_11b_int8.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import CACHE_LEN, decode_step_bytes
from llama32mm_tpu.configs import llama32_11b_vision_config

N_STEPS = 112


def main():
    cfg = llama32_11b_vision_config(max_cache_length=CACHE_LEN)
    tc = cfg.text_config
    h, hd, nq, nkv, inter, L, V = (
        tc.hidden_size, tc.head_dim, tc.n_heads, tc.n_kv_groups, tc.hidden_dim,
        tc.n_layers, tc.vocab_size,
    )
    dt = tc.jnp_dtype
    k = jax.random.PRNGKey(0)

    def q8(key, shape):
        # int8 iota (fused, no wide intermediate — random bits would stage a
        # 4x uint32 buffer and OOM the 16 GB chip); values are irrelevant to
        # a bandwidth probe. A per-layer iota offset along axis 0 keeps the
        # L layer slices byte-distinct — identical slices can be aliased /
        # deduped by the runtime, overstating the roofline this probe is
        # meant to establish (bench.py::random_int8_vlm_params measured
        # identical-buffer decode 23% above the physical HBM ceiling).
        w = jax.jit(
            lambda: (
                jax.lax.broadcasted_iota(jnp.int8, shape, len(shape) - 1)
                + jax.lax.broadcasted_iota(jnp.int8, shape, 0)
            )
        )()
        scale = jnp.full(shape[:1] + shape[-1:] if len(shape) == 3 else shape[-1:],
                         1e-2, jnp.float32)
        return w, scale

    weights = {
        name: q8(i, (L, h_in, h_out))
        for i, (name, h_in, h_out) in enumerate([
            ("wq", h, nq * hd), ("wk", h, nkv * hd), ("wv", h, nkv * hd),
            ("wo", nq * hd, h), ("wg", h, inter), ("wu", h, inter),
            ("wd", inter, h),
        ])
    }
    head_q, head_s = q8(7, (h, V))
    head_s = jnp.full((V,), 1e-2, jnp.float32)
    cache_shape = (L, 1, nkv, CACHE_LEN, hd)
    kcache = jax.jit(lambda: (
        jax.lax.broadcasted_iota(jnp.int8, cache_shape, 3)
        + jax.lax.broadcasted_iota(jnp.int8, cache_shape, 0)
    ))()
    vcache = jax.jit(lambda: (
        jax.lax.broadcasted_iota(jnp.int8, cache_shape, 4)
        + jax.lax.broadcasted_iota(jnp.int8, cache_shape, 0)
    ))()
    kscale = jnp.full((L, 1, nkv, CACHE_LEN), 1e-2, jnp.float32)
    vscale = jnp.full((L, 1, nkv, CACHE_LEN), 1e-2, jnp.float32)

    def qmm(x, wq, ws):
        # the engine's int8 route: convert-into-dot, per-out-channel scale
        return (x @ wq.astype(dt)) * ws.astype(dt)

    @jax.jit
    def sol(weights, head_q, head_s, kcache, vcache, kscale, vscale, x0):
        def step(x, _):
            def layer(x, xs):
                (wq, sq), (wk, sk), (wv, sv), (wo, so), (wg, sg), (wu, su), (wd, sd), \
                    kc, vc, ks, vs = xs
                q = qmm(x, wq, sq)
                kk = qmm(x, wk, sk)
                vv = qmm(x, wv, sv)
                att = jnp.einsum("bnsd,bd->bns", kc.astype(dt), q[:, :hd])
                att = att * ks.astype(dt)
                ctx = jnp.einsum("bns,bnsd->bd", att * vs.astype(dt), vc.astype(dt))
                x = x + qmm(q, wo, so) * 1e-2 + jnp.sum(ctx) * 1e-6 + jnp.sum(kk + vv) * 1e-9
                x = x + qmm(qmm(x, wg, sg) * qmm(x, wu, su), wd, sd) * 1e-2
                return jnp.clip(x, -1.0, 1.0), None

            x, _ = jax.lax.scan(
                layer, x,
                (weights["wq"], weights["wk"], weights["wv"], weights["wo"],
                 weights["wg"], weights["wu"], weights["wd"],
                 kcache, vcache, kscale, vscale),
            )
            logits = (x @ head_q.astype(dt)) * head_s.astype(dt)
            return jnp.clip(x * 0.999 + logits[:, :h] * 1e-6, -1.0, 1.0), None

        x, _ = jax.lax.scan(step, x0, None, length=N_STEPS)
        return x

    x0 = jax.random.normal(jax.random.fold_in(k, 99), (1, h), dt)
    args = (weights, head_q, head_s, kcache, vcache, kscale, vscale, x0)
    out = np.asarray(sol(*args))
    assert np.isfinite(out.astype(np.float32)).all()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(sol(*args))
        ts.append(time.perf_counter() - t0)
    t = float(np.percentile(ts, 50))
    tok_s = N_STEPS / t
    bytes_per_step = decode_step_bytes(cfg, CACHE_LEN, weight_bytes=1, kv_bytes=1,
                                       head_bytes=1)
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
            f"11B-int8 decode-SoL: {tok_s:.2f} steps/s  "
            f"({bytes_per_step * tok_s / 1e9:.1f} GB/s effective over "
            f"{bytes_per_step / 1e9:.2f} GB/step)"
        )


if __name__ == "__main__":
    main()
