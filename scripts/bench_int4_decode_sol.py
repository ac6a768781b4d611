"""Decode speed-of-light probe at the 11B north-star shapes in int4 serving
form: the exact per-step HBM traffic of the 11B int4+int8KV decode — the
stacked packed-nibble streams read through the engine's own Pallas kernels
(``int4_gemv_stacked_pallas`` for all 7 decoder weights, ``int4_gemv_pallas``
for the head — the in-VMEM nibble unpack is part of the access pattern, not
overhead) + fp32 per-group scales + int8 KV dots with per-position scales —
stripped of everything else: no norms/rope/softmax/cache writes/sampling/
while_loop bookkeeping.

Companion to scripts/bench_decode_sol_11b_int8.py. Two readings:
- ``sol_steps_per_sec`` vs the engine's ``m11b_int4_decode_tokens_per_sec``
  tells whether the engine loses anything ON TOP of the kernel (routing,
  x-plane prep composition, program overhead).
- ``effective_gbps`` vs the int8 probe's ~700 GB/s tells how much of the
  byte-stream ceiling the nibble-unpack itself forfeits (the VPU-bound
  question VERDICT r4 Weak #1 asks). scripts/bench_int4_unpack_ceiling.py
  breaks that number down further.

Run: python -u scripts/bench_int4_decode_sol.py [--json] [--variant post|w4a8]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import CACHE_LEN, int4_decode_step_bytes, random_int4_vlm_params
from llama32mm_tpu.configs import llama32_11b_vision_config
from llama32mm_tpu.ops.pallas.gemv import (
    int4_gemv_pallas,
    int4_gemv_stacked_pallas,
)

N_STEPS = 112
HEAD_BB = 8 * 1024 * 1024  # the engine's int4 lm_head route block size


def _arg(flag: str, default: str) -> str:
    if flag in sys.argv:
        return sys.argv[sys.argv.index(flag) + 1]
    return default


def main():
    variant = _arg("--variant", None)
    # experiment knobs (hypothesis probes, not engine settings): --group N
    # re-draws the random weights at a different quant group size (dot
    # granularity: group 128 → K=64 per-plane dots); --block N streams the
    # stacked weights in N-MB blocks instead of the engine's 8 MB default.
    group = int(_arg("--group", "0"))
    if group:
        import bench as _bench

        _bench.INT4_GROUP = group
    block_mb = int(_arg("--block", "0"))
    bb = block_mb * 1024 * 1024 if block_mb else None
    cfg = llama32_11b_vision_config(max_cache_length=CACHE_LEN)
    tc = cfg.text_config
    h, hd, nkv, L = tc.hidden_size, tc.head_dim, tc.n_kv_groups, tc.n_layers
    dt = tc.jnp_dtype

    # The bench's own int4 param builder (layer-unique packed bytes — no
    # buffer-dedup hazard; see random_int8_vlm_params docstring) so the
    # probe streams byte-identical weight state to bench_11b_int4.
    params = random_int4_vlm_params(cfg)
    blocks = params["language_model"]["model"]["blocks"]
    att, ff = blocks["att"], blocks["ff"]
    weights = [
        att["W_query"]["weight"], att["W_key"]["weight"],
        att["W_value"]["weight"], att["out_proj"]["weight"],
        ff["swiglu"]["w_gate"], ff["swiglu"]["w_up"], ff["w_down"]["weight"],
    ]
    head = params["language_model"]["lm_head"]["weight"]

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

    @jax.jit
    def sol(weights, head, kcache, vcache, kscale, vscale, x0):
        def step(x, _):
            def layer(x, xs):
                l, kc, vc, ks, vs = xs
                q = int4_gemv_stacked_pallas(x, weights[0]["q4"], weights[0]["scale"], l, variant=variant, block_bytes=bb)
                kk = int4_gemv_stacked_pallas(x, weights[1]["q4"], weights[1]["scale"], l, variant=variant, block_bytes=bb)
                vv = int4_gemv_stacked_pallas(x, weights[2]["q4"], weights[2]["scale"], l, variant=variant, block_bytes=bb)
                attn = jnp.einsum("bnsd,bd->bns", kc.astype(dt), q[:, :hd])
                attn = attn * ks.astype(dt)
                ctx = jnp.einsum("bns,bnsd->bd", attn * vs.astype(dt), vc.astype(dt))
                o = int4_gemv_stacked_pallas(q, weights[3]["q4"], weights[3]["scale"], l, variant=variant, block_bytes=bb)
                x = x + o * 1e-2 + jnp.sum(ctx) * 1e-6 + jnp.sum(kk + vv) * 1e-9
                g = int4_gemv_stacked_pallas(x, weights[4]["q4"], weights[4]["scale"], l, variant=variant, block_bytes=bb)
                u = int4_gemv_stacked_pallas(x, weights[5]["q4"], weights[5]["scale"], l, variant=variant, block_bytes=bb)
                d = int4_gemv_stacked_pallas(g * u, weights[6]["q4"], weights[6]["scale"], l, variant=variant, block_bytes=bb)
                return jnp.clip(x + d * 1e-2, -1.0, 1.0), None

            x, _ = jax.lax.scan(
                layer, x,
                (jnp.arange(L, dtype=jnp.int32), kcache, vcache, kscale, vscale),
            )
            logits = int4_gemv_pallas(x, head["q4"], head["scale"], block_bytes=HEAD_BB,
                                      variant=variant)
            return jnp.clip(x * 0.999 + logits[:, :h] * 1e-6, -1.0, 1.0), None

        x, _ = jax.lax.scan(step, x0, None, length=N_STEPS)
        return x

    x0 = jax.random.normal(jax.random.PRNGKey(99), (1, h), dt)
    args = (weights, head, kcache, vcache, kscale, vscale, x0)
    out = np.asarray(sol(*args))
    assert np.isfinite(out.astype(np.float32)).all()
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(sol(*args))
        ts.append(time.perf_counter() - t0)
    t = float(np.percentile(ts, 50))
    tok_s = N_STEPS / t
    bytes_per_step = int4_decode_step_bytes(params, cfg, CACHE_LEN)
    if "--json" in sys.argv:
        import json

        dev = jax.devices()[0]
        print(json.dumps({
            "sol_steps_per_sec": round(tok_s, 3),
            "variant": variant or "default",
            "group": group or 128,
            "block_mb": block_mb or 8,
            "effective_gbps": round(bytes_per_step * tok_s / 1e9, 1),
            "backend": jax.default_backend(),
            "device_kind": getattr(dev, "device_kind", "unknown").lower(),
        }))
    else:
        print(
            f"11B-int4 decode-SoL: {tok_s:.2f} steps/s  "
            f"({bytes_per_step * tok_s / 1e9:.1f} GB/s effective over "
            f"{bytes_per_step / 1e9:.2f} GB/step)"
        )


if __name__ == "__main__":
    main()
