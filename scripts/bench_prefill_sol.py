"""Stripped-GEMM prefill probe (VERDICT r3 #6) — and a measured NEGATIVE
result: the bare matmul sequence of the image-prefill TTFT path (ViT-H tower
GEMMs at [1600, 1280] + decoder prefill GEMMs at [s=1632, h] + attention
einsums + the 1-position lm_head, no norms/rope/masking/cache/sampling) runs
SLOWER than the full engine phases it strips (v5e, 3B: ViT 134 ms vs the
engine's 20.7 ms; decoder 90.3 ms vs ≈72 ms). Score-materializing attention
round-trips [N,N]/[s,s] blocks through HBM that the engine's flash kernel
never writes, and XLA fuses the real graph better than this skeleton — so
"stripped" is NOT a ceiling here. The ceiling argument for TTFT is the
FLOP/measured-peak accounting in docs/TTFT.md; this probe is kept because a
naive reviewer would reach for it and should see why it's wrong.

Companion to scripts/bench_decode_sol.py (bandwidth-bound decode, where the
stripped probe IS the right ceiling because decode is stream-bound).

Run: python -u scripts/bench_prefill_sol.py [--json] [--m11b]
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
    m11b = "--m11b" in sys.argv
    if m11b:
        from llama32mm_tpu.configs import llama32_11b_vision_config

        cfg = llama32_11b_vision_config()
    else:
        cfg = bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
    tc, vc = cfg.text_config, cfg.vision_config
    dt = tc.jnp_dtype
    k = jax.random.PRNGKey(0)

    def w(key, shape):
        return jax.random.normal(jax.random.fold_in(k, key), shape, dt) * 0.02

    def w8(key, shape):
        # int8 weights + per-channel fp32 scales — the engine's serving
        # format; the probe GEMM converts-into-dot exactly like XLA does.
        # int8 is sampled per-layer (randint's int32 sampling intermediate
        # at the full [L,h,out] 11B FFN stack is 9.4 GB — OOM on one chip).
        kk2 = jax.random.fold_in(k, key)
        n_chunks = shape[0] if len(shape) == 3 else 64
        chunk = (shape[0] // n_chunks,) + shape[1:] if len(shape) == 2 else shape[1:]

        @jax.jit
        def sample(keys):
            q = jax.lax.map(
                lambda kp: jax.random.randint(kp, chunk, -127, 128, dtype=jnp.int8),
                keys,
            )
            return q.reshape(shape)

        q = sample(jax.random.split(kk2, n_chunks))
        # per-channel scales; stacked weights [L, in, out] carry a per-layer
        # leading axis so the scan can unstack them alongside the weights
        sshape = (shape[0], shape[-1]) if len(shape) == 3 else shape[-1:]
        scale = jnp.full(sshape, 0.02 / 30, jnp.float32)
        return q, scale

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
            # head-major [h, N, d] layout so the attention einsums lower to
            # plain batched matmuls (the token-major "nhd,mhd->hnm" order
            # compiled to a 7×-slower transposing schedule on v5e)
            q = qkv[:, :d].reshape(N, vh, vhd).transpose(1, 0, 2)
            kk = qkv[:, d:2 * d].reshape(N, vh, vhd).transpose(1, 0, 2)
            vv = qkv[:, 2 * d:].reshape(N, vh, vhd).transpose(1, 0, 2)
            att = jnp.einsum("hnd,hmd->hnm", q, kk) * (vhd ** -0.5)
            ctx = jnp.einsum("hnm,hmd->hnd", att, vv).transpose(1, 0, 2).reshape(N, d)
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
    mk = w8 if m11b else w
    dec = {
        "wq": mk(10, (L, h, nq * hd)),
        "wk": mk(11, (L, h, nkv * hd)),
        "wv": mk(12, (L, h, nkv * hd)),
        "wo": mk(13, (L, nq * hd, h)),
        "wg": mk(14, (L, h, inter)),
        "wu": mk(15, (L, h, inter)),
        "wd": mk(16, (L, inter, h)),
    }
    head = mk(17, (h, V))

    def mat(x, wq):
        if m11b:  # convert-into-dot int8 dequant, exactly the serving GEMM
            q, scale = wq
            return (x @ q.astype(dt)) * scale.astype(dt)
        return x @ wq

    @jax.jit
    def dec_sol(dec, head, x):
        def layer(x, xs):
            wq, wk, wv, wo, wg, wu, wd = xs
            g = nq // nkv
            # head-major layouts (batched-matmul lowering, as above)
            q = mat(x, wq).reshape(s, nkv, g, hd).transpose(1, 2, 0, 3)
            kk = mat(x, wk).reshape(s, nkv, hd).transpose(1, 0, 2)
            vv = mat(x, wv).reshape(s, nkv, hd).transpose(1, 0, 2)
            att = jnp.einsum("kgsd,ktd->kgst", q, kk) * (hd ** -0.5)
            ctx = (
                jnp.einsum("kgst,ktd->kgsd", att, vv)
                .transpose(2, 0, 1, 3)
                .reshape(s, nq * hd)
            )
            x = x + mat(ctx, wo)
            x = x + mat(jnp.clip(mat(x, wg) * mat(x, wu), -3.0, 3.0), wd) * 1e-2
            return jnp.clip(x, -3.0, 3.0), None

        x, _ = jax.lax.scan(
            layer, x,
            (dec["wq"], dec["wk"], dec["wv"], dec["wo"], dec["wg"], dec["wu"], dec["wd"]),
        )
        return mat(x[-1:], head)  # lm_head at the sampled position only

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
