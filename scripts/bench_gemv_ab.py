"""Per-shape decode gemv A/B: XLA vs the large-block Pallas gemv kernel.

Mirrors the engine's structure exactly — the weight is a stacked [L, K, N]
array sliced by ``lax.scan`` (as models/language.py's layer scan does), the
gemv runs once per layer per pass — so per-call overheads, scan slicing, and
block-pipelining all show up as they would in the real decode step. Sweeps
the Pallas block size per shape. Shapes: every decoder matmul of the 3B
bench config + lm_head, plus the 11B int8 set.

Run: python -u scripts/bench_gemv_ab.py [--model 3b|11b-int8]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from llama32mm_tpu.ops.pallas.gemv import (
    gemv_pallas,
    gemv_stacked_pallas,
    int8_gemv_pallas,
    int8_gemv_stacked_pallas,
)

PASSES = 24


def build_stack(key, L, K, N, dtype):
    def draw(k):
        return jax.random.uniform(k, (K, N), jnp.float32, -0.02, 0.02).astype(dtype)

    if dtype == jnp.int8:
        def draw(k):  # noqa: F811
            return jax.random.randint(k, (K, N), -127, 128, jnp.int32).astype(jnp.int8)

    w = jax.jit(lambda kk: jax.lax.map(draw, jax.random.split(kk, L)))(key)
    jax.block_until_ready(w)
    return w


def timeit(make_run, iters=PASSES):
    short = max(1, iters // 4)
    run_l, run_s = make_run(iters), make_run(short)
    run_l(); run_s()
    tl, ts_ = [], []
    for _ in range(3):
        t0 = time.perf_counter(); run_s(); ts_.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run_l(); tl.append(time.perf_counter() - t0)
    return (float(np.percentile(tl, 50)) - float(np.percentile(ts_, 50))) / (iters - short)


def bench_shape(name, L, K, N, rows, dtype, blocks):
    """One stacked weight: scan over L slices, gemv each, fold into carry."""
    w = build_stack(jax.random.PRNGKey(hash(name) % (1 << 31)), L, K, N, dtype)
    scale = jnp.full((L, N), 0.01, jnp.float32) if dtype == jnp.int8 else None
    xdt = jnp.bfloat16
    x = jnp.full((rows, K), 0.5, xdt)
    gb = L * K * N * (1 if dtype == jnp.int8 else 2) / 1e9
    if dtype == jnp.int8:
        gb += L * N * 4 / 1e9

    def make(fn):
        @functools.partial(jax.jit, static_argnums=(2,))
        def run(w, x, n, scale=None):
            def passes(x, _):
                def layer(x, xs):
                    wl = xs if scale is None else xs[0]
                    y = fn(x, xs)
                    # fold [rows, N] into [rows, K] carry without a big buffer
                    s = jnp.sum(y, axis=-1, keepdims=True).astype(jnp.float32)
                    return (x * 0.999 + s * 1e-12).astype(x.dtype), None

                xs = w if scale is None else (w, scale)
                x, _ = jax.lax.scan(layer, x, xs)
                return x, None

            x, _ = jax.lax.scan(passes, x, None, length=n)
            return x

        if scale is None:
            return lambda n: lambda: np.asarray(run(w, x, n))
        return lambda n: lambda: np.asarray(run(w, x, n, scale))

    def xla_fn(x, xs):
        if dtype == jnp.int8:
            wl, sl = xs
            return (jnp.matmul(x, wl.astype(x.dtype)).astype(jnp.float32) * sl).astype(x.dtype)
        return jnp.matmul(x, xs)

    def make_stacked(bb):
        """Scan over a layer COUNTER; the kernel reads w[l] straight from the
        stacked HBM array via scalar prefetch (no scan-slice copy)."""
        @functools.partial(jax.jit, static_argnums=(2,))
        def run(w, x, n, scale=None):
            def passes(x, _):
                def layer(x, l):
                    if scale is None:
                        y = gemv_stacked_pallas(x, w, l, block_bytes=bb)
                    else:
                        y = int8_gemv_stacked_pallas(x, w, scale, l, block_bytes=bb)
                    s = jnp.sum(y, axis=-1, keepdims=True).astype(jnp.float32)
                    return (x * 0.999 + s * 1e-12).astype(x.dtype), None

                x, _ = jax.lax.scan(layer, x, jnp.arange(L, dtype=jnp.int32))
                return x, None

            x, _ = jax.lax.scan(passes, x, None, length=n)
            return x

        if scale is None:
            return lambda n: lambda: np.asarray(run(w, x, n))
        return lambda n: lambda: np.asarray(run(w, x, n, scale))

    results = {}
    sec = timeit(make(xla_fn))
    results["xla"] = gb / sec
    print(f"  {name:22s} xla          {sec*1e3:7.3f} ms/pass  {gb/sec:6.1f} GB/s", flush=True)
    for mb in blocks:
        try:
            sec = timeit(make_stacked(mb * 1024 * 1024))
            results[f"stacked{mb}M"] = gb / sec
            print(f"  {name:22s} stacked{mb:3d}M {sec*1e3:7.3f} ms/pass  {gb/sec:6.1f} GB/s", flush=True)
        except Exception as e:
            print(f"  {name:22s} stacked{mb:3d}M FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
    for mb in blocks:
        bb = mb * 1024 * 1024

        def pallas_fn(x, xs, bb=bb):
            if dtype == jnp.int8:
                wl, sl = xs
                return int8_gemv_pallas(x, wl, sl, block_bytes=bb)
            return gemv_pallas(x, xs, block_bytes=bb)

        try:
            sec = timeit(make(pallas_fn))
            results[f"pallas{mb}M"] = gb / sec
            print(f"  {name:22s} pallas {mb:3d}M  {sec*1e3:7.3f} ms/pass  {gb/sec:6.1f} GB/s", flush=True)
        except Exception as e:
            print(f"  {name:22s} pallas {mb:3d}M  FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="3b", choices=["3b", "11b-int8"])
    ap.add_argument("--rows", type=int, default=1)
    ap.add_argument("--blocks", default="4,8,14,24")
    args = ap.parse_args()
    blocks = [int(b) for b in args.blocks.split(",")]

    if args.model == "3b":
        L, h, inter, V = 28, 3072, 8192, 128256
        nq_hd, nkv_hd = 3072, 1024
        dt = jnp.bfloat16
    else:
        L, h, inter, V = 40, 4096, 14336, 128256
        nq_hd, nkv_hd = 4096, 1024
        dt = jnp.int8

    print(f"model={args.model} rows={args.rows} dtype={dt.__name__}", flush=True)
    shapes = [
        ("wq", L, h, nq_hd),
        ("wk", L, h, nkv_hd),
        ("wo", L, nq_hd, h),
        ("wg", L, h, inter),
        ("wd", L, inter, h),
        ("lm_head", 1, h, V),
    ]
    total_gb = 0.0
    agg = {}
    for name, Ls, K, N in shapes:
        res = bench_shape(name, Ls, K, N, args.rows, dt, blocks)
        mult = {"wk": 2, "wg": 2}.get(name, 1)  # wk≈wv, wg≈wu
        gb = Ls * K * N * (1 if dt == jnp.int8 else 2) / 1e9 * mult
        total_gb += gb
        for k, v in res.items():
            agg.setdefault(k, 0.0)
            agg[k] += gb / v  # seconds
    print(f"\naggregate over one decode step's weight stream ({total_gb:.2f} GB):", flush=True)
    for k, sec in sorted(agg.items(), key=lambda kv: kv[1]):
        print(f"  {k:12s} {sec*1e3:7.3f} ms  {total_gb/sec:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
