"""Isolated stacked-gemv kernel A/B: int8 vs int4 Pallas at 11B decode shapes.

Answers the open round-4 question: the always-on int4 route measured 51 tok/s
end-to-end at 11B (vs 74 for int8) — is the int4 kernel itself slow (VPU
nibble-unpack bound), or is the loss elsewhere (routing, x-plane prep,
program overhead)?

Method matches scripts/bench_gemv_ab.py: a jit program runs ``n`` passes,
each pass scanning the full L-layer stack through the kernel via its
scalar-prefetch index (the engine's exact access pattern); the time for a
long run minus a short run cancels the per-dispatch tunnel constant
(measured ~20 ms on axon — absolute per-call timing at small L is useless).

Run: python -u scripts/bench_int4_kernel.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from llama32mm_tpu.ops.pallas.gemv import (
    int4_gemv_stacked_pallas,
    int8_gemv_stacked_pallas,
)
from llama32mm_tpu.ops.quant import quantize_weight, quantize_weight_int4

L = 40  # 11B decoder depth
PASSES = 12
G = 128


def timeit(make_run, iters=PASSES):
    short = max(1, iters // 4)
    run_l, run_s = make_run(iters), make_run(short)
    run_l(); run_s()
    tl, ts_ = [], []
    for _ in range(3):
        t0 = time.perf_counter(); run_s(); ts_.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run_l(); tl.append(time.perf_counter() - t0)
    return (float(np.percentile(tl, 50)) - float(np.percentile(ts_, 50))) / (iters - short)


def make(kernel, x, *wargs):
    @functools.partial(jax.jit, static_argnums=(0,))
    def run(n, x, *wargs):
        def passes(x, _):
            def layer(x, l):
                y = kernel(x, *wargs, l)
                s = jnp.sum(y, axis=-1, keepdims=True).astype(jnp.float32)
                return (x * 0.999 + s * 1e-12).astype(x.dtype), None

            x, _ = jax.lax.scan(layer, x, jnp.arange(L, dtype=jnp.int32))
            return x, None

        return jax.lax.scan(passes, x, None, length=n)[0]

    return lambda n: lambda: np.asarray(run(n, x, *wargs))


def main():
    print("devices:", jax.devices(), flush=True)
    k = jax.random.PRNGKey(0)

    for name, (H, OUT) in (
        ("gate/up 4096x14336", (4096, 14336)),
        ("down 14336x4096", (14336, 4096)),
        ("qkv-ish 4096x4096", (4096, 4096)),
    ):
        def draw(kk, H=H, OUT=OUT):
            return jax.random.uniform(kk, (H, OUT), jnp.float32, -0.02, 0.02)

        keys = jax.random.split(k, L)
        q8 = jax.jit(lambda ks: jax.lax.map(lambda kk: quantize_weight(draw(kk)), ks))(keys)
        q4 = jax.jit(
            lambda ks: jax.lax.map(lambda kk: quantize_weight_int4(draw(kk), G), ks)
        )(keys)
        jax.block_until_ready((q8, q4))
        x = jax.random.normal(jax.random.fold_in(k, 1), (1, H), jnp.bfloat16)

        i8_gb = L * (H * OUT + OUT * 4) / 1e9
        i4_gb = L * (H * OUT // 2 + (H // G) * OUT * 4) / 1e9

        t8 = timeit(make(
            lambda x, wq, sc, l: int8_gemv_stacked_pallas(x, wq, sc, l),
            x, q8["q"], q8["scale"],
        ))
        print(
            f"{name}: int8 {t8/L*1e6:7.1f} us/gemv ({i8_gb/t8:6.1f} GB/s)",
            flush=True,
        )
        for variant in ("pre", "post", "post-cat"):
            for bb_mb in (8, 14):
                try:
                    t4 = timeit(make(
                        lambda x, wq, sc, l, v=variant, bb=bb_mb: (
                            int4_gemv_stacked_pallas(
                                x, wq, sc, l, block_bytes=bb * 1024 * 1024,
                                variant=v)
                        ),
                        x, q4["q4"], q4["scale"],
                    ))
                    print(
                        f"{name}: int4[{variant},{bb_mb}M] {t4/L*1e6:7.1f} us/gemv "
                        f"({i4_gb/t4:6.1f} GB/s packed, {i8_gb/t4:6.1f} int8-eq) "
                        f"| vs int8 {t8/t4:5.2f}x",
                        flush=True,
                    )
                except Exception as e:
                    print(f"{name}: int4[{variant},{bb_mb}M] FAILED: "
                          f"{type(e).__name__}: {str(e)[:140]}", flush=True)
        del q8, q4


if __name__ == "__main__":
    main()
