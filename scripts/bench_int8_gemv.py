"""Micro-bench the int8 dequant matmul at decode (gemv) shapes.

Compares the Pallas dequant-in-VMEM kernel against XLA's fused
convert-into-dot, per weight shape of the 3B decoder, timed as a scan of N
iterations inside one jit (tunnel-safe: fetch-synced).

Usage: python scripts/bench_int8_gemv.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from llama32mm_tpu.ops.pallas.quant_matmul import int8_matmul_pallas

N = 200
SHAPES = [  # (h, o) decoder linears at 3B: qkv+o, gate/up, down
    (3072, 3072),
    (3072, 1024),
    (3072, 8192),
    (8192, 3072),
]


def xla_dequant(x, wq, scale):
    return (jnp.matmul(x, wq.astype(x.dtype)).astype(jnp.float32) * scale).astype(x.dtype)


def timed(name, f, x, wq, scale, h, o):
    @jax.jit
    def run(x, wq, scale):
        def body(c, _):
            y = f(x + c.astype(x.dtype) * 0, wq, scale)
            return jnp.sum(y).astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return c

    np.asarray(run(x, wq, scale))  # compile
    t0 = time.perf_counter()
    np.asarray(run(x, wq, scale))
    dt = (time.perf_counter() - t0) / N
    gbps = (h * o + h * o // 1024) / dt / 1e9  # int8 bytes streamed (scale small)
    print(f"  {name:18s} {dt * 1e6:9.1f} us  ~{gbps:6.1f} GB/s effective")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    for h, o in SHAPES:
        print(f"[h={h}, o={o}] r=1 gemv")
        x = jax.random.normal(key, (1, h), dt)
        wq = jax.random.randint(key, (h, o), -127, 127, jnp.int8)
        scale = jax.random.uniform(key, (o,), jnp.float32, 0.01, 0.02)
        timed("pallas", int8_matmul_pallas, x, wq, scale, h, o)
        timed("xla fused-dequant", xla_dequant, x, wq, scale, h, o)


if __name__ == "__main__":
    main()
