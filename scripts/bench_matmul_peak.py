"""Calibrate achievable bf16 matmul TFLOP/s on this chip at prefill shapes.

Run: python -u scripts/bench_matmul_peak.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N = 100
SHAPES = [
    (1632, 3072, 8192),   # FFN gate/up
    (1632, 8192, 3072),   # FFN down
    (1632, 3072, 5120),   # fused qkv
    (1664, 3072, 8192),   # M padded to 13x128
    (4096, 4096, 4096),   # square reference point
]


def main():
    for m, k, n in SHAPES:
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)

        @jax.jit
        def run(x, w):
            def body(c, _):
                # cheap data dependency (x + 0*c) — optimization_barrier on the
                # operands forces full buffer copies and contaminates timing
                x_d = x + c.astype(x.dtype) * 0
                y = jnp.matmul(x_d, w)
                return jnp.max(y).astype(jnp.float32), ()

            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return c

        np.asarray(run(x, w))
        t0 = time.perf_counter()
        np.asarray(run(x, w))
        dt = (time.perf_counter() - t0) / N
        tf = 2 * m * k * n / dt / 1e12
        print(f"[{m:5d},{k:5d}]x[{k:5d},{n:5d}]  {dt * 1e6:8.1f} us  {tf:6.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
