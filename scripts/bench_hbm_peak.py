"""Measure achievable HBM read bandwidth: sum-reduce a 4.3 GB bf16 array,
with a carry-dependent dynamic_slice start so the read cannot be hoisted
(and no optimization_barrier, which copies its operands).

Run: python -u scripts/bench_hbm_peak.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

N_ROWS, N_COLS = 1 << 23, 256  # 8.4M x 256 bf16 = 4.29 GB
ITERS = 20


def main():
    x = jax.random.normal(jax.random.PRNGKey(0), (N_ROWS + 1, N_COLS), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(c, _):
            off = (c.astype(jnp.int32) % 2).astype(jnp.int32)
            window = jax.lax.dynamic_slice(x, (off, 0), (N_ROWS, N_COLS))
            s = jnp.sum(window.astype(jnp.float32))
            return s, ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return c

    np.asarray(run(x))
    t0 = time.perf_counter()
    np.asarray(run(x))
    dt = (time.perf_counter() - t0) / ITERS
    gb = N_ROWS * N_COLS * 2 / 1e9
    print(f"read {gb:.2f} GB in {dt * 1e3:.2f} ms -> {gb / dt:.1f} GB/s "
          f"({gb / dt / 819 * 100:.1f}% of nominal 819)", flush=True)


if __name__ == "__main__":
    main()
