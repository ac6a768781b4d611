"""Isolate why the int8 dequant gemv runs ~5x off bandwidth.

Probes (all stream the same [3072, 8192] weight):
  a) int8 stream, bitcast-packed s32 sum — NO relayout, pure DMA+VPU
  b) int8 -> bf16 convert then sum — pays the (32,128)->(16,128) relayout
  c) s8 x s8 MXU dot, s32 accumulation — the AQT-style serving path
  d) bf16 stream control (2x bytes) — the layout the working decode uses

Scoped VMEM on v5e is ~16 MB: keep blocks <= 3 MB so double buffering fits.

Run: python -u scripts/bench_int8_probe.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 200
H, O = 3072, 8192
BN = 1024  # int8 block [H, BN] = 3 MB


def _sum_packed_kernel(w_ref, out_ref):
    # operand arrives pre-bitcast as s32 [H, BN//4] — no relayout, no widening
    out_ref[:] = jnp.sum(w_ref[:], axis=0, keepdims=True)


CVT_BN = 512  # f32 temp [H, BN] must fit scoped VMEM (16 MB) with buffers


def _sum_cvt_kernel(w_ref, out_ref):
    w = w_ref[:].astype(jnp.bfloat16)
    out_ref[:] = jnp.sum(w.astype(jnp.float32), axis=0, keepdims=True)


def _sum_bf16_kernel(w_ref, out_ref):
    out_ref[:] = jnp.sum(w_ref[:].astype(jnp.float32), axis=0, keepdims=True)


def _dot_kernel(x_ref, w_ref, out_ref):
    out_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def probe_packed(w, x):
    w32 = jax.lax.bitcast_convert_type(w.reshape(H, O // 4, 4), jnp.int32)
    return pl.pallas_call(
        _sum_packed_kernel,
        grid=(O // BN,),
        in_specs=[pl.BlockSpec((H, BN // 4), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BN // 4), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, O // 4), jnp.int32),
    )(w32)


def probe_cvt(w, x):
    return pl.pallas_call(
        _sum_cvt_kernel,
        grid=(O // CVT_BN,),
        in_specs=[pl.BlockSpec((H, CVT_BN), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, CVT_BN), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, O), jnp.float32),
    )(w)


def probe_bf16(w, x):
    return pl.pallas_call(
        _sum_bf16_kernel,
        grid=(O // CVT_BN,),
        in_specs=[pl.BlockSpec((H, CVT_BN), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, CVT_BN), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, O), jnp.float32),
    )(w)


def probe_dot(w, x):
    return pl.pallas_call(
        _dot_kernel,
        grid=(O // BN,),
        in_specs=[
            pl.BlockSpec((32, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, BN), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((32, BN), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, O), jnp.int32),
    )(x, w)


def timed(name, f, wdtype, bytes_per_el):
    @jax.jit
    def run(w, x):
        def body(c, _):
            w_dep, x_dep, _c = jax.lax.optimization_barrier((w, x, c))
            y = f(w_dep, x_dep)
            return jnp.max(y).astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
        return c

    if wdtype == jnp.int8:
        w = jax.random.randint(jax.random.PRNGKey(0), (H, O), -127, 127, jnp.int8)
    else:
        w = jax.random.normal(jax.random.PRNGKey(0), (H, O), wdtype)
    x = jax.random.randint(jax.random.PRNGKey(1), (32, H), -127, 127, jnp.int8)
    np.asarray(run(w, x))
    t0 = time.perf_counter()
    np.asarray(run(w, x))
    dt = (time.perf_counter() - t0) / N
    print(f"{name:26s} {dt * 1e6:9.1f} us  ~{H * O * bytes_per_el / dt / 1e9:6.1f} GB/s", flush=True)


def main():
    timed("a) int8 stream packed", probe_packed, jnp.int8, 1)
    timed("b) int8 -> bf16 + sum", probe_cvt, jnp.int8, 1)
    timed("c) s8xs8 MXU dot", probe_dot, jnp.int8, 1)
    timed("d) bf16 stream control", probe_bf16, jnp.bfloat16, 2)


if __name__ == "__main__":
    main()
