"""Decode weight-stream experiments: can ANY schedule beat XLA's gemv stream?

VERDICT round-2 item #1: the engine decodes at ~716 GB/s effective vs the
819 GB/s nominal roofline, and the existing SoL probe (bench_decode_sol.py)
reproduces the SAME XLA gemv schedule — it bounds "XLA on this pattern", not
the hardware. This script attacks the access pattern itself with explicit
Pallas schedules over the same ~6 GB/step weight stream the 3B decode reads:

  xla_gemv      — jnp gemv over the stacked chunks (the engine's schedule)
  pallas_grid   — pallas_call grid over chunks; Mosaic auto double-buffers
                  HBM→VMEM block fetches (chunk-size sweep)
  pallas_dma    — manual double-buffered make_async_copy pipeline (the
                  explicit-DMA schedule the VERDICT asked for)
  pallas_multi  — manual pipeline with 3 buffers / 2 DMAs in flight
  stream_reduce — pure jnp sum-reduce of the same bytes (no MXU), the
                  "one giant contiguous read" orientation

Every variant streams the SAME physical array (fresh random bits per chunk —
identical tiles get deduped by the runtime and measure above the physical
ceiling, see bench.py::random_int8_vlm_params) and folds a gemv per chunk so
the compute shape matches decode (1×K×N matmul = MXU-starved, bandwidth
bound). Results go into BASELINE.md's experiment matrix.

Run: python -u scripts/bench_pallas_stream.py [--gb 6] [--iters 8]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_DIM = 1024  # reduction dim per chunk (x is [1, K])


def build_weights(total_gb: float, chunk_rows: int, chunk_cols: int):
    """~total_gb of bf16 as [C, chunk_rows, chunk_cols], fresh bits per chunk
    (lax.map over the leading axis; one fold_in per chunk keeps RNG transients
    chunk-sized and every chunk byte-distinct — no runtime dedup)."""
    bytes_per_chunk = chunk_rows * chunk_cols * 2
    n_chunks = max(2, int(total_gb * 1e9 / bytes_per_chunk))

    def build(key):
        keys = jax.random.split(key, n_chunks)
        return jax.lax.map(
            lambda k: (jax.random.uniform(k, (chunk_rows, chunk_cols), jnp.float32,
                                          -0.02, 0.02)).astype(jnp.bfloat16),
            keys,
        )

    w = jax.jit(build)(jax.random.PRNGKey(0))
    jax.block_until_ready(w)
    return w


def timeit(make_run, iters):
    """Seconds per pass from the DIFFERENCE of a long and a short dispatch
    (cancels the constant tunnel/dispatch overhead, which at these sizes is
    tens of ms). ``make_run(n)`` returns a zero-arg callable doing n passes."""
    short = max(1, iters // 4)
    run_l, run_s = make_run(iters), make_run(short)
    run_l(); run_s()  # compile + warm both
    tl, ts_ = [], []
    for _ in range(3):
        t0 = time.perf_counter(); run_s(); ts_.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run_l(); tl.append(time.perf_counter() - t0)
    return (float(np.percentile(tl, 50)) - float(np.percentile(ts_, 50))) / (iters - short)


# --- variant 1: XLA gemv (the engine's schedule) ---------------------------


def xla_gemv(w, x, iters):
    C, R, N = w.shape

    @functools.partial(jax.jit, static_argnums=2)
    def run(w, x, n):
        def step(x, _):
            def chunk(acc, wc):
                y = jnp.dot(x, wc.reshape(R, N), preferred_element_type=jnp.float32)
                return acc + jnp.sum(y), None

            s, _ = jax.lax.scan(chunk, jnp.float32(0), w)
            # fold result into the carry so no pass can be hoisted/elided
            return (x * 0.999 + s * 1e-12).astype(x.dtype), None

        x, _ = jax.lax.scan(step, x, None, length=n)
        return x

    return timeit(lambda n: lambda: np.asarray(run(w, x, n)), iters)


# --- variant 2: pallas grid (Mosaic auto-pipelined block fetches) -----------


def pallas_grid(w, x, iters, cols_per_block=None):
    C, R, N = w.shape
    TN = cols_per_block or N

    def kern(x_ref, w_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[0, 0] = 0.0

        y = jnp.dot(x_ref[:], w_ref[0], preferred_element_type=jnp.float32)
        out_ref[0, 0] += jnp.sum(y)

    grid = (C * (N // TN),)
    nb = N // TN

    call = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, TN), lambda i: (i // nb, 0, i % nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    @functools.partial(jax.jit, static_argnums=2)
    def run(w, x, n):
        def step(x, _):
            s = call(x, w)[0, 0]
            return (x * 0.999 + s * 1e-12).astype(x.dtype), None

        x, _ = jax.lax.scan(step, x, None, length=n)
        return x

    return timeit(lambda n: lambda: np.asarray(run(w, x, n)), iters)


# --- variant 3/4: manual DMA pipeline (explicit double/triple buffering) ----


def pallas_dma(w, x, iters, n_buffers=2):
    C, R, N = w.shape

    def kern(x_ref, w_hbm, out_ref):
        def body(bufs, sems):
            def get_dma(slot, idx):
                return pltpu.make_async_copy(
                    w_hbm.at[idx], bufs.at[slot], sems.at[slot]
                )

            for s in range(n_buffers - 1):
                get_dma(s, s).start()

            def loop(i, acc):
                slot = i % n_buffers
                nxt = (i + n_buffers - 1) % n_buffers

                @pl.when(i + n_buffers - 1 < C)
                def _():
                    get_dma(nxt, i + n_buffers - 1).start()

                get_dma(slot, i).wait()
                y = jnp.dot(x_ref[:], bufs[slot],
                            preferred_element_type=jnp.float32)
                return acc + jnp.sum(y)

            acc = jax.lax.fori_loop(0, C, loop, jnp.float32(0))
            out_ref[0, 0] = acc

        pl.run_scoped(
            body,
            pltpu.VMEM((n_buffers, R, N), w.dtype),
            pltpu.SemaphoreType.DMA((n_buffers,)),
        )

    call = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    @functools.partial(jax.jit, static_argnums=2)
    def run(w, x, n):
        def step(x, _):
            s = call(x, w)[0, 0]
            return (x * 0.999 + s * 1e-12).astype(x.dtype), None

        x, _ = jax.lax.scan(step, x, None, length=n)
        return x

    return timeit(lambda n: lambda: np.asarray(run(w, x, n)), iters)


# --- variant 5: pure streaming reduce (no MXU) ------------------------------


def stream_reduce(w, x, iters):
    @functools.partial(jax.jit, static_argnums=2)
    def run(w, x, n):
        def step(x, _):
            s = jnp.sum(w.astype(jnp.float32))
            return (x * 0.999 + s * 1e-12).astype(x.dtype), None

        x, _ = jax.lax.scan(step, x, None, length=n)
        return x

    return timeit(lambda n: lambda: np.asarray(run(w, x, n)), iters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=6.0)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rows", type=int, default=K_DIM)
    ap.add_argument("--cols", type=int, default=8192)
    args = ap.parse_args()

    w = build_weights(args.gb, args.rows, args.cols)
    C, R, N = w.shape
    gb = C * R * N * 2 / 1e9
    x = jnp.full((1, R), 0.5, jnp.bfloat16)
    print(f"streaming {gb:.2f} GB/pass as {C} x [{R}, {N}] bf16 chunks "
          f"({R*N*2/1e6:.1f} MB each), {args.iters} passes per rep", flush=True)

    def report(name, sec):
        print(f"  {name:28s} {sec*1e3:8.2f} ms/pass   {gb/sec:7.1f} GB/s", flush=True)

    report("xla_gemv (engine schedule)", xla_gemv(w, x, args.iters))
    report("stream_reduce (no MXU)", stream_reduce(w, x, args.iters))
    for tn in (N, N // 2, N // 4):
        report(f"pallas_grid TN={tn}", pallas_grid(w, x, args.iters, tn))
    report("pallas_dma 2-buf", pallas_dma(w, x, args.iters, 2))
    report("pallas_dma 3-buf", pallas_dma(w, x, args.iters, 3))
    report("pallas_dma 4-buf", pallas_dma(w, x, args.iters, 4))


if __name__ == "__main__":
    main()
