"""int4 unpack-bound ceiling experiment (VERDICT r4 Weak #1).

The question: the stacked int4 kernel streams packed nibbles at ~X GB/s while
the int8 kernel streams its bytes at ~700 GB/s — is the difference the VPU
cost of the in-VMEM nibble unpack (a hard ceiling for any int4 kernel), or
unclaimed schedule?

Method: micro-kernels over the SAME stacked [L, k2, n] uint8 array + scalar-
prefetch access pattern as the real kernel, each doing strictly less work,
timed with the long-minus-short protocol (tunnel constant cancels):

  stream    DMA the full block, compute touches only 8 rows — the pure
            byte-stream ceiling for this block geometry (the DMA cost is
            paid in full regardless of what the kernel reads).
  bc-dot    one plane: full-byte u8→i16→bf16 cast + one bf16 dot
            (2 VPU lane-ops/byte + 1 MXU dot).
  lo-dot    one plane: (b & 0xF) u8→i8 reinterpret →bf16 cast + one dot
            (2-3 VPU lane-ops/byte + 1 MXU dot).
  post      the shipped kernel (_int4_kernel_post): both planes + 2 dots +
            fp32 group post-scale (~4 lane-ops/byte).
  i8dot     legalization probe: (b & 0xF) as int8, s8×s8→s32 jnp.dot —
            if Mosaic runs this at speed, a W4A8 scheme (2 lane-ops/byte +
            2 int8 MXU dots, exact integer nibble recovery) beats the bf16
            unpack; if it fails to lower, that door is closed.

Run: python -u scripts/bench_int4_unpack_ceiling.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from llama32mm_tpu.ops.pallas.common import cdiv
from llama32mm_tpu.ops.pallas.gemv import int4_gemv_stacked_pallas

L = 40
PASSES = 12
G = 128
_MB = 1024 * 1024
_VMEM = 100 * _MB


def timeit(make_run, iters=PASSES):
    short = max(1, iters // 4)
    run_l, run_s = make_run(iters), make_run(short)
    run_l(); run_s()
    tl, ts_ = [], []
    for _ in range(3):
        t0 = time.perf_counter(); run_s(); ts_.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run_l(); tl.append(time.perf_counter() - t0)
    return (float(np.percentile(tl, 50)) - float(np.percentile(ts_, 50))) / (iters - short)


def micro_call(kernel_body, shape3, bn):
    """pallas_call over the stacked packed array with the real kernel's
    grid/BlockSpec geometry. The returned callable takes the packed array as
    an ARGUMENT (closing over a concrete 1.1 GB array would embed it as a
    jit constant — pathological compile times through the remote compiler)."""
    Ls, k2, n = shape3

    def call(lidx, q4, *extras):
        in_specs = [
            pl.BlockSpec((1, k2, bn), lambda i, l: (l[0], 0, i),
                         memory_space=pltpu.VMEM),
        ]
        for e in extras:
            zero = tuple(0 for _ in e.shape)
            in_specs.append(
                pl.BlockSpec(e.shape, lambda i, l, z=zero: z,
                             memory_space=pltpu.VMEM)
            )
        return pl.pallas_call(
            kernel_body,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(cdiv(n, bn),),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((8, bn), lambda i, l: (0, i),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=_VMEM,
            ),
            cost_estimate=pl.CostEstimate(
                flops=2 * k2 * n, bytes_accessed=k2 * n, transcendentals=0,
            ),
            interpret=False,
        )(lidx, q4, *extras)

    return call


def k_stream(l_ref, w_ref, out_ref):
    # full block DMA'd; compute touches 8 rows only
    out_ref[:] = w_ref[0, :8, :].astype(jnp.int8).astype(jnp.float32)


def k_bc_dot(l_ref, w_ref, x_ref, out_ref):
    bc = w_ref[0].astype(jnp.int16).astype(jnp.bfloat16)
    out_ref[:] = jnp.dot(x_ref[:], bc, preferred_element_type=jnp.float32)


def k_lo_dot(l_ref, w_ref, x_ref, out_ref):
    lo = (w_ref[0] & 0xF).astype(jnp.int8).astype(jnp.bfloat16)
    out_ref[:] = jnp.dot(x_ref[:], lo, preferred_element_type=jnp.float32)


def k_i8_lo_dot(l_ref, w_ref, xq_ref, out_ref):
    lo = (w_ref[0] & 0xF).astype(jnp.int8)
    out_ref[:] = jnp.dot(
        xq_ref[:], lo, preferred_element_type=jnp.int32
    ).astype(jnp.float32)


def k_i8_both_dot(l_ref, w_ref, xq_ref, out_ref):
    # the full W4A8 unpack: lo = b & 0xF as s8; bfull = (b ^ 0x80) as s8
    # (= b - 128 exactly); 2 lane-ops/byte + 2 s8 MXU dots. Nibble recovery
    # (Σx·u_hi = (dot(x,b) - dot(x,u_lo))/16) happens outside in fp32 — this
    # micro-kernel measures the in-kernel cost only.
    b = w_ref[0]
    lo = (b & 0xF).astype(jnp.int8)
    bf = (b ^ 0x80).astype(jnp.int8)
    acc = jnp.dot(xq_ref[:], lo, preferred_element_type=jnp.int32)
    acc = acc * 16 + jnp.dot(xq_ref[:], bf, preferred_element_type=jnp.int32)
    out_ref[:] = acc.astype(jnp.float32)


def make_runner(call_fn, q4, *extras):
    @functools.partial(jax.jit, static_argnums=(0,))
    def run(npass, q4, *extras):
        def passes(c, _):
            def layer(c, l):
                y = call_fn(l.reshape(1), q4, *extras)
                return c + jnp.sum(y[:1, :8]) * 1e-20, None

            c, _ = jax.lax.scan(layer, c, jnp.arange(L, dtype=jnp.int32))
            return c, None

        return jax.lax.scan(passes, jnp.float32(0), None, length=npass)[0]

    return lambda n: lambda: np.asarray(run(n, q4, *extras))


def main():
    print("devices:", jax.devices(), flush=True)
    k = jax.random.PRNGKey(0)

    for name, (H, OUT) in (
        ("gate/up 4096x14336", (4096, 14336)),
        ("down 14336x4096", (14336, 4096)),
        ("qkv-ish 4096x4096", (4096, 4096)),
    ):
        k2 = H // 2
        rng = np.random.default_rng(1)
        q4 = jax.device_put(jnp.asarray(
            rng.integers(0, 256, (L, k2, OUT), dtype=np.uint8)))
        scale = jnp.full((L, H // G, OUT), 0.008, jnp.float32)
        x = jax.random.normal(jax.random.fold_in(k, 1), (8, k2), jnp.bfloat16)
        xq = jax.random.randint(jax.random.fold_in(k, 2), (8, k2), -127, 128,
                                jnp.int32).astype(jnp.int8)
        x1full = jax.random.normal(jax.random.fold_in(k, 3), (1, H), jnp.bfloat16)
        gb = L * k2 * OUT / 1e9

        for bb_mb in (8, 14):
            bn = max(128, (bb_mb * _MB // k2) // 128 * 128)
            bn = min((OUT + 127) // 128 * 128, bn)
            rows = []
            for kname, body, extras in (
                ("stream", k_stream, ()),
                ("bc-dot", k_bc_dot, (x,)),
                ("lo-dot", k_lo_dot, (x,)),
                ("i8-lo-dot", k_i8_lo_dot, (xq,)),
                ("i8-both-dot", k_i8_both_dot, (xq,)),
            ):
                try:
                    call = micro_call(body, q4.shape, bn)
                    t = timeit(make_runner(call, q4, *extras))
                    rows.append(f"{kname} {gb/t:6.1f} GB/s")
                except Exception as e:
                    rows.append(f"{kname} FAIL({type(e).__name__}:{str(e)[:60]})")
            # the shipped kernel at this block size, r=1 (decode shape)
            try:
                t = timeit(make_runner(
                    lambda l, q4_, scale_, x_, bb=bb_mb: (
                        int4_gemv_stacked_pallas(
                            x_, q4_, scale_, l[0], block_bytes=bb * _MB)
                    ), q4, scale, x1full))
                rows.append(f"post {gb/t:6.1f} GB/s")
            except Exception as e:
                rows.append(f"post FAIL({type(e).__name__}:{str(e)[:60]})")
            print(f"{name} [{bb_mb}M blocks, bn={bn}]: " + " | ".join(rows),
                  flush=True)
        del q4


if __name__ == "__main__":
    main()
