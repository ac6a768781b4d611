"""Does int4 actually halve weight HBM traffic on this chip?

The int4 serving mode only pays off if (a) XLA stores jnp.int4 packed two
nibbles per byte in HBM, and (b) the grouped dequant matmul streams it at
bandwidth. This probe times the exact decode-gemv access pattern at 11B
shapes for bf16 / int8 / int4 operands and reports effective GB/s against
each one's theoretical footprint. int4 is stored packed-uint8 (two
two's-complement nibbles per byte) and unpacked in VMEM by the Pallas kernel
— jnp.int4 itself is not used (S4 jit arguments crash the axon runtime).

Run: python -u scripts/bench_int4_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from llama32mm_tpu.ops.quant import qlinear, quantize_weight, quantize_weight_int4

H, OUT, G = 4096, 14336, 128  # 11B gate/up shape
REPS = 30


def med_time(f, *args):
    np.asarray(f(*args))  # warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(ts, 50))


def main():
    k = jax.random.PRNGKey(0)
    w = jax.random.normal(k, (H, OUT), jnp.float32)
    x = jax.random.normal(jax.random.fold_in(k, 1), (1, 1, H), jnp.bfloat16)

    wb = jax.device_put(w.astype(jnp.bfloat16))
    q8 = jax.device_put(quantize_weight(w))
    q4 = jax.device_put(quantize_weight_int4(w, G))

    # N back-to-back gemvs over N distinct STACKED weight layers (the
    # engine's layout: lax.scan slices one layer per step) so HBM (not
    # cache) is the source; footprint = N × weight bytes.
    N = 8
    stack8 = jnp.stack([w + i for i in range(N)])  # [N, H, OUT] f32

    wbs = jax.device_put(stack8.astype(jnp.bfloat16))
    q8s = jax.device_put(jax.jit(lambda s: jax.lax.map(quantize_weight, s))(stack8))
    q4s = jax.device_put(
        jax.jit(lambda s: jax.lax.map(lambda wi: quantize_weight_int4(wi, G), s))(stack8)
    )

    # K sweeps inside ONE jit program: a single dispatch through the tunnel
    # costs ~4 ms, so per-call timing measures dispatch, not the kernel. The
    # carry chains each sweep on the last accumulator value to defeat CSE.
    K = 25

    def sweeper(one):
        @jax.jit
        def run(ws, x):
            def body(i, carry):
                x, _ = carry

                def layer(acc, wi):
                    return acc + one(x, wi).astype(jnp.float32), None

                acc, _ = jax.lax.scan(layer, jnp.zeros((1, 1, OUT), jnp.float32), ws)
                x = x + (acc[0, 0, 0] * 1e-30).astype(x.dtype)
                return (x, acc)

            return jax.lax.fori_loop(0, K, body, (x, jnp.zeros((1, 1, OUT), jnp.float32)))[1]

        return run

    run_bf16 = sweeper(lambda x, w: x @ w)
    run_q = sweeper(lambda x, q: qlinear(x, q))

    for name, fn, args, wbytes in (
        ("bf16", run_bf16, (wbs, x), H * OUT * 2),
        ("int8", run_q, (q8s, x), H * OUT + OUT * 4),
        ("int4", run_q, (q4s, x), H * OUT // 2 + (H // G) * OUT * 4),
    ):
        t = med_time(fn, *args) / K
        gbps = N * wbytes / t / 1e9
        print(
            f"{name}: {t * 1e6:8.1f} us per {N}-gemv sweep "
            f"({N * wbytes / 1e6:.1f} MB theoretical) -> {gbps:6.1f} GB/s eff",
            flush=True,
        )

    print("int4 packed nbytes/layer:", q4s["q4"].nbytes // N, "(int8 would be", H * OUT, ")")


if __name__ == "__main__":
    main()
