"""Measure batched speculative decoding in the continuous-batching server on
the real chip: aggregate throughput with spec_lookup=K vs 0 for a pool of
repetitive continuations (the favorable regime) in one process (params
transfer once).

Run: python -u scripts/bench_spec_server.py [slots] [K] [steps_per_sync]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from bench import CACHE_LEN, bench_config
from llama32mm_tpu.inference.server import ContinuousBatchingServer
from llama32mm_tpu.models.vlm import init_vlm_params

MAX_NEW = 96


def run(params, cfg, prompts, slots, spec, steps_per_sync):
    srv = ContinuousBatchingServer(
        params, cfg, slots=slots, max_cache_length=CACHE_LEN, prompt_buckets="auto",
        eos_token_id=-1, steps_per_sync=steps_per_sync, spec_lookup=spec,
    )
    # warm: decode ladder + admit/prefill programs
    srv.warmup()
    rid = srv.submit(prompts[0], None, max_new_tokens=8)
    srv.run()
    t0 = time.perf_counter()
    rids = [srv.submit(p, None, max_new_tokens=MAX_NEW) for p in prompts]
    srv.run()
    dt = time.perf_counter() - t0
    total = sum(len(srv.tokens_so_far(r)) for r in rids)
    st = srv.stats()
    return total / dt, st.get("spec_tokens_per_step")


def main():
    slots = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    sps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cfg = bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
    tc = cfg.text_config
    # one jitted dispatch: eager per-leaf init is a tunneled round trip per
    # leaf (see bench.py)
    params = jax.jit(lambda k: init_vlm_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    prompts = []
    for i in range(slots):
        base = np.asarray(
            jax.random.randint(jax.random.PRNGKey(10 + i), (6,), 0, tc.vocab_size - 10)
        )
        prompts.append(np.tile(base, 22)[: 128 - i * 3])  # ragged, repetitive

    base_tps, _ = run(params, cfg, prompts, slots, 0, sps)
    print(f"slots={slots} spec=0 sps={sps}: {base_tps:.1f} tok/s aggregate", flush=True)
    spec_tps, acc = run(params, cfg, prompts, slots, K, sps)
    print(
        f"slots={slots} spec={K} sps={sps}: {spec_tps:.1f} tok/s aggregate "
        f"({spec_tps / base_tps:.2f}x, {acc} committed tokens/verify-step)"
    )


if __name__ == "__main__":
    main()
