"""Measure prefix-caching admission latency on the real chip: a request whose
prompt extends a registered prefix (image + instruction template) admits by
copying the cached KV and prefilling only the suffix — vs full prefill.

Run: python -u scripts/bench_prefix_cache.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import CACHE_LEN, bench_config
from llama32mm_tpu.inference.server import ContinuousBatchingServer
from llama32mm_tpu.models.vlm import init_vlm_params

SUFFIX = 48  # user-question tail appended to the shared template


def admit_time(srv, ids, px, reps=5, **submit_kw):
    """Median wall time of the step() that performs the admission (slot pool
    empty, so the step is admission + one decode chunk)."""
    ts = []
    for _ in range(reps):
        rid = srv.submit(ids, px, max_new_tokens=4, **submit_kw)
        t0 = time.perf_counter()
        while not srv.is_finished(rid):
            srv.step()
            if len(srv.tokens_so_far(rid)) >= 1:
                break  # first token out = admission complete
        ts.append(time.perf_counter() - t0)
        while not srv.is_finished(rid):
            srv.step()
    return float(np.median(ts))


def main():
    cfg = bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
    tc = cfg.text_config
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    n_img = tc.num_image_tokens

    head = np.zeros(n_img + 32, np.int32)
    head[:n_img] = cfg.image_token_index
    head[n_img:] = np.arange(32) + 100
    tail = np.arange(SUFFIX, dtype=np.int32) + 200
    full = np.concatenate([head, tail])
    px = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (3, cfg.vision_config.image_size,
                                                  cfg.vision_config.image_size),
                          tc.jnp_dtype)
    )

    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=CACHE_LEN, prompt_buckets="auto",
        eos_token_id=-1, steps_per_sync=4,
    )

    # warm both admission routes
    t_full = admit_time(srv, full, px, reps=1)
    pid = srv.register_prefix(head, pixel_values=px)
    t_pfx = admit_time(srv, full, None, reps=1, prefix_id=pid)

    t_full = admit_time(srv, full, px, reps=5)
    t_pfx = admit_time(srv, full, None, reps=5, prefix_id=pid)
    print(
        f"admission (prompt {full.shape[0]} tok, image): full prefill "
        f"{t_full*1e3:.0f} ms -> prefix-cached suffix ({SUFFIX} tok) "
        f"{t_pfx*1e3:.0f} ms  ({t_full/t_pfx:.1f}x)"
    )


if __name__ == "__main__":
    main()
