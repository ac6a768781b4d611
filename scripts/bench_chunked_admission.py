"""Chunked-admission stall measurement (3B bench shapes, 1 chip).

One slot decodes a long generation while a full image prompt (1632 tokens)
is admitted next to it. The metric is the longest wall-clock gap between
decode dispatches for the running request — with monolithic admission the
whole prefill sits in that gap; with ``prefill_chunk`` the prefill is spread
across steps with decode interleaved, bounding the stall near one chunk's
latency.

Run: python -u scripts/bench_chunked_admission.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

from bench import bench_config, make_inputs
from llama32mm_tpu.inference.server import ContinuousBatchingServer
from llama32mm_tpu.models.vlm import init_vlm_params
from llama32mm_tpu.preprocess.image import preprocess_image_device


def measure(params, cfg, chunk, long_prompt=None):
    tc = cfg.text_config
    if long_prompt:
        # text-only heavy prompt: the regime where admission stall bites
        # (prefill is seconds, not one decode period)
        s = long_prompt
        ids = jax.random.randint(jax.random.PRNGKey(11), (1, s), 0, tc.vocab_size - 10)
        px0 = None
        cache = -(-(s + 256) // 128) * 128
    else:
        ids, raw, s = make_inputs(cfg)
        px = jax.jit(
            lambda r: preprocess_image_device(r, cfg.vision_config.image_size, tc.jnp_dtype)
        )(raw)
        px0 = np.asarray(px[0])
        cache = 2048

    srv = ContinuousBatchingServer(
        params, cfg, slots=2, max_cache_length=cache, kv_dtype="int8",
        steps_per_sync=4, eos_token_id=-1, prefill_chunk=chunk,
    )

    def scenario():
        """r0 decodes in steady state; the heavy prompt is admitted next to
        it. Returns the inter-token gaps r0 experiences AFTER its own
        admission (its own prefill is TTFT, not a cross-request stall) —
        the max over the co-admission window is the stall the heavy request
        inflicts on it."""
        r0 = srv.submit(np.asarray(ids[0]), px0, max_new_tokens=120)
        # drive r0 through its own admission into steady decode first
        while len(srv.tokens_so_far(r0)) < 2:
            srv.step()
        gaps = []
        last = time.perf_counter()
        n0 = len(srv.tokens_so_far(r0))
        heavy = None
        for i in range(60):
            if i == 4 and heavy is None:
                heavy = srv.submit(np.asarray(ids[0]), px0, max_new_tokens=120)
            srv.step()
            now = time.perf_counter()
            n = len(srv.tokens_so_far(r0))
            if n > n0:
                gaps.append(now - last)
                n0 = n
            last = now
            if srv.is_finished(r0):
                break
        # drain the heavy request so the next pass starts clean
        while heavy is not None and not srv.is_finished(heavy):
            srv.step()
        return gaps

    scenario()  # warm pass: every program (admission, chunks, decode) compiles
    gaps = scenario()
    return {
        "max_gap_ms": round(max(gaps) * 1e3, 1),
        "p50_gap_ms": round(float(np.percentile(gaps, 50)) * 1e3, 1),
        "steps_observed": len(gaps),
    }


def main():
    cfg = bench_config("bfloat16" if jax.default_backend() == "tpu" else "float32")
    params = jax.device_put(init_vlm_params(jax.random.PRNGKey(0), cfg))
    out = {}
    for label, chunk in (("monolithic", None), ("chunk512", 512)):
        out[label] = measure(params, cfg, chunk)
    # the regime the feature exists for: a 12k-token admission next to a
    # running decode
    for label, chunk in (("long12k_monolithic", None), ("long12k_chunk1024", 1024)):
        out[label] = measure(params, cfg, chunk, long_prompt=12288)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
