"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: single-image VLM decode tokens/sec/chip (BASELINE.md north star:
≥90% of the HBM-bandwidth roofline; the reference publishes no numbers, so
``vs_baseline`` reports measured/roofline).

On the single available chip an 11B bf16 model does not fit in a v5e's 16 GB
HBM, so the bench config uses Llama-3.2-3B text shapes under the full ViT-H/14
vision tower; the roofline is computed for the same config, making the
fraction hardware-meaningful. Also reports p50 TTFT (prefill incl. on-device
image preprocess from raw uint8 pixels — the second north-star metric).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from llama32mm_tpu.configs import LLAMA32Config, MLLAMAConfig, VisionEncoderConfig
from llama32mm_tpu.inference.engine import InferenceEngine
from llama32mm_tpu.models.vlm import init_vlm_params
from llama32mm_tpu.preprocess.image import preprocess_image_device

MAX_NEW = 64
SHORT_NEW = 16
PROMPT_TEXT_LEN = 32
# Cache sized to request capacity rounded UP to the 128-lane tile (the cache
# seq axis is the minor dim of the decode score matrix — 1696 measured slower
# than 1792 despite streaming less KV, because ragged lane tiles cost more
# than the 96 dead slots; dead tail beyond that is pure HBM waste).
CACHE_LEN = 1792

# HBM bandwidth per chip (GB/s) for roofline
_HBM_GBPS = {"v5e": 819.0, "v5litepod": 819.0, "v5p": 2765.0, "v4": 1228.0}


def bench_config(dtype: str = "bfloat16") -> MLLAMAConfig:
    """Llama-3.2-3B text shapes + the reference's ViT-H/14@560 vision tower."""
    return MLLAMAConfig(
        vision_config=VisionEncoderConfig(),  # ViT-H/14, 560px, 32 layers
        text_config=LLAMA32Config(
            vocab_size=128256,
            hidden_size=3072,
            n_heads=24,
            n_layers=28,
            hidden_dim=8192,
            n_kv_groups=8,
            dtype=dtype,
            max_cache_length=CACHE_LEN,
        ),
        projection_dim=3072,
        hidden_size=3072,
    )


def decode_roofline_tokens_per_sec(cfg: MLLAMAConfig, mean_ctx: int, hbm_gbps: float) -> float:
    """Decode is HBM-bound: every step streams the decoder weights + lm_head +
    the live KV prefix."""
    tc = cfg.text_config
    bytes_per_el = 2 if tc.dtype in ("bfloat16", "float16") else 4
    per_layer = (
        tc.hidden_size * tc.n_heads * tc.head_dim  # Wq
        + 2 * tc.hidden_size * tc.n_kv_groups * tc.head_dim  # Wk, Wv
        + tc.n_heads * tc.head_dim * tc.hidden_size  # Wo
        + 3 * tc.hidden_size * tc.hidden_dim  # gate, up, down
        + 2 * tc.hidden_size  # norms
    )
    weights = tc.n_layers * per_layer + tc.hidden_size * tc.vocab_size  # + lm_head
    kv = tc.n_layers * 2 * tc.n_kv_groups * tc.head_dim * mean_ctx
    step_bytes = (weights + kv) * bytes_per_el
    return hbm_gbps * 1e9 / step_bytes


def batched_throughput(cfg, params, raw, preprocess, batch: int = 8) -> float:
    """Aggregate decode throughput with a batch of concurrent sequences —
    the serving-scale secondary metric (weights stream once per step
    regardless of batch). Enabled with BENCH_BATCH=1 (adds ~2 compiles)."""
    tc = cfg.text_config
    n_img = tc.num_image_tokens
    s = n_img + PROMPT_TEXT_LEN
    ids = jax.random.randint(jax.random.PRNGKey(3), (batch, s), 0, tc.vocab_size - 10)
    ids = ids.at[:, :n_img].set(cfg.image_token_index)
    px = jnp.broadcast_to(preprocess(raw), (batch, 3, 560, 560))
    engine = InferenceEngine(params, cfg, max_cache_length=CACHE_LEN)

    def run(max_new):
        return np.asarray(
            engine.generate(
                ids, px, max_new_tokens=max_new, temperature=0.0, eos_token_id=-1,
                rng=jax.random.PRNGKey(0),
            ).tokens
        )

    run(SHORT_NEW)
    run(MAX_NEW)

    def p50(max_new):
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            run(max_new)
            ts.append(time.perf_counter() - t0)
        return float(np.percentile(ts, 50))

    per_seq = (MAX_NEW - SHORT_NEW) / max(p50(MAX_NEW) - p50(SHORT_NEW), 1e-9)
    return per_seq * batch


def main() -> None:
    backend = jax.default_backend()
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown").lower()
    hbm_gbps = next((v for k, v in _HBM_GBPS.items() if k in kind.replace(" ", "")), 819.0)

    dtype = "bfloat16" if backend == "tpu" else "float32"
    cfg = bench_config(dtype)
    tc = cfg.text_config

    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    params = jax.device_put(params)
    # (Serving fusion — models/fuse.py — measured a wash at decode and +3 ms
    # TTFT on 1 chip via scripts/bench_fuse_ab.py, so the bench serves the
    # unfused layout; fusion stays available for multi-chip serving.)

    n_img = tc.num_image_tokens
    s = n_img + PROMPT_TEXT_LEN
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, s), 0, tc.vocab_size - 10)
    ids = ids.at[:, :n_img].set(cfg.image_token_index)
    raw = jax.random.randint(
        jax.random.PRNGKey(2), (1, cfg.vision_config.image_size, cfg.vision_config.image_size, 3),
        0, 255, jnp.int32,
    ).astype(jnp.uint8)

    engine = InferenceEngine(params, cfg, max_cache_length=CACHE_LEN)

    @jax.jit
    def preprocess(raw):
        return preprocess_image_device(raw, cfg.vision_config.image_size, tc.jnp_dtype)

    def run(max_new):
        px = preprocess(raw)
        return engine.generate(
            ids, px, max_new_tokens=max_new, temperature=0.0, eos_token_id=-1,
            rng=jax.random.PRNGKey(0),
        )

    def fetch(res):
        # device→host fetch: the only reliable sync point on tunneled
        # backends where block_until_ready can return early.
        return np.asarray(res.tokens)

    def timed_runs(max_new, reps):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(run(max_new))
            ts.append(time.perf_counter() - t0)
        return float(np.percentile(ts, 50))

    # Warmup / compile all program shapes.
    fetch(run(1))
    fetch(run(SHORT_NEW))
    fetch(run(MAX_NEW))

    # TTFT: preprocess + prefill + first token (max_new=1 program).
    ttft_p50 = timed_runs(1, 5)

    # Decode rate from the difference of two full generates (same program
    # family, prefill cost cancels) — subtracting the separate TTFT program
    # is less robust to tunnel timing noise (one outlier sample once produced
    # an impossible 3.6x-roofline reading).
    t_short = timed_runs(SHORT_NEW, 5)
    t_long = timed_runs(MAX_NEW, 5)
    decode_tps = (MAX_NEW - SHORT_NEW) / max(t_long - t_short, 1e-9)

    batch_tps = None
    if os.environ.get("BENCH_BATCH"):
        batch_tps = batched_throughput(cfg, params, raw, preprocess, batch=8)

    mean_ctx = s + MAX_NEW // 2
    roofline = decode_roofline_tokens_per_sec(cfg, mean_ctx, hbm_gbps)
    # Effective HBM rate the decode actually sustains (bytes it must stream
    # per step × measured steps/s). For context: a pure 4.3 GB streaming
    # reduce on this chip measures ~610 GB/s (74.5% of nominal 819 —
    # scripts/bench_hbm_peak.py), so decode above that is at the practical
    # bandwidth ceiling even when the nominal-roofline fraction reads <90%.
    step_bytes = hbm_gbps * 1e9 / roofline
    effective_gbps = step_bytes * decode_tps / 1e9

    # --- full int8 serving mode: int8 weights + int8 KV cache (secondary
    # metric; before commit 8af26fd the int8_* fields measured weights-only
    # with a bf16 cache — B=1 differs by only ~1%) ---
    from llama32mm_tpu.ops.quant import quantize_llama_params

    # Free the bf16 serving state as the int8 copy is built: the bf16 engine
    # (and its cached executables) first, then each donated decoder weight —
    # both full weight sets never coexist in HBM (16 GB v5e).
    del engine
    qparams = quantize_llama_params(params, free_originals=True)
    params = None
    # Full int8 serving mode: int8 weights + int8 KV cache (kv matters little
    # at B=1 but +42% at batch 8 — see README serving table).
    qengine = InferenceEngine(qparams, cfg, max_cache_length=CACHE_LEN, kv_dtype="int8")

    def qrun(max_new):
        px = preprocess(raw)
        return qengine.generate(
            ids, px, max_new_tokens=max_new, temperature=0.0, eos_token_id=-1,
            rng=jax.random.PRNGKey(0),
        )

    def q_timed(max_new, reps):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(qrun(max_new).tokens)
            ts.append(time.perf_counter() - t0)
        return float(np.percentile(ts, 50))

    np.asarray(qrun(SHORT_NEW).tokens)
    np.asarray(qrun(MAX_NEW).tokens)
    q_short = q_timed(SHORT_NEW, 5)
    q_long = q_timed(MAX_NEW, 5)
    q_decode_tps = (MAX_NEW - SHORT_NEW) / max(q_long - q_short, 1e-9)

    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_per_chip",
                "value": round(decode_tps, 2),
                "unit": "tokens/s",
                "vs_baseline": round(decode_tps / roofline, 4),
                "roofline_tokens_per_sec": round(roofline, 2),
                "effective_hbm_gbps": round(effective_gbps, 1),
                # one-off streaming-reduce measurement of THIS dev chip
                # (scripts/bench_hbm_peak.py) — only meaningful on v5e
                **({"measured_stream_peak_gbps": 609.8} if "v5" in kind else {}),
                "ttft_p50_ms": round(ttft_p50 * 1e3, 1),
                "int8_decode_tokens_per_sec": round(q_decode_tps, 2),
                "int8_vs_bf16_roofline": round(q_decode_tps / roofline, 4),
                **({"batch8_decode_tokens_per_sec": round(batch_tps, 1)} if batch_tps else {}),
                "config": "llama3.2-3B-text+ViT-H/14@560, bf16, 1 chip",
                "backend": backend,
                "device_kind": kind,
                "prompt_len": s,
                "max_new_tokens": MAX_NEW,
            }
        )
    )


if __name__ == "__main__":
    main()
