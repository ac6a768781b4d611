"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: single-image VLM decode tokens/sec/chip (BASELINE.md north star:
≥90% of the HBM-bandwidth roofline; the reference publishes no numbers, so
``vs_baseline`` reports measured/roofline).

On the single available chip an 11B bf16 model does not fit in a v5e's 16 GB
HBM, so the bf16 bench config uses Llama-3.2-3B text shapes under the full
ViT-H/14 vision tower; the roofline is computed for the same config, making
the fraction hardware-meaningful. The 11B north-star shapes ARE measured in
int8 serving mode (int8 weights + int8 KV ≈ 9.3 GB — fits), reported against
their own int8 roofline. Also reports p50 TTFT (prefill incl. on-device image
preprocess from raw uint8 pixels — the second north-star metric) and int8
QUALITY vs bf16 (teacher-forced top-1 agreement + mean |Δlogit| over the
generated span) so the int8 speed numbers aren't blind.

Measurement method (hardened, round 2): decode rate comes from the difference
of two full generates (prefill cost cancels) over a 112-token window, median
of 7 reps with the IQR reported as ``decode_tps_spread``; device→host fetch
is the sync point (block_until_ready can return early through the axon
tunnel).
"""

from __future__ import annotations

import json
import os
import time

import jax

# Persistent compile cache: the round-end bench run reuses executables from
# earlier runs on this host (tunnel compiles have been observed to degrade to
# minutes; cache hits skip them entirely).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from llama32mm_tpu.configs import (
    LLAMA32Config,
    MLLAMAConfig,
    VisionEncoderConfig,
    llama32_11b_vision_config,
)
from llama32mm_tpu.inference.engine import InferenceEngine
from llama32mm_tpu.models.vlm import init_vlm_params, vlm_forward
from llama32mm_tpu.preprocess.image import preprocess_image_device

MAX_NEW = 128
SHORT_NEW = 16
REPS = 7
PROMPT_TEXT_LEN = 32
# Cache sized to request capacity rounded UP to the 128-lane tile (the cache
# seq axis is the minor dim of the decode score matrix — 1696 measured slower
# than 1792 despite streaming less KV, because ragged lane tiles cost more
# than the 96 dead slots; dead tail beyond that is pure HBM waste).
CACHE_LEN = 1792
QUALITY_SPAN = 64  # teacher-forced positions for the int8-quality comparison

# HBM bandwidth per chip (GB/s) for roofline
_HBM_GBPS = {"v5e": 819.0, "v5litepod": 819.0, "v5lite": 819.0, "v5p": 2765.0,
             "v4": 1228.0}


def resolve_hbm_gbps() -> float:
    """Nominal HBM bandwidth of the attached chip (roofline denominator),
    resolved from the device kind — shared with the standalone scripts so no
    entry point hardcodes a chip's number (ADVICE r4)."""
    kind = getattr(jax.devices()[0], "device_kind", "unknown").lower()
    return next(
        (v for k, v in _HBM_GBPS.items() if k in kind.replace(" ", "")), 819.0
    )


# Nominal bf16 matmul peak (TFLOP/s) per chip — the PRIMARY train-efficiency
# denominator (VERDICT r4 Weak #3: the measured-peak probe autotunes to
# anywhere in 118–153 TFLOP/s across compiles, a ±30% wobble that made the
# r4 MFU claim irreproducible; nominal is a constant of the part).
_NOMINAL_TFLOPS = {"v5e": 197.0, "v5litepod": 197.0, "v5lite": 197.0,
                   "v5p": 459.0, "v4": 275.0}


def resolve_nominal_tflops() -> float:
    kind = getattr(jax.devices()[0], "device_kind", "unknown").lower()
    return next(
        (v for k, v in _NOMINAL_TFLOPS.items() if k in kind.replace(" ", "")),
        197.0,
    )


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


def decode_step_bytes(cfg: MLLAMAConfig, mean_ctx: int, weight_bytes: int = 2,
                      kv_bytes: int = 2, head_bytes: int = None) -> float:
    """HBM bytes one decode step must stream: decoder weights + lm_head + the
    live KV prefix (+ fp32 per-channel / per-position scales in int8 modes)."""
    tc = cfg.text_config
    head_bytes = weight_bytes if head_bytes is None else head_bytes
    per_layer_weights = (
        tc.hidden_size * tc.n_heads * tc.head_dim  # Wq
        + 2 * tc.hidden_size * tc.n_kv_groups * tc.head_dim  # Wk, Wv
        + tc.n_heads * tc.head_dim * tc.hidden_size  # Wo
        + 3 * tc.hidden_size * tc.hidden_dim  # gate, up, down
    )
    per_layer_scales = (
        tc.n_heads * tc.head_dim + 2 * tc.n_kv_groups * tc.head_dim
        + tc.hidden_size + 2 * tc.hidden_dim + tc.hidden_size
    )
    norms = tc.n_layers * 2 * tc.hidden_size * 2  # norms stay bf16
    weights = tc.n_layers * per_layer_weights * weight_bytes + norms
    if weight_bytes == 1:
        weights += tc.n_layers * per_layer_scales * 4  # fp32 scales
    head = tc.hidden_size * tc.vocab_size * head_bytes
    if head_bytes == 1:
        head += tc.vocab_size * 4
    kv = tc.n_layers * 2 * tc.n_kv_groups * tc.head_dim * mean_ctx * kv_bytes
    if kv_bytes == 1:
        kv += tc.n_layers * 2 * tc.n_kv_groups * mean_ctx * 4  # per-position scales
    return float(weights + head + kv)


def decode_roofline_tokens_per_sec(cfg: MLLAMAConfig, mean_ctx: int, hbm_gbps: float,
                                   **kw) -> float:
    return hbm_gbps * 1e9 / decode_step_bytes(cfg, mean_ctx, **kw)


def int4_decode_step_bytes(params, cfg: MLLAMAConfig, mean_ctx: int) -> float:
    """HBM bytes one int4-mode decode step must stream, from the LIVE decoder
    + head leaves as allocated (q4 packed bytes + fp32 group scales + bf16
    norms — no analytic model to drift) + the int8 KV prefix + its
    per-position fp32 scales."""
    tc = cfg.text_config
    lm = params["language_model"]
    head = lm.get("lm_head", {})
    if head.get("weight") is None:
        # tied head: the decode streams the bf16 embedding table transposed
        head = lm["model"]["tok_emb"]
    stream = sum(
        x.nbytes
        for x in jax.tree.leaves(
            {"blocks": lm["model"]["blocks"], "fn": lm["model"]["final_norm"],
             "head": head}
        )
    )
    kv = tc.n_layers * 2 * tc.n_kv_groups * tc.head_dim * mean_ctx
    kv += tc.n_layers * 2 * tc.n_kv_groups * mean_ctx * 4
    return float(stream + kv)


def make_inputs(cfg, seed=1):
    tc = cfg.text_config
    n_img = tc.num_image_tokens
    s = n_img + PROMPT_TEXT_LEN
    ids = jax.random.randint(jax.random.PRNGKey(seed), (1, s), 0, tc.vocab_size - 10)
    ids = ids.at[:, :n_img].set(cfg.image_token_index)
    raw = jax.random.randint(
        jax.random.PRNGKey(seed + 1),
        (1, cfg.vision_config.image_size, cfg.vision_config.image_size, 3),
        0, 255, jnp.int32,
    ).astype(jnp.uint8)
    return ids, raw, s


def timed_median(fn, reps):
    """Median wall time over ``reps`` runs through the shared profiling Timer
    (``utils/profiling.py``). The fns benched here sync internally (they end
    in ``np.asarray`` of device output), so the Timer's sync is identity."""
    from llama32mm_tpu.utils.profiling import Timer

    timer = Timer(sync=lambda out: out)
    med = timer.measure("bench", fn, warmup=0, iters=reps)
    return med, np.asarray(timer.records["bench"])


def engine_decode_rate(engine, ids, px, reps=REPS, max_new=MAX_NEW, short=SHORT_NEW):
    """Decode tok/s from the difference of two full generates (prefill cost
    cancels; robust to tunnel timing noise). Returns (median_tps, spread_tps)
    where spread is the IQR of per-pair rates."""

    def run(n):
        return np.asarray(
            engine.generate(
                ids, px, max_new_tokens=n, temperature=0.0, eos_token_id=-1,
                rng=jax.random.PRNGKey(0),
            ).tokens
        )

    run(short)
    run(max_new)  # warm both programs
    _, t_s = timed_median(lambda: run(short), reps)
    _, t_l = timed_median(lambda: run(max_new), reps)
    med = (max_new - short) / max(np.percentile(t_l, 50) - np.percentile(t_s, 50), 1e-9)
    # spread: pairwise rates from matched reps (conservative noise estimate)
    pair = (max_new - short) / np.maximum(np.sort(t_l) - np.sort(t_s), 1e-9)
    q1, q3 = np.percentile(pair, 25), np.percentile(pair, 75)
    return float(med), float(q3 - q1)


def teacher_forced_logits(params, cfg, ext_ids, px, span, kv_dtype=None):
    """Logits at the last ``span`` next-token positions of ``ext_ids`` (one
    prefill; optionally through an int8 KV cache to include its error)."""
    from llama32mm_tpu.utils.kvcache import init_kv_cache
    from llama32mm_tpu.inference.engine import structured_prefill_mask

    tc = cfg.text_config
    b, s = ext_ids.shape
    positions = jnp.arange(s - span - 1, s - 1)[None, :]

    @jax.jit
    def fwd(params, ids, px):
        kv = None
        mask = None
        if kv_dtype is not None:
            kv = init_kv_cache(tc, b, max_length=CACHE_LEN, dtype=jnp.int8)
            mask = structured_prefill_mask(jnp.ones((b, s), jnp.int32), CACHE_LEN)
        out = vlm_forward(
            params, cfg, input_ids=ids, pixel_values=px, attention_mask=mask,
            kv_cache=kv, logits_positions=positions,
        )
        return out.logits.astype(jnp.float32)

    return np.asarray(fwd(params, ext_ids, px))


def _progress(msg: str) -> None:
    import sys

    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description="llama32mm-tpu benchmark")
    ap.add_argument(
        "--trace", default=None, metavar="DIR",
        help="capture a jax.profiler trace of one warm short generate into "
        "DIR (TensorBoard-loadable; phases named via jax.named_scope: "
        "vision_encode / mm_projector / image_splice / decoder / prefill / "
        "decode_step)",
    )
    args, _ = ap.parse_known_args()

    # --- same-run decode speed-of-light probes (VERDICT r3 #2: vs_achievable
    # must be measured in THIS run, not pinned from a prior session). Each
    # probe is a subprocess so its weight set never shares HBM with the bench
    # params — and they run FIRST, before this process claims the chip.
    sol_bf16 = sol_11b = sol_11b_int4 = None
    if not os.environ.get("BENCH_SKIP_SOL") and "cpu" not in os.environ.get(
        "JAX_PLATFORMS", ""
    ):
        import subprocess
        import sys

        here = os.path.dirname(os.path.abspath(__file__))

        probe_env = dict(
            os.environ,
            JAX_COMPILATION_CACHE_DIR=os.path.join(here, ".jax_cache"),
            JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="1.0",
        )

        def _sol_probe(script: str):
            try:
                out = subprocess.run(
                    [sys.executable, os.path.join(here, "scripts", script), "--json"],
                    capture_output=True, text=True, timeout=1200, env=probe_env,
                )
                rec = json.loads(out.stdout.strip().splitlines()[-1])
                return rec if rec.get("backend") == "tpu" else None
            except Exception:
                return None

        _progress("same-run decode-SoL probes (3 subprocesses, ~2-4 min each)")
        sol_bf16 = _sol_probe("bench_decode_sol.py")
        sol_11b = _sol_probe("bench_decode_sol_11b_int8.py")
        sol_11b_int4 = _sol_probe("bench_int4_decode_sol.py")
        _progress(
            f"SoL probes: bf16={sol_bf16} int8_11b={sol_11b} int4_11b={sol_11b_int4}"
        )

    backend = jax.default_backend()
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "unknown").lower()
    hbm_gbps = resolve_hbm_gbps()

    dtype = "bfloat16" if backend == "tpu" else "float32"
    cfg = bench_config(dtype)
    tc = cfg.text_config

    # One jitted dispatch generates the whole 6.4 GB tree ON DEVICE — eager
    # init is one tunneled round trip per leaf (observed minutes-to-hours when
    # the tunnel is degraded; this path is the round-end deliverable).
    _progress("initializing 3B bench params on device (single jitted dispatch)")
    t0 = time.perf_counter()
    params = jax.jit(lambda k: init_vlm_params(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    _progress(f"param init done in {time.perf_counter() - t0:.1f}s")
    # (Serving fusion — models/fuse.py — measured a wash at decode and +3 ms
    # TTFT on 1 chip via scripts/bench_fuse_ab.py, so the bench serves the
    # unfused layout; fusion stays available for multi-chip serving.)

    ids, raw, s = make_inputs(cfg)

    engine = InferenceEngine(params, cfg, max_cache_length=CACHE_LEN)

    @jax.jit
    def preprocess(raw):
        return preprocess_image_device(raw, cfg.vision_config.image_size, tc.jnp_dtype)

    px = preprocess(raw)

    def run(max_new):
        return np.asarray(
            engine.generate(
                ids, preprocess(raw), max_new_tokens=max_new, temperature=0.0,
                eos_token_id=-1, rng=jax.random.PRNGKey(0),
            ).tokens
        )

    if args.trace:
        from llama32mm_tpu.utils.profiling import trace

        _progress(f"capturing profiler trace into {args.trace}")
        run(SHORT_NEW)  # compile + warm outside the trace window
        with trace(args.trace):
            run(SHORT_NEW)
        _progress("trace captured (load with: tensorboard --logdir <DIR>)")

    # Warmup / compile TTFT program, then measure (preprocess + prefill +
    # first token in one program).
    _progress("compiling + measuring TTFT")
    run(1)
    ttft_p50, _ = timed_median(lambda: run(1), 5)

    _progress("measuring bf16 decode rate")
    decode_tps, decode_spread = engine_decode_rate(engine, ids, px)

    # Batched aggregate + its roofline (VERDICT r4 #6): on by default on TPU
    # so batch8_vs_roofline is a captured field, not a builder-session one.
    # BENCH_SKIP_BATCH=1 skips (~3 min); BENCH_BATCH=1 forces it elsewhere.
    batch_metrics = {}
    if os.environ.get("BENCH_BATCH") or (
        backend == "tpu" and not os.environ.get("BENCH_SKIP_BATCH")
    ):
        try:
            batch_metrics = batched_throughput(cfg, params, raw, preprocess,
                                               batch=8, hbm_gbps=hbm_gbps)
        except Exception as e:  # never break the driver capture
            _progress(f"batched section failed: {type(e).__name__}: {e}")

    mean_ctx = s + MAX_NEW // 2
    roofline = decode_roofline_tokens_per_sec(cfg, mean_ctx, hbm_gbps)
    # Effective HBM rate the decode actually sustains (bytes it must stream
    # per step × measured steps/s). For context: a pure 4.3 GB streaming
    # reduce on this chip measures ~610 GB/s (74.5% of nominal 819 —
    # scripts/bench_hbm_peak.py), so decode above that is at the practical
    # bandwidth ceiling even when the nominal-roofline fraction reads <90%.
    effective_gbps = decode_step_bytes(cfg, mean_ctx) * decode_tps / 1e9

    # --- int8 quality inputs: teacher-forced span from the bf16 greedy run
    # (computed with the bf16 params BEFORE they are donated to quantization;
    # reuses the already-compiled 128-token program)
    bf16_tokens = run(MAX_NEW)[:, :QUALITY_SPAN]
    ext_ids = jnp.concatenate([ids, jnp.asarray(bf16_tokens)], axis=1)
    logits_bf16 = teacher_forced_logits(params, cfg, ext_ids, px, QUALITY_SPAN)

    # --- training throughput (VERDICT r3 #3): on-chip 3B LoRA train step on
    # the bf16 params before they are donated to quantization ---
    train_metrics = {}
    if backend == "tpu" and not os.environ.get("BENCH_SKIP_TRAIN"):
        _progress("LoRA train-step throughput (compile + 5 steps)")
        train_metrics = bench_lora_train(cfg, params)

    # --- int4 serving mode on the 3B shapes: every decoder linear + head
    # packed-nibble (g=128) + int8 KV. Measured BEFORE the bf16→int8 donation
    # (needs the bf16 originals); quality reported against the same bf16
    # teacher-forced span so the speed number isn't blind.
    int4_metrics = {}
    if backend == "tpu" and not os.environ.get("BENCH_SKIP_INT4"):
        q4params = q4engine = logits_int4 = None
        try:
            _progress("quantizing to int4 + measuring int4 quality/speed")
            from llama32mm_tpu.ops.quant import quantize_llama_params as _q

            q4params = _q(params, bits=4)
            logits_int4 = teacher_forced_logits(
                q4params, cfg, ext_ids, px, QUALITY_SPAN, kv_dtype="int8"
            )
            i4_top1 = float(np.mean(
                np.argmax(logits_bf16, -1) == np.argmax(logits_int4, -1)
            ))
            i4_dlogit = float(np.mean(np.abs(logits_bf16 - logits_int4)))
            q4engine = InferenceEngine(
                q4params, cfg, max_cache_length=CACHE_LEN, kv_dtype="int8"
            )
            i4_tps, i4_spread = engine_decode_rate(q4engine, ids, px, reps=5)
            # int4 3B roofline (VERDICT r4 Weak #1: the field was 11B-only):
            # live packed+scale bytes of the int4 decoder/head + int8 KV
            i4_roofline = hbm_gbps * 1e9 / int4_decode_step_bytes(
                q4params, cfg, s + (MAX_NEW + SHORT_NEW) // 2
            )
            int4_metrics = {
                "int4_decode_tokens_per_sec": round(i4_tps, 2),
                "int4_decode_spread": round(i4_spread, 2),
                "int4_roofline_tokens_per_sec": round(i4_roofline, 2),
                "int4_vs_roofline": round(i4_tps / i4_roofline, 4),
                "int4_top1_agreement": round(i4_top1, 4),
                "int4_mean_abs_dlogit": round(i4_dlogit, 4),
                "int4_kernel_variant": _gemv_variant(),
            }
        except Exception as e:  # never break the driver capture
            _progress(f"int4 3B section failed: {type(e).__name__}: {e}")
        finally:
            # ADVICE r4: a failed int4 section must not leave its weight copy
            # referenced and shrink HBM for the int8/11B sections below
            del q4params, q4engine, logits_int4
            import gc

            gc.collect()

    # --- full int8 serving mode: int8 weights + int8 KV cache ---
    _progress("quantizing to int8 + measuring int8 quality/speed")
    from llama32mm_tpu.ops.quant import quantize_llama_params

    # Free the bf16 serving state as the int8 copy is built: the bf16 engine
    # (and its cached executables) first, then each donated decoder weight —
    # both full weight sets never coexist in HBM (16 GB v5e).
    del engine
    qparams = quantize_llama_params(params, free_originals=True)
    params = None

    logits_int8 = teacher_forced_logits(qparams, cfg, ext_ids, px, QUALITY_SPAN)
    logits_int8kv = teacher_forced_logits(
        qparams, cfg, ext_ids, px, QUALITY_SPAN, kv_dtype="int8"
    )

    def quality(a, b):
        top1 = float(np.mean(np.argmax(a, -1) == np.argmax(b, -1)))
        dlogit = float(np.mean(np.abs(a - b)))
        return top1, dlogit

    int8_top1, int8_dlogit = quality(logits_bf16, logits_int8)
    int8kv_top1, int8kv_dlogit = quality(logits_bf16, logits_int8kv)

    qengine = InferenceEngine(qparams, cfg, max_cache_length=CACHE_LEN, kv_dtype="int8")
    q_decode_tps, q_spread = engine_decode_rate(qengine, ids, px, reps=5)
    del qengine
    qparams = None

    # --- 11B north-star shapes in int8 serving mode (fits the 16 GB chip:
    # ~9.3 GB int8 decoder+head, bf16 embeddings/vision; weights are random
    # int8 — identical speed, no 21 GB bf16 intermediate ever exists) ---
    m11b = {}
    if backend == "tpu" and not os.environ.get("BENCH_SKIP_11B"):
        import gc
        import sys

        gc.collect()
        jax.clear_caches()  # drop 3B executables + their donated-buffer refs
        try:
            used = jax.devices()[0].memory_stats().get("bytes_in_use", 0)
            print(f"[bench] HBM in use before 11B section: {used/1e9:.2f} GB",
                  file=sys.stderr)
        except Exception:
            pass
        _progress("11B int8 section: on-device param init")
        cfg11 = llama32_11b_vision_config(max_cache_length=CACHE_LEN)
        m11b = bench_11b_int8(cfg11, hbm_gbps, sol=sol_11b)
        if not os.environ.get("BENCH_SKIP_INT4"):
            try:
                gc.collect()
                jax.clear_caches()
                _progress("11B int4 section: param init")
                m11b.update(bench_11b_int4(cfg11, hbm_gbps, sol=sol_11b_int4))
            except Exception as e:
                _progress(f"11B int4 section failed: {type(e).__name__}: {e}")
            # mixed recipe measured in the SAME run so the all-int4 vs mixed
            # A/B (VERDICT r4 #2 / docs/serving.md mode table) is a captured
            # artifact, not a builder-session claim. No SoL probe: the mixed
            # layout streams the same packed-nibble + int8 planes the two
            # probes above already bound.
            try:
                gc.collect()
                jax.clear_caches()
                _progress("11B mixed-recipe section: param init")
                m11b.update(bench_11b_int4(cfg11, hbm_gbps, mixed=True))
            except Exception as e:
                _progress(f"11B mixed section failed: {type(e).__name__}: {e}")

    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec_per_chip",
                "value": round(decode_tps, 2),
                "unit": "tokens/s",
                "vs_baseline": round(decode_tps / roofline, 4),
                "roofline_tokens_per_sec": round(roofline, 2),
                "decode_tps_spread": round(decode_spread, 2),
                "reps": REPS,
                "effective_hbm_gbps": round(effective_gbps, 1),
                # decode SoL = the exact decode gemv+KV access pattern stripped
                # of all model overhead (bench_decode_sol.py), measured in THIS
                # run by the subprocess probe above — the engine matching /
                # exceeding it means the remaining gap to the nominal 819 GB/s
                # roofline is hardware stream efficiency, not software. The
                # pinned fallback (r3 session: 106.2 steps/s, 609.8 GB/s stream
                # peak via bench_hbm_peak.py) only applies if the probe failed.
                **(
                    {
                        "decode_sol_tokens_per_sec": sol_bf16["sol_steps_per_sec"],
                        "decode_sol_effective_gbps": sol_bf16["effective_gbps"],
                        "vs_decode_sol": round(
                            decode_tps / sol_bf16["sol_steps_per_sec"], 4
                        ),
                        "decode_sol_source": "same-run probe",
                    }
                    if sol_bf16
                    else (
                        {
                            "measured_stream_peak_gbps": 609.8,
                            "decode_sol_tokens_per_sec": 106.2,
                            "vs_decode_sol": round(decode_tps / 106.2, 4),
                            "decode_sol_source": "r3 pinned (probe failed)",
                        }
                        if "v5" in kind
                        else {}
                    )
                ),
                "ttft_p50_ms": round(ttft_p50 * 1e3, 1),
                "int8_decode_tokens_per_sec": round(q_decode_tps, 2),
                "int8_vs_bf16_roofline": round(q_decode_tps / roofline, 4),
                # int8 quality vs bf16 (teacher-forced over the 64-token
                # generated span; random-init weights = near-worst-case logit
                # margins, real checkpoints agree more)
                "int8_top1_agreement": round(int8_top1, 4),
                "int8_mean_abs_dlogit": round(int8_dlogit, 4),
                "int8kv_top1_agreement": round(int8kv_top1, 4),
                "int8kv_mean_abs_dlogit": round(int8kv_dlogit, 4),
                **batch_metrics,
                **int4_metrics,
                **train_metrics,
                **m11b,
                "config": "llama3.2-3B-text+ViT-H/14@560, bf16, 1 chip",
                "backend": backend,
                "device_kind": kind,
                "prompt_len": s,
                "max_new_tokens": MAX_NEW,
            }
        )
    )


def random_int8_vlm_params(cfg: MLLAMAConfig):
    """Random params with the decoder linears directly int8 (+fp32 scales) —
    generated ON DEVICE in one jitted dispatch (host init + leaf-by-leaf
    device_put measured 20+ minutes through a degraded tunnel). Large leaves
    are drawn chunk-by-chunk under ``lax.map`` so RNG bits (4 bytes/element —
    a full (L, h, inter) draw would transiently need ~4× the 9.3 GB tree)
    stay chunk-sized. Every element is a fresh draw — this matters: weights
    built by broadcasting one random tile over the layer axis measured the
    decode 23% ABOVE its access-pattern speed-of-light and ABOVE the nominal
    HBM roofline (physically impossible for real streams — identical buffers
    evidently get aliased/deduped somewhere in the runtime); fresh draws
    reproduce the host-initialized numbers exactly (71.1 vs 71.7 tok/s)."""
    tc = cfg.text_config
    h, hd, nq, nkv, inter, L = (
        tc.hidden_size, tc.head_dim, tc.n_heads, tc.n_kv_groups, tc.hidden_dim, tc.n_layers
    )
    vc = cfg.vision_config
    d, vi, vL, p = vc.hidden_size, vc.intermediate_size, vc.num_hidden_layers, vc.patch_size

    def build(key):
        ctr = [0]

        def next_key():
            ctr[0] += 1
            return jax.random.fold_in(key, ctr[0])

        def _chunked(draw, shape):
            """draw(key, chunk_shape) mapped over the leading (3D stacks) or a
            split of the last (large 2D) axis; fresh values everywhere, RNG
            transients bounded by one chunk."""
            if len(shape) == 3:
                keys = jax.random.split(next_key(), shape[0])
                return jax.lax.map(lambda k: draw(k, shape[1:]), keys)
            rows, last = shape
            if rows * last <= (1 << 26):
                return draw(next_key(), shape)
            reps = next((r for r in (32, 16, 8, 4, 2) if last % r == 0), 1)
            keys = jax.random.split(next_key(), reps)
            cols = jax.lax.map(lambda k: draw(k, (rows, last // reps)), keys)
            return jnp.swapaxes(cols, 0, 1).reshape(rows, last)

        def qleaf(shape, out_dim):
            def draw(k, sh):
                return jax.random.randint(k, sh, -127, 128, jnp.int32).astype(jnp.int8)

            scale_shape = shape[:1] + (out_dim,) if len(shape) == 3 else (out_dim,)
            return {"q": _chunked(draw, shape),
                    "scale": jnp.full(scale_shape, 0.008, jnp.float32)}

        def bf16(shape, scale=0.02):
            def draw(k, sh):
                return jax.random.uniform(k, sh, jnp.float32, -scale, scale).astype(jnp.bfloat16)

            return _chunked(draw, shape)

        blocks = {
            "norm1": {"weight": jnp.ones((L, h), jnp.bfloat16)},
            "att": {
                "W_query": {"weight": qleaf((L, h, nq * hd), nq * hd)},
                "W_key": {"weight": qleaf((L, h, nkv * hd), nkv * hd)},
                "W_value": {"weight": qleaf((L, h, nkv * hd), nkv * hd)},
                "out_proj": {"weight": qleaf((L, nq * hd, h), h)},
            },
            "norm2": {"weight": jnp.ones((L, h), jnp.bfloat16)},
            "ff": {
                "swiglu": {
                    "w_gate": qleaf((L, h, inter), inter),
                    "w_up": qleaf((L, h, inter), inter),
                },
                "w_down": {"weight": qleaf((L, inter, h), h)},
            },
        }

        def vlin(n_in, n_out):
            return {"weight": bf16((vL, n_in, n_out)),
                    "bias": jnp.zeros((vL, n_out), jnp.bfloat16)}

        def vln():
            return {"weight": jnp.ones((vL, d), jnp.bfloat16),
                    "bias": jnp.zeros((vL, d), jnp.bfloat16)}

        vision = {
            "embeddings": {
                "patch_embedding": {"weight": bf16((vc.num_channels * p * p, d))},
                "position_embedding": {"weight": bf16((vc.num_patches, d))},
            },
            "layers": {
                "layernorm1": vln(),
                "self_attn": {k: vlin(d, d) for k in ("q_proj", "k_proj", "v_proj", "out_proj")},
                "layernorm2": vln(),
                "mlp": {"fc1": vlin(d, vi), "fc2": vlin(vi, d)},
            },
            "post_layernorm": {"weight": jnp.ones((d,), jnp.bfloat16),
                               "bias": jnp.zeros((d,), jnp.bfloat16)},
        }
        return {
            "vision_model": vision,
            "multi_modal_projector": {
                "linear": {"weight": bf16((d, h)), "bias": jnp.zeros((h,), jnp.bfloat16)}
            },
            "language_model": {
                "model": {"tok_emb": {"weight": bf16((tc.vocab_size, h))}, "blocks": blocks,
                          "final_norm": {"weight": jnp.ones((h,), jnp.bfloat16)}},
                "lm_head": {"weight": qleaf((h, tc.vocab_size), tc.vocab_size)},
            },
        }

    params = jax.jit(build)(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    return params


def bench_11b_int8(cfg11: MLLAMAConfig, hbm_gbps: float, sol: dict | None = None) -> dict:
    tc = cfg11.text_config
    params = random_int8_vlm_params(cfg11)
    ids, raw, s = make_inputs(cfg11, seed=5)

    @jax.jit
    def preprocess(raw):
        return preprocess_image_device(raw, cfg11.vision_config.image_size, tc.jnp_dtype)

    px = preprocess(raw)
    engine = InferenceEngine(params, cfg11, max_cache_length=CACHE_LEN, kv_dtype="int8")

    def run(max_new):
        return np.asarray(
            engine.generate(
                ids, px, max_new_tokens=max_new, temperature=0.0, eos_token_id=-1,
                rng=jax.random.PRNGKey(0),
            ).tokens
        )

    _progress("11B: compiling + measuring TTFT")
    run(1)
    ttft, _ = timed_median(lambda: run(1), 5)
    _progress("11B: measuring decode rate")
    # 112-token window (was 64-16=48 in r3): the narrow window put the whole
    # measurement inside one tunnel-jitter quantum and produced the ±20%
    # spread VERDICT r3 flagged (Weak #2); same protocol as the 3B headline.
    tps, spread = engine_decode_rate(engine, ids, px, reps=7, max_new=128, short=16)
    mean_ctx = s + (128 + 16) // 2
    roofline = decode_roofline_tokens_per_sec(
        cfg11, mean_ctx, hbm_gbps, weight_bytes=1, kv_bytes=1, head_bytes=1
    )
    return {
        "m11b_int8_decode_tokens_per_sec": round(tps, 2),
        "m11b_int8_decode_spread": round(spread, 2),
        "m11b_int8_roofline_tokens_per_sec": round(roofline, 2),
        "m11b_int8_vs_roofline": round(tps / roofline, 4),
        # achievable ceiling: the 11B int8 decode's exact access pattern (int8
        # gemvs convert-into-dot + fp32 scales + int8 KV dots) stripped of all
        # model overhead (scripts/bench_decode_sol_11b_int8.py) — measured in
        # THIS run by the subprocess probe when available; the gap from
        # vs_roofline to 1.0 is int8-gemv stream efficiency.
        **(
            {
                "m11b_int8_sol_steps_per_sec": sol["sol_steps_per_sec"],
                "m11b_int8_vs_sol": round(tps / sol["sol_steps_per_sec"], 4),
                "m11b_sol_source": "same-run probe",
            }
            if sol
            else {
                "m11b_int8_sol_steps_per_sec": 72.06,
                "m11b_int8_vs_sol": round(tps / 72.06, 4),
                "m11b_sol_source": "r3 pinned (probe failed)",
            }
        ),
        "m11b_int8_ttft_p50_ms": round(ttft * 1e3, 1),
        "m11b_config": "llama3.2-11B-Vision shapes, int8 weights + int8 KV, 1 chip",
    }


INT4_GROUP = 128


def random_int4_vlm_params(cfg: MLLAMAConfig, mixed: bool = False):
    """Random 11B params with decoder linears + lm_head int4 packed-nibble
    (per-group-128 scales), vision/embeddings bf16 — built by swapping q4
    leaves into :func:`random_int8_vlm_params`'s tree (packed bytes drawn
    host-side: uint8 bulk randomness is cheap and layer-unique, so no
    buffer-dedup hazard — see the int8 builder's docstring).

    ``mixed=True`` builds the INT4_MIXED_RECIPE shape instead: gate/up +
    lm_head int4, attention + w_down stay int8 (the quality recipe,
    ops/quant.py::INT4_MIXED_RECIPE)."""
    tc = cfg.text_config
    rng = np.random.default_rng(0)

    def q4leaf(shape):
        *lead, ci, co = shape
        packed = rng.integers(0, 256, (*lead, ci // 2, co), dtype=np.uint8)
        scale = np.full((*lead, ci // INT4_GROUP, co), 0.008, np.float32)
        return {"q4": jax.device_put(jnp.asarray(packed)),
                "scale": jax.device_put(jnp.asarray(scale))}

    params = random_int8_vlm_params(cfg)
    h, hd, nq, nkv, inter, L = (
        tc.hidden_size, tc.head_dim, tc.n_heads, tc.n_kv_groups, tc.hidden_dim,
        tc.n_layers,
    )
    blocks = params["language_model"]["model"]["blocks"]
    if not mixed:
        blocks["att"]["W_query"]["weight"] = q4leaf((L, h, nq * hd))
        blocks["att"]["W_key"]["weight"] = q4leaf((L, h, nkv * hd))
        blocks["att"]["W_value"]["weight"] = q4leaf((L, h, nkv * hd))
        blocks["att"]["out_proj"]["weight"] = q4leaf((L, nq * hd, h))
        blocks["ff"]["w_down"]["weight"] = q4leaf((L, inter, h))
    blocks["ff"]["swiglu"]["w_gate"] = q4leaf((L, h, inter))
    blocks["ff"]["swiglu"]["w_up"] = q4leaf((L, h, inter))
    params["language_model"]["lm_head"]["weight"] = q4leaf((h, tc.vocab_size))
    return params


def bench_11b_int4(cfg11: MLLAMAConfig, hbm_gbps: float, mixed: bool = False,
                   sol: dict | None = None) -> dict:
    """11B north-star shapes with decoder linears + head int4 packed-nibble
    (g=128) + int8 KV — since the shift-free unpack kernel
    (ops/pallas/gemv.py::_int4_kernel_post) this is the FASTEST 11B serving
    mode on one chip, not just the smallest (~7.2 GB weights).
    ``mixed=True`` measures the INT4_MIXED_RECIPE layout instead
    (gate/up + head int4, attention + w_down int8; ``m11b_mixed_*`` fields)."""
    tc = cfg11.text_config
    params = random_int4_vlm_params(cfg11, mixed=mixed)
    ids, raw, s = make_inputs(cfg11, seed=5)

    @jax.jit
    def preprocess(raw):
        return preprocess_image_device(raw, cfg11.vision_config.image_size, tc.jnp_dtype)

    px = preprocess(raw)
    engine = InferenceEngine(params, cfg11, max_cache_length=CACHE_LEN, kv_dtype="int8")

    def run(max_new):
        return np.asarray(
            engine.generate(
                ids, px, max_new_tokens=max_new, temperature=0.0, eos_token_id=-1,
                rng=jax.random.PRNGKey(0),
            ).tokens
        )

    _progress("11B int4: compiling + measuring TTFT")
    run(1)
    ttft, _ = timed_median(lambda: run(1), 5)
    _progress("11B int4: measuring decode rate")
    tps, spread = engine_decode_rate(engine, ids, px, reps=7, max_new=128, short=16)

    # Roofline from the bytes the decode step actually streams (shared helper
    # — live q4 packed + fp32 group scale + bf16 norm leaves + int8 KV).
    mean_ctx = s + (128 + 16) // 2
    roofline = hbm_gbps * 1e9 / int4_decode_step_bytes(params, cfg11, mean_ctx)
    p = "m11b_mixed" if mixed else "m11b_int4"
    desc = ("int4 gate/up+head, int8 attn+w_down (mixed recipe)" if mixed
            else "int4 packed weights (g=128)")
    return {
        f"{p}_decode_tokens_per_sec": round(tps, 2),
        f"{p}_decode_spread": round(spread, 2),
        f"{p}_roofline_tokens_per_sec": round(roofline, 2),
        f"{p}_vs_roofline": round(tps / roofline, 4),
        # achievable ceiling: the int4 decode's exact access pattern (the
        # engine's own stacked packed-nibble Pallas kernels + int8 KV dots)
        # stripped of all model overhead — measured in THIS run by
        # scripts/bench_int4_decode_sol.py when available (VERDICT r4 #1).
        **(
            {
                f"{p}_sol_steps_per_sec": sol["sol_steps_per_sec"],
                f"{p}_vs_sol": round(tps / sol["sol_steps_per_sec"], 4),
                f"{p}_sol_source": "same-run probe",
            }
            if sol
            else {}
        ),
        f"{p}_ttft_p50_ms": round(ttft * 1e3, 1),
        f"{p}_weights_gb": round(sum(x.nbytes for x in jax.tree.leaves(params)) / 1e9, 2),
        f"{p}_kernel_variant": _gemv_variant(),
        f"{p}_config": f"llama3.2-11B-Vision shapes, {desc} + int8 KV, 1 chip",
    }


def _gemv_variant() -> str:
    from llama32mm_tpu.ops.pallas import gemv as _g

    return _g._INT4_VARIANT


TRAIN_BATCH = 4
TRAIN_SEQ = 2048


def lora_train_flops_per_token(tc, seq_len: int, rank: int = 16) -> tuple[float, float]:
    """(executed, model) matmul FLOPs per token for one LoRA train step.

    Accounting (documented so the MFU figure is falsifiable):
    - ``lin``: forward matmul FLOPs/token over the decoder linears + lm_head
      (2·m·n per token per [m,n] matmul).
    - ``attn``: forward attention FLOPs/token, QKᵀ + AV, causal-halved:
      per sequence 2·T²·n_heads·head_dim → per token 2·T·n_heads·head_dim·L.
    - executed = lin·3 + attn·4 + lora·4: base weights are frozen so the
      backward runs dgrad only (1× fwd for linears, 2× for attention's four
      grad matmuls), and ``remat=True`` re-runs the forward during the
      backward (+1×). Adapter matmuls (rank·(n_in+n_out)) pay fwd + dgrad +
      wgrad + remat ≈ 4×. Flash-attention's internal score recompute in the
      VJP is NOT counted, so MFU is slightly conservative.
    - model = lin·2 + attn·3 + lora·3 — the same accounting with no remat
      term: the PaLM-style "useful" FLOPs, the numerator of ``train_mfu``.
    """
    h, hd, nq, nkv, inter, L, V = (
        tc.hidden_size, tc.head_dim, tc.n_heads, tc.n_kv_groups, tc.hidden_dim,
        tc.n_layers, tc.vocab_size,
    )
    lin = L * 2 * (h * nq * hd + 2 * h * nkv * hd + nq * hd * h + 3 * h * inter) + 2 * h * V
    attn = L * 2 * nq * hd * seq_len
    # adapted matmuls: q/k/v/o + gate/up/down per layer, + lm_head
    lora_dims = [
        (h, nq * hd), (h, nkv * hd), (h, nkv * hd), (nq * hd, h),
        (h, inter), (h, inter), (inter, h),
    ]
    lora = L * sum(2 * rank * (a + b) for a, b in lora_dims) + 2 * rank * (h + V)
    executed = lin * 3 + attn * 4 + lora * 4
    model = lin * 2 + attn * 3 + lora * 3
    return float(executed), float(model)


def measure_matmul_peak_tflops(dtype=jnp.bfloat16, reps: int = 3) -> float:
    """Same-run MXU ceiling: dependency-chained n³ matmuls inside one jit,
    synced by a host fetch of one element (the denominator of train_mfu; r3
    pinned value was 138 TFLOP/s via scripts/bench_matmul_peak.py).

    Chained-in-one-program + np.asarray sync matters on the axon tunnel,
    where ``block_until_ready`` on a single dispatched op returns before the
    op executes (measured: 0.07 ms for one 8192³ matmul ⇒ 17 PFLOP/s, i.e. a
    lie). The remote compile service's autotune is also nondeterministic
    across compiles of the SAME shape (observed 118–153 TFLOP/s for 4096³
    depending on the compile, stable <1% within one executable), so the
    ceiling is the MAX over two shapes — a low denominator would flatter
    train_mfu. Compiles are one-time via the persistent .jax_cache."""
    from jax import lax

    best = 0.0
    for n, chain in ((4096, 64), (8192, 32)):
        a = jax.random.normal(jax.random.PRNGKey(0), (n, n), dtype)
        # fold the magnitude normalisation into b so the loop body is one
        # pure matmul (entries of y stay ~N(0,1): each product scales by √n)
        b = jax.random.normal(jax.random.PRNGKey(1), (n, n), dtype) / jnp.asarray(
            n**0.5, dtype
        )

        @jax.jit
        def f(a, b, chain=chain):
            y, _ = lax.scan(lambda y, _: (y @ b, None), a, None, length=chain)
            return y[0, 0]

        np.asarray(f(a, b))  # compile + warm
        med, _ = timed_median(lambda: np.asarray(f(a, b)), reps)
        best = max(best, 2.0 * n**3 * chain / med / 1e12)
    return best


def bench_lora_train(cfg, params) -> dict:
    """On-chip LoRA train-step throughput at the 3B shapes (VERDICT r3 #3):
    text-only packed batch [4, 2048], rank-16 adapters over every decoder
    linear + lm_head (the reference README's apply_lora recipe), remat +
    chunked-CE — the same configuration scripts/bench_qlora_11b.py uses for
    the 11B long-context runs. Returns train_tokens_per_sec, train_mfu
    (model FLOPs vs NOMINAL peak — stable across runs) and train_hfu
    (executed FLOPs incl. remat, the hardware-utilization figure)."""
    from llama32mm_tpu.train.lora import init_lora_params, make_lora_train_step

    tc = cfg.text_config
    peak_tflops = measure_matmul_peak_tflops(tc.jnp_dtype)

    lora = init_lora_params(jax.random.PRNGKey(7), cfg, rank=16)
    init_state, train_step = make_lora_train_step(
        cfg, remat=True, loss_chunk=512
    )
    state = init_state(lora)
    step = jax.jit(train_step)

    k = jax.random.PRNGKey(11)
    batch = {
        "input_ids": jax.random.randint(
            k, (TRAIN_BATCH, TRAIN_SEQ), 0, tc.vocab_size - 10
        ),
        "labels": jax.random.randint(
            jax.random.fold_in(k, 1), (TRAIN_BATCH, TRAIN_SEQ), 0, tc.vocab_size - 10
        ),
    }
    rng = jax.random.PRNGKey(13)

    state, loss = step(params, state, batch, rng)
    np.asarray(loss)  # host fetch: the only sync the axon tunnel honours

    def one_step():
        nonlocal state
        state, loss = step(params, state, batch, rng)
        np.asarray(loss)

    med, _ = timed_median(one_step, 5)
    tokens = TRAIN_BATCH * TRAIN_SEQ
    tps = tokens / med
    executed, model = lora_train_flops_per_token(tc, TRAIN_SEQ)
    nominal = resolve_nominal_tflops()
    del state, lora
    # Labeling (VERDICT r4 Weak #3): train_mfu = MODEL FLOPs (no remat term)
    # against the NOMINAL chip peak — both numerator convention and
    # denominator are stable across runs, so the field is reproducible by the
    # driver. train_hfu = executed FLOPs incl. remat recomputation (the
    # hardware-utilization figure the r4 capture mislabeled as MFU). The
    # measured same-run matmul peak stays as a diagnostic denominator
    # (*_vs_measured_peak) because its compile-time autotune wobbles ±30%.
    return {
        "train_tokens_per_sec": round(tps, 1),
        "train_mfu": round(model * tps / (nominal * 1e12), 4),
        "train_hfu": round(executed * tps / (nominal * 1e12), 4),
        "train_mfu_vs_measured_peak": round(model * tps / (peak_tflops * 1e12), 4),
        "train_hfu_vs_measured_peak": round(executed * tps / (peak_tflops * 1e12), 4),
        "train_step_ms": round(med * 1e3, 1),
        "nominal_peak_tflops": round(nominal, 1),
        "matmul_peak_tflops": round(peak_tflops, 1),
        "train_config": "3B LoRA r16 all-linears+head, [4,2048] text, remat+chunked-CE, bf16",
    }


def batched_decode_roofline(cfg, batch: int, mean_ctx: int, hbm_gbps: float,
                            **byte_kw) -> float:
    """Aggregate-token HBM roofline for batched decode (VERDICT r4 #6): one
    step streams the decoder weights + head ONCE and the live KV prefix once
    PER SEQUENCE, so

        steps/s ceiling = HBM / (W_bytes + batch · KV_bytes)
        aggregate tok/s ceiling = batch · steps/s ceiling.

    This is why batching wins: the weight stream amortizes over ``batch``
    tokens while only the (much smaller) KV traffic scales. Activations are
    negligible at these batch sizes (≤ 8·h per matmul vs h·inter weights)."""
    w_bytes = decode_step_bytes(cfg, 0, **byte_kw)  # ctx=0 → weights+head only
    kv_bytes = decode_step_bytes(cfg, mean_ctx, **byte_kw) - w_bytes
    return batch * hbm_gbps * 1e9 / (w_bytes + batch * kv_bytes)


def batched_throughput(cfg, params, raw, preprocess, batch: int = 8,
                       hbm_gbps: float = 819.0) -> dict:
    """Aggregate decode throughput with a batch of concurrent sequences —
    the serving-scale secondary metric (weights stream once per step
    regardless of batch), reported against its own aggregate roofline
    (``batched_decode_roofline``). Enabled with BENCH_BATCH=1 (adds ~2
    compiles)."""
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
    agg = per_seq * batch
    roofline = batched_decode_roofline(cfg, batch, s + MAX_NEW // 2, hbm_gbps)
    return {
        f"batch{batch}_decode_tokens_per_sec": round(agg, 1),
        f"batch{batch}_roofline_tokens_per_sec": round(roofline, 1),
        f"batch{batch}_vs_roofline": round(agg / roofline, 4),
    }


if __name__ == "__main__":
    main()
