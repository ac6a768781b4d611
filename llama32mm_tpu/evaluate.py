"""Quality evaluation: teacher-forced perplexity and cross-mode agreement.

The reference has no evaluation tooling of any kind (SURVEY §4: no tests, no
benchmarks — the HF pipeline is its only oracle). Serving ships quantized
modes (int8 weights, int8 KV, int4), and a speed number without a quality
number invites shipping a degraded mode blind — this module is the quality
side:

- ``perplexity(params, config, ids)`` — windowed teacher-forced NLL over a
  token stream through the text decoder (one jitted program per window
  shape; fp32 log-softmax).
- ``agreement(params_a, params_b, config, ids)`` — per-position top-1
  next-token agreement and mean |Δlogit| between two parameter sets (e.g.
  bf16 vs int8) on the same stream.
- CLI: ``python -m llama32mm_tpu.evaluate --hf-weights DIR --text FILE
  [--quantize int8|int4] [--compare]``.

Citations: loss semantics follow the reference's shifted CE
(``Model/model.py:431-438``); the decoder math is the parity path
(PARITY.md).
"""

from __future__ import annotations

import argparse
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from llama32mm_tpu.configs import MLLAMAConfig


def _window_fn(config: MLLAMAConfig, impl: str, kv_dtype: Optional[str] = None):
    """Jitted: window ids [1, W] → (sum NLL over next-token predictions,
    count, logits [1, W, V]). ``kv_dtype="int8"`` routes the prefill through
    a quantized KV cache so the int8-KV rounding error is part of the
    measured quality (the serving int8-KV mode's actual numerics)."""
    from llama32mm_tpu.models.language import causal_lm_forward
    from llama32mm_tpu.ops.attention import AttnMask
    from llama32mm_tpu.utils.kvcache import init_kv_cache

    tc = config.text_config

    def fn(params, ids, n_valid):
        w = ids.shape[1]
        mask = AttnMask(
            kv_valid=(jnp.arange(w)[None, :] < n_valid).astype(jnp.int32),
            q_offset=jnp.asarray(0, jnp.int32),
        )
        kv = None
        if kv_dtype is not None:
            kv = init_kv_cache(tc, ids.shape[0], max_length=w,
                               dtype=jnp.dtype(kv_dtype))
        logits, _ = causal_lm_forward(
            params["language_model"], tc, input_ids=ids, attention_mask=mask,
            kv_cache=kv, impl=impl,
        )
        logits = logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        # predict ids[t+1] from position t; positions >= n_valid-1 are pad
        tgt = ids[:, 1:]
        tok_logp = jnp.take_along_axis(logp[:, :-1], tgt[..., None], axis=-1)[..., 0]
        valid = (jnp.arange(w - 1)[None, :] < (n_valid - 1)).astype(jnp.float32)
        nll = -jnp.sum(tok_logp * valid)
        return nll, jnp.sum(valid), logits

    return jax.jit(fn)


def _windows(ids: np.ndarray, window: int):
    """Split a 1-D token stream into (padded window, n_valid) pieces."""
    n = ids.shape[0]
    for start in range(0, n, window):
        piece = ids[start : start + window]
        n_valid = piece.shape[0]
        if n_valid < 2:
            break  # a single token predicts nothing
        if n_valid < window:
            piece = np.pad(piece, (0, window - n_valid))
        yield piece[None].astype(np.int32), n_valid


def perplexity(
    params,
    config: MLLAMAConfig,
    token_ids,
    window: int = 2048,
    impl: str = "auto",
    kv_dtype: Optional[str] = None,
) -> dict:
    """Teacher-forced perplexity of the text decoder over ``token_ids``
    (1-D array/list). Windows are independent (no cross-window context —
    the standard strided-eval simplification); one executable serves every
    window. ``kv_dtype="int8"`` includes the int8-KV rounding error."""
    ids = np.asarray(token_ids).reshape(-1)
    window = int(min(window, max(2, ids.shape[0])))
    fn = _window_fn(config, impl, kv_dtype)
    total_nll, total_tok = 0.0, 0.0
    for piece, n_valid in _windows(ids, window):
        nll, cnt, _ = fn(params, jnp.asarray(piece), jnp.asarray(n_valid, jnp.int32))
        total_nll += float(nll)
        total_tok += float(cnt)
    if total_tok == 0:
        raise ValueError("need at least 2 tokens to evaluate perplexity")
    mean_nll = total_nll / total_tok
    return {
        "nll_per_token": mean_nll,
        "perplexity": float(np.exp(mean_nll)),
        "tokens": int(total_tok),
        "window": window,
    }


def agreement(
    params_a,
    params_b,
    config: MLLAMAConfig,
    token_ids,
    window: int = 2048,
    impl: str = "auto",
    kv_dtype_b: Optional[str] = None,
) -> dict:
    """Greedy next-token top-1 agreement + mean |Δlogit| between two
    parameter sets on the same stream (the quantization-quality metric —
    docs/serving.md 'speed × quality'). ``kv_dtype_b`` runs the B side
    through a quantized KV cache (serving-mode numerics; the A side stays
    the clean reference)."""
    ids = np.asarray(token_ids).reshape(-1)
    window = int(min(window, max(2, ids.shape[0])))
    fn = _window_fn(config, impl)
    fn_b = _window_fn(config, impl, kv_dtype_b) if kv_dtype_b else fn

    # Per-window stats reduced ON DEVICE: the raw window logits are
    # [1, W, 128k] fp32 ≈ 1 GB — fetching them to host per window per net
    # (the first implementation) costs minutes per mode on a tunneled chip
    # and 16 GB of host traffic per agreement call; two scalars cost nothing.
    # Semantics identical to the host version: match = Σ over the first
    # n_valid-1 positions of (argmax_a == argmax_b); dsum = Σ over those
    # positions of mean-over-vocab |Δlogit|.
    @jax.jit
    def pair_stats(la, lb, n_valid):
        w = la.shape[1]
        valid = (jnp.arange(w) < (n_valid - 1)).astype(jnp.float32)
        hit = (jnp.argmax(la[0], -1) == jnp.argmax(lb[0], -1)).astype(jnp.float32)
        dmean = jnp.mean(jnp.abs(la[0] - lb[0]), axis=-1)
        return jnp.sum(hit * valid), jnp.sum(dmean * valid)

    match, total, dsum = 0.0, 0.0, 0.0
    for piece, n_valid in _windows(ids, window):
        pj, nj = jnp.asarray(piece), jnp.asarray(n_valid, jnp.int32)
        _, _, la = fn(params_a, pj, nj)
        _, _, lb = fn_b(params_b, pj, nj)
        m, d = pair_stats(la, lb, nj)
        match += float(m)
        dsum += float(d)
        total += n_valid - 1
    return {
        "top1_agreement": match / total,
        "mean_abs_dlogit": dsum / total,
        "tokens": int(total),
    }


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Perplexity / quantization-quality eval.")
    p.add_argument("--hf-weights", required=True)
    p.add_argument("--text", required=True, help="UTF-8 text file to evaluate on.")
    p.add_argument("--window", type=int, default=2048)
    p.add_argument("--max-tokens", type=int, default=32768)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--quantize", choices=["none", "int8", "int4"], default="none")
    p.add_argument(
        "--compare", action="store_true",
        help="also evaluate the unquantized model and report agreement "
        "(loads both — needs the HBM for two copies).",
    )
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from llama32mm_tpu.io.checkpoint import load_hf_model

    model, tokenizer = load_hf_model(
        args.hf_weights, dtype=args.dtype,
        streaming=args.quantize != "none",
        quantize_int8=args.quantize == "int8",
        quantize_int4=args.quantize == "int4",
    )
    with open(args.text, encoding="utf-8") as f:
        ids = np.asarray(tokenizer(f.read()).input_ids[: args.max_tokens])
    print(f"evaluating {ids.shape[0]} tokens, window {args.window}, "
          f"quantize={args.quantize}")
    res = perplexity(model.params, model.config, ids, window=args.window)
    print({k: round(v, 4) if isinstance(v, float) else v for k, v in res.items()})
    if args.compare and args.quantize != "none":
        ref, _ = load_hf_model(args.hf_weights, dtype=args.dtype)
        agr = agreement(ref.params, model.params, model.config, ids, window=args.window)
        print({k: round(v, 4) if isinstance(v, float) else v for k, v in agr.items()})


if __name__ == "__main__":
    main()
