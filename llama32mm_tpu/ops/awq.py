"""Activation-aware weight equalization for int4/int8 quantization (AWQ-style).

VERDICT r2 #5: the int4 recipe was bare symmetric RTN. AWQ's observation
(Lin et al., public method) is that quantization error is dominated by the
weights multiplying LARGE activations; scaling those input channels up in the
weight (and down in the producer) before rounding preserves them, and the
rescale folds EXACTLY into adjacent ops — no runtime cost:

- q/k/v consume norm1's output, gate/up consume norm2's: per-channel scales
  fold into the RMSNorm gammas (``out_i = (x+res)_i · inv_rms · γ_i`` — γ is
  a pure per-channel post-scale, so ``γ/s`` ↔ ``W·s`` is exact);
- w_down consumes ``silu(gate)·up``: scales fold into w_up's OUTPUT columns
  (``silu(g)·(u/s) @ (s·W_down) = silu(g)·u @ W_down`` — exact through the
  elementwise product because silu(g) is untouched);
- the tied/untied lm_head consumes final_norm's output: folds into
  final_norm. (Not equalized here: folding into final_norm would also scale
  the TIED embedding lookup; only untied heads could use it, and the head
  measured quantization-insensitive — scripts/bench_int4_quality.py.)

Calibration: one ordinary forward with ``collect_stats=True``
(``models/language.py``) returns per-layer per-channel mean-|input| of every
decoder linear. No reference counterpart (the reference has no quantization).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def calibrate_stats(params: dict, config, input_ids, pixel_values=None, attention_mask=None):
    """Run one calibration forward; returns the per-layer stats dict
    ``{"norm1_absmean": [L, h], "norm2_absmean": [L, h], "inter_absmean": [L, I]}``."""
    from llama32mm_tpu.models.vlm import vlm_forward

    b = input_ids.shape[0]
    out = vlm_forward(
        params, config, input_ids=input_ids, pixel_values=pixel_values,
        attention_mask=attention_mask, collect_stats=True,
        # stats come from the decoder body — skip the full [B, T, vocab]
        # logits (0.9+ GB at bench shapes; calibration doesn't read them)
        logits_positions=jnp.zeros((b, 1), jnp.int32),
    )
    return jax.tree.map(lambda x: jax.lax.stop_gradient(x), out.stats)


def _scales(absmean: jax.Array, alpha: float) -> jax.Array:
    """AWQ scale ``s = (E|x|)^α``, normalized per layer to geometric mean 1
    (keeps overall weight magnitude — and the group maxima — centered)."""
    a = jnp.maximum(absmean.astype(jnp.float32), 1e-6) ** alpha
    log_gm = jnp.mean(jnp.log(a), axis=-1, keepdims=True)
    return a / jnp.exp(log_gm)


def awq_equalize(params: dict, stats: dict, alpha: float = 0.5) -> dict:
    """Return a numerics-identical param tree with activation-aware scales
    folded in (quantize the result with ``quantize_llama_params``).

    Applies three exact foldings: norm1 ↔ q/k/v rows, norm2 ↔ gate/up rows,
    w_up columns ↔ w_down rows. ``alpha=0.5`` is AWQ's standard tradeoff
    between protecting activations and inflating weight ranges."""
    lm = params.get("language_model", params)
    blocks = lm["model"]["blocks"]
    att, ff = blocks["att"], blocks["ff"]
    sw = ff["swiglu"]
    dt = sw["w_gate"].dtype

    s1 = _scales(stats["norm1_absmean"], alpha)  # [L, h]
    s2 = _scales(stats["norm2_absmean"], alpha)  # [L, h]
    sd = _scales(stats["inter_absmean"], alpha)  # [L, I]

    def rows(w, s):  # input-channel (row) scaling of [L, in, out]
        return (w.astype(jnp.float32) * s[:, :, None]).astype(dt)

    def cols(w, s):  # output-channel (column) scaling of [L, in, out]
        return (w.astype(jnp.float32) * s[:, None, :]).astype(dt)

    new_blocks = {
        **blocks,
        "norm1": {"weight": (blocks["norm1"]["weight"].astype(jnp.float32) / s1).astype(dt)},
        "norm2": {"weight": (blocks["norm2"]["weight"].astype(jnp.float32) / s2).astype(dt)},
        "att": {
            **att,
            "W_query": {"weight": rows(att["W_query"]["weight"], s1)},
            "W_key": {"weight": rows(att["W_key"]["weight"], s1)},
            "W_value": {"weight": rows(att["W_value"]["weight"], s1)},
        },
        "ff": {
            **ff,
            "swiglu": {
                **sw,
                "w_gate": rows(sw["w_gate"], s2),
                # w_up gets BOTH foldings: rows by the norm2 scales (its
                # input), columns by 1/sd (so w_down rows can take sd)
                "w_up": cols(rows(sw["w_up"], s2), 1.0 / sd),
            },
            "w_down": {"weight": rows(ff["w_down"]["weight"], sd)},
        },
    }
    new_lm = {**lm, "model": {**lm["model"], "blocks": new_blocks}}
    if "language_model" in params:
        return {**params, "language_model": new_lm}
    return new_lm
