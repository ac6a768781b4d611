"""Token sampling: greedy / temperature / top-k / top-p.

Parity target: reference ``select_next_token``
(``Inference/Inference.py:85-106``):

- temperature 0.0 → greedy argmax;
- otherwise: temperature-scale → top-k (kth-value threshold mask) → top-p
  nucleus with the reference's *exclusive-of-current-token* cumulative rule
  (a token survives while ``cumsum - prob(token) <= top_p``,
  ``Inference.py:102``) → categorical sample.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def filter_logits(
    logits: jax.Array,  # [..., V]
    temperature: float,
    top_p: float = 0.9,
    top_k: int = 50,
) -> jax.Array:
    """Temperature-scale then apply the top-k / top-p masks; returns filtered
    fp32 logits (−inf on removed tokens). Requires ``temperature > 0``."""
    logits = logits.astype(jnp.float32) / temperature
    neg_inf = jnp.asarray(-jnp.inf, logits.dtype)

    if top_k > 0:
        k = min(top_k, logits.shape[-1])
        kth_val = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth_val, neg_inf, logits)

    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        sorted_order = jnp.argsort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # exclusive-of-current-token rule (Inference.py:102)
        drop = (cum - probs) > top_p
        sorted_logits = jnp.where(drop, neg_inf, sorted_logits)
        # scatter back to vocabulary order
        inv = jnp.argsort(sorted_order, axis=-1)
        logits = jnp.take_along_axis(sorted_logits, inv, axis=-1)

    return logits


def select_next_token(
    logits: jax.Array,  # [..., V]
    rng: jax.Array,
    temperature: float = 0.0,
    top_p: float = 0.9,
    top_k: int = 50,
) -> jax.Array:
    """Sample token ids ``[...]`` from logits. ``temperature``/``top_p``/
    ``top_k`` are static (python) values, matching the CLI flags."""
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    return jax.random.categorical(rng, filter_logits(logits, temperature, top_p, top_k), axis=-1)
