"""Gradient accumulation shared by the LoRA and full-FT train steps.

TPU-first shape: the microbatch loop is a ``lax.scan`` (one compiled body,
activation memory of a single microbatch), and microbatch gradients are
weighted by their valid-target counts so the accumulated update equals the
single big-batch update EXACTLY — the per-batch loss is a mean over valid
(non-``ignore_index``) shifted targets (models/vlm.py shifted CE), so
``grad(total mean) = Σ nᵢ·grad(meanᵢ) / Σ nᵢ``, not the unweighted average
of microbatch grads (those differ whenever padding is uneven).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def valid_target_count(labels: jax.Array, ignore_index: int) -> jax.Array:
    """Number of positions the shifted CE scores: targets are ``labels[:, 1:]``
    minus ``ignore_index`` entries."""
    return jnp.sum(labels[:, 1:] != ignore_index).astype(jnp.float32)


def accumulate_grads(
    loss_fn,
    wrt,
    batch: dict,
    rng: jax.Array,
    accum_steps: int,
    ignore_index: int,
):
    """Run ``loss_fn(wrt, microbatch, rng_i)`` over the leading ``[A, ...]``
    microbatch axis of ``batch`` under ``lax.scan``, returning
    ``(loss, grads)`` identical to one big-batch ``value_and_grad``.

    Every ``batch`` leaf must carry the same leading dim ``A == accum_steps``;
    each microbatch must contain at least one valid target (a microbatch of
    pure padding makes its mean loss NaN before the zero weight can mask it).
    """
    for k, v in batch.items():
        if v is not None and v.shape[0] != accum_steps:
            raise ValueError(
                f"accum_steps={accum_steps}: batch[{k!r}] must carry a leading "
                f"microbatch axis of that size, got shape {v.shape}"
            )
    rngs = jax.random.split(rng, accum_steps)
    grad_fn = jax.value_and_grad(loss_fn)

    def body(carry, xs):
        gsum, lsum, nsum = carry
        mb, r = xs
        loss, grads = grad_fn(wrt, mb, r)
        n = valid_target_count(mb["labels"], ignore_index)
        gsum = jax.tree.map(lambda a, g: a + g * n, gsum, grads)
        return (gsum, lsum + loss * n, nsum + n), None

    zeros = jax.tree.map(jnp.zeros_like, wrt)
    (gsum, lsum, nsum), _ = jax.lax.scan(
        body, (zeros, jnp.zeros(()), jnp.zeros(())), (batch, rngs)
    )
    grads = jax.tree.map(lambda g: (g / nsum).astype(g.dtype), gsum)
    return lsum / nsum, grads
