"""Token sampling: greedy / temperature / top-k / top-p / min-p /
repetition penalty.

Parity target: reference ``select_next_token``
(``Inference/Inference.py:85-106``):

- temperature 0.0 → greedy argmax;
- otherwise: temperature-scale → top-k (kth-value threshold mask) → top-p
  nucleus with the reference's *exclusive-of-current-token* cumulative rule
  (a token survives while ``cumsum - prob(token) <= top_p``,
  ``Inference.py:102``) → categorical sample.

Beyond the reference (standard serving samplers, HF-rule semantics, tested
against ``transformers`` processors as the oracle):

- ``min_p``: drop tokens whose probability is below ``min_p`` × the top
  token's probability. A pure ratio test — ``prob(v)/prob(argmax) =
  exp(logit_v - logit_max)`` is invariant under masking other tokens — so it
  needs no sort. Applied AFTER top-k/top-p (HF warper order): its own mask is
  order-invariant, but top-p's nucleus cumsum must run over probabilities not
  renormalized by a prior min-p mask.
- ``repetition_penalty``: CTRL rule — logits of tokens already present in
  the row's context are divided by the penalty when positive, multiplied
  when negative. Applies to greedy decoding too (it changes the argmax).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def apply_repetition_penalty(
    logits: jax.Array,  # [..., V]
    presence: jax.Array,  # [..., V] bool: token appears in the row's context
    penalty,  # scalar or [...]-shaped float (1.0 = disabled)
) -> jax.Array:
    """CTRL repetition penalty (HF ``RepetitionPenaltyLogitsProcessor``
    semantics): for context-present tokens, positive logits are divided by
    ``penalty`` and negative logits multiplied by it. Returns fp32 logits."""
    l = logits.astype(jnp.float32)
    pen = jnp.asarray(penalty, jnp.float32)
    if pen.ndim:
        pen = pen.reshape(pen.shape + (1,) * (l.ndim - pen.ndim))
    pl = jnp.where(l > 0, l / pen, l * pen)
    return jnp.where(presence, pl, l)


def presence_from_tokens(
    tokens: jax.Array,  # [B, S] int token history (right-padded rows)
    n_valid: jax.Array,  # [B] count of valid leading entries per row
    vocab_size: int,
) -> jax.Array:
    """Scatter a token history into a [B, vocab] presence mask. Entries past
    ``n_valid`` and ids outside the vocab (e.g. the image placeholder id ==
    vocab_size, SURVEY §2.9 #10) are ignored."""
    b, s = tokens.shape
    valid = (jnp.arange(s)[None, :] < n_valid[:, None]) & (tokens >= 0) & (
        tokens < vocab_size
    )
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, s))
    pres = jnp.zeros((b, vocab_size), jnp.bool_)
    return pres.at[rows, jnp.clip(tokens, 0, vocab_size - 1)].max(valid)


def filter_logits(
    logits: jax.Array,  # [..., V]
    temperature: float,
    top_p: float = 0.9,
    top_k: int = 50,
    min_p: float = 0.0,
) -> jax.Array:
    """Temperature-scale then apply the top-k / top-p / min-p masks (HF
    warper order); returns filtered fp32 logits (−inf on removed tokens).
    Requires ``temperature > 0``."""
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

    if min_p > 0.0:
        # HF warper order: temperature → top_k → top_p → min_p. Applying the
        # ratio test LAST matters for top-p: its cumsum must run over
        # probabilities NOT renormalized by a prior min-p mask, or the
        # nucleus shrinks. The test itself is mask-invariant (the argmax
        # survives top-k/top-p, and prob ratios are softmax-invariant).
        lmax = jnp.max(logits, axis=-1, keepdims=True)
        logits = jnp.where(logits < lmax + jnp.log(min_p), neg_inf, logits)

    return logits


def select_next_token(
    logits: jax.Array,  # [..., V]
    rng: jax.Array,
    temperature: float = 0.0,
    top_p: float = 0.9,
    top_k: int = 50,
    min_p: float = 0.0,
    presence: jax.Array = None,  # [..., V] bool context-presence mask
    repetition_penalty: float = 1.0,
) -> jax.Array:
    """Sample token ids ``[...]`` from logits. ``temperature``/``top_p``/
    ``top_k``/``min_p``/``repetition_penalty`` are static (python) values,
    matching the CLI flags. The repetition penalty applies before the
    greedy/sampled split — it reshapes the argmax too."""
    if repetition_penalty != 1.0 and presence is not None:
        logits = apply_repetition_penalty(logits, presence, repetition_penalty)
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    return jax.random.categorical(
        rng, filter_logits(logits, temperature, top_p, top_k, min_p), axis=-1
    )


def filter_logits_traced(
    logits: jax.Array,  # [B, V]
    temperature: jax.Array,  # [B] float
    top_p: jax.Array,  # [B] float
    top_k: jax.Array,  # [B] int
    min_p: jax.Array = None,  # [B] float (None/0 = disabled)
) -> jax.Array:
    """``filter_logits`` with TRACED per-row sampler settings — one compiled
    program serves every (temperature, top_p, top_k) combination, so a
    serving batch can mix per-request samplers (and changing settings never
    recompiles). Same math as the static path: temperature-scale → kth-value
    top-k mask → exclusive-cumsum top-p mask. ``top_k <= 0`` disables top-k;
    ``top_p >= 1`` disables top-p. Rows with ``temperature <= 0`` get a safe
    divisor (callers pick argmax for those rows instead)."""
    V = logits.shape[-1]
    t = jnp.maximum(temperature.astype(jnp.float32), 1e-6)[:, None]
    logits = logits.astype(jnp.float32) / t
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)

    sorted_desc = jnp.sort(logits, axis=-1)[..., ::-1]
    k = jnp.clip(top_k, 1, V).astype(jnp.int32)
    kth_val = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    apply_k = (top_k > 0)[:, None]
    logits = jnp.where(apply_k & (logits < kth_val), neg_inf, logits)

    # top-p over the k-masked logits (the static path sorts post-mask too)
    order = jnp.argsort(logits, axis=-1)[..., ::-1]
    sorted2 = jnp.take_along_axis(logits, order, axis=-1)
    probs = jax.nn.softmax(sorted2, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    drop = ((cum - probs) > top_p[:, None]) & (top_p < 1.0)[:, None]
    sorted2 = jnp.where(drop, neg_inf, sorted2)
    inv = jnp.argsort(order, axis=-1)
    logits = jnp.take_along_axis(sorted2, inv, axis=-1)

    if min_p is not None:
        # min-p LAST (HF warper order temperature → top_k → top_p → min_p):
        # ratio test keep v while prob(v) >= min_p * prob(argmax), i.e.
        # logit_v >= logit_max + log(min_p) — no sort needed. Running it
        # after top-p keeps the nucleus cumsum over un-renormalized probs.
        lmax = jnp.max(logits, axis=-1, keepdims=True)
        thresh = lmax + jnp.log(jnp.maximum(min_p.astype(jnp.float32), 1e-30))[:, None]
        logits = jnp.where((min_p > 0.0)[:, None] & (logits < thresh), neg_inf, logits)

    return logits


def spec_verify_tokens(
    logits: jax.Array,  # [B, K+1, V] target logits at each fed position
    drafts: jax.Array,  # [B, K] proposed (deterministic) draft tokens
    rng: jax.Array,
    temperature: jax.Array,  # [B]
    top_p: jax.Array,  # [B]
    top_k: jax.Array,  # [B]
    min_p: jax.Array = None,  # [B] float (None/0 = disabled)
    presence: jax.Array = None,  # [B, V] bool context presence at chunk start
    penalty: jax.Array = None,  # [B] repetition penalty (1.0 = disabled)
) -> tuple:
    """Rejection-sampling verification of deterministic drafts (speculative
    decoding × sampling; reference sampler semantics per row).

    The draft proposal is a point mass (prompt-lookup bigram match), so the
    standard rejection rule reduces to: accept draft ``d`` with probability
    ``p(d)`` under the row's FILTERED sampling distribution ``p`` (temperature
    → top-k → top-p, exactly ``select_next_token_traced``'s distribution); on
    the first rejection, resample from ``p`` with ``d`` removed and
    renormalized (= the normalized residual ``(p - q)+`` for a point-mass
    ``q``), which makes every committed token EXACTLY ``p``-distributed —
    speculation changes latency, never the distribution. Greedy rows
    (``temperature <= 0``) accept iff the draft equals the argmax and commit
    the argmax — bit-equal to the greedy-only spec path.

    Returns ``(nxt [B, K+1] int32, acc [B, K] bool)``: committing
    ``nxt[:, :n]`` where ``n-1`` is the length of ``acc``'s leading-True
    prefix (the caller's existing cumprod+1 rule) yields accepted drafts,
    then the replacement at the first miss — or the bonus token at position
    K when everything was accepted. An all-greedy batch skips the full-vocab
    filter through the same ``lax.cond`` fast path as the plain sampler.

    Repetition penalty composes EXACTLY with speculation: position ``j``'s
    distribution is only consulted when drafts ``0..j-1`` were all accepted
    (and therefore committed), so its true context presence is the
    chunk-start ``presence`` plus exactly those drafts — a cumulative
    one-hot, computable for all positions in parallel. Committed tokens are
    then distributed identically to non-speculative penalized decoding."""
    B, K1, V = logits.shape
    K = K1 - 1
    if penalty is not None and presence is not None:

        def _penalize(l):
            dh = drafts[..., None] == jnp.arange(V)[None, None, :]  # [B,K,V]
            cum = jnp.cumsum(dh.astype(jnp.int32), axis=1) > 0
            pres = jnp.concatenate(
                [presence[:, None], presence[:, None] | cum], axis=1
            )  # [B, K+1, V]
            return apply_repetition_penalty(l, pres, penalty)

        logits = jax.lax.cond(
            jnp.all(penalty == 1.0),
            lambda l: l.astype(jnp.float32),
            _penalize,
            logits,
        )
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, K+1]
    acc_greedy = drafts == greedy[:, :K]

    def _sampled(_):
        flat = logits.reshape(B * K1, V)
        rep = lambda a: jnp.repeat(a, K1)  # noqa: E731 — row b, pos j → b*K1+j
        filt = filter_logits_traced(
            flat, rep(temperature), rep(top_p), rep(top_k),
            None if min_p is None else rep(min_p),
        ).reshape(B, K1, V)
        p = jax.nn.softmax(filt, axis=-1)
        r_acc, r_repl, r_bonus = jax.random.split(rng, 3)
        p_draft = jnp.take_along_axis(p[:, :K], drafts[..., None], axis=-1)[..., 0]
        accept = jax.random.uniform(r_acc, (B, K)) < p_draft
        # residual distribution: draft token removed, renormalized
        draft_hot = drafts[..., None] == jnp.arange(V)[None, None, :]
        masked = jnp.where(draft_hot, -jnp.inf, filt[:, :K])
        repl = jax.random.categorical(r_repl, masked, axis=-1).astype(jnp.int32)
        bonus = jax.random.categorical(r_bonus, filt[:, K], axis=-1).astype(jnp.int32)
        nxt_s = jnp.concatenate(
            [jnp.where(accept, drafts, repl), bonus[:, None]], axis=1
        )
        g_row = (temperature <= 0.0)[:, None]
        return (
            jnp.where(g_row, greedy, nxt_s),
            jnp.where(g_row, acc_greedy, accept),
        )

    return jax.lax.cond(
        jnp.all(temperature <= 0.0),
        lambda _: (greedy, acc_greedy),
        _sampled,
        operand=None,
    )


def select_next_token_traced(
    logits: jax.Array,  # [B, V]
    rng: jax.Array,
    temperature: jax.Array,  # [B]
    top_p: jax.Array,  # [B]
    top_k: jax.Array,  # [B]
    min_p: jax.Array = None,  # [B] float (None/0 = disabled)
    presence: jax.Array = None,  # [B, V] bool context presence per row
    penalty: jax.Array = None,  # [B] repetition penalty (1.0 = disabled)
) -> jax.Array:
    """Per-row sampling with traced settings: rows with ``temperature <= 0``
    take the argmax (greedy — bit-equal to the static path), the rest sample
    from the filtered distribution. One ``rng`` serves the whole batch
    (categorical draws independent gumbel noise per row).

    The filter sorts the full vocab ([B, 128k]) — expensive per decode step —
    so an all-greedy batch skips it through a runtime ``lax.cond`` (measured:
    unconditional filtering halved 4-slot greedy serving throughput, 223 →
    118 tok/s aggregate; still ONE executable for any settings mix). The
    repetition penalty applies BEFORE that split (it reshapes the greedy
    argmax too), behind its own all-disabled ``lax.cond`` fast path."""
    if penalty is not None and presence is not None:
        logits = jax.lax.cond(
            jnp.all(penalty == 1.0),
            lambda l: l.astype(jnp.float32),
            lambda l: apply_repetition_penalty(l, presence, penalty),
            logits,
        )
    greedy = jnp.argmax(logits, axis=-1)

    def _sample(_):
        filt = filter_logits_traced(logits, temperature, top_p, top_k, min_p)
        sampled = jax.random.categorical(rng, filt, axis=-1)
        return jnp.where(temperature <= 0.0, greedy, sampled)

    return jax.lax.cond(
        jnp.all(temperature <= 0.0), lambda _: greedy, _sample, operand=None
    )
