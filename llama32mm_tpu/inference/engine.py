"""jit-compiled inference engine: fused prefill + ``lax.while_loop`` decode.

TPU-native replacement for the reference's python decode loop
(``Inference/Inference.py:109-177``): instead of per-step tensor concats and a
host round-trip per token, the whole generate call — image encode, splice,
prefill, sampling, and the KV-cached decode loop — is one compiled XLA
program over a preallocated cache. Mask/position bookkeeping is index
arithmetic on static shapes (SURVEY §3.2).

Fixed to intent:
- decode positions continue each row's TRUE prompt length (reference feeds
  RoPE position 0 for every decoded token — SURVEY §2.9 #9; and counting
  right-padding slots would inflate the positional gap for short rows in a
  ragged batch);
- decode attends cached positions but keeps prompt padding blocked (the
  reference's growing-mask path crashes at step 2 and its working path
  attends padding — SURVEY §2.9 #8).

Serving: ``prompt_buckets`` pads prompts up to a small set of static lengths
so new prompt shapes reuse the compiled program instead of retracing the full
ViT+decoder+while_loop pipeline (~minutes per shape on TPU). Bucketing is
semantically transparent: RoPE positions derive from the true length and
padded key slots stay masked.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llama32mm_tpu.configs import MLLAMAConfig
from llama32mm_tpu.models.vlm import vlm_forward
from llama32mm_tpu.ops.attention import AttnMask
from llama32mm_tpu.utils.kvcache import init_kv_cache
from llama32mm_tpu.utils.sampling import select_next_token


def structured_prefill_mask(padding_mask: jax.Array, max_len: int) -> AttnMask:
    """[B, S] padding mask → AttnMask: prompt keys valid per padding, cache
    tail invalid, queries start at position 0."""
    b, s = padding_mask.shape
    kv_valid = jnp.pad(padding_mask.astype(jnp.int32), ((0, 0), (0, max_len - s)))
    return AttnMask(kv_valid=kv_valid, q_offset=jnp.asarray(0, jnp.int32))


def structured_decode_mask(
    padding_mask: jax.Array, cur_len: jax.Array, max_len: int
) -> AttnMask:
    """Decode-step AttnMask: prompt padding stays blocked, generated slots
    < cur_len valid; the single query sits at position cur_len - 1."""
    b, s = padding_mask.shape
    k = jnp.arange(max_len)[None, :]
    pad_ok = jnp.pad(padding_mask.astype(bool), ((0, 0), (0, max_len - s)), constant_values=True)
    kv_valid = ((k < cur_len) & pad_ok).astype(jnp.int32)
    return AttnMask(kv_valid=kv_valid, q_offset=jnp.asarray(cur_len - 1, jnp.int32))


def build_prefill_mask(padding_mask: jax.Array, max_len: int, dtype=jnp.float32) -> jax.Array:
    """[B, S] padding mask → [B, 1, S, max_len] additive mask: causal over the
    first S key slots, padding blocked, cache tail (k >= S) blocked."""
    b, s = padding_mask.shape
    neg = jnp.finfo(dtype).min
    q = jnp.arange(s)[:, None]
    k = jnp.arange(max_len)[None, :]
    causal_ok = k <= q  # [S, max_len]
    in_prompt = k < s
    key_pad_ok = jnp.pad(padding_mask.astype(bool), ((0, 0), (0, max_len - s)))
    ok = causal_ok[None] & in_prompt[None] & key_pad_ok[:, None, :]
    return jnp.where(ok[:, None], jnp.asarray(0.0, dtype), neg)


def build_decode_mask(
    padding_mask: jax.Array, cur_len: jax.Array, max_len: int, dtype=jnp.float32
) -> jax.Array:
    """[B, S] prompt padding mask + current total length → [B, 1, 1, max_len]
    additive mask: prompt padding stays blocked, generated slots < cur_len
    attendable, tail blocked."""
    b, s = padding_mask.shape
    neg = jnp.finfo(dtype).min
    k = jnp.arange(max_len)[None, :]
    key_pad_ok = jnp.pad(padding_mask.astype(bool), ((0, 0), (0, max_len - s)))
    ok = (k < cur_len) & jnp.where(k < s, key_pad_ok, True)
    return jnp.where(ok[:, None, None, :], jnp.asarray(0.0, dtype), neg)


def bucketed_len(s: int, max_new_tokens: int, cache_len: int, buckets) -> int:
    """Shared prompt-bucketing policy (engine + server): smallest bucket ≥ s
    whose generation still fits the cache; ``"auto"`` = next 128 multiple;
    falls back to the exact length when no bucket fits."""
    if buckets is None:
        return s
    room = cache_len - max_new_tokens
    if buckets == "auto":
        cand = min(-(-s // 128) * 128, room)
        return cand if cand >= s else s
    for b in buckets:
        if b >= s and b <= room:
            return b
    return s


class GenerateResult(NamedTuple):
    tokens: jax.Array  # [B, max_new_tokens] generated ids (eos-padded)
    num_generated: jax.Array  # [B] count of valid tokens (incl. eos)
    prefill_logits: jax.Array  # [B, V] last-position prefill logits
    # speculative mode only: decode-loop iterations taken (< num_generated
    # when drafts were accepted); None on the standard path.
    steps: Optional[jax.Array] = None


class InferenceEngine:
    """Compiled prefill+decode for a fixed (batch, prompt-capacity, cache) shape.

    One ``generate`` XLA program per (max_new_tokens, sampler setting); prompt
    padding keeps the prompt-length axis static.
    """

    def __init__(
        self,
        params,
        config: MLLAMAConfig,
        max_cache_length: Optional[int] = None,
        impl: str = "auto",
        kv_dtype: Optional[str] = None,
        prompt_buckets=None,
        spec_lookup: int = 0,
        spec_draft: int = 0,
        draft_params=None,
        draft_config=None,
        gemv_routes="auto",
    ):
        """``kv_dtype="int8"`` enables the quantized KV cache serving mode
        (int8 slots + per-position scales folded into attention — halves
        cache HBM traffic and capacity; slightly lossy, off the parity
        path).

        ``prompt_buckets``: ``None`` (exact prompt shapes — one compile per
        length), ``"auto"`` (pad up to the next 128-lane multiple — one
        compile per 128-wide band, and the prefill matmul M-tiles stay
        aligned), or an explicit ascending tuple of lengths.

        ``spec_lookup=K`` (K ≥ 1) enables prompt-lookup speculative decoding
        for greedy batch-1 generates: each loop iteration drafts K tokens by
        matching the trailing bigram against the prompt+generated history and
        verifies all of them in ONE forward (a decode step is weight-bound,
        so a K+1-token step costs ~the same HBM as a 1-token step). Exactly
        greedy-equivalent — drafts the model disagrees with are discarded.
        Wins are text-dependent (repetitive continuations accept more).

        ``spec_draft=K`` with ``draft_params``/``draft_config`` (a small
        causal LM sharing the target's vocab — e.g. 1B drafting for 11B)
        enables DRAFT-MODEL speculative decoding: each iteration rolls the
        draft forward K greedy steps (its own KV cache, ~free at draft
        scale), then verifies all K in one target forward via the same
        rejection sampler — exact for greedy and sampled decoding alike.
        Unlike prompt-lookup, acceptance tracks the draft's actual
        agreement with the target, not text repetitiveness. The draft sees
        the token stream only (image positions fed a placeholder id);
        verification guarantees the output distribution regardless of how
        the draft copes."""
        if kv_dtype not in (None, "int8"):
            raise ValueError(f"kv_dtype must be None or 'int8', got {kv_dtype!r}")
        if prompt_buckets is not None and prompt_buckets != "auto":
            prompt_buckets = tuple(sorted(int(b) for b in prompt_buckets))
        if spec_lookup < 0:
            raise ValueError(f"spec_lookup must be >= 0, got {spec_lookup}")
        if spec_draft < 0:
            raise ValueError(f"spec_draft must be >= 0, got {spec_draft}")
        if spec_draft and spec_lookup:
            raise ValueError("spec_draft and spec_lookup are mutually exclusive")
        if spec_draft and (draft_params is None or draft_config is None):
            raise ValueError("spec_draft needs draft_params and draft_config")
        if spec_draft and draft_config.vocab_size < config.text_config.vocab_size:
            raise ValueError(
                "draft vocab must cover the target vocab: "
                f"{draft_config.vocab_size} < {config.text_config.vocab_size}"
            )
        self.params = params
        self.config = config
        self.max_cache_length = max_cache_length or config.text_config.max_cache_length
        self.impl = impl
        self.kv_dtype = kv_dtype
        self.prompt_buckets = prompt_buckets
        self.spec_lookup = int(spec_lookup)
        self.spec_draft = int(spec_draft)
        self.draft_params = draft_params
        self.draft_config = draft_config
        # Decode gemv routing (VERDICT r2 #1): "auto" = the measured per-shape
        # winners on TPU (ops/pallas/gemv.py::default_decode_routes), off
        # elsewhere; pass an explicit dict or None to override. Applies to
        # decode-step/verify forwards only — prefill keeps XLA's MXU tiling.
        if gemv_routes == "auto":
            if jax.default_backend() == "tpu":
                from llama32mm_tpu.models.language import int4_route_names
                from llama32mm_tpu.ops.pallas.gemv import default_decode_routes
                from llama32mm_tpu.ops.quant import is_quantized

                anyq = any(
                    is_quantized(l)
                    for l in jax.tree.leaves(
                        params,
                        is_leaf=lambda x: isinstance(x, dict)
                        and ("q" in x or "q4" in x),
                    )
                    if isinstance(l, dict)
                )
                gemv_routes = default_decode_routes(quantized=anyq)
                # int4 leaves are ALWAYS routed (stacked): the unrouted path
                # pays an HBM→HBM dynamic-slice copy of the packed bytes
                # before the opaque Pallas call — the exact penalty
                # gemv_stacked_pallas documents (706 vs 220 GB/s) and the
                # reason all-int4 11B decode measured 0.65× int8 in round 3.
                int4_routes = int4_route_names(params)
                if int4_routes:
                    gemv_routes = {**(gemv_routes or {}), **int4_routes}
            else:
                gemv_routes = None
        self.gemv_routes = gemv_routes
        self._generate_jit = {}

    def _bucketed_len(self, s: int, max_new_tokens: int) -> int:
        return bucketed_len(s, max_new_tokens, self.max_cache_length, self.prompt_buckets)

    def _make_generate(self, max_new_tokens, temperature, top_p, top_k, min_p,
                       rep_pen, eos_token_id, use_image):
        cfg = self.config
        tc = cfg.text_config
        max_len = self.max_cache_length
        impl = self.impl
        gemv_routes = self.gemv_routes
        # repetition penalty needs the row's context presence [B, V] — built
        # from the prompt, then one scatter per committed token. Off (1.0) the
        # loop state and math are untouched.
        use_pen = rep_pen != 1.0

        kv_dtype = self.kv_dtype

        def generate_fn(params, input_ids, pixel_values, padding_mask, rng):
            b, s = input_ids.shape
            adtype = jnp.int8 if kv_dtype == "int8" else tc.jnp_dtype
            cache = init_kv_cache(tc, b, max_length=max_len, dtype=adtype)

            prefill_mask = structured_prefill_mask(padding_mask, max_len)
            # true per-row prompt length (right padding): logits are read at
            # the last valid position, and decode RoPE positions continue
            # from here rather than from the padded length — so bucketing /
            # ragged batches don't shift the query-key positional gap.
            true_len = jnp.sum(padding_mask, axis=1).astype(jnp.int32)  # [B]
            last_pos = true_len - 1
            # lm_head computed only at last_pos — the full [B, S, vocab]
            # prefill logits are never formed (TTFT: saves the S×V matmul +
            # its HBM write).
            with jax.named_scope("prefill"):
                out = vlm_forward(
                    params,
                    cfg,
                    input_ids=input_ids,
                    pixel_values=pixel_values if use_image else None,
                    attention_mask=prefill_mask,
                    kv_cache=cache,
                    impl=impl,
                    logits_positions=last_pos[:, None],
                )
            pre_logits = out.logits[:, 0]  # [B, V]

            rows = jnp.arange(b)
            if use_pen:
                from llama32mm_tpu.utils.sampling import presence_from_tokens

                safe_ids = jnp.where(
                    input_ids == cfg.image_token_index, -1, input_ids
                )  # image placeholders are not penalizable vocab tokens
                pres0 = presence_from_tokens(safe_ids, true_len, tc.vocab_size)
            else:
                pres0 = jnp.zeros((b, 1), jnp.bool_)  # unused placeholder

            rng, step_rng = jax.random.split(rng)
            first = select_next_token(
                pre_logits, step_rng, temperature, top_p, top_k, min_p,
                presence=pres0 if use_pen else None, repetition_penalty=rep_pen,
            )
            if use_pen:
                pres0 = pres0.at[rows, first].max(True)

            tokens0 = jnp.zeros((b, max_new_tokens), dtype=jnp.int32)
            tokens0 = tokens0.at[:, 0].set(first.astype(jnp.int32))
            done0 = first == eos_token_id
            count0 = jnp.ones((b,), jnp.int32)

            def cond(state):
                i, tokens, done, count, cache, last, pres, rng = state
                return (i < max_new_tokens) & (~jnp.all(done))

            def body(state):
                i, tokens, done, count, cache, last, pres, rng = state
                # Slot bookkeeping counts the padded prompt (the fed token
                # lands at slot s+i-1; after the write k < s+i slots are
                # attendable, pad slots stay blocked) — but the RoPE position
                # continues each row's TRUE length: true_len + i - 1.
                cur_total = s + i
                mask = structured_decode_mask(padding_mask, cur_total, max_len)
                pos = (true_len + (i - 1))[:, None].astype(jnp.int32)
                with jax.named_scope("decode_step"):
                    step_out = vlm_forward(
                        params,
                        cfg,
                        input_ids=last[:, None].astype(jnp.int32),
                        attention_mask=mask,
                        position_ids=pos,
                        kv_cache=cache,
                        impl=impl,
                        gemv_routes=gemv_routes,
                    )
                rng, step_rng = jax.random.split(rng)
                nxt = select_next_token(
                    step_out.logits[:, -1], step_rng, temperature, top_p, top_k,
                    min_p, presence=pres if use_pen else None,
                    repetition_penalty=rep_pen,
                ).astype(jnp.int32)
                nxt = jnp.where(done, jnp.asarray(eos_token_id, jnp.int32), nxt)
                if use_pen:
                    pres = pres.at[rows, nxt].max(~done)
                tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i))
                new_done = done | (nxt == eos_token_id)
                count = count + (~done).astype(jnp.int32)
                return (i + 1, tokens, new_done, count, step_out.kv_cache, nxt, pres, rng)

            state = (jnp.asarray(1, jnp.int32), tokens0, done0, count0, out.kv_cache,
                     first, pres0, rng)
            _, tokens, done, count, _, _, _, _ = jax.lax.while_loop(cond, body, state)
            return GenerateResult(tokens=tokens, num_generated=count, prefill_logits=pre_logits)

        return jax.jit(generate_fn)

    def _make_generate_spec(self, max_new_tokens, temperature, top_p, top_k,
                            min_p, rep_pen, eos_token_id, use_image):
        """Prompt-lookup speculative decode (batch-1).

        Each iteration drafts ``K = spec_lookup`` tokens by bigram match
        against the true token history and verifies them in one
        ``(K+1)``-token forward. A decode step streams the same weights/KV
        regardless of its (tiny) query count, so accepted drafts are nearly
        free tokens; rejected drafts cost nothing but the extra FLOPs.
        Verification is rejection sampling
        (``utils/sampling.py::spec_verify_tokens``): greedy (T=0) is
        bit-exact argmax; T>0 commits tokens EXACTLY distributed per the
        sampler settings — speculation never changes the distribution.
        Cache bookkeeping: the K+1 entries land at slots ``pos..pos+K``;
        entries past the accepted prefix are stale but stay masked
        (``kv_valid`` gates on committed length) until overwritten by the
        next iteration's write at ``pos + n_commit``."""
        from llama32mm_tpu.utils.sampling import spec_verify_tokens

        cfg = self.config
        tc = cfg.text_config
        max_len = self.max_cache_length
        impl = self.impl
        kv_dtype = self.kv_dtype
        K = self.spec_lookup
        gemv_routes = self.gemv_routes
        use_pen = rep_pen != 1.0
        samp = (
            jnp.asarray([temperature], jnp.float32),
            jnp.asarray([top_p], jnp.float32),
            jnp.asarray([top_k], jnp.int32),
            jnp.asarray([min_p], jnp.float32),
        )
        pen_arr = jnp.asarray([rep_pen], jnp.float32)

        def generate_fn(params, input_ids, pixel_values, padding_mask, rng):
            b, s = input_ids.shape  # b == 1 (enforced by generate())
            adtype = jnp.int8 if kv_dtype == "int8" else tc.jnp_dtype
            cache = init_kv_cache(tc, b, max_length=max_len, dtype=adtype)
            prefill_mask = structured_prefill_mask(padding_mask, max_len)
            true_len = jnp.sum(padding_mask, axis=1).astype(jnp.int32)
            out = vlm_forward(
                params, cfg,
                input_ids=input_ids,
                pixel_values=pixel_values if use_image else None,
                attention_mask=prefill_mask, kv_cache=cache, impl=impl,
                logits_positions=(true_len - 1)[:, None],
            )
            pre_logits = out.logits[:, 0]
            if use_pen:
                from llama32mm_tpu.utils.sampling import presence_from_tokens

                safe_ids = jnp.where(
                    input_ids == cfg.image_token_index, -1, input_ids
                )
                pres0 = presence_from_tokens(safe_ids, true_len, tc.vocab_size)
            else:
                pres0 = jnp.zeros((b, 1), jnp.bool_)
            rng, first_rng = jax.random.split(rng)
            first = select_next_token(
                pre_logits, first_rng, temperature, top_p, top_k, min_p,
                presence=pres0 if use_pen else None, repetition_penalty=rep_pen,
            ).astype(jnp.int32)  # [1]
            if use_pen:
                pres0 = pres0.at[jnp.arange(b), first].max(True)

            tl = true_len[0]
            L = s + max_new_tokens
            # True-sequence buffer for the bigram lookup: prompt at [0, tl),
            # generated appended at tl+j — no bucket-padding gap, unlike the
            # cache slot layout.
            idx = jnp.arange(L)
            seq0 = jnp.where(idx < tl, jnp.pad(input_ids[0], (0, max_new_tokens)), 0)
            seq0 = seq0.at[tl].set(first[0])
            tokens0 = jnp.zeros((b, max_new_tokens), jnp.int32).at[:, 0].set(first)
            done0 = first == eos_token_id
            count0 = jnp.ones((), jnp.int32)
            steps0 = jnp.zeros((), jnp.int32)

            pad_ok = jnp.pad(
                padding_mask.astype(bool), ((0, 0), (0, max_len - s)),
                constant_values=True,
            )

            def cond(st):
                tokens, done, count, steps, cache, seq, pres, rng = st
                return (count < max_new_tokens) & (~done[0])

            def body(st):
                tokens, done, count, steps, cache, seq, pres, rng = st
                rng, step_rng = jax.random.split(rng)
                last_at = tl + count - 1  # seq index of the last committed token
                last_tok = seq[last_at]

                # Draft K tokens: most recent earlier occurrence of the
                # trailing bigram; the K tokens that followed it. No match →
                # garbage drafts → verification rejects them (no cost beyond
                # the step we were taking anyway).
                gram_a = seq[last_at - 1]
                m = (seq == gram_a) & (jnp.roll(seq, -1) == last_tok)
                m = m & ((idx + 1) < (last_at))  # strictly before the current bigram
                best = jnp.max(jnp.where(m, idx, -1))
                start = jnp.clip(best + 2, 0, L - K)
                drafts = jax.lax.dynamic_slice(seq, (start,), (K,))

                # One (K+1)-token verify forward at cache slots p..p+K.
                p_slot = (s + count - 1).astype(jnp.int32)
                feed = jnp.concatenate([last_tok[None], drafts])[None, :]
                k_arr = jnp.arange(max_len)[None, :]
                kv_valid = ((k_arr < (p_slot + K + 1)) & pad_ok).astype(jnp.int32)
                mask = AttnMask(kv_valid=kv_valid, q_offset=p_slot)
                pos = (tl + count - 1 + jnp.arange(K + 1))[None, :].astype(jnp.int32)
                step_out = vlm_forward(
                    params, cfg, input_ids=feed, attention_mask=mask,
                    position_ids=pos, kv_cache=cache._replace(pos=p_slot),
                    impl=impl, gemv_routes=gemv_routes,
                )
                nxt_b, acc_bit = spec_verify_tokens(
                    step_out.logits, drafts[None], step_rng, *samp,
                    presence=pres if use_pen else None,
                    penalty=pen_arr if use_pen else None,
                )
                nxt = nxt_b[0]  # [K+1]

                # Longest accepted draft prefix, +1 bonus token; clamp to the
                # remaining budget and cut at the first committed eos.
                acc = jnp.cumprod(acc_bit[0].astype(jnp.int32))
                n_commit = jnp.minimum(jnp.sum(acc) + 1, max_new_tokens - count)
                j = jnp.arange(K + 1)
                eos_hit = (j < n_commit) & (nxt == eos_token_id)
                n_commit = jnp.minimum(n_commit, jnp.min(jnp.where(eos_hit, j, K + 1)) + 1)
                if use_pen:
                    pres = pres.at[jnp.zeros((K + 1,), jnp.int32), nxt].max(j < n_commit)

                tidx = jnp.arange(max_new_tokens)
                sel = (tidx >= count) & (tidx < count + n_commit)
                src = jnp.take(nxt, jnp.clip(tidx - count, 0, K))
                tokens = jnp.where(sel[None, :], src[None, :], tokens)
                sel_s = (idx >= tl + count) & (idx < tl + count + n_commit)
                src_s = jnp.take(nxt, jnp.clip(idx - (tl + count), 0, K))
                seq = jnp.where(sel_s, src_s, seq)

                done = done | jnp.any(eos_hit)[None]
                return (tokens, done, count + n_commit, steps + 1,
                        step_out.kv_cache, seq, pres, rng)

            st = (tokens0, done0, count0, steps0, out.kv_cache, seq0, pres0, rng)
            tokens, done, count, steps, _, _, _, _ = jax.lax.while_loop(cond, body, st)
            return GenerateResult(
                tokens=tokens, num_generated=count[None], prefill_logits=pre_logits,
                steps=steps,
            )

        return jax.jit(generate_fn)

    def _make_generate_spec_draft(self, max_new_tokens, temperature, top_p, top_k,
                                  min_p, rep_pen, eos_token_id, use_image):
        """Draft-model speculative decode (batch-1).

        Per iteration: the draft LM rolls K greedy single-token steps from
        the last committed token (writing its own KV cache as it goes), then
        the target verifies all K in one ``(K+1)``-token forward through the
        same rejection sampler as the prompt-lookup path — greedy stays
        bit-exact argmax, T>0 commits exactly per the target distribution.

        Cache consistency needs no rewind: the committed prefix equals what
        the draft fed (accepted drafts), and the first corrected/bonus token
        lands exactly where the next iteration's first draft step writes —
        stale entries past the commit point stay masked (``kv_valid``) until
        overwritten, same argument as the target cache.

        The draft sees only token ids (image-placeholder positions fed id 0 —
        it cannot embed ``image_token_index == vocab_size``, SURVEY §2.9 #10);
        on image prompts its early drafts are bad and verification simply
        rejects them."""
        from llama32mm_tpu.models.language import causal_lm_forward, llama_forward
        from llama32mm_tpu.utils.sampling import spec_verify_tokens

        cfg = self.config
        tc = cfg.text_config
        dtc = self.draft_config
        max_len = self.max_cache_length
        impl = self.impl
        kv_dtype = self.kv_dtype
        K = self.spec_draft
        gemv_routes = self.gemv_routes
        use_pen = rep_pen != 1.0
        samp = (
            jnp.asarray([temperature], jnp.float32),
            jnp.asarray([top_p], jnp.float32),
            jnp.asarray([top_k], jnp.int32),
            jnp.asarray([min_p], jnp.float32),
        )
        pen_arr = jnp.asarray([rep_pen], jnp.float32)

        def generate_fn(params, draft_params, input_ids, pixel_values, padding_mask, rng):
            b, s = input_ids.shape  # b == 1 (enforced by generate())
            adtype = jnp.int8 if kv_dtype == "int8" else tc.jnp_dtype
            cache = init_kv_cache(tc, b, max_length=max_len, dtype=adtype)
            prefill_mask = structured_prefill_mask(padding_mask, max_len)
            true_len = jnp.sum(padding_mask, axis=1).astype(jnp.int32)
            out = vlm_forward(
                params, cfg,
                input_ids=input_ids,
                pixel_values=pixel_values if use_image else None,
                attention_mask=prefill_mask, kv_cache=cache, impl=impl,
                logits_positions=(true_len - 1)[:, None],
            )
            pre_logits = out.logits[:, 0]
            if use_pen:
                from llama32mm_tpu.utils.sampling import presence_from_tokens

                safe_ids = jnp.where(
                    input_ids == cfg.image_token_index, -1, input_ids
                )
                pres0 = presence_from_tokens(safe_ids, true_len, tc.vocab_size)
            else:
                pres0 = jnp.zeros((b, 1), jnp.bool_)
            rng, first_rng = jax.random.split(rng)
            first = select_next_token(
                pre_logits, first_rng, temperature, top_p, top_k, min_p,
                presence=pres0 if use_pen else None, repetition_penalty=rep_pen,
            ).astype(jnp.int32)  # [1]
            if use_pen:
                pres0 = pres0.at[jnp.arange(b), first].max(True)

            # Draft prefill: same padded prompt/mask/slots, lm_head skipped
            # (only the cache is needed). Image-token ids fall outside the
            # draft's embedding table → placeholder id 0.
            draft_ids = jnp.where(input_ids == cfg.image_token_index, 0, input_ids)
            dcache = init_kv_cache(dtc, b, max_length=max_len, dtype=dtc.jnp_dtype)
            dout = llama_forward(
                draft_params["model"], dtc, input_ids=draft_ids,
                attention_mask=prefill_mask, kv_cache=dcache, impl=impl,
            )
            dcache = dout.kv_cache

            tl = true_len[0]
            tokens0 = jnp.zeros((b, max_new_tokens), jnp.int32).at[:, 0].set(first)
            done0 = first == eos_token_id
            count0 = jnp.ones((), jnp.int32)
            steps0 = jnp.zeros((), jnp.int32)
            k_arr = jnp.arange(max_len)[None, :]
            pad_ok = jnp.pad(
                padding_mask.astype(bool), ((0, 0), (0, max_len - s)),
                constant_values=True,
            )

            def cond(st):
                tokens, done, count, steps, cache, dcache, last, pres, rng = st
                return (count < max_new_tokens) & (~done[0])

            def body(st):
                tokens, done, count, steps, cache, dcache, last, pres, rng = st
                rng, step_rng = jax.random.split(rng)
                p_slot = (s + count - 1).astype(jnp.int32)

                # K+1 greedy draft steps; step j writes the draft cache at
                # slot p_slot + j and proposes draft j. The (K+1)-th step
                # exists ONLY to write slot p_slot+K (its proposal is
                # discarded): a fully-accepted chunk commits K+1 tokens, and
                # without that write the next iteration would attend an
                # unwritten draft-cache slot — drafts then degrade
                # permanently after the first full accept.
                def draft_step(j, carry):
                    dc, cur, drafts = carry
                    slot = p_slot + j
                    kvv = ((k_arr < (slot + 1)) & pad_ok).astype(jnp.int32)
                    dmask = AttnMask(kv_valid=kvv, q_offset=slot)
                    dpos = (tl + count - 1 + j)[None, None].astype(jnp.int32)
                    dlogits, dc = causal_lm_forward(
                        draft_params, dtc, input_ids=cur[None, None],
                        attention_mask=dmask, position_ids=dpos,
                        kv_cache=dc._replace(pos=slot), impl=impl,
                    )
                    nxt_d = jnp.argmax(dlogits[0, -1]).astype(jnp.int32)
                    return dc, nxt_d, drafts.at[j].set(nxt_d)

                dcache, _, dbuf = jax.lax.fori_loop(
                    0, K + 1, draft_step,
                    (dcache, last, jnp.zeros((K + 1,), jnp.int32)),
                )
                drafts = dbuf[:K]

                # One (K+1)-token target verify at slots p..p+K.
                feed = jnp.concatenate([last[None], drafts])[None, :]
                kv_valid = ((k_arr < (p_slot + K + 1)) & pad_ok).astype(jnp.int32)
                mask = AttnMask(kv_valid=kv_valid, q_offset=p_slot)
                pos = (tl + count - 1 + jnp.arange(K + 1))[None, :].astype(jnp.int32)
                step_out = vlm_forward(
                    params, cfg, input_ids=feed, attention_mask=mask,
                    position_ids=pos, kv_cache=cache._replace(pos=p_slot),
                    impl=impl, gemv_routes=gemv_routes,
                )
                nxt_b, acc_bit = spec_verify_tokens(
                    step_out.logits, drafts[None], step_rng, *samp,
                    presence=pres if use_pen else None,
                    penalty=pen_arr if use_pen else None,
                )
                nxt = nxt_b[0]  # [K+1]

                acc = jnp.cumprod(acc_bit[0].astype(jnp.int32))
                n_commit = jnp.minimum(jnp.sum(acc) + 1, max_new_tokens - count)
                j = jnp.arange(K + 1)
                eos_hit = (j < n_commit) & (nxt == eos_token_id)
                n_commit = jnp.minimum(n_commit, jnp.min(jnp.where(eos_hit, j, K + 1)) + 1)
                if use_pen:
                    pres = pres.at[jnp.zeros((K + 1,), jnp.int32), nxt].max(j < n_commit)

                tidx = jnp.arange(max_new_tokens)
                sel = (tidx >= count) & (tidx < count + n_commit)
                src = jnp.take(nxt, jnp.clip(tidx - count, 0, K))
                tokens = jnp.where(sel[None, :], src[None, :], tokens)
                new_last = nxt[n_commit - 1]

                done = done | jnp.any(eos_hit)[None]
                return (tokens, done, count + n_commit, steps + 1,
                        step_out.kv_cache, dcache, new_last, pres, rng)

            st = (tokens0, done0, count0, steps0, out.kv_cache, dcache, first[0],
                  pres0, rng)
            tokens, done, count, steps, _, _, _, _, _ = jax.lax.while_loop(cond, body, st)
            return GenerateResult(
                tokens=tokens, num_generated=count[None], prefill_logits=pre_logits,
                steps=steps,
            )

        return jax.jit(generate_fn)

    def generate(
        self,
        input_ids,
        pixel_values=None,
        attention_mask=None,
        max_new_tokens: int = 256,
        temperature: float = 0.0,
        top_p: float = 0.9,
        top_k: int = 50,
        min_p: float = 0.0,
        repetition_penalty: float = 1.0,
        eos_token_id: int = -1,
        rng: Optional[jax.Array] = None,
    ) -> GenerateResult:
        if not (0.0 <= min_p <= 1.0):
            # min_p > 1 masks every token (threshold above the argmax prob)
            raise ValueError(f"min_p must be in [0, 1], got {min_p}")
        if repetition_penalty <= 0:
            raise ValueError(
                f"repetition_penalty must be > 0, got {repetition_penalty}"
            )
        input_ids = jnp.asarray(input_ids)
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), dtype=jnp.int32)
        else:
            attention_mask = jnp.asarray(attention_mask)
        # Bucket the prompt to a static length (compile reuse; positions stay
        # exact because decode continues from the true length). Spec decoding
        # needs K extra cache slots past the budget (the final verify writes
        # K+1 entries) — without reserving them here, auto-bucketing could pad
        # into that headroom and the capacity check below would spuriously
        # reject a prompt that fits unbucketed.
        spec_k = self.spec_lookup or self.spec_draft
        s_b = self._bucketed_len(s, max_new_tokens + spec_k)
        if s_b != s:
            input_ids = jnp.pad(input_ids, ((0, 0), (0, s_b - s)))
            attention_mask = jnp.pad(attention_mask, ((0, 0), (0, s_b - s)))
            s = s_b
        if s + max_new_tokens > self.max_cache_length:
            raise ValueError(
                f"prompt ({s}) + max_new_tokens ({max_new_tokens}) exceeds KV cache "
                f"capacity {self.max_cache_length}"
            )
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        use_image = pixel_values is not None
        if spec_k > 0:
            which = "spec" if self.spec_lookup else "specd"
            if b != 1:
                raise ValueError(f"{which} decoding supports batch size 1")
            if s + max_new_tokens + spec_k > self.max_cache_length:
                # every verify step writes K+1 entries even on the final
                # iteration — without this headroom the last write would run
                # past the cache and dynamic_update_slice would CLAMP the
                # start, silently corrupting committed slots
                raise ValueError(
                    f"speculative K={spec_k} needs K extra cache slots: "
                    f"prompt ({s}) + max_new_tokens ({max_new_tokens}) + K > "
                    f"capacity {self.max_cache_length}"
                )
            key = (which, max_new_tokens, temperature, top_p, top_k, min_p,
                   repetition_penalty, eos_token_id, use_image)
            if key not in self._generate_jit:
                make = (self._make_generate_spec if which == "spec"
                        else self._make_generate_spec_draft)
                self._generate_jit[key] = make(*key[1:])
        else:
            key = (max_new_tokens, temperature, top_p, top_k, min_p,
                   repetition_penalty, eos_token_id, use_image)
            if key not in self._generate_jit:
                self._generate_jit[key] = self._make_generate(*key)
        px = (
            jnp.asarray(pixel_values, dtype=self.config.text_config.jnp_dtype)
            if use_image
            else jnp.zeros((b, 3, 1, 1), self.config.text_config.jnp_dtype)
        )
        if self.spec_draft > 0:
            return self._generate_jit[key](
                self.params, self.draft_params, input_ids, px, attention_mask, rng
            )
        return self._generate_jit[key](self.params, input_ids, px, attention_mask, rng)

    def decode_tokens(self, tokenizer, result: GenerateResult, batch_idx: int = 0) -> str:
        toks = np.asarray(result.tokens[batch_idx])[: int(result.num_generated[batch_idx])]
        return tokenizer.decode([int(t) for t in toks], skip_special_tokens=True).strip()
