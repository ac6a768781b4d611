"""Continuous-batching serving loop over a fixed pool of KV-cache slots.

The reference serves one request per process (``Inference/Inference.py:109-177``
— load, preprocess, one prefill, one python decode loop). Production serving
needs the next request to start without waiting for the previous one to
finish. This module adds that as a TPU-native scheduler:

- a **fixed pool of B cache slots** (static shapes — no recompilation as
  requests come and go);
- **admission = prefill-into-slot**: one compiled program per prompt bucket
  encodes the image, prefills the prompt into a slot-sized cache, and splices
  it into the batch cache at the assigned slot (a contiguous
  ``dynamic_update_slice`` on the slot axis);
- **decode = one batched program** advancing every slot one token per step,
  ``steps_per_sync`` steps per dispatch (``lax.scan``), with **per-slot**
  write offsets, RoPE positions, and validity bitmaps — each slot sits at its
  own fill level, so a freshly admitted prompt decodes next to a request that
  is 500 tokens in (the per-row cache write is one XLA scatter per layer,
  ``utils/kvcache.py::update_stacked``);
- host-side bookkeeping only between dispatches: queueing, slot assignment,
  EOS / max-new-token completion, per-request token collection;
- **prefix caching** (``register_prefix``): the KV of a shared prompt prefix
  (system preamble, few-shot header, image+instruction template, multi-turn
  history) is computed once and held in a one-slot cache; admission copies it
  into the slot and prefills only the suffix at ``q_offset = prefix_len`` —
  same decoder chunk programs, token-identical outputs, prefill cost
  proportional to the suffix;
- **speculative decoding** (``spec_lookup=K``): every live slot drafts K
  tokens from its own history (prompt-lookup bigram match) and the pool
  verifies them in ONE (K+1)-token forward — decode streams the same
  weights regardless of query count, so accepted drafts are nearly free for
  every slot at once; verification is per-slot rejection sampling, so greedy
  requests stay bit-exact and sampled requests keep their exact target
  distribution (spec × sampling compose);
- **multi-LoRA serving** (``adapter_bank=stack_adapter_bank([...])``): each
  request picks a LoRA by ``adapter_id`` and every slot decodes with ITS
  adapter in the same batched forward (per-row A/B einsums over gathered
  adapters) — multi-tenant fine-tunes share one weight stream.

Weights stream from HBM once per decode step regardless of how many slots are
live, so aggregate tokens/s scales with occupancy (the batch-8 bench point:
~4.7× single-stream at bf16, ~6.4× at int8+int8KV — docs/serving.md). Works
with the int8 weight and int8-KV serving modes unchanged.

Semantics match ``InferenceEngine.generate`` exactly for greedy decoding: a
request admitted into a busy batch produces the same tokens as a solo
``generate`` call (pinned by ``tests/test_server.py``).
"""

from __future__ import annotations

import time
from collections import deque
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llama32mm_tpu.configs import MLLAMAConfig
from llama32mm_tpu.inference.engine import structured_prefill_mask
from llama32mm_tpu.models.vlm import vlm_forward
from llama32mm_tpu.utils.kvcache import KVCache, init_kv_cache
from llama32mm_tpu.utils.sampling import (
    presence_from_tokens,
    select_next_token_traced,
    spec_verify_tokens,
)


class QueueFullError(RuntimeError):
    """Raised by ``submit`` when the admission queue is at ``max_queue``
    (backpressure — the HTTP front-end maps this to 429)."""


def _single_adapter(bank: dict, aid) -> dict:
    """One adapter tree selected from a bank by a TRACED index — leaves drop
    the bank axis, giving the shared-adapter layout ([L, in, r] blocks /
    [in, r] flat), so one admission executable serves every adapter."""
    return jax.tree.map(lambda leaf: jnp.take(leaf, aid, axis=0), bank)


class BatchState(NamedTuple):
    """Device-side state of the slot pool (one pytree, donated every step)."""

    cache: KVCache  # pos: [B] per-slot write offset (cache coords)
    kv_valid: jax.Array  # [B, S] int32: attendable cache positions per slot
    rope_pos: jax.Array  # [B] int32: next RoPE position (true tokens so far)
    last_token: jax.Array  # [B] int32: last sampled token (fed next step)
    seq: Optional[jax.Array] = None  # [B, S] int32 true token history per
    # slot (prompt + committed, densely at their true positions; invariant:
    # seq[b, rope_pos[b]] = last_token[b]) — feeds the spec-mode bigram
    # draft lookup and the repetition penalty's context-presence mask


class _Request:
    __slots__ = (
        "rid", "input_ids", "pixel_values", "max_new_tokens", "tokens",
        "slot", "finished", "prompt_len", "prefix", "adapter_id", "sampler",
        "deadline", "timed_out",
    )

    def __init__(self, rid, input_ids, pixel_values, max_new_tokens, prefix=None,
                 adapter_id=0, sampler=(0.0, 0.9, 50, 0.0, 1.0), deadline=None):
        self.rid = rid
        self.input_ids = input_ids  # np [s]
        self.pixel_values = pixel_values  # np [3, H, W] or None
        self.max_new_tokens = max_new_tokens
        self.tokens: list[int] = []
        self.slot: Optional[int] = None
        self.finished = False
        self.prompt_len = int(input_ids.shape[-1])
        self.prefix: Optional[_Prefix] = prefix
        self.adapter_id = adapter_id
        self.sampler = sampler  # (T, top_p, top_k, min_p, rep_penalty) for this request
        self.deadline = deadline  # absolute time.monotonic() cutoff or None
        self.timed_out = False


class _Prefix:
    """A registered shared prompt prefix: its KV lives in a one-slot scratch
    cache computed once; admissions that hit it prefill only the suffix."""

    __slots__ = ("pid", "input_ids", "has_image", "auto_match", "cache", "length",
                 "hits", "adapter_id")

    def __init__(self, pid, input_ids, has_image, auto_match, cache, length):
        self.pid = pid
        self.input_ids = input_ids  # np [P]
        self.has_image = has_image
        self.auto_match = auto_match
        self.cache = cache  # KVCache [L, 1, nkv, S, hd] — rows [0, length) filled
        self.length = length  # true token length P
        self.hits = 0
        self.adapter_id = 0  # the adapter its KV was computed with


class ContinuousBatchingServer:
    """Slot-pool scheduler: submit requests any time, step the batch, collect
    finished generations.

    Constructor sampler settings are per-request DEFAULTS (override per
    ``submit``; settings are traced arguments, so any mix shares one
    executable); ``max_new_tokens`` is per request. ``prompt_buckets`` as in
    ``InferenceEngine``: ``"auto"`` pads prompts to 128-lane multiples so one
    prefill executable serves a band of lengths.
    """

    def __init__(
        self,
        params,
        config: MLLAMAConfig,
        slots: int = 4,
        max_cache_length: Optional[int] = None,
        kv_dtype: Optional[str] = None,
        prompt_buckets="auto",
        impl: str = "auto",
        temperature: float = 0.0,
        top_p: float = 0.9,
        top_k: int = 50,
        min_p: float = 0.0,
        repetition_penalty: float = 1.0,
        eos_token_id: int = -1,
        steps_per_sync: int = 8,
        prefill_chunk: Optional[int] = None,
        spec_lookup: int = 0,
        adapter_bank: Optional[dict] = None,
        rng: Optional[jax.Array] = None,
        max_queue: Optional[int] = None,
        gemv_routes="auto",
    ):
        """``prefill_chunk=C`` enables **chunked admission** (Sarathi-style):
        a long prompt prefills ``C`` tokens per ``step()`` into a scratch
        cache, with a decode dispatch for the already-running slots between
        chunks — admission no longer stalls in-flight decodes for the whole
        prompt (at 32k a monolithic prefill is seconds of stall). The image
        tower still encodes in one program (it is ~17 ms and has no
        sequential structure to split); only the decoder pass chunks.
        Token-for-token identical to monolithic admission."""
        if kv_dtype not in (None, "int8"):
            raise ValueError(f"kv_dtype must be None or 'int8', got {kv_dtype!r}")
        if prefill_chunk is not None and prefill_chunk < 1:
            raise ValueError(f"prefill_chunk must be >= 1, got {prefill_chunk}")
        if spec_lookup < 0:
            raise ValueError(f"spec_lookup must be >= 0, got {spec_lookup}")
        # Multi-LoRA serving: a stacked bank of adapters
        # (train/lora.py::stack_adapter_bank); each request picks one by
        # ``submit(..., adapter_id=i)``. Entry 0 should be the identity
        # adapter (zero_lora_params) so default requests run the base model.
        # Decoder + lm_head adapters apply; vision/projector adapters are
        # request-invariant and not supported per-slot.
        self.adapter_bank = adapter_bank
        self.n_adapters = (
            int(jax.tree.leaves(adapter_bank)[0].shape[0])
            if adapter_bank is not None
            else 0
        )
        if prompt_buckets is not None and prompt_buckets != "auto":
            prompt_buckets = tuple(sorted(int(b) for b in prompt_buckets))
        self.params = params
        self.config = config
        self.slots = slots
        self.max_cache_length = max_cache_length or config.text_config.max_cache_length
        self.kv_dtype = kv_dtype
        self.prompt_buckets = prompt_buckets
        self.impl = impl
        # Decode gemv routing (VERDICT r2 #1): decode-step/verify forwards
        # stream routed weights through the large-block Pallas gemv kernels
        # ("auto" = measured winners on TPU, off elsewhere; see
        # ops/pallas/gemv.py::default_decode_routes). Admission/prefill keeps
        # XLA's MXU tiling.
        if gemv_routes == "auto":
            if jax.default_backend() == "tpu":
                from llama32mm_tpu.models.language import int4_route_names
                from llama32mm_tpu.ops.pallas.gemv import default_decode_routes
                from llama32mm_tpu.ops.quant import is_quantized

                anyq = any(
                    isinstance(l, dict) and is_quantized(l)
                    for l in jax.tree.leaves(
                        params, is_leaf=lambda x: isinstance(x, dict) and ("q" in x or "q4" in x)
                    )
                )
                gemv_routes = default_decode_routes(quantized=anyq)
                # int4 leaves always route stacked (see engine.py) — the
                # unrouted path re-slices the packed bytes HBM→HBM per step.
                int4_routes = int4_route_names(params)
                if int4_routes:
                    gemv_routes = {**(gemv_routes or {}), **int4_routes}
            else:
                gemv_routes = None
        self.gemv_routes = gemv_routes
        self.sampler = (temperature, top_p, top_k, min_p, repetition_penalty)
        self.eos_token_id = eos_token_id
        self.steps_per_sync = steps_per_sync
        self.spec_lookup = int(spec_lookup)
        self._rng = rng if rng is not None else jax.random.PRNGKey(0)
        self._donate = jax.default_backend() == "tpu"

        tc = config.text_config
        adtype = jnp.int8 if kv_dtype == "int8" else tc.jnp_dtype
        self.state = BatchState(
            cache=init_kv_cache(
                tc, slots, max_length=self.max_cache_length, dtype=adtype
            )._replace(pos=jnp.zeros((slots,), jnp.int32)),
            kv_valid=jnp.zeros((slots, self.max_cache_length), jnp.int32),
            rope_pos=jnp.zeros((slots,), jnp.int32),
            last_token=jnp.zeros((slots,), jnp.int32),
            seq=(
                jnp.zeros((slots, self.max_cache_length), jnp.int32)
            ),
        )

        self._queue: deque[_Request] = deque()
        self._by_slot: list[Optional[_Request]] = [None] * slots
        self._slot_adapter = [0] * slots  # adapter index per slot (bank mode)
        self._slot_sampler = [self.sampler] * slots  # (T, p, k, min_p, pen) per slot
        self._slot_samp_cache = None  # device copies of ^, rebuilt on admission
        self._results: dict[int, _Request] = {}
        self._next_id = 0
        self._prefill_jit = {}
        self._decode_jit = {}
        self.prefill_chunk = prefill_chunk
        self._inflight: Optional[dict] = None  # chunked admission in progress
        self._encode_jit = {}
        self._chunk_jit = {}  # chunk size -> jitted decoder pass
        self._splice_jit = None
        self._scratch_jit = None
        self._prefixes: dict[int, _Prefix] = {}
        self._next_prefix_id = 0
        self._copy_jit = None  # deep-copies a prefix cache (admissions donate)
        self._spec_steps = 0  # live-slot verify steps (spec mode)
        self._spec_tokens = 0  # tokens those steps committed
        # Backpressure: bound the admission queue (None = unbounded, the
        # round-2 behavior). A flood past the bound raises QueueFullError at
        # submit() instead of growing host memory and tail latency silently.
        if max_queue is not None and max_queue < 1:
            raise ValueError(f"max_queue must be >= 1, got {max_queue}")
        self.max_queue = max_queue
        self._timeouts = 0  # requests expired by their deadline

    # -- compiled programs --------------------------------------------------

    def _next_rng(self):
        self._rng, r = jax.random.split(self._rng)
        return r

    @staticmethod
    def _samp_args(sampler):
        """(T, p, k, min_p, pen) → traced [1]-arrays for the single-request
        programs."""
        t, p, k, mp, pen = sampler
        return (
            jnp.asarray([t], jnp.float32),
            jnp.asarray([p], jnp.float32),
            jnp.asarray([k], jnp.int32),
            jnp.asarray([mp], jnp.float32),
            jnp.asarray([pen], jnp.float32),
        )

    def _slot_samp_args(self):
        """Per-slot sampler settings as traced [B]-arrays for decode. Cached:
        they only change at admission, and rebuilding them was 3 host→device
        transfers per decode chunk (costly on tunneled backends)."""
        if self._slot_samp_cache is None:
            self._slot_samp_cache = (
                jnp.asarray([s[0] for s in self._slot_sampler], jnp.float32),
                jnp.asarray([s[1] for s in self._slot_sampler], jnp.float32),
                jnp.asarray([s[2] for s in self._slot_sampler], jnp.int32),
                jnp.asarray([s[3] for s in self._slot_sampler], jnp.float32),
                jnp.asarray([s[4] for s in self._slot_sampler], jnp.float32),
            )
        return self._slot_samp_cache

    def _make_prefill(self, bucket: int, use_image: bool):
        cfg = self.config
        tc = cfg.text_config
        impl = self.impl
        adtype = jnp.int8 if self.kv_dtype == "int8" else tc.jnp_dtype
        use_lora = self.adapter_bank is not None

        def prefill_fn(params, state: BatchState, ids, px, pad_mask, slot, rng,
                       bank, aid, samp):
            cache1 = init_kv_cache(tc, 1, max_length=bucket, dtype=adtype)
            true_len = jnp.sum(pad_mask, axis=1).astype(jnp.int32)  # [1]
            lora = _single_adapter(bank, aid) if use_lora else None
            with jax.named_scope("serve_admission"):
                out = vlm_forward(
                    params,
                    cfg,
                    input_ids=ids,
                    pixel_values=px if use_image else None,
                    attention_mask=structured_prefill_mask(pad_mask, bucket),
                    kv_cache=cache1,
                    impl=impl,
                    logits_positions=(true_len - 1)[:, None],
                    lora=lora,
                )
            safe_ids = jnp.where(ids == cfg.image_token_index, -1, ids)
            pres = presence_from_tokens(safe_ids, true_len, tc.vocab_size)
            first = select_next_token_traced(
                out.logits[:, 0], rng, samp[0], samp[1], samp[2],
                samp[3], pres, samp[4],
            )
            first = first[0].astype(jnp.int32)

            c = state.cache
            pc = out.kv_cache
            k = jax.lax.dynamic_update_slice(c.k, pc.k, (0, slot, 0, 0, 0))
            v = jax.lax.dynamic_update_slice(c.v, pc.v, (0, slot, 0, 0, 0))
            ks = vs = None
            if c.k_scale is not None:
                ks = jax.lax.dynamic_update_slice(c.k_scale, pc.k_scale, (0, slot, 0, 0))
                vs = jax.lax.dynamic_update_slice(c.v_scale, pc.v_scale, (0, slot, 0, 0))
            row_valid = jnp.pad(
                pad_mask.astype(jnp.int32),
                ((0, 0), (0, self.max_cache_length - bucket)),
            )
            seq = state.seq
            if seq is not None:
                seq_row = jnp.pad(ids, ((0, 0), (0, self.max_cache_length - bucket)))
                seq_row = seq_row.at[0, true_len[0]].set(first)
                seq = jax.lax.dynamic_update_slice(seq, seq_row, (slot, 0))
            return BatchState(
                cache=KVCache(
                    k=k, v=v, pos=c.pos.at[slot].set(bucket), k_scale=ks, v_scale=vs
                ),
                kv_valid=jax.lax.dynamic_update_slice(state.kv_valid, row_valid, (slot, 0)),
                rope_pos=state.rope_pos.at[slot].set(true_len[0]),
                last_token=state.last_token.at[slot].set(first),
                seq=seq,
            )

        return jax.jit(prefill_fn, donate_argnums=(1,) if self._donate else ())

    def _make_decode(self, n_steps: int):
        cfg = self.config
        tc = cfg.text_config
        impl = self.impl
        gemv_routes = self.gemv_routes
        S = self.max_cache_length
        dt = tc.jnp_dtype
        use_lora = self.adapter_bank is not None

        def decode_fn(params, state: BatchState, active, rng, bank, slot_aid,
                      slot_samp):
            karange = jnp.arange(S)[None, :]
            if use_lora:
                from llama32mm_tpu.train.lora import gather_adapter_bank

                lora = gather_adapter_bank(bank, slot_aid)  # loop-invariant
            else:
                lora = None

            def one(st: BatchState, step_rng):
                # Write offset per slot; the fed token's key lands there and
                # must be attendable this step (like the engine's
                # structured_decode_mask with cur_len = wp + 1).
                wp = jnp.clip(st.cache.pos, 0, S - 1)  # [B]
                new_bit = (karange == wp[:, None]).astype(jnp.int32)
                attend = (st.kv_valid != 0) | (new_bit != 0)
                mask4 = jnp.where(
                    attend[:, None, None, :], jnp.asarray(0.0, dt), jnp.finfo(dt).min
                )
                with jax.named_scope("serve_decode_step"):
                    out = vlm_forward(
                        params,
                        cfg,
                        input_ids=st.last_token[:, None],
                        attention_mask=mask4,
                        position_ids=st.rope_pos[:, None],
                        kv_cache=st.cache._replace(pos=wp),
                        impl=impl,
                        lora=lora,
                        gemv_routes=gemv_routes,
                    )
                B = st.rope_pos.shape[0]

                def _pres():
                    # context presence from the true token history; image
                    # placeholder ids are not penalizable vocab tokens
                    safe = jnp.where(st.seq == cfg.image_token_index, -1, st.seq)
                    return presence_from_tokens(
                        safe, st.rope_pos + 1, tc.vocab_size
                    )

                # the [B, S] → [B, V] presence scatter only runs when some
                # slot actually has a repetition penalty
                pres = jax.lax.cond(
                    jnp.all(slot_samp[4] == 1.0),
                    lambda: jnp.zeros((B, tc.vocab_size), jnp.bool_),
                    _pres,
                )
                nxt = select_next_token_traced(
                    out.logits[:, -1], step_rng,
                    slot_samp[0], slot_samp[1], slot_samp[2],
                    slot_samp[3], pres, slot_samp[4],
                ).astype(jnp.int32)
                # seq history is maintained unconditionally (one [B] scatter
                # into [B, S] int32 per step, ~64 KB written at slots=8,
                # S=2048 — ≪0.01% of the ~11 GB of weights each step streams)
                # so a repetition-penalty request admitted mid-flight always
                # sees complete history; only the O(B·V) presence scatter
                # above is worth gating.
                upd_seq = st.seq.at[
                    jnp.arange(B), jnp.clip(st.rope_pos + 1, 0, S - 1)
                ].set(nxt)
                # Only active slots advance; idle slots keep rewriting the
                # same (masked) scratch position and their state is fully
                # reset on the next admission.
                return (
                    BatchState(
                        cache=out.kv_cache._replace(
                            pos=jnp.where(active, wp + 1, st.cache.pos)
                        ),
                        kv_valid=jnp.where(
                            active[:, None], st.kv_valid | new_bit, st.kv_valid
                        ),
                        rope_pos=jnp.where(active, st.rope_pos + 1, st.rope_pos),
                        last_token=jnp.where(active, nxt, st.last_token),
                        seq=jnp.where(active[:, None], upd_seq, st.seq),
                    ),
                    nxt,
                )

            st, toks = jax.lax.scan(one, state, jax.random.split(rng, n_steps))
            return st, toks.T  # [B, n_steps]

        return jax.jit(decode_fn, donate_argnums=(1,) if self._donate else ())

    def _make_decode_spec(self, n_steps: int):
        """Batched prompt-lookup speculative decode: every live slot drafts
        ``K = spec_lookup`` tokens from its own token history (most recent
        earlier occurrence of its trailing bigram) and verifies them in ONE
        ``(K+1)``-token forward shared by all slots. A decode step streams
        the same weights regardless of query count, so accepted drafts are
        nearly free for the whole pool. Verification is per-slot rejection
        sampling (``utils/sampling.py::spec_verify_tokens``): greedy slots
        stay bit-exact to the greedy-only path, sampled slots commit tokens
        EXACTLY distributed per their (temperature, top_p, top_k) — spec ×
        sampling compose in one executable (reference sampler:
        Inference/Inference.py:85-106). Returns
        ``(state, tokens [B, n_steps, K+1], counts [B, n_steps])``."""
        cfg = self.config
        tc = cfg.text_config
        impl = self.impl
        gemv_routes = self.gemv_routes
        S = self.max_cache_length
        K = self.spec_lookup
        dt = tc.jnp_dtype
        eos = self.eos_token_id
        use_lora = self.adapter_bank is not None

        def decode_fn(params, state: BatchState, active, rng, bank, slot_aid,
                      slot_samp):
            B = state.rope_pos.shape[0]
            karange = jnp.arange(S)[None, :]  # [1, S]
            jr = jnp.arange(K + 1)
            if use_lora:
                from llama32mm_tpu.train.lora import gather_adapter_bank

                lora = gather_adapter_bank(bank, slot_aid)
            else:
                lora = None

            def one(st: BatchState, step_rng):
                seq = st.seq
                rp = st.rope_pos  # seq index of the pending token
                last_tok = st.last_token  # == seq[b, rp[b]]

                # --- draft K per slot: trailing bigram lookup over seq ---
                gram_a = jnp.take_along_axis(
                    seq, jnp.maximum(rp - 1, 0)[:, None], axis=1
                )[:, 0]
                m = (seq == gram_a[:, None]) & (jnp.roll(seq, -1, axis=1) == last_tok[:, None])
                m = m & ((karange + 1) < rp[:, None])  # strictly before current bigram
                best = jnp.max(jnp.where(m, karange, -1), axis=1)  # [B]
                start = jnp.clip(best + 2, 0, S - K)
                drafts = jnp.take_along_axis(
                    seq, start[:, None] + jnp.arange(K)[None, :], axis=1
                )  # [B, K]

                # --- one (K+1)-token verify for the whole pool ---
                wp = jnp.clip(st.cache.pos, 0, S - 1 - K)  # [B]
                feed = jnp.concatenate([last_tok[:, None], drafts], axis=1)  # [B, K+1]
                # fed token j lands at wp+j and may attend committed slots or
                # new slots wp..wp+j (causal within the chunk)
                new_ok = (karange[:, None, :] >= wp[:, None, None]) & (
                    karange[:, None, :] <= (wp[:, None, None] + jr[None, :, None])
                )  # [B, K+1, S]
                attend = (st.kv_valid != 0)[:, None, :] | new_ok
                mask4 = jnp.where(
                    attend[:, None], jnp.asarray(0.0, dt), jnp.finfo(dt).min
                )  # [B, 1, K+1, S]
                pos = rp[:, None] + jr[None, :]
                out = vlm_forward(
                    params, cfg, input_ids=feed, attention_mask=mask4,
                    position_ids=pos, kv_cache=st.cache._replace(pos=wp),
                    impl=impl, lora=lora, gemv_routes=gemv_routes,
                )
                # --- rejection-sampling verify (greedy rows = argmax) ---
                def _pres():
                    safe = jnp.where(seq == cfg.image_token_index, -1, seq)
                    return presence_from_tokens(safe, rp + 1, tc.vocab_size)

                pres = jax.lax.cond(
                    jnp.all(slot_samp[4] == 1.0),
                    lambda: jnp.zeros((B, tc.vocab_size), jnp.bool_),
                    _pres,
                )
                nxt, acc_bit = spec_verify_tokens(
                    out.logits, drafts, step_rng,
                    slot_samp[0], slot_samp[1], slot_samp[2],
                    slot_samp[3], pres, slot_samp[4],
                )  # [B, K+1] int32, [B, K] bool

                # --- per-slot commit: longest accepted prefix + bonus ---
                acc = jnp.cumprod(acc_bit.astype(jnp.int32), axis=1)
                n_commit = jnp.sum(acc, axis=1) + 1  # [B] in [1, K+1]
                eos_hit = (jr[None, :] < n_commit[:, None]) & (nxt == eos)
                first_eos = jnp.min(jnp.where(eos_hit, jr[None, :], K + 1), axis=1)
                n_commit = jnp.minimum(n_commit, first_eos + 1)
                n_commit = jnp.where(active, n_commit, 0)

                # committed KV slots: wp .. wp+n_commit-1
                commit_bits = (
                    (karange >= wp[:, None]) & (karange < (wp + n_commit)[:, None])
                ).astype(jnp.int32)
                # seq[rp+1+j] = nxt[j] for j < n_commit
                off = karange - (rp + 1)[:, None]
                sel = (off >= 0) & (off < n_commit[:, None])
                src = jnp.take_along_axis(
                    nxt, jnp.clip(off, 0, K), axis=1
                )  # gather nxt per position
                new_seq = jnp.where(sel, src, seq)
                new_last = jnp.take_along_axis(
                    nxt, jnp.maximum(n_commit - 1, 0)[:, None], axis=1
                )[:, 0]

                st2 = BatchState(
                    cache=out.kv_cache._replace(
                        pos=jnp.where(active, wp + n_commit, st.cache.pos)
                    ),
                    kv_valid=jnp.where(
                        active[:, None], st.kv_valid | commit_bits, st.kv_valid
                    ),
                    rope_pos=jnp.where(active, rp + n_commit, rp),
                    last_token=jnp.where(active, new_last, last_tok),
                    seq=jnp.where(active[:, None], new_seq, seq),
                )
                return st2, (nxt, n_commit)

            st, (toks, counts) = jax.lax.scan(
                one, state, jax.random.split(rng, n_steps)
            )
            # scan stacks on axis 0: [n_steps, B, ...] → [B, n_steps, ...]
            return st, toks.swapaxes(0, 1), counts.swapaxes(0, 1)

        return jax.jit(decode_fn, donate_argnums=(1,) if self._donate else ())

    # -- chunked admission programs ----------------------------------------

    def _make_encode(self, bucket: int, use_image: bool):
        """ViT encode + token embed + image-feature splice → UNSCALED prompt
        embeddings [1, bucket, H] (``llama_forward`` applies the √hidden
        parity scale itself)."""
        cfg = self.config
        tc = cfg.text_config
        impl = self.impl

        def encode_fn(params, ids, px, pad_mask):
            from llama32mm_tpu.models.vlm import (
                encode_image,
                merge_input_ids_with_image_features,
            )

            embeds = params["language_model"]["model"]["tok_emb"]["weight"][
                jnp.clip(ids, 0, tc.vocab_size - 1)
            ]
            if use_image:
                feats = encode_image(params, cfg, px, impl=impl)
                embeds, _ = merge_input_ids_with_image_features(
                    feats, embeds, ids, pad_mask, cfg.image_token_index
                )
            return embeds

        return jax.jit(encode_fn)

    def _make_scratch(self):
        tc = self.config.text_config
        adtype = jnp.int8 if self.kv_dtype == "int8" else tc.jnp_dtype
        S = self.max_cache_length
        return jax.jit(lambda: init_kv_cache(tc, 1, max_length=S, dtype=adtype))

    def _make_chunk(self, C: int):
        """One decoder pass over C prompt tokens at offset ``off`` into the
        scratch cache. ONE executable serves every bucket, offset, and
        prompt (all of those are runtime values). Also returns lm_head
        logits at the prompt's last valid position clamped into this chunk —
        the host keeps the chunk where it actually lands."""
        cfg = self.config
        tc = cfg.text_config
        impl = self.impl
        use_lora = self.adapter_bank is not None

        def chunk_fn(params, scratch: KVCache, emb_chunk, pad_row, off, true_len,
                     bank, aid):
            from llama32mm_tpu.models.language import llama_forward, lm_head_apply
            from llama32mm_tpu.ops.attention import AttnMask

            lora = _single_adapter(bank, aid) if use_lora else None
            mask = AttnMask(kv_valid=pad_row, q_offset=off)
            out = llama_forward(
                params["language_model"]["model"],
                tc,
                input_embeds=emb_chunk,
                attention_mask=mask,
                position_ids=(off + jnp.arange(C))[None, :],
                kv_cache=scratch._replace(pos=off),
                impl=impl,
                lora=lora,
            )
            idx = jnp.clip(true_len - 1 - off, 0, C - 1)
            h_last = jax.lax.dynamic_slice_in_dim(out.hidden_states, idx, 1, axis=1)
            logits = lm_head_apply(
                params["language_model"], tc, h_last, impl=impl,
                lora=None if lora is None else lora.get("lm_head"),
            )
            return out.kv_cache, logits[:, 0]

        return jax.jit(chunk_fn, donate_argnums=(1,) if self._donate else ())

    def _make_splice(self):
        cfg = self.config
        tc = cfg.text_config

        def splice_fn(params, state: BatchState, scratch: KVCache, logits,
                      pad_row, ids_row, filled, true_len, slot, rng, samp):
            safe_ids = jnp.where(ids_row == cfg.image_token_index, -1, ids_row)
            pres = presence_from_tokens(
                safe_ids, jnp.reshape(true_len, (1,)), tc.vocab_size
            )
            first = select_next_token_traced(
                logits, rng, samp[0], samp[1], samp[2], samp[3], pres, samp[4]
            )
            first = first[0].astype(jnp.int32)
            c = state.cache
            k = jax.lax.dynamic_update_slice(c.k, scratch.k, (0, slot, 0, 0, 0))
            v = jax.lax.dynamic_update_slice(c.v, scratch.v, (0, slot, 0, 0, 0))
            ks = vs = None
            if c.k_scale is not None:
                ks = jax.lax.dynamic_update_slice(c.k_scale, scratch.k_scale, (0, slot, 0, 0))
                vs = jax.lax.dynamic_update_slice(c.v_scale, scratch.v_scale, (0, slot, 0, 0))
            seq = state.seq
            if seq is not None:
                seq_row = ids_row.at[0, true_len].set(first)
                seq = jax.lax.dynamic_update_slice(seq, seq_row, (slot, 0))
            return BatchState(
                cache=KVCache(
                    k=k, v=v, pos=c.pos.at[slot].set(filled), k_scale=ks, v_scale=vs
                ),
                kv_valid=jax.lax.dynamic_update_slice(
                    state.kv_valid, pad_row, (slot, 0)
                ),
                rope_pos=state.rope_pos.at[slot].set(true_len),
                last_token=state.last_token.at[slot].set(first),
                seq=seq,
            )

        return jax.jit(splice_fn, donate_argnums=(1,) if self._donate else ())

    def _start_admission(self, req: _Request, slot: int) -> None:
        """Begin a scratch-cache admission: chunked prefill, prefix-cached
        prefill, or both. With a prefix, the registered KV is copied into the
        scratch and only the SUFFIX is embedded and prefilled, starting at
        ``q_offset = prefix_len`` (the decoder chunk program is offset-agnostic,
        so the same executables serve prefixed and plain admissions)."""
        s = req.prompt_len
        base = 0 if req.prefix is None else req.prefix.length
        n_suffix = s - base
        if self.prefill_chunk is not None:
            C = self.prefill_chunk
        elif self.prompt_buckets == "auto":
            # one-shot suffix prefill: pad to the 128-lane band so one chunk
            # executable serves a range of suffix lengths (engine policy)
            C = -(-n_suffix // 128) * 128
        else:
            C = n_suffix
        bucket = base + -(-n_suffix // C) * C
        room = self.max_cache_length - req.max_new_tokens - self.spec_lookup
        if bucket > room:
            if s > room:
                raise ValueError(
                    f"prompt ({s}) + max_new_tokens ({req.max_new_tokens}) "
                    f"exceeds cache capacity {self.max_cache_length}"
                )
            bucket = s  # chunk-align would overflow: last chunk runs ragged
        sbucket = bucket - base  # suffix rows to embed/prefill
        ids = np.zeros((1, sbucket), np.int32)
        ids[0, : n_suffix] = req.input_ids[base:]
        pad = np.zeros((1, sbucket), np.int32)
        pad[0, : n_suffix] = 1
        use_image = req.pixel_values is not None
        key = (sbucket, use_image)
        if key not in self._encode_jit:
            self._encode_jit[key] = self._make_encode(sbucket, use_image)
        if use_image:
            px = jnp.asarray(req.pixel_values, self.config.text_config.jnp_dtype)[None]
        else:
            px = jnp.zeros((1, 3, 1, 1), self.config.text_config.jnp_dtype)
        embeds = self._encode_jit[key](
            self.params, jnp.asarray(ids), px, jnp.asarray(pad)
        )
        if req.prefix is None:
            if self._scratch_jit is None:
                self._scratch_jit = self._make_scratch()
            scratch = self._scratch_jit()
        else:
            # deep copy: admission chunk programs donate the scratch buffers
            if self._copy_jit is None:
                self._copy_jit = jax.jit(lambda c: jax.tree.map(jnp.copy, c))
            scratch = self._copy_jit(req.prefix.cache)
            req.prefix.hits += 1
        pad_row = np.zeros((1, self.max_cache_length), np.int32)
        pad_row[0, :s] = 1
        ids_row = np.zeros((1, self.max_cache_length), np.int32)
        ids_row[0, :s] = req.input_ids
        self._inflight = {
            "req": req, "slot": slot, "embeds": embeds,
            "pad_row": jnp.asarray(pad_row), "ids_row": jnp.asarray(ids_row),
            "true_len": s, "off": base,
            "base": base, "chunk": C, "bucket": bucket, "scratch": scratch,
            "logits": None,
        }

    def _advance_admission(self) -> None:
        fl = self._inflight
        C = fl["chunk"]
        off, bucket = fl["off"], fl["bucket"]
        n = min(C, bucket - off)
        # Traced-offset slice: an eager dynamic_slice bakes each offset into
        # a fresh tiny executable (a remote compile per chunk on a tunneled
        # backend); one jitted slicer per (embeds shape, n) serves them all.
        key = ("slice", n)
        if key not in self._encode_jit:
            self._encode_jit[key] = jax.jit(
                lambda e, o: jax.lax.dynamic_slice_in_dim(e, o, n, axis=1)
            )
        emb_chunk = self._encode_jit[key](
            fl["embeds"], jnp.asarray(off - fl["base"], jnp.int32)
        )
        if n not in self._chunk_jit:
            self._chunk_jit[n] = self._make_chunk(n)
        scratch, logits = self._chunk_jit[n](
            self.params, fl["scratch"], emb_chunk, fl["pad_row"],
            jnp.asarray(off, jnp.int32), jnp.asarray(fl["true_len"], jnp.int32),
            self.adapter_bank, jnp.asarray(fl["req"].adapter_id, jnp.int32),
        )
        fl["scratch"] = scratch
        if off <= fl["true_len"] - 1 < off + n:
            fl["logits"] = logits
        fl["off"] = off + n
        if fl["off"] >= bucket:
            if self._splice_jit is None:
                self._splice_jit = self._make_splice()
            req, slot = fl["req"], fl["slot"]
            self.state = self._splice_jit(
                self.params, self.state, fl["scratch"], fl["logits"],
                fl["pad_row"], fl["ids_row"], jnp.asarray(bucket, jnp.int32),
                jnp.asarray(fl["true_len"], jnp.int32),
                jnp.asarray(slot, jnp.int32), self._next_rng(),
                self._samp_args(req.sampler),
            )
            req.slot = slot
            self._by_slot[slot] = req
            self._slot_adapter[slot] = req.adapter_id
            self._slot_sampler[slot] = req.sampler
            self._slot_samp_cache = None
            self._drop_payload(req)
            self._inflight = None
            first = int(np.asarray(self.state.last_token[slot]))
            self._emit(req, [first])

    # -- host-side scheduling -----------------------------------------------

    def _bucketed_len(self, s: int, max_new: int) -> int:
        # capacity was validated at submit(); policy shared with the engine
        from llama32mm_tpu.inference.engine import bucketed_len

        return bucketed_len(s, max_new, self.max_cache_length, self.prompt_buckets)

    def register_prefix(self, input_ids, pixel_values=None, auto_match=None,
                        adapter_id: int = 0) -> int:
        """Compute and retain the KV of a shared prompt PREFIX (system
        preamble, few-shot header, image + instruction template, multi-turn
        history). Subsequent requests whose prompt starts with it skip its
        prefill entirely: admission copies the cached KV into the slot and
        prefills only the suffix.

        ``auto_match`` (default: true for text-only prefixes) lets ``submit``
        hit the prefix automatically by longest token-prefix match. Prefixes
        carrying an image are never auto-matched (every image request starts
        with the same placeholder tokens — ids alone can't distinguish the
        images); pass their ``prefix_id`` to ``submit`` explicitly, with the
        request's ``pixel_values=None`` (the image is already in the prefix).

        Cost: one slot-sized KV cache held in HBM per registered prefix.
        """
        ids = np.asarray(input_ids).reshape(-1).astype(np.int32)
        P = int(ids.shape[0])
        if P < 1 or P >= self.max_cache_length:
            raise ValueError(f"prefix length {P} must be in [1, cache {self.max_cache_length})")
        px = None if pixel_values is None else np.asarray(pixel_values)
        if px is not None and px.ndim == 4:
            px = px[0]
        use_image = px is not None
        if auto_match is None:
            auto_match = not use_image
        if auto_match and use_image:
            raise ValueError("image prefixes cannot be auto-matched — pass prefix_id explicitly")
        self._check_adapter_id(adapter_id)

        # one-shot prefill of the prefix into a fresh scratch cache (the same
        # offset-agnostic chunk program admissions use)
        pids = np.zeros((1, P), np.int32)
        pids[0] = ids
        pad = np.ones((1, P), np.int32)
        key = (P, use_image)
        if key not in self._encode_jit:
            self._encode_jit[key] = self._make_encode(P, use_image)
        pxj = (
            jnp.asarray(px, self.config.text_config.jnp_dtype)[None]
            if use_image
            else jnp.zeros((1, 3, 1, 1), self.config.text_config.jnp_dtype)
        )
        embeds = self._encode_jit[key](self.params, jnp.asarray(pids), pxj, jnp.asarray(pad))
        if self._scratch_jit is None:
            self._scratch_jit = self._make_scratch()
        pad_row = np.zeros((1, self.max_cache_length), np.int32)
        pad_row[0, :P] = 1
        if P not in self._chunk_jit:
            self._chunk_jit[P] = self._make_chunk(P)
        cache, _ = self._chunk_jit[P](
            self.params, self._scratch_jit(), embeds, jnp.asarray(pad_row),
            jnp.asarray(0, jnp.int32), jnp.asarray(P, jnp.int32),
            self.adapter_bank, jnp.asarray(adapter_id, jnp.int32),
        )
        pid = self._next_prefix_id
        self._next_prefix_id += 1
        pfx = _Prefix(pid, ids, use_image, auto_match, cache, P)
        pfx.adapter_id = adapter_id
        self._prefixes[pid] = pfx
        return pid

    def drop_prefix(self, prefix_id: int) -> None:
        """Release a registered prefix (frees its HBM cache)."""
        del self._prefixes[prefix_id]

    def _check_adapter_id(self, adapter_id: int) -> None:
        if adapter_id == 0 and self.adapter_bank is None:
            return
        if self.adapter_bank is None:
            raise ValueError("no adapter_bank configured on this server")
        if not 0 <= adapter_id < self.n_adapters:
            raise ValueError(
                f"adapter_id {adapter_id} out of range [0, {self.n_adapters})"
            )

    def _match_prefix(self, ids: np.ndarray, adapter_id: int) -> Optional[_Prefix]:
        best = None
        for p in self._prefixes.values():
            if (
                p.auto_match
                and p.adapter_id == adapter_id  # prefix KV is adapter-specific
                and p.length < ids.shape[0]
                and (best is None or p.length > best.length)
                and np.array_equal(ids[: p.length], p.input_ids)
            ):
                best = p
        return best

    def submit(
        self,
        input_ids,
        pixel_values=None,
        max_new_tokens: int = 256,
        prefix_id: Optional[int] = None,
        adapter_id: int = 0,
        temperature: Optional[float] = None,
        top_p: Optional[float] = None,
        top_k: Optional[int] = None,
        min_p: Optional[float] = None,
        repetition_penalty: Optional[float] = None,
        timeout_s: Optional[float] = None,
    ) -> int:
        """Queue a request; returns its id. ``input_ids``: [s] or [1, s] — the
        FULL prompt including any prefix tokens. ``prefix_id`` pins a
        registered prefix; without it, text-only requests auto-match the
        longest registered auto-match prefix (with the same ``adapter_id``).
        ``adapter_id`` selects this request's LoRA from the server's
        ``adapter_bank`` (0 = the bank's first entry, conventionally the
        identity adapter). ``temperature``/``top_p``/``top_k``/``min_p``/
        ``repetition_penalty`` override the server defaults for THIS request
        — sampler settings are traced, so a batch mixes per-request samplers
        in one executable and new settings never recompile; with
        ``spec_lookup`` active, sampled requests verify drafts by rejection
        sampling and keep their exact distribution (the repetition penalty
        composes exactly too: a verified position's presence set includes
        the earlier drafts of its own chunk — ``spec_verify_tokens``).
        ``timeout_s`` sets a per-request deadline: a request still queued or
        decoding ``timeout_s`` seconds after submission is expired at the
        next ``step()`` (it finishes with whatever tokens it has, flagged
        ``timed_out``)."""
        if self.max_queue is not None and len(self._queue) >= self.max_queue:
            raise QueueFullError(
                f"admission queue full ({len(self._queue)}/{self.max_queue})"
            )
        if timeout_s is not None and timeout_s <= 0:
            raise ValueError(f"timeout_s must be > 0, got {timeout_s}")
        sampler = (
            self.sampler[0] if temperature is None else float(temperature),
            self.sampler[1] if top_p is None else float(top_p),
            self.sampler[2] if top_k is None else int(top_k),
            self.sampler[3] if min_p is None else float(min_p),
            self.sampler[4]
            if repetition_penalty is None
            else float(repetition_penalty),
        )
        if sampler[4] <= 0:
            raise ValueError(f"repetition_penalty must be > 0, got {sampler[4]}")
        if not (0.0 <= sampler[3] <= 1.0):
            # min_p > 1 puts the threshold above the argmax probability and
            # masks EVERY token to -inf; HF validates the same range.
            raise ValueError(f"min_p must be in [0, 1], got {sampler[3]}")
        ids = np.asarray(input_ids)
        if ids.ndim == 2 and ids.shape[0] == 1:
            ids = ids[0]
        if ids.ndim != 1:
            # reshape(-1) here would silently concatenate a [B, s] batch of
            # prompts into one request — one submit() call is one request
            raise ValueError(
                f"submit() takes ONE prompt ([s] or [1, s]); got shape "
                f"{np.asarray(input_ids).shape} — call submit once per request"
            )
        # Reject oversized requests NOW: failing later at admission would pop
        # the request off the queue mid-step and strand it unfinished.
        # spec_lookup needs K extra cache slots of headroom: the final verify
        # writes K draft entries past the last committed token.
        if ids.shape[0] + max_new_tokens + self.spec_lookup > self.max_cache_length:
            extra = f" + spec headroom ({self.spec_lookup})" if self.spec_lookup else ""
            raise ValueError(
                f"prompt ({ids.shape[0]}) + max_new_tokens ({max_new_tokens})"
                f"{extra} exceeds cache capacity {self.max_cache_length}"
            )
        px = None if pixel_values is None else np.asarray(pixel_values)
        if px is not None and px.ndim == 4:
            px = px[0]
        self._check_adapter_id(adapter_id)
        prefix = None
        if prefix_id is not None:
            prefix = self._prefixes[prefix_id]
            if prefix.length >= ids.shape[0]:
                raise ValueError(
                    f"prompt ({ids.shape[0]}) must extend past the prefix "
                    f"({prefix.length}) by at least one token"
                )
            if not np.array_equal(ids[: prefix.length], prefix.input_ids):
                raise ValueError("prompt does not start with the given prefix's tokens")
            if prefix.has_image and px is not None:
                raise ValueError(
                    "the prefix already carries the image — submit with pixel_values=None"
                )
            if prefix.adapter_id != adapter_id:
                raise ValueError(
                    f"prefix {prefix_id} was computed with adapter "
                    f"{prefix.adapter_id}, not {adapter_id} — prefix KV is "
                    f"adapter-specific"
                )
        elif px is None:
            prefix = self._match_prefix(ids, adapter_id)
        rid = self._next_id
        self._next_id += 1
        deadline = None if timeout_s is None else time.monotonic() + timeout_s
        req = _Request(rid, ids, px, max_new_tokens, prefix=prefix,
                       adapter_id=adapter_id, sampler=sampler, deadline=deadline)
        self._queue.append(req)
        self._results[rid] = req
        return rid

    def _expire_deadlines(self) -> None:
        """Finish any request whose deadline has passed (queued, admitting,
        or decoding). Runs at the top of every step(); an expired request
        keeps the tokens it already generated and is flagged ``timed_out``."""
        now = time.monotonic()
        expired = [
            r
            for r in self._results.values()
            if not r.finished and r.deadline is not None and now >= r.deadline
        ]
        for req in expired:
            req.timed_out = True
            self._timeouts += 1
            self.cancel(req.rid)

    def _admit(self, req: _Request, slot: int) -> None:
        s = req.prompt_len
        bucket = self._bucketed_len(s, req.max_new_tokens + self.spec_lookup)
        ids = np.zeros((1, bucket), np.int32)
        ids[0, :s] = req.input_ids
        pad = np.zeros((1, bucket), np.int32)
        pad[0, :s] = 1
        use_image = req.pixel_values is not None
        key = (bucket, use_image)
        if key not in self._prefill_jit:
            self._prefill_jit[key] = self._make_prefill(bucket, use_image)
        if use_image:
            px = jnp.asarray(req.pixel_values, self.config.text_config.jnp_dtype)[None]
        else:
            px = jnp.zeros((1, 3, 1, 1), self.config.text_config.jnp_dtype)
        self.state = self._prefill_jit[key](
            self.params,
            self.state,
            jnp.asarray(ids),
            px,
            jnp.asarray(pad),
            jnp.asarray(slot, jnp.int32),
            self._next_rng(),
            self.adapter_bank,
            jnp.asarray(req.adapter_id, jnp.int32),
            self._samp_args(req.sampler),
        )
        req.slot = slot
        self._by_slot[slot] = req
        self._slot_adapter[slot] = req.adapter_id
        self._slot_sampler[slot] = req.sampler
        self._slot_samp_cache = None
        self._drop_payload(req)
        # The prefill's sampled token is the request's first generated token.
        first = int(np.asarray(self.state.last_token[slot]))
        self._emit(req, [first])

    def _emit(self, req: _Request, toks: list[int]) -> None:
        for t in toks:
            if req.finished:
                break
            req.tokens.append(t)
            if t == self.eos_token_id or len(req.tokens) >= req.max_new_tokens:
                req.finished = True
        if req.finished and req.slot is not None:
            self._free_slot(req)

    @staticmethod
    def _drop_payload(req: _Request) -> None:
        # Admission copied the prompt into the slot cache (and the image to
        # device); holding the host arrays afterwards leaks ~MBs per vision
        # request for the lifetime of _results.
        req.input_ids = None
        req.pixel_values = None

    def release(self, rid: int) -> bool:
        """Evict a FINISHED request's record (tokens included) from the
        results table — long-running servers call this after delivering the
        result, otherwise the table grows per request forever. Returns False
        (and keeps the record) while the request is still queued/running —
        use ``cancel`` for those."""
        req = self._results.get(rid)
        if req is None:
            return True
        if not req.finished:
            return False
        del self._results[rid]
        return True

    def _free_slot(self, req: _Request) -> None:
        self._by_slot[req.slot] = None
        # Reset the freed slot's sampler to greedy: a stale temperature>0
        # would keep defeating the all-greedy lax.cond fast path (full-vocab
        # sort every step — the measured 223→118 tok/s regression) for as
        # long as the slot sits idle.
        # Full 5-tuple (T, top_p, top_k, min_p, rep_penalty): _slot_samp_args
        # indexes s[3]/s[4] on every rebuild, so a short tuple here would
        # crash the serving loop the first time one request finishes while
        # others are still decoding.
        self._slot_sampler[req.slot] = (0.0, self.sampler[1], self.sampler[2], 0.0, 1.0)
        self._slot_samp_cache = None
        req.slot = None

    def step(self) -> list[int]:
        """Admit pending requests into free slots (one prefill chunk's worth
        when ``prefill_chunk`` is set), then run one decode chunk for the
        running slots. Returns ids of requests that finished during this
        call."""
        before = {r.rid for r in self._results.values() if r.finished}
        self._expire_deadlines()

        if self.prefill_chunk is not None:
            if self._inflight is not None:
                self._advance_admission()
            elif self._queue:
                for slot in range(self.slots):
                    if self._by_slot[slot] is None:
                        self._start_admission(self._queue.popleft(), slot)
                        self._advance_admission()  # first chunk this step
                        break
        else:
            for slot in range(self.slots):
                if self._by_slot[slot] is None and self._queue:
                    req = self._queue.popleft()
                    if req.prefix is None:
                        self._admit(req, slot)
                    else:
                        # prefix-cached admission rides the scratch machinery
                        # (suffix in one chunk); completes within this step
                        self._start_admission(req, slot)
                        while self._inflight is not None:
                            self._advance_admission()

        active_rows = [r is not None for r in self._by_slot]
        if any(active_rows):
            # Bound the chunk by the tightest request's remaining budget, but
            # quantized (_chunk_steps): tokens past max_new/EOS are discarded
            # by _emit.
            remaining = min(
                r.max_new_tokens - len(r.tokens) for r in self._by_slot if r is not None
            )
            if self.spec_lookup > 0:
                # each spec step commits 1..K+1 tokens per slot
                n = self._chunk_steps(-(-remaining // (self.spec_lookup + 1)))
                _, toks, counts = self._dispatch_decode(n, active_rows)
                for slot, req in enumerate(self._by_slot):
                    if req is not None:
                        # Emit per verify-step so acceptance stats count only
                        # tokens the request actually keeps: steps after its
                        # EOS/budget produce commits _emit discards, and
                        # counting those would skew spec_tokens_per_step for
                        # anyone tuning spec_lookup from stats().
                        for i in range(toks.shape[1]):
                            if req.finished:
                                break
                            step_out = [
                                int(t) for t in toks[slot, i, : counts[slot, i]]
                            ]
                            kept_before = len(req.tokens)
                            self._emit(req, step_out)
                            self._spec_steps += 1
                            self._spec_tokens += len(req.tokens) - kept_before
            else:
                n = self._chunk_steps(remaining)
                toks, _, _ = self._dispatch_decode(n, active_rows)
                for slot, req in enumerate(self._by_slot):
                    if req is not None:
                        self._emit(req, [int(t) for t in toks[slot]])

        after = {r.rid for r in self._results.values() if r.finished}
        return sorted(after - before)

    def _chunk_steps(self, needed: int) -> int:
        """Quantize the decode-chunk length to a power of two capped at
        ``steps_per_sync``. Sizing the chunk exactly to the tightest request's
        tail would compile a fresh executable for every distinct remaining
        length (each compile is tens of seconds on a tunneled backend, mid
        serving). Overshot steps are discarded by ``_emit``; their clamped
        cache writes land only in the finishing slot's own row, which the next
        admission fully resets."""
        n = 1
        while n < min(needed, self.steps_per_sync):
            n *= 2
        return min(n, max(1, self.steps_per_sync))

    def _dispatch_decode(self, n: int, active_rows):
        """Run one compiled decode chunk of ``n`` scan steps. Returns
        ``(tokens, spec_tokens, spec_counts)`` as numpy — the first for the
        plain path ([B, n]), the latter two for the spec path
        ([B, n, K+1], [B, n])."""
        active = jnp.asarray(active_rows)
        slot_aid = jnp.asarray(self._slot_adapter, jnp.int32)
        if self.spec_lookup > 0:
            if ("spec", n) not in self._decode_jit:
                self._decode_jit[("spec", n)] = self._make_decode_spec(n)
            self.state, toks, counts = self._decode_jit[("spec", n)](
                self.params, self.state, active, self._next_rng(),
                self.adapter_bank, slot_aid, self._slot_samp_args(),
            )
            return None, np.asarray(toks), np.asarray(counts)
        if n not in self._decode_jit:
            self._decode_jit[n] = self._make_decode(n)
        self.state, toks = self._decode_jit[n](
            self.params, self.state, active, self._next_rng(),
            self.adapter_bank, slot_aid, self._slot_samp_args(),
        )
        return np.asarray(toks), None, None

    def warmup(self) -> None:
        """Pre-compile the decode-chunk ladder (every power-of-two chunk size
        up to ``steps_per_sync``) so serving never stalls on a mid-stream
        compile. Each program runs once with every slot forced inactive — a
        semantic no-op (inactive slots advance nothing; their scratch cache
        writes are masked), so this is safe even while requests are live."""
        n = 1
        while True:
            self._dispatch_decode(self._chunk_steps(n), [False] * self.slots)
            if n >= self.steps_per_sync:
                break
            n *= 2

    def run(self) -> dict[int, np.ndarray]:
        """Drive until every submitted request finishes; returns
        ``{request_id: generated token ids}``."""
        while (
            self._queue
            or self._inflight is not None
            or any(r is not None for r in self._by_slot)
        ):
            self.step()
        return {rid: np.asarray(r.tokens) for rid, r in self._results.items()}

    def cancel(self, rid: int) -> bool:
        """Cancel a request: dequeue it, or free its slot if running (the
        slot's cache state needs no cleanup — admission fully resets it).
        Cancelling the in-flight chunked admission abandons the scratch
        prefill. Returns False if the request already finished."""
        req = self._results[rid]
        if req.finished:
            return False
        req.finished = True
        if req.slot is not None:
            self._free_slot(req)
        elif self._inflight is not None and self._inflight["req"] is req:
            self._inflight = None
        else:
            try:
                self._queue.remove(req)
            except ValueError:
                pass
        return True

    def tokens_so_far(self, rid: int) -> np.ndarray:
        return np.asarray(self._results[rid].tokens)

    def is_finished(self, rid: int) -> bool:
        return self._results[rid].finished

    def stats(self) -> dict:
        """Scheduler observability: occupancy, queue depth, progress."""
        live = [r for r in self._by_slot if r is not None]
        return {
            "slots": self.slots,
            "slots_busy": len(live),
            "queued": len(self._queue),
            "submitted": self._next_id,
            "finished": sum(r.finished for r in self._results.values()),
            "tokens_generated": sum(len(r.tokens) for r in self._results.values()),
            **({"max_queue": self.max_queue} if self.max_queue is not None else {}),
            **({"timeouts": self._timeouts} if self._timeouts else {}),
            **(
                {
                    "prefixes": len(self._prefixes),
                    "prefix_hits": sum(p.hits for p in self._prefixes.values()),
                    "prefix_tokens_cached": sum(p.length for p in self._prefixes.values()),
                }
                if self._prefixes
                else {}
            ),
            **({"adapters": self.n_adapters} if self.adapter_bank is not None else {}),
            **(
                {
                    "spec_lookup": self.spec_lookup,
                    "spec_tokens_per_step": round(
                        self._spec_tokens / max(self._spec_steps, 1), 3
                    ),
                }
                if self.spec_lookup
                else {}
            ),
            **(
                {
                    "admitting": self._inflight["req"].rid,
                    "admit_progress": f"{self._inflight['off']}/{self._inflight['bucket']}",
                }
                if self._inflight is not None
                else {}
            ),
        }
