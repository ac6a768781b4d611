"""LoRA fine-tuning.

Parity targets:
- ``Linear_LORA`` (reference ``Model/model.py:107-121``): frozen base linear +
  trainable low-rank A/B with ``alpha/rank`` scaling and input dropout; only
  the adapters receive gradients (``:116-118``).
- The README's ``apply_lora`` recipe wraps every decoder linear; here
  ``init_lora_params`` builds adapters for all seven decoder linears
  (W_query/W_key/W_value/out_proj/w_gate/w_up/w_down) as stacked per-layer
  arrays that ride the same ``lax.scan``.
- Shifted-CE labels path (``Model/model.py:431-438``) is the loss.
- Adapter-only checkpoint save (README "LoRA fine-tuning": save only
  lora_a/lora_b tensors).

The reference ships the pieces but no train loop (SURVEY §3.4); the loop here
is new: a jit/pjit-able ``lora_train_step`` differentiating **only** the
adapter tree, with optax Adam.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from llama32mm_tpu.configs import LLAMA32Config, MLLAMAConfig
from llama32mm_tpu.models.vlm import vlm_forward
from llama32mm_tpu.train.accum import accumulate_grads

DEFAULT_TARGETS = ("W_query", "W_key", "W_value", "out_proj", "w_gate", "w_up", "w_down")

_TARGET_DIMS = {
    "W_query": lambda c: (c.hidden_size, c.n_heads * c.head_dim),
    "W_key": lambda c: (c.hidden_size, c.n_kv_groups * c.head_dim),
    "W_value": lambda c: (c.hidden_size, c.n_kv_groups * c.head_dim),
    "out_proj": lambda c: (c.n_heads * c.head_dim, c.hidden_size),
    "w_gate": lambda c: (c.hidden_size, c.hidden_dim),
    "w_up": lambda c: (c.hidden_size, c.hidden_dim),
    "w_down": lambda c: (c.hidden_dim, c.hidden_size),
}


def init_lora_params(
    key: jax.Array,
    config,
    rank: int = 16,
    alpha: float = 16.0,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
    include_lm_head: bool = True,
    include_projector: bool = False,
) -> dict:
    """Stacked per-layer LoRA adapters for the decoder linears, plus (by
    default) an ``lm_head`` adapter — the reference README's ``apply_lora``
    recipe wraps **every** ``nn.Linear`` inside ``language_model``, which
    includes the head (``Model/model.py:349-364`` + README "LoRA
    fine-tuning").

    ``config`` may be an ``LLAMA32Config`` or a full ``MLLAMAConfig``;
    ``include_projector=True`` (requires the full config) also adapts the
    multi-modal projector linear.

    A ~ kaiming-uniform (like the reference's nn.Linear default init for
    lora_a), B = 0 (reference lora_b also defaults to kaiming — but zero-B is
    the evident intent so fine-tuning starts at the base model; the reference
    never zero-inits, which makes its adapted model differ from the base at
    step 0)."""
    full_cfg = config if isinstance(config, MLLAMAConfig) else None
    text_cfg: LLAMA32Config = full_cfg.text_config if full_cfg is not None else config
    L = text_cfg.n_layers
    blocks = {}
    for i, name in enumerate(targets):
        n_in, n_out = _TARGET_DIMS[name](text_cfg)
        k = jax.random.fold_in(key, i)
        bound = 1.0 / math.sqrt(n_in)
        blocks[name] = {
            "lora_a": jax.random.uniform(k, (L, n_in, rank), jnp.float32, -bound, bound).astype(dtype),
            "lora_b": jnp.zeros((L, rank, n_out), dtype),
            "scaling": jnp.full((L,), alpha / rank, jnp.float32),
        }
    lora = {"blocks": blocks}

    def _flat_adapter(k, n_in, n_out):
        bound = 1.0 / math.sqrt(n_in)
        return {
            "lora_a": jax.random.uniform(k, (n_in, rank), jnp.float32, -bound, bound).astype(dtype),
            "lora_b": jnp.zeros((rank, n_out), dtype),
            "scaling": jnp.asarray(alpha / rank, jnp.float32),
        }

    if include_lm_head:
        lora["lm_head"] = _flat_adapter(
            jax.random.fold_in(key, 1000), text_cfg.hidden_size, text_cfg.vocab_size
        )
    if include_projector:
        if full_cfg is None:
            raise ValueError("include_projector=True requires a full MLLAMAConfig")
        lora["projector"] = _flat_adapter(
            jax.random.fold_in(key, 1001),
            full_cfg.vision_config.hidden_size,
            text_cfg.hidden_size,
        )
    return lora


def zero_lora_params(config, rank: int = 16, **kw) -> dict:
    """An identity adapter (B = 0, like init) — slot 0 of a serving bank, so
    requests without an adapter run the base model exactly."""
    return init_lora_params(jax.random.PRNGKey(0), config, rank=rank, **kw)


def stack_adapter_bank(adapters: Sequence[dict]) -> dict:
    """Stack N same-shaped adapter trees into a bank (leaves gain a leading
    ``[N, ...]`` axis) for multi-LoRA serving: the continuous-batching server
    holds one bank and every slot picks its adapter by index
    (``ContinuousBatchingServer(adapter_bank=...)``). All adapters must share
    rank/targets; entry 0 is conventionally the identity adapter
    (:func:`zero_lora_params`)."""
    if not adapters:
        raise ValueError("need at least one adapter")
    structs = {jax.tree.structure(a) for a in adapters}
    if len(structs) != 1:
        raise ValueError("adapters have mismatched structures (rank/targets must agree)")
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *adapters)


def gather_adapter_bank(bank: dict, idx) -> dict:
    """Per-row adapter tree for a batch: ``idx [B]`` selects each row's
    adapter from the bank and the layer axis is moved back to the front so
    the decoder's layer scan slices it — blocks leaves become
    ``[L, B, in, r]`` (scan → ``[B, in, r]``, the batched path in
    ``models/language.py::_maybe_lora``), flat adapters (lm_head/projector)
    become ``[B, in, r]``."""
    idx = jnp.asarray(idx, jnp.int32)

    out = {}
    if "blocks" in bank:
        out["blocks"] = jax.tree.map(
            lambda leaf: jnp.moveaxis(jnp.take(leaf, idx, axis=0), 0, 1),
            bank["blocks"],
        )
    for name in bank:
        if name != "blocks":
            out[name] = jax.tree.map(
                lambda leaf: jnp.take(leaf, idx, axis=0), bank[name]
            )
    return out


class Linear_LORA:
    """Object-API parity with the reference ``Linear_LORA`` module
    (Model/model.py:107-121): frozen base + trainable adapters."""

    def __init__(self, in_dim: int, out_dim: int, rank: int, alpha: float, dropout: float,
                 key: Optional[jax.Array] = None, dtype=jnp.float32):
        key = key if key is not None else jax.random.PRNGKey(0)
        kw, ka, kb = jax.random.split(key, 3)
        bound = 1.0 / math.sqrt(in_dim)
        self.rank = rank
        self.alpha = alpha
        self.dropout = dropout
        self.weight = jax.random.uniform(kw, (in_dim, out_dim), jnp.float32, -bound, bound).astype(dtype)
        self.lora_a = jax.random.uniform(ka, (in_dim, rank), jnp.float32, -bound, bound).astype(dtype)
        self.lora_b = jax.random.uniform(kb, (rank, out_dim), jnp.float32,
                                         -1.0 / math.sqrt(rank), 1.0 / math.sqrt(rank)).astype(dtype)

    def __call__(self, x, dropout_rng: Optional[jax.Array] = None):
        base = jnp.matmul(x, self.weight)
        xin = x
        if dropout_rng is not None and self.dropout > 0.0:
            keep = jax.random.bernoulli(dropout_rng, 1.0 - self.dropout, x.shape)
            xin = jnp.where(keep, x / (1.0 - self.dropout), 0.0).astype(x.dtype)
        return base + (self.alpha / self.rank) * jnp.matmul(jnp.matmul(xin, self.lora_a), self.lora_b)


def merge_lora_into_params(params: dict, lora: dict) -> dict:
    """Fold adapters into the base weights (inference-time merge):
    ``W' = W + scaling · A @ B`` per layer; a merged tied ``lm_head`` is
    untied (the delta breaks the embedding share)."""
    blocks = dict(params["language_model"]["model"]["blocks"])
    att = dict(blocks["att"])
    ff = dict(blocks["ff"])
    sw = dict(ff["swiglu"])

    def merged(w, ad):
        delta = jnp.einsum("lir,lro->lio", ad["lora_a"], ad["lora_b"])
        return (w + ad["scaling"][:, None, None] * delta).astype(w.dtype)

    for name, ad in lora["blocks"].items():
        if name in ("W_query", "W_key", "W_value", "out_proj"):
            att[name] = {"weight": merged(att[name]["weight"], ad)}
        elif name in ("w_gate", "w_up"):
            sw[name] = merged(sw[name], ad)
        elif name == "w_down":
            ff["w_down"] = {"weight": merged(ff["w_down"]["weight"], ad)}
    ff["swiglu"] = sw
    blocks["att"] = att
    blocks["ff"] = ff
    lm = dict(params["language_model"])
    model = dict(lm["model"])
    model["blocks"] = blocks
    lm["model"] = model

    def merged_flat(w, ad):
        delta = jnp.matmul(ad["lora_a"], ad["lora_b"])
        return (w + ad["scaling"] * delta).astype(w.dtype)

    if "lm_head" in lora:
        head_w = lm["lm_head"]["weight"]
        if head_w is None:  # tied head: materialize, merge, untie
            head_w = model["tok_emb"]["weight"].T
        lm = {**lm, "lm_head": {"weight": merged_flat(head_w, lora["lm_head"])}}

    out = {**params, "language_model": lm}
    if "projector" in lora:
        proj = dict(out["multi_modal_projector"]["linear"])
        proj["weight"] = merged_flat(proj["weight"], lora["projector"])
        out = {**out, "multi_modal_projector": {"linear": proj}}
    return out


class LoraTrainState(NamedTuple):
    lora: dict
    opt_state: tuple
    step: jax.Array


def make_lora_train_step(
    config: MLLAMAConfig,
    learning_rate: float = 1e-4,
    lora_dropout: float = 0.0,
    impl: str = "auto",
    remat: bool = False,
    loss_chunk=None,
    accum_steps: int = 1,
):
    """Build (init_state, train_step). ``train_step(params, state, batch, rng)``
    differentiates only the adapters; base params are frozen (reference
    Model/model.py:116-118).

    ``accum_steps=A``: gradient accumulation — every ``batch`` leaf carries a
    leading microbatch axis ``[A, ...]``; a ``lax.scan`` runs the A
    forward/backwards sequentially (activation memory of ONE microbatch) and
    applies a single optimizer update. Microbatch grads are weighted by their
    valid-target counts, so the update equals the one big ``[A·B]`` batch
    exactly even when microbatches carry different amounts of padding
    (each microbatch must contain ≥1 valid target)."""
    import optax

    tx = optax.adam(learning_rate)

    def init_state(lora: dict) -> LoraTrainState:
        return LoraTrainState(lora=lora, opt_state=tx.init(lora), step=jnp.zeros((), jnp.int32))

    def loss_fn(lora, params, batch, rng):
        out = vlm_forward(
            params,
            config,
            input_ids=batch["input_ids"],
            pixel_values=batch.get("pixel_values"),
            attention_mask=batch.get("attention_mask"),
            labels=batch["labels"],
            lora=lora,
            dropout_rng=rng if lora_dropout > 0.0 else None,
            lora_dropout=lora_dropout,
            impl=impl,
            remat=remat,
            loss_chunk=loss_chunk,
        )
        return out.loss

    def train_step(params, state: LoraTrainState, batch: dict, rng: jax.Array):
        if accum_steps > 1:
            loss, grads = accumulate_grads(
                lambda lora, mb, r: loss_fn(lora, params, mb, r),
                state.lora, batch, rng, accum_steps, config.ignore_index,
            )
        else:
            loss, grads = jax.value_and_grad(loss_fn)(state.lora, params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.lora)
        lora = optax.apply_updates(state.lora, updates)
        return LoraTrainState(lora=lora, opt_state=opt_state, step=state.step + 1), loss

    return init_state, train_step


def lora_train_step(params, state, batch, rng, config, **kw):
    """One-shot convenience wrapper (builds the step each call; prefer
    make_lora_train_step + jit for loops)."""
    init_state, step_fn = make_lora_train_step(config, **kw)
    return step_fn(params, state, batch, rng)


# ---------------------------------------------------------------------------
# Train-state save/resume (adapters + optimizer state; the reference has no
# resume at all — SURVEY §5 'Checkpoint/resume')
# ---------------------------------------------------------------------------


def _npz_path(path: str) -> str:
    # np.savez appends .npz to bare paths but np.load does not — normalize so
    # save/load round-trip through the same path string.
    return path if path.endswith(".npz") else path + ".npz"


def save_train_state(path: str, state: LoraTrainState) -> None:
    """Persist the full training state (adapters + Adam moments + step) so
    fine-tuning can resume exactly."""
    leaves, _ = jax.tree.flatten(state)
    np.savez_compressed(
        _npz_path(path), **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    )


def load_train_state(path: str, template: LoraTrainState) -> LoraTrainState:
    """Restore a state saved by ``save_train_state``; ``template`` (e.g. a
    fresh ``init_state(lora)``) provides the tree structure."""
    data = np.load(_npz_path(path))
    leaves, treedef = jax.tree.flatten(template)
    loaded = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    for want, got in zip(leaves, loaded):
        assert tuple(jnp.shape(want)) == tuple(got.shape), (
            f"train-state shape mismatch: {jnp.shape(want)} vs {got.shape}"
        )
    return jax.tree.unflatten(treedef, loaded)


# ---------------------------------------------------------------------------
# Adapter-only checkpoint save/load (README "LoRA fine-tuning")
# ---------------------------------------------------------------------------


def save_lora_adapters(path: str, lora: dict) -> None:
    from safetensors.numpy import save_file

    flat = {}
    for name, ad in lora["blocks"].items():
        for leaf in ("lora_a", "lora_b", "scaling"):
            flat[f"blocks.{name}.{leaf}"] = np.asarray(ad[leaf])
    for extra in ("lm_head", "projector"):
        if extra in lora:
            for leaf in ("lora_a", "lora_b", "scaling"):
                flat[f"{extra}.{leaf}"] = np.asarray(lora[extra][leaf])
    save_file(flat, path)


def load_lora_adapters(path: str) -> dict:
    from safetensors import safe_open

    out: dict = {"blocks": {}}
    with safe_open(path, framework="np") as fh:
        for key in fh.keys():
            parts = key.split(".")
            if parts[0] == "blocks":
                _, name, leaf = parts
                out["blocks"].setdefault(name, {})[leaf] = jnp.asarray(fh.get_tensor(key))
            else:  # flat adapters: lm_head / projector
                name, leaf = parts
                out.setdefault(name, {})[leaf] = jnp.asarray(fh.get_tensor(key))
    return out
