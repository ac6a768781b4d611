"""Full-parameter fine-tuning (beyond the reference's LoRA-only recipe).

The reference ships only the LoRA pieces (``Linear_LORA`` Model/model.py:107-121
+ the shifted-CE loss Model/model.py:431-438); a complete framework also needs
full fine-tuning. TPU-first design:

- **Mixed precision**: keep fp32 master weights, cast to ``compute_dtype``
  (bf16 on TPU) *inside* the differentiated function — autodiff through the
  cast yields fp32 gradients w.r.t. the masters, the forward/backward matmuls
  run on the MXU in bf16.
- **Frozen subtrees** (``freeze_vision=True`` freezes the ViT tower — the
  standard VLM recipe): frozen params are closed over, not differentiated, so
  no gradient or optimizer memory is spent on them (vision grads are never
  computed, not computed-then-masked).
- **Sharded optimizer state for free**: under GSPMD the Adam moments inherit
  the parameter shardings (``tx.init`` is elementwise over sharded arrays), so
  a tp/dp-sharded model trains with tp/dp-sharded moments with no extra code —
  verified in ``tests/test_full_train.py`` on the virtual mesh.
- **ZeRO-style optimizer partitioning** (``zero1_params=...``): TP-only
  optimizer layout does not fit 90B full FT on v5p-16 (fp32 masters + two
  Adam moments = 12 bytes/param = 135 GB/chip at tp=8 — docs/AOT_NORTHSTAR.md).
  Passing the sharded param tree as ``zero1_params`` extends every moment's
  sharding over the ``dp`` axis (``parallel.zero1_shardings``); gradients are
  constrained to the same layout so GSPMD reduce-scatters them, the Adam
  update computes sharded, and the new params are constrained back to the
  compute layout (XLA all-gathers the updates) — the ZeRO-1 dataflow from
  sharding annotations alone. ``zero1_masters=True`` additionally keeps the
  fp32 masters dp-sharded (ZeRO-3-style), casting to ``compute_dtype``
  *before* the gather so weights cross ICI in bf16 and the backward
  reduce-scatter also runs in bf16.
- Composes with ``remat=True`` (scan-over-remat decoder) and
  ``loss_chunk=N`` (chunked shifted-CE) for long-context training, same as
  the LoRA path.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from llama32mm_tpu.configs import MLLAMAConfig
from llama32mm_tpu.models.vlm import vlm_forward

FROZEN_KEYS_VISION = ("vision_model",)


class FullTrainState(NamedTuple):
    params: dict  # trainable tree (masters, typically fp32)
    frozen: dict  # non-trainable subtrees ({} when everything trains)
    opt_state: Any
    step: jax.Array

    def full_params(self) -> dict:
        """Re-assemble the complete VLM param tree (inference/export)."""
        return {**self.frozen, **self.params}


def split_trainable(params: dict, freeze_vision: bool = False):
    """Partition the top-level VLM tree into (trainable, frozen) dicts."""
    frozen_keys = FROZEN_KEYS_VISION if freeze_vision else ()
    trainable = {k: v for k, v in params.items() if k not in frozen_keys}
    frozen = {k: v for k, v in params.items() if k in frozen_keys}
    return trainable, frozen


def make_optimizer(
    learning_rate=1e-5,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    optimizer: str = "adamw",
):
    """The exact optax chain ``make_train_step`` trains with (exposed so AOT
    tooling can rebuild the identical opt-state tree structure).

    ``optimizer``: ``"adamw"`` (default) or ``"adafactor"``. Adafactor keeps
    factored second-moment statistics (one row + one column vector per
    matrix instead of two full moment trees) — the difference between full
    fine-tuning fitting on a single 16 GB chip or not at 3B scale: AdamW
    moments for a 3.2B-param model are ~13 GB on top of params+grads,
    Adafactor's are ~5 MB."""
    import optax

    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    if optimizer == "adamw":
        chain.append(
            optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay)
        )
    elif optimizer == "adafactor":
        chain.append(
            optax.adafactor(
                learning_rate=learning_rate,
                multiply_by_parameter_scale=False,
                momentum=None,
                weight_decay_rate=weight_decay or None,
            )
        )
    else:
        raise ValueError(f"optimizer must be 'adamw' or 'adafactor', got {optimizer!r}")
    return optax.chain(*chain)


def make_train_step(
    config: MLLAMAConfig,
    learning_rate=1e-5,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    freeze_vision: bool = False,
    compute_dtype: Optional[str] = None,
    impl: str = "auto",
    remat: bool = False,
    loss_chunk: Optional[int] = None,
    zero1_params: Optional[dict] = None,
    zero1_axis: str = "dp",
    zero1_masters: bool = False,
    accum_steps: int = 1,
    optimizer: str = "adamw",
):
    """Build ``(init_state, train_step)`` for full fine-tuning.

    ``train_step(state, batch, rng) -> (state, loss)`` differentiates every
    non-frozen parameter with AdamW (+ global-norm clipping when
    ``max_grad_norm`` is set). ``learning_rate`` may be a float or an optax
    schedule. ``batch``: ``input_ids`` / ``labels`` (+ optional
    ``pixel_values`` / ``attention_mask``), as in the LoRA path.

    ``accum_steps=A``: gradient accumulation — batch leaves carry a leading
    ``[A, ...]`` microbatch axis, the A backward passes run under ``lax.scan``
    (one microbatch of activation memory), and grads are valid-target-count
    weighted so the single optimizer update equals the big-batch one exactly
    (``train/accum.py``). Composes with zero1: the ACCUMULATED grad tree is
    what gets reduce-scattered into the optimizer layout.

    ``zero1_params``: the GSPMD-sharded param tree (or ShapeDtypeStructs with
    shardings attached) — enables ZeRO-1 optimizer partitioning over
    ``zero1_axis`` (see module docstring). ``zero1_masters=True`` also keeps
    the masters themselves partitioned.
    """
    import optax

    tx = make_optimizer(learning_rate, weight_decay, max_grad_norm, b1, b2,
                        optimizer=optimizer)
    cdt = None if compute_dtype is None else jnp.dtype(compute_dtype)

    if zero1_params is not None:
        from llama32mm_tpu.parallel.sharding import zero1_shardings

        _z1_like, _ = split_trainable(zero1_params, freeze_vision)
        # compute layout = the shardings the forward/backward runs in
        _compute_shd = jax.tree.map(lambda p: p.sharding, _z1_like)
        # optimizer layout = compute layout extended over the zero1 axis
        _z1_shd = zero1_shardings(_z1_like, axis=zero1_axis)
    else:
        _compute_shd = _z1_shd = None

    def init_state(params: dict) -> FullTrainState:
        # Call EAGERLY on (sharded) arrays: eager ``tx.init`` zeros inherit
        # each param's NamedSharding, so the moments come up sharded like the
        # model with no extra code. (Under jit the compiler would be free to
        # re-shard the freshly created zeros.)
        trainable, frozen = split_trainable(params, freeze_vision)
        opt_state = tx.init(trainable)
        if _z1_shd is not None:
            opt_state = optax.tree_map_params(
                tx, lambda leaf, s: jax.device_put(leaf, s), opt_state, _z1_shd
            )
            if zero1_masters:
                trainable = jax.tree.map(jax.device_put, trainable, _z1_shd)
        return FullTrainState(
            params=trainable,
            frozen=frozen,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
        )

    def _cast(tree):
        if cdt is None:
            return tree
        return jax.tree.map(
            lambda x: x.astype(cdt) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )

    def loss_fn(trainable, frozen, batch, rng):
        trainable = _cast(trainable)
        if zero1_masters and _compute_shd is not None:
            # Masters live dp-sharded; gather to the compute (tp) layout
            # AFTER the downcast so the all-gather moves compute_dtype bytes
            # and its transpose (the grad reduce-scatter) does too.
            trainable = jax.tree.map(
                jax.lax.with_sharding_constraint, trainable, _compute_shd
            )
        out = vlm_forward(
            {**_cast(frozen), **trainable},
            config,
            input_ids=batch["input_ids"],
            pixel_values=batch.get("pixel_values"),
            attention_mask=batch.get("attention_mask"),
            labels=batch["labels"],
            dropout_rng=rng,  # drives ViT attention dropout when enabled
            impl=impl,
            remat=remat,
            loss_chunk=loss_chunk,
        )
        return out.loss

    def train_step(state: FullTrainState, batch: dict, rng: jax.Array):
        if accum_steps > 1:
            from llama32mm_tpu.train.accum import accumulate_grads

            loss, grads = accumulate_grads(
                lambda p, mb, r: loss_fn(p, state.frozen, mb, r),
                state.params, batch, rng, accum_steps, config.ignore_index,
            )
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, state.frozen, batch, rng
            )
        if _z1_shd is not None:
            # reduce-scatter the grads into the optimizer layout: the Adam
            # update then computes 1/|dp| of every moment per chip
            grads = jax.tree.map(
                jax.lax.with_sharding_constraint, grads, _z1_shd
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if _z1_shd is not None:
            opt_state = optax.tree_map_params(
                tx,
                lambda leaf, s: jax.lax.with_sharding_constraint(leaf, s),
                opt_state,
                _z1_shd,
            )
        params = optax.apply_updates(state.params, updates)
        if _z1_shd is not None:
            # all-gather the sharded updates back into the params' layout
            # (masters stay partitioned when zero1_masters)
            params = jax.tree.map(
                jax.lax.with_sharding_constraint,
                params,
                _z1_shd if zero1_masters else _compute_shd,
            )
        return (
            FullTrainState(
                params=params,
                frozen=state.frozen,
                opt_state=opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    return init_state, train_step


# ---------------------------------------------------------------------------
# Full train-state save/resume (params + moments + step). safetensors, one
# tensor per tree leaf. The format is mmap-friendly on LOAD (resume reads
# leaves lazily); the save path still materializes every leaf on host before
# writing — beyond single-host scale (90B: masters + moments ≈ 1 TB) use
# io.distributed (ShardedCheckpointer / TrainCheckpointManager): per-shard
# orbax writes, resharding restore, async save.
# ---------------------------------------------------------------------------


def _flatten_with_names(state: FullTrainState):
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(state)
    named = []
    for path, leaf in leaves_with_path:
        name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        named.append((name, leaf))
    return named, treedef


def save_full_train_state(path: str, state: FullTrainState) -> None:
    """Persist masters + frozen tree + optimizer moments + step so full
    fine-tuning resumes exactly. One safetensors file keyed by tree path.
    (bf16 leaves round-trip through a uint16 view — safetensors.numpy has no
    native ml_dtypes support.)"""
    from safetensors.numpy import save_file

    named, _ = _flatten_with_names(state)
    out = {}
    for name, leaf in named:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "V" or arr.dtype.name == "bfloat16":
            arr = arr.view(np.uint16)
            name = "bf16:" + name
        out[name] = arr
    save_file(out, path)


def load_full_train_state(path: str, template: FullTrainState) -> FullTrainState:
    """Restore a state saved by ``save_full_train_state``; ``template`` (a
    fresh ``init_state(params)``) provides tree structure, dtypes, and — when
    its arrays are sharded — the GSPMD placement (each loaded leaf is
    device_put to the template leaf's sharding)."""
    from safetensors import safe_open

    named, treedef = _flatten_with_names(template)
    loaded = []
    with safe_open(path, framework="np") as f:
        keys = set(f.keys())
        for name, want in named:
            key = name if name in keys else "bf16:" + name
            if key not in keys:
                raise KeyError(f"train-state file is missing leaf {name!r}")
            arr = f.get_tensor(key)
            if key.startswith("bf16:"):
                arr = arr.view(np.dtype("bfloat16"))
            if tuple(arr.shape) != tuple(jnp.shape(want)):
                raise ValueError(
                    f"train-state shape mismatch at {name}: "
                    f"{tuple(jnp.shape(want))} vs {arr.shape}"
                )
            want_dtype = jnp.asarray(want).dtype if not hasattr(want, "dtype") else want.dtype
            if arr.dtype != want_dtype:
                # e.g. bf16-master checkpoint resumed into an fp32-master
                # template: shapes match, precision silently wrong without this
                raise ValueError(
                    f"train-state dtype mismatch at {name}: template expects "
                    f"{want_dtype}, file has {arr.dtype}"
                )
            sharding = getattr(want, "sharding", None)
            loaded.append(
                jax.device_put(arr, sharding) if sharding is not None
                else jnp.asarray(arr)
            )
    return jax.tree_util.tree_unflatten(treedef, loaded)
