"""Distributed (sharded) checkpointing for GSPMD train states.

Why this exists: ``io/checkpoint.py``'s HF-layout safetensors writer
host-gathers every leaf (``np.asarray``) and holds the whole model in host
RAM — right for exporting ≤11B checkpoints into the HF ecosystem, wrong for
the 90B north-star train state (fp32 masters + two Adam moments ≈ 1 TB over
v5p-16; a single stacked ``w_gate`` master leaf is ~75 GB), and structurally
impossible multi-host (a process cannot gather shards it doesn't address).
The reference has no save path at all — it is load-only
(``/root/reference/Model/utils.py:149-166``; SURVEY §5 "Checkpoint/resume").

TPU-native design — orbax + tensorstore, the JAX ecosystem's production
checkpoint layer, not a bespoke format:

- **per-process shard writes**: each host serializes only the shards it
  addresses (OCDBT/zarr layout), so save cost scales with per-chip bytes,
  not model bytes;
- **resharding restore**: leaves are placed directly to the shardings of an
  abstract template — resuming onto a *different* mesh shape (dp=2×tp=4 →
  dp=4×tp=2 after a slice resize) is a first-class operation, not a
  host-gather + re-shard (``tests/test_distributed_ckpt.py`` pins it);
- **async save**: serialization overlaps the following train steps;
  ``wait()`` (or the next ``save``) joins the background write;
- **arbitrary pytrees**: the full ``FullTrainState`` / ``LoraTrainState``
  NamedTuples round-trip — params, frozen subtrees, optax moment chains,
  step counters — including int8-quantized base trees (int8 payloads +
  fp32 scale dicts are ordinary leaves).

The two writers are complementary: ``save_checkpoint_params`` exports the
canonical float tree to HF-named safetensors for interchange;
``ShardedCheckpointer`` / ``TrainCheckpointManager`` persist the *native
sharded training state* for scale and exact resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax

__all__ = [
    "ShardedCheckpointer",
    "TrainCheckpointManager",
    "abstract_state",
]


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def abstract_state(tree: Any, shardings: Optional[Any] = None) -> Any:
    """Build the abstract template ``restore`` needs from a concrete state
    tree: every array leaf becomes a ``jax.ShapeDtypeStruct`` carrying the
    leaf's sharding (or the matching leaf of ``shardings`` when given — pass
    the *target* layout here to reshard on restore).

    The template can be built without materializing the state: apply this to
    ``jax.eval_shape(init_state, params_template)`` output, with
    ``shardings`` from the mesh rules.
    """

    def one(leaf, shd=None):
        if shd is None:
            shd = getattr(leaf, "sharding", None)
        # Single-device / committed-to-default arrays restore fine without
        # an explicit sharding (orbax falls back to the default device).
        if shd is not None and not isinstance(shd, jax.sharding.Sharding):
            shd = None
        return jax.ShapeDtypeStruct(jax.numpy.shape(leaf), leaf.dtype, sharding=shd)

    if shardings is None:
        return jax.tree.map(one, tree)
    return jax.tree.map(one, tree, shardings)


class ShardedCheckpointer:
    """Sharded save/restore of one pytree per directory.

    >>> ck = ShardedCheckpointer()
    >>> ck.save("/ckpts/step_100", state)            # blocks until durable
    >>> ck.save("/ckpts/step_200", state, wait=False)  # overlaps training
    >>> ck.wait()                                    # join the async write
    >>> state = ck.restore("/ckpts/step_200", abstract_state(state))
    """

    def __init__(self) -> None:
        self._ckptr = _ocp().StandardCheckpointer()

    def save(self, path: str, tree: Any, *, wait: bool = True, force: bool = True) -> None:
        """Write ``tree`` under ``path`` (a directory; created atomically).
        ``wait=False`` returns as soon as device buffers are snapshotted and
        serializes in the background — training may continue immediately.
        """
        self._ckptr.save(os.path.abspath(path), tree, force=force)
        if wait:
            self._ckptr.wait_until_finished()

    def restore(self, path: str, template: Any) -> Any:
        """Restore the tree saved at ``path``. ``template`` is either the
        matching concrete state (its shardings are reused) or an abstract
        tree from :func:`abstract_state` — each leaf is placed directly to
        its template sharding, so a checkpoint saved on one mesh restores
        onto another without a host gather.
        """
        if not _is_abstract(template):
            template = abstract_state(template)
        return self._ckptr.restore(os.path.abspath(path), template)

    def wait(self) -> None:
        """Block until any in-flight async save is durable on disk."""
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self._ckptr.close()


def _is_abstract(tree: Any) -> bool:
    leaves = jax.tree.leaves(tree)
    return bool(leaves) and all(
        isinstance(leaf, jax.ShapeDtypeStruct) for leaf in leaves
    )


class TrainCheckpointManager:
    """Rotating step-indexed checkpoints over one run directory.

    Wraps ``orbax.CheckpointManager``: ``save(step, state)`` keeps at most
    ``max_to_keep`` newest steps (older directories are garbage-collected),
    saves run async by default, and ``restore()`` with no step resumes the
    latest. Survives preemption mid-save: an interrupted write never
    replaces a previous finalized step (orbax commits directories
    atomically via rename).

    >>> mgr = TrainCheckpointManager(run_dir, max_to_keep=3)
    >>> for step in range(n):
    ...     state, loss = train_step(state, batch, rng)
    ...     mgr.save(int(state.step), state)   # async, rotates old steps
    >>> mgr.wait()
    >>> state = mgr.restore(template=abstract_state(state))  # latest
    """

    def __init__(
        self,
        directory: str,
        max_to_keep: Optional[int] = 3,
        save_interval_steps: int = 1,
        async_save: bool = True,
    ) -> None:
        ocp = _ocp()
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                enable_async_checkpointing=async_save,
            ),
        )

    def save(self, step: int, state: Any, *, force: bool = False) -> bool:
        """Queue a save of ``state`` at ``step``; returns False when the
        manager's ``save_interval_steps`` policy skips this step."""
        ocp = _ocp()
        return self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        """Restore ``step`` (default: latest). ``template`` as in
        :meth:`ShardedCheckpointer.restore`."""
        ocp = _ocp()
        if step is None:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(
                    f"no checkpoint steps under {self._mgr.directory}"
                )
        if not _is_abstract(template):
            template = abstract_state(template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
