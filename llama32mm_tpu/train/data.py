"""Training input pipeline: packing, deterministic shuffling, resumable
iteration, host→device prefetch.

The reference has no trainer at all (SURVEY §3.4 — its README describes a
user-supplied loop); a complete framework also needs the data side of that
loop. TPU-first constraints shape the design:

- **Static shapes**: every batch is exactly ``[batch, seq_len]`` — packing
  documents into a contiguous token stream (EOS-separated) instead of
  per-example padding keeps the MXU busy on real tokens (padding at the
  stream tail only). Loss never crosses a document boundary: the label at
  each document's first token is ``ignore_index``, so the shifted CE
  (models/vlm.py) excludes the "EOS of doc A predicts first token of doc B"
  position. Attention does cross boundaries (plain causal) — the standard
  GPT-style packing trade-off; use one document per row if isolation
  matters.
- **Determinism + resume**: the epoch order is a seeded permutation; the
  iterator's :class:`DataState` (3 ints) fully determines every future
  batch. Save it next to the model state (it is a pytree —
  ``TrainCheckpointManager`` persists it with the rest), restore, and the
  stream continues bit-identically (``tests/test_train_data.py``).
- **Prefetch**: :func:`prefetch_to_device` stages the next batches onto the
  device (optionally into a dp NamedSharding) from a background thread while
  the current step runs, hiding host→device latency (on pod slices, DCN
  transfer) behind compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, NamedTuple, Optional, Sequence

import numpy as np

__all__ = [
    "DataState",
    "PackedBatchIterator",
    "pack_documents",
    "prefetch_to_device",
]

IGNORE_INDEX = -100


def pack_documents(
    docs: Sequence[Sequence[int]],
    seq_len: int,
    eos_id: int,
    pad_id: int = 0,
    ignore_index: int = IGNORE_INDEX,
) -> dict:
    """Pack tokenized documents into ``[n_rows, seq_len]`` causal-LM arrays.

    Each document is terminated with ``eos_id`` and the stream is sliced into
    fixed rows; the tail is padded. Returns ``{"input_ids", "labels"}`` where
    ``labels`` equals ``input_ids`` except ``ignore_index`` at every
    document-start position (no cross-document prediction) and at padding.
    """
    if seq_len < 2:
        raise ValueError("seq_len must be >= 2 for shifted-CE training")
    stream: List[int] = []
    starts: List[int] = []
    for doc in docs:
        if len(doc) == 0:
            continue
        starts.append(len(stream))
        stream.extend(int(t) for t in doc)
        stream.append(int(eos_id))
    if not stream:
        raise ValueError("no non-empty documents to pack")

    n_rows = (len(stream) + seq_len - 1) // seq_len
    total = n_rows * seq_len
    ids = np.full((total,), pad_id, dtype=np.int32)
    ids[: len(stream)] = np.asarray(stream, dtype=np.int32)
    labels = ids.copy()
    labels[len(stream):] = ignore_index  # padding tail
    labels[np.asarray(starts, dtype=np.int64)] = ignore_index  # doc starts
    return {
        "input_ids": ids.reshape(n_rows, seq_len),
        "labels": labels.reshape(n_rows, seq_len),
    }


class DataState(NamedTuple):
    """Everything needed to resume the stream: 3 scalars, checkpointable as a
    pytree alongside the train state."""

    epoch: np.int64
    row: np.int64  # next unconsumed packed row within the epoch
    seed: np.int64


class PackedBatchIterator:
    """Deterministic, resumable iterator of packed ``[batch, seq_len]``
    causal-LM batches over a document corpus.

    Per epoch: documents are shuffled by a permutation seeded with
    ``(seed, epoch)``, packed (:func:`pack_documents`), and yielded in
    ``batch_size``-row batches; a trailing partial batch is dropped
    (static shapes). Epochs repeat indefinitely.

    ``state`` / ``from_state`` round-trip resume:

    >>> it = PackedBatchIterator(docs, batch_size=8, seq_len=512, eos_id=2)
    >>> b0, b1 = next(it), next(it)
    >>> st = it.state
    >>> it2 = PackedBatchIterator.from_state(docs, 8, 512, 2, st)
    >>> assert np.array_equal(next(it2)["input_ids"], next(it)["input_ids"])
    """

    def __init__(
        self,
        docs: Sequence[Sequence[int]],
        batch_size: int,
        seq_len: int,
        eos_id: int,
        seed: int = 0,
        pad_id: int = 0,
        ignore_index: int = IGNORE_INDEX,
        shuffle: bool = True,
        _epoch: int = 0,
        _row: int = 0,
    ) -> None:
        if batch_size < 1:
            raise ValueError("batch_size must be >= 1")
        self._docs = docs
        self.batch_size = batch_size
        self.seq_len = seq_len
        self.eos_id = eos_id
        self.pad_id = pad_id
        self.ignore_index = ignore_index
        self.shuffle = shuffle
        self._seed = int(seed)
        self._epoch = int(_epoch)
        self._row = int(_row)
        self._packed: Optional[dict] = None
        self._packed_epoch = -1

    @property
    def state(self) -> DataState:
        return DataState(
            epoch=np.int64(self._epoch), row=np.int64(self._row),
            seed=np.int64(self._seed),
        )

    @classmethod
    def from_state(
        cls,
        docs: Sequence[Sequence[int]],
        batch_size: int,
        seq_len: int,
        eos_id: int,
        state: DataState,
        **kw,
    ) -> "PackedBatchIterator":
        """Rebuild the iterator at an exact stream position. ``state`` leaves
        may be numpy/jax scalars (as restored from a checkpoint)."""
        return cls(
            docs, batch_size, seq_len, eos_id, seed=int(state.seed),
            _epoch=int(state.epoch), _row=int(state.row), **kw,
        )

    def _epoch_rows(self) -> dict:
        if self._packed_epoch != self._epoch:
            order = np.arange(len(self._docs))
            if self.shuffle:
                rng = np.random.default_rng((self._seed, self._epoch))
                order = rng.permutation(len(self._docs))
            self._packed = pack_documents(
                [self._docs[i] for i in order], self.seq_len, self.eos_id,
                pad_id=self.pad_id, ignore_index=self.ignore_index,
            )
            self._packed_epoch = self._epoch
        return self._packed

    def __iter__(self) -> "PackedBatchIterator":
        return self

    def __next__(self) -> dict:
        while True:
            packed = self._epoch_rows()
            n_rows = packed["input_ids"].shape[0]
            if self._row + self.batch_size <= n_rows:
                sl = slice(self._row, self._row + self.batch_size)
                self._row += self.batch_size
                return {k: v[sl] for k, v in packed.items()}
            # partial tail dropped: next epoch
            self._epoch += 1
            self._row = 0


def prefetch_to_device(
    it: Iterator[dict],
    size: int = 2,
    sharding=None,
) -> Iterator[dict]:
    """Wrap a host batch iterator so the next ``size`` batches are staged on
    device (optionally placed into ``sharding`` — pass the dp batch
    NamedSharding on a mesh) by a background thread while the train step
    runs. Exceptions from the inner iterator propagate at the matching
    ``next()``; iteration ends when the inner iterator does.
    """
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=max(1, size))
    _END = object()

    def put(batch):
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    def worker():
        try:
            for batch in it:
                q.put(put(batch))
        except BaseException as e:  # noqa: BLE001 — relayed to the consumer
            q.put((_END, e))
            return
        q.put((_END, None))

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    while True:
        item = q.get()
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _END:
            if item[1] is not None:
                raise item[1]
            return
        yield item
