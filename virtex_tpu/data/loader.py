r"""
Host-side data loader: threaded decode/augment workers with batch prefetch,
feeding device-sharded arrays.

Replaces the reference's torch ``DataLoader`` + ``DistributedSampler`` + the
``cycle`` generator (``virtex/utils/common.py:14-36``,
``scripts/pretrain_virtex.py:67-96``). TPU-native differences:

- one *process per host* (not per chip): each host loads its shard of the
  global batch and the arrays are laid out over the mesh with
  ``jax.make_array_from_process_local_data``;
- deterministic, resumable epoch shuffling: permutation seeded by
  ``(seed, epoch)`` mirrors ``DistributedSampler.set_epoch`` semantics;
- cv2/numpy work runs on a thread pool (cv2 releases the GIL), with a bounded
  prefetch queue of fully-collated batches.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional

import numpy as np


class ShardedSampler:
    """Yields epoch-wise shuffled index streams, sharded over hosts.

    Equivalent to torch's DistributedSampler with ``set_epoch`` re-seeding
    (reference ``common.py:25-30``), but infinite: iterate and it keeps
    producing indices across epoch boundaries forever.
    """

    def __init__(
        self,
        num_examples: int,
        shuffle: bool = True,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
        start_epoch: int = 0,
    ):
        assert 0 <= shard_index < num_shards
        self.num_examples = num_examples
        self.shuffle = shuffle
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.epoch = start_epoch

    def __iter__(self) -> Iterator[int]:
        while True:
            if self.shuffle:
                order = np.random.RandomState(
                    (self.seed * 1_000_003 + self.epoch) % (2**31)
                ).permutation(self.num_examples)
            else:
                order = np.arange(self.num_examples)
            # Even shards: drop the tail remainder (same as drop_last +
            # DistributedSampler padding semantics, simpler and unbiased
            # for the infinite pretraining stream).
            per_shard = self.num_examples // self.num_shards
            shard = order[self.shard_index * per_shard:(self.shard_index + 1) * per_shard]
            yield from shard.tolist()
            self.epoch += 1


class DataLoader:
    """Batched, prefetching loader over a map-style dataset.

    Args:
        dataset: Object with ``__len__``, ``__getitem__(idx, rng)`` and
            ``collate_fn(list_of_items) -> batch dict``.
        batch_size: *Per-host* batch size.
        shuffle: Shuffle each epoch.
        num_workers: Decode/augment thread count (0 = synchronous).
        seed: Base RNG seed; combined with epoch and item index so every
            item's augmentations are independent yet reproducible.
        prefetch: Number of collated batches to keep ready.
        infinite: If False, stop after one epoch (eval); if True, cycle
            forever (pretraining).
    """

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        prefetch: int = 2,
        infinite: bool = True,
        num_shards: int = 1,
        shard_index: int = 0,
        collate_fn: Optional[Callable] = None,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(0, num_workers)
        self.seed = seed
        self.prefetch = max(1, prefetch)
        self.infinite = infinite
        self.drop_last = drop_last or infinite
        self.collate_fn = collate_fn or dataset.collate_fn
        self.sampler = ShardedSampler(
            len(dataset), shuffle=shuffle, seed=seed,
            num_shards=num_shards, shard_index=shard_index,
        )
        self._counter = 0

    def __len__(self) -> int:
        return (len(self.dataset) // self.sampler.num_shards) // self.batch_size

    def _fetch(self, idx: int, item_seed: int):
        rng = np.random.RandomState(item_seed % (2**31))
        try:
            return self.dataset.__getitem__(idx, rng=rng)
        except TypeError:
            return self.dataset[idx]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches_per_epoch = len(self)
        shard_examples = len(self.dataset) // self.sampler.num_shards
        remainder = 0 if self.drop_last else shard_examples % self.batch_size
        if batches_per_epoch == 0 and remainder == 0:
            raise ValueError(
                f"Dataset ({len(self.dataset)} examples / {self.sampler.num_shards} "
                f"shards) smaller than batch size {self.batch_size}"
            )

        index_stream = iter(self.sampler)

        def batch_indices():
            n = 0
            while self.infinite or n < batches_per_epoch:
                yield [next(index_stream) for _ in range(self.batch_size)]
                n += 1
            if remainder:
                # final short batch (eval only; shapes trigger one recompile)
                yield [next(index_stream) for _ in range(remainder)]

        if self.num_workers == 0:
            for idxs in batch_indices():
                items = [
                    self._fetch(i, self.seed + 7919 * self._advance())
                    for i in idxs
                ]
                yield self.collate_fn(items)
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                try:
                    for idxs in batch_indices():
                        if stop.is_set():
                            return
                        futures = [
                            pool.submit(
                                self._fetch, i, self.seed + 7919 * self._advance()
                            )
                            for i in idxs
                        ]
                        items = [f.result() for f in futures]
                        batch = self.collate_fn(items)
                        while not stop.is_set():
                            try:
                                out_q.put(batch, timeout=0.5)
                                break
                            except queue.Full:
                                continue
                    out_q.put(None)
                except BaseException as e:  # surface worker errors
                    out_q.put(e)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def _advance(self) -> int:
        self._counter += 1
        return self._counter


# Device placement of host batches lives in virtex_tpu.parallel.shard_batch
# (single-host device_put / multi-host make_array_from_process_local_data).
