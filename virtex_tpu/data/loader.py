r"""
Host-side data loader: threaded decode/augment workers with batch prefetch,
feeding device-sharded arrays.

Replaces the reference's torch ``DataLoader`` + ``DistributedSampler`` + the
``cycle`` generator (``virtex/utils/common.py:14-36``,
``scripts/pretrain_virtex.py:67-96``). TPU-native differences:

- one *process per host* (not per chip): each host loads its shard of the
  global batch and the arrays are laid out over the mesh with
  ``jax.make_array_from_process_local_data``;
- deterministic AND resumable: the stream position is a single monotone
  counter of items consumed; ``(epoch, position) = divmod(counter,
  items_per_epoch)`` reconstructs the shuffle analytically, and every item's
  augmentation RNG is seeded by ``(seed, epoch, dataset_index)`` — so a
  resumed run replays byte-identical batches from where the interrupted run
  left off (``state_dict()``/``load_state_dict()`` ride in checkpoints);
- cv2/numpy work runs on a thread pool (cv2 releases the GIL), with a bounded
  prefetch queue of fully-collated batches.
"""
from __future__ import annotations

import inspect
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import numpy as np


def item_rng(seed: int, epoch: int, index: int) -> np.random.RandomState:
    """Augmentation RNG for one (epoch, dataset index) visit — a pure
    function of its arguments, so any run (fresh or resumed) that reaches
    the same visit draws the same augmentations."""
    root = np.random.SeedSequence((seed, epoch, index))
    return np.random.RandomState(root.generate_state(1)[0])


class ShardedSampler:
    """Yields ``(epoch, dataset_index)`` pairs: epoch-wise shuffled index
    streams, sharded over hosts.

    Equivalent to torch's DistributedSampler with ``set_epoch`` re-seeding
    (reference ``common.py:25-30``), but infinite and stateless: the stream
    is a pure function of ``(seed, items_consumed)`` —
    ``iterate(start_count)`` resumes mid-epoch exactly.
    """

    def __init__(
        self,
        num_examples: int,
        shuffle: bool = True,
        seed: int = 0,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        assert 0 <= shard_index < num_shards
        self.num_examples = num_examples
        self.shuffle = shuffle
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        # Even shards: drop the tail remainder (same as drop_last +
        # DistributedSampler padding semantics, simpler and unbiased for the
        # infinite pretraining stream).
        self.items_per_epoch = num_examples // num_shards

    def epoch_order(self, epoch: int) -> np.ndarray:
        """This shard's dataset indices for one epoch."""
        if self.shuffle:
            order = np.random.RandomState(
                (self.seed * 1_000_003 + epoch) % (2**31)
            ).permutation(self.num_examples)
        else:
            order = np.arange(self.num_examples)
        lo = self.shard_index * self.items_per_epoch
        return order[lo:lo + self.items_per_epoch]

    def iterate(self, start_count: int = 0) -> Iterator[Tuple[int, int]]:
        """Infinite ``(epoch, dataset_index)`` stream beginning at absolute
        stream position ``start_count``."""
        count = start_count
        while True:
            epoch, pos = divmod(count, self.items_per_epoch)
            order = self.epoch_order(epoch)
            for i in range(pos, self.items_per_epoch):
                yield epoch, int(order[i])
                count += 1

    def __iter__(self) -> Iterator[Tuple[int, int]]:
        return self.iterate(0)


class DataLoader:
    """Batched, prefetching loader over a map-style dataset.

    Args:
        dataset: Object with ``__len__``, ``__getitem__(idx, rng)`` and
            ``collate_fn(list_of_items) -> batch dict``.
        batch_size: *Per-host* batch size.
        shuffle: Shuffle each epoch.
        num_workers: Decode/augment thread count (0 = synchronous).
        seed: Base RNG seed; item augmentations are seeded by
            ``(seed, epoch, dataset_index)`` — reproducible across resume.
        prefetch: Number of collated batches to keep ready.
        infinite: If False, stop after one epoch (eval); if True, cycle
            forever (pretraining) with resumable position tracking.
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
        pad_final: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(0, num_workers)
        self.seed = seed
        self.prefetch = max(1, prefetch)
        self.infinite = infinite
        self.drop_last = drop_last or infinite
        # pad_final: repeat the short final batch's items up to batch_size
        # so every batch has the SAME static shape (one compiled program —
        # XLA would otherwise recompile for the tail shape). Consumers that
        # need exact per-item results dedupe by id (duplicates are copies).
        self.pad_final = pad_final and not self.drop_last
        self.collate_fn = collate_fn or dataset.collate_fn
        # Decide ONCE whether __getitem__ takes the per-item RNG. A
        # try/except TypeError around the call would also swallow
        # TypeErrors raised INSIDE the dataset and retry without the rng
        # (nondeterministic augmentations, masked real errors).
        try:
            sig = inspect.signature(dataset.__getitem__)
            self._getitem_takes_rng = any(
                p.name == "rng" or p.kind is inspect.Parameter.VAR_KEYWORD
                for p in sig.parameters.values())
        except (TypeError, ValueError):
            # Unreadable signature (C extension / proxy): probe once with
            # the rng kwarg rather than silently dropping determinism.
            try:
                dataset.__getitem__(0, rng=item_rng(seed, 0, 0))
                self._getitem_takes_rng = True
            except TypeError:
                self._getitem_takes_rng = False
        self.sampler = ShardedSampler(
            len(dataset), shuffle=shuffle, seed=seed,
            num_shards=num_shards, shard_index=shard_index,
        )
        # Absolute stream position = items handed to the consumer. Only the
        # infinite (training) stream advances it; eval loaders restart at 0.
        self.items_consumed = 0

    # -- resumable position (rides in checkpoints) --------------------------
    def state_dict(self) -> Dict[str, int]:
        return {"items_consumed": int(self.items_consumed)}

    def load_state_dict(self, state: Dict[str, int]) -> None:
        self.items_consumed = int(state["items_consumed"])

    def __len__(self) -> int:
        return self.sampler.items_per_epoch // self.batch_size

    def _fetch(self, epoch: int, idx: int):
        if self._getitem_takes_rng:
            return self.dataset.__getitem__(
                idx, rng=item_rng(self.seed, epoch, idx))
        return self.dataset[idx]

    def _fetch_batch(self, pairs):
        """Whole-batch fetch through the dataset's ``get_batch`` hook (one
        OpenMP-parallel native call instead of per-item Python hops);
        identical RNG semantics to per-item ``_fetch``."""
        rngs = [item_rng(self.seed, e, i) for e, i in pairs]
        return self.dataset.get_batch([i for _, i in pairs], rngs)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches_per_epoch = len(self)
        remainder = (0 if self.drop_last
                     else self.sampler.items_per_epoch % self.batch_size)
        if batches_per_epoch == 0 and remainder == 0:
            raise ValueError(
                f"Dataset ({len(self.dataset)} examples / "
                f"{self.sampler.num_shards} shards) smaller than batch size "
                f"{self.batch_size}"
            )

        start = self.items_consumed if self.infinite else 0
        pair_stream = self.sampler.iterate(start)

        def batch_pairs():
            n = 0
            while self.infinite or n < batches_per_epoch:
                yield [next(pair_stream) for _ in range(self.batch_size)]
                n += 1
            if remainder:
                tail = [next(pair_stream) for _ in range(remainder)]
                if self.pad_final:
                    # cycle the tail's own items up to the static batch size
                    tail = tail + [tail[i % remainder]
                                   for i in range(self.batch_size - remainder)]
                # without padding: short batch (shapes trigger one recompile)
                yield tail

        # Datasets advertise whole-batch fetching only when their native
        # OpenMP path is live (a Python fallback would serialise the batch
        # and lose the thread pool's parallelism).
        batched_fetch = getattr(self.dataset, "supports_batch_fetch", False)

        if self.num_workers == 0:
            for pairs in batch_pairs():
                items = (self._fetch_batch(pairs) if batched_fetch
                         else [self._fetch(e, i) for e, i in pairs])
                batch = self.collate_fn(items)
                if self.infinite:
                    self.items_consumed += len(pairs)
                yield batch
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            # The whole-batch path needs no thread pool: the single C++
            # call fans the batch over cores with OpenMP itself.
            pool = (None if batched_fetch
                    else ThreadPoolExecutor(self.num_workers))

            def put_checked(item) -> bool:
                # Every producer put must poll the stop event: a consumer
                # that abandons iteration with the queue full would
                # otherwise leave this thread blocked in put() forever
                # (leaking it plus up to `prefetch` image batches).
                while not stop.is_set():
                    try:
                        out_q.put(item, timeout=0.5)
                        return True
                    except queue.Full:
                        continue
                return False

            try:
                try:
                    for pairs in batch_pairs():
                        if stop.is_set():
                            return
                        if batched_fetch:
                            items = self._fetch_batch(pairs)
                        else:
                            futures = [pool.submit(self._fetch, e, i)
                                       for e, i in pairs]
                            items = [f.result() for f in futures]
                        if not put_checked((self.collate_fn(items),
                                            len(pairs))):
                            return
                    put_checked(None)
                except BaseException as e:  # surface worker errors
                    put_checked(e)
            finally:
                if pool is not None:
                    pool.shutdown(wait=True)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                batch, n_items = item
                # Position advances only when the consumer RECEIVES a batch,
                # so prefetched-but-unconsumed batches are replayed on resume.
                if self.infinite:
                    self.items_consumed += n_items
                yield batch
        finally:
            stop.set()


# Device placement of host batches lives in virtex_tpu.parallel.shard_batch
# (single-host device_put / multi-host make_array_from_process_local_data).
