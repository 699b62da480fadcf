"""Host input pipeline: sampling, collation, threaded prefetch, per-host
sharding.

Replaces the reference's torch DataLoader machinery
(``dataloaders/dataloader.py``):
- rank sharding via ``Subset(range(rank, N, world_size))`` (``:29-33``) ->
  per-host index sharding by ``jax.process_index()``;
- batch-size auto-shrink for tiny fine-tune sets (``:36-40``);
- ``DataLoaderWithPrefetch`` with ``prefetch_size`` in-flight samples
  (``:52-92``) -> a thread pool + bounded batch queue (cv2/np release the
  GIL; a C++ decode loader can slot in underneath later).
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

logger = logging.getLogger("latentpose_tpu.data.pipeline")


def default_collate(samples):
    """List of (data_dict, target_dict) -> stacked numpy batch dicts."""
    data_keys = samples[0][0].keys()
    target_keys = samples[0][1].keys()
    data = {k: np.stack([s[0][k] for s in samples]) for k in data_keys}
    target = {}
    for k in target_keys:
        vals = [s[1][k] for s in samples]
        if np.isscalar(vals[0]) or np.ndim(vals[0]) == 0:
            target[k] = np.asarray(vals,
                                   np.int32 if k == "label" else np.float32)
        else:
            target[k] = np.stack(vals)
    return data, target


class BatchLoader:
    """Iterable over (data_dict, target_dict) batches with prefetch."""

    def __init__(self, dataset, batch_size, shuffle=True, seed=0,
                 num_workers=4, prefetch_size=16, drop_last=True,
                 shard_by_process=True):
        import jax
        self.dataset = dataset
        # tiny fine-tune sets: shrink batch (reference dataloader.py:36-40)
        if batch_size > len(dataset):
            logger.warning("Decreasing batch size %d -> dataset size %d",
                           batch_size, len(dataset))
            batch_size = len(dataset)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch_batches = max(1, prefetch_size // batch_size)
        self.drop_last = drop_last
        self.epoch = 0
        self.rank = jax.process_index() if shard_by_process else 0
        self.world = jax.process_count() if shard_by_process else 1

    @property
    def num_labels(self):
        return getattr(self.dataset, "num_labels",
                       len(self.dataset.dirlist))

    def _epoch_indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # static per-host shard (reference dataloader.py:29-33)
        return idx[self.rank::self.world]

    def __len__(self):
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self):
        indices = self._epoch_indices()
        self.epoch += 1
        batches = [indices[i:i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        out_queue: "queue.Queue" = queue.Queue(self.prefetch_batches)
        sentinel = object()
        stop = threading.Event()

        def put(item):
            # bounded put that gives up when the consumer is gone, so an
            # abandoned iterator doesn't leave the producer blocked (and
            # still touching dataset files during caller teardown)
            while not stop.is_set():
                try:
                    out_queue.put(item, timeout=0.1)
                    return
                except queue.Full:
                    continue

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(
                            self.dataset.__getitem__, batch_idx))
                        put(default_collate(samples))
            except BaseException as exc:  # propagate into the consumer
                put(exc)
            finally:
                put(sentinel)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = out_queue.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so a producer blocked on a full queue can finish
            try:
                while True:
                    out_queue.get_nowait()
            except queue.Empty:
                pass
            thread.join()
