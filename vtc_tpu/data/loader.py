"""Host-side data loader: map-style dataset -> shuffled, collated numpy
batches with background prefetch.

Replaces ``torch.utils.data.DataLoader`` (``train.py:48-64``). Decode work
(PIL/cv2/ffmpeg) releases the GIL, so a thread pool gives the multi-worker
overlap the reference got from worker processes, without the fd-exhaustion
and thread-oversubscription workarounds it needed
(``train.py:8-18``). Batches are numpy; the trainer owns the host->device
transfer (sharded device_put over the mesh's data axis).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


def default_collate(items):
    """Stack a list of per-sample tuples into a batch tuple.

    Handles nested tuples (audio-with-comments) and dict metas; string /
    object fields collate to lists.
    """
    elem = items[0]
    if isinstance(elem, (tuple, list)):
        return tuple(default_collate([it[i] for it in items]) for i in range(len(elem)))
    if isinstance(elem, dict):
        return {k: default_collate([it[k] for it in items]) for k in elem}
    if isinstance(elem, np.ndarray):
        return np.stack(items)
    if isinstance(elem, (int, np.integer)):
        return np.asarray(items, dtype=np.int64)
    if isinstance(elem, (float, np.floating)):
        return np.asarray(items, dtype=np.float32)
    return list(items)


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        collate_fn=default_collate,
        prefetch: int = 2,
        shard_by_process: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(int(num_workers), 0)
        self.seed = seed
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self._epoch = 0
        # multi-host input sharding: each host reads its own slice of the
        # (identically shuffled) index stream
        if shard_by_process:
            import jax

            self.process_index = jax.process_index()
            self.process_count = jax.process_count()
        else:
            self.process_index = 0
            self.process_count = 1

    def __len__(self) -> int:
        n = len(self.dataset) // self.process_count
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        if self.process_count > 1:
            per_host = n // self.process_count
            idx = idx[
                self.process_index * per_host : (self.process_index + 1) * per_host
            ]
        batches = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator:
        self._epoch += 1
        batches = self._batch_indices()

        if self.num_workers == 0:
            for b in batches:
                yield self.collate_fn([self.dataset[int(i)] for i in b])
            return

        yield from self._threaded_iter(batches)

    def _threaded_iter(self, batches):
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """put that keeps polling the stop event — a producer blocked
            forever in out_q.put when the consumer abandons the iterator
            mid-epoch would leak the thread pool and its buffered batches."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                def load_batch(b):
                    items = list(pool.map(self.dataset.__getitem__, [int(i) for i in b]))
                    return self.collate_fn(items)

                try:
                    for b in batches:
                        if stop.is_set():
                            return
                        if not put_or_stop(load_batch(b)):
                            return
                except Exception as e:  # surface worker errors to the consumer
                    put_or_stop(e)
                finally:
                    put_or_stop(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def prefetch_to_device(iterator, mesh=None, size: int = 2):
    """Overlap host batching with device compute: device_put up to ``size``
    batches ahead (the jax analogue of pin_memory+non_blocking)."""
    import jax

    from ..parallel.mesh import shard_batch

    def put(x):
        if mesh is not None:
            return shard_batch(x, mesh)
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a) if hasattr(a, "shape") else a, x
        )

    buf = []
    for item in iterator:
        buf.append(put(item))
        if len(buf) > size:
            yield buf.pop(0)
    yield from buf


class GrainDataLoader:
    """grain-backed loader: true multiprocess workers (the BPE tokenizer and
    RAKE fallback are GIL-bound Python, so the threaded loader can't scale
    them; grain workers are processes, like the reference's DataLoader
    workers but without its fd/thread workarounds).

    Same interface as :class:`DataLoader`; collation is grain's Batch
    transform over the dataset's numpy outputs.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        shard_by_process: bool = False,
        **_,
    ):
        import grain.python as gp

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._gp = gp
        self.num_workers = max(int(num_workers), 0)
        self.seed = seed
        self._epoch = 0
        if shard_by_process:
            import jax

            self._shard = gp.ShardOptions(
                shard_index=jax.process_index(),
                shard_count=jax.process_count(),
                drop_remainder=True,
            )
        else:
            self._shard = gp.NoSharding()

    def __len__(self) -> int:
        n = len(self.dataset)
        shards = getattr(self._shard, "shard_count", 1) or 1
        n = n // shards  # per-process batches (matches what __iter__ yields
        # under ShardOptions; an unsharded count would inflate len_epoch and
        # the StepLR steps_per_epoch by process_count)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        gp = self._gp
        self._epoch += 1
        sampler = gp.IndexSampler(
            num_records=len(self.dataset),
            shuffle=self.shuffle,
            seed=self.seed + self._epoch,
            num_epochs=1,
            shard_options=self._shard,
        )
        loader = gp.DataLoader(
            data_source=self.dataset,
            sampler=sampler,
            operations=[
                gp.Batch(batch_size=self.batch_size, drop_remainder=self.drop_last)
            ],
            worker_count=self.num_workers,
        )
        yield from loader
