"""Prefetching data loader.

The reference starves its GPUs with batch_size=1 and 2 workers
(reference utils.py:69-81, SURVEY §7 "hard parts"). Here clips are
assembled by a thread pool of CPU workers (the heavy lifting is
cv2/numpy, which release the GIL) and staged into a bounded prefetch
queue so the accelerator never waits on the host.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator

import numpy as np

from faceoff_tpu.data.dataset import TemporalAlignmentDataset, pack_batch


class DataLoader:
    """Iterate batches of `batch_clips` clips, each worker seeded
    deterministically from (epoch, clip index)."""

    def __init__(
        self,
        dataset: TemporalAlignmentDataset,
        batch_clips: int = 1,
        *,
        shuffle: bool = True,
        num_workers: int = 8,
        prefetch: int = 2,
        seed: int = 0,
        pack: Callable = pack_batch,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        """shard_index/shard_count: multi-host data sharding — each process
        iterates a disjoint 1/shard_count slice of every epoch (role of the
        reference's DistributedSampler, distributed/distributed.py:135-143).
        """
        self.dataset = dataset
        self.batch_clips = batch_clips
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.pack = pack
        self.epoch = 0
        self.shard_index = shard_index
        self.shard_count = max(1, shard_count)

    def __len__(self) -> int:
        per_shard = len(self.dataset) // self.shard_count
        return max(1, per_shard // self.batch_clips)

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            # same permutation on every host; disjoint strided slices
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        if self.shard_count > 1:
            # BALANCED shards: every process gets exactly
            # len // shard_count items (cross-process collectives need
            # every process to iterate the same number of batches; an
            # uneven or empty tail shard would desync or crash them).
            # Datasets smaller than the process count duplicate one item
            # per process — still balanced.
            per = len(order) // self.shard_count
            if per == 0:
                order = order[[self.shard_index % len(order)]]
            else:
                order = order[self.shard_index:: self.shard_count][:per]
        return order

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._epoch_order()
        n_batches = len(self)
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        abandoned = threading.Event()

        def load_clip(epoch: int, pos: int) -> Dict[str, np.ndarray]:
            idx = int(order[pos % len(order)])
            rng = np.random.default_rng(
                (self.seed * 1_000_003 + epoch) * 1_000_003 + pos
            )
            return self.dataset.get_item(idx, rng)

        def _put(item) -> bool:
            """Bounded put that gives up once the consumer is gone."""
            while not abandoned.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    futures = []
                    for b in range(n_batches):
                        for c in range(self.batch_clips):
                            futures.append(
                                pool.submit(
                                    load_clip,
                                    self.epoch,
                                    b * self.batch_clips + c,
                                )
                            )
                    for b in range(n_batches):
                        if abandoned.is_set():
                            for f in futures:
                                f.cancel()
                            return
                        items = [
                            futures[b * self.batch_clips + c].result()
                            for c in range(self.batch_clips)
                        ]
                        if not _put(self.pack(items)):
                            for f in futures:
                                f.cancel()
                            return
            except Exception as e:  # surface worker errors to the consumer
                _put(e)
            finally:
                _put(sentinel)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_q.get()
                if item is sentinel:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
            thread.join()
        finally:
            # consumer stopped early (break / next(iter(...)) / error):
            # release the producer and its decode workers instead of
            # leaking them until process exit
            abandoned.set()
        self.epoch += 1


def prefetch_to_device(iterator, sharding, depth: int = 2):
    """Double-buffered host->device staging.

    Pulls host batches from `iterator` in a background thread and stages
    them onto `sharding` ahead of consumption, so the transfer of batch
    k+1 overlaps the device execution of step k. On a tunneled
    accelerator the put latency otherwise serializes with every dispatch
    (the round-1 e2e gap: ~70 ms/step of relay latency on top of a ~21 ms
    step). depth bounds device-resident staged batches (memory).

    Multi-process: `jax.device_put` onto a cross-process sharding demands
    the SAME host value on every process, but each process's loader
    yields only its own shard — so global arrays are assembled with
    `jax.make_array_from_process_local_data` instead (the local batch is
    this process's addressable block of the global batch; caught by
    tests/test_multiprocess.py's real two-process CLI run).
    """
    import jax

    from faceoff_tpu.parallel.mesh import stage_global

    out_q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    sentinel = object()

    def producer():
        try:
            for batch in iterator:
                out_q.put(
                    jax.tree_util.tree_map(
                        lambda x: stage_global(x, sharding), batch
                    )
                )
        except Exception as e:
            out_q.put(e)
        finally:
            out_q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = out_q.get()
        if item is sentinel:
            break
        if isinstance(item, Exception):
            raise item
        yield item
    thread.join()
