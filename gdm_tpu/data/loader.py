"""Prefetching batch loader (host side).

Replaces torch.utils.data.DataLoader + DistributedSampler
(train_lm.py:399-408): a thread pool decodes/crops samples concurrently
while the accelerator runs the previous step, with a bounded prefetch
queue.  Threads (not processes) suffice because the per-sample work is
dominated by PIL/cv2/scipy calls that release the GIL; the optional C++
decode path (gdm_tpu.native) drops the GIL entirely.

Sharding: `shard(rank, world)` gives each data-parallel host an
interleaved slice of the epoch permutation — the jax-native replacement
for DistributedSampler (SURVEY.md section 2d).
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np

# process-worker plumbing: the dataset is shipped once per worker via the
# initializer (not per task), and each worker re-seeds its augmentation
# rng so forked copies don't produce identical random streams
_worker_dataset = None


def _init_worker(dataset, seed):
    global _worker_dataset
    _worker_dataset = dataset
    rng = getattr(dataset, "rng", None)
    if rng is not None:
        dataset.rng = np.random.RandomState(
            (seed + os.getpid()) % (2 ** 31))


def _worker_get(i):
    return _worker_dataset[i]


def collate(samples: list[dict]) -> tuple[dict, list[dict]]:
    """Stack numeric fields; collect non-array fields into a meta list."""
    batch, meta = {}, [{} for _ in samples]
    for k, v in samples[0].items():
        if isinstance(v, (np.ndarray, np.integer, np.floating, int,
                          float, bool)):
            batch[k] = np.stack([np.asarray(s[k]) for s in samples])
        else:
            for i, s in enumerate(samples):
                meta[i][k] = s[k]
    return batch, meta


_DONE = object()


class DevicePrefetcher:
    """Run a staging function one batch ahead of the consumer in a
    background thread (bounded queue).

    MEASURED NOT-A-WIN for its original purpose (overlapping H2D +
    preprocessing dispatch with the train step, VERDICT r3 item 1):
    jax dispatch — including ``device_put`` — is ASYNC, so the direct
    main-thread staging in `cli train` already overlaps transfers with
    the device's previous step; adding this thread on the 1-core
    tunnel host only contended for the core and the tunnel client
    (e2e train A/B 2026-08-20: 18.8-37.5 sps threaded vs 47.4 direct —
    the actual e2e win was cutting uploaded bytes, see
    cli._device_batch).  Kept as a utility for genuinely SYNCHRONOUS
    stage functions (host-side transforms, blocking IO) and for A/B
    runs (bench.measure_train_e2e(prefetch=True)).

    jax dispatch is thread-safe; staged ops enter the device queue
    ahead of the step that consumes them, which is dependency-correct.
    Do NOT pass a stage_fn whose jits donate their inputs.

    Exceptions from the source iterator or stage_fn re-raise in the
    consumer; abandoning iteration (break / error) unblocks and ends
    the staging thread like DataLoader's stop-aware put.
    """

    def __init__(self, source, stage_fn, depth: int = 2):
        self.source = source
        self.stage_fn = stage_fn
        self.depth = max(1, depth)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for item in self.source:
                    if stop.is_set():
                        return
                    if not put(self.stage_fn(item)):
                        return
                put(_DONE)
            except Exception as e:          # surface in consumer
                put(e)
            except BaseException:           # KeyboardInterrupt/SystemExit
                # delivered to this thread: unblock the consumer before
                # dying, else it waits on q.get() forever (ADVICE r4)
                put(_DONE)
                raise

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _DONE:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


class DataLoader:
    """Iterate a dataset in shuffled, sharded, prefetched batches.

    Args:
      dataset: indexable with __len__/__getitem__ returning dicts.
      batch_size: global per-host batch size.
      shuffle: reshuffle each epoch (seeded; call set_epoch like the
        reference's DistributedSampler, train_lm.py:259).
      drop_last: drop the trailing partial batch.
      num_workers: decode workers.
      workers: 'thread' (default; PIL/cv2/scipy release the GIL on big
        crops) or 'process' (sidesteps the GIL entirely — wins when
        per-sample python overhead dominates, e.g. small crops).
      prefetch: max batches resident in the queue.
      rank/world: this host's shard of the sample stream.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 8,
                 prefetch: int = 4, seed: int = 0, rank: int = 0,
                 world: int = 1, workers: str = "thread"):
        assert workers in ("thread", "process"), workers
        self.workers = workers
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.rank, self.world = rank, world
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            # per-sample rng derivation mixes the epoch in (PoseDataset);
            # process pools ship the dataset at __iter__ time, so the
            # epoch set here reaches the workers
            self.dataset.set_epoch(epoch)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        return order[self.rank::self.world]

    def __len__(self):
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else -(
            -n // self.batch_size)

    def __iter__(self):
        idxs = self._epoch_indices()
        n_batches = len(self)
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        if self.workers == "process":
            def make_pool():
                return ProcessPoolExecutor(
                    self.num_workers, initializer=_init_worker,
                    initargs=(self.dataset, self.seed))
            get_fn = _worker_get
        else:
            def make_pool():
                return ThreadPoolExecutor(self.num_workers)
            get_fn = self.dataset.__getitem__

        def put(item) -> bool:
            """stop-aware put: a consumer that abandons iteration (error
            or early break) sets `stop` with the queue full — a plain
            blocking put would park this thread forever and leak the
            worker pool (OS processes in 'process' mode)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            with make_pool() as pool:
                for b in range(n_batches):
                    if stop.is_set():
                        return
                    chunk = idxs[b * self.batch_size:
                                 (b + 1) * self.batch_size]
                    try:
                        samples = list(pool.map(get_fn, chunk))
                        if not put(collate(samples)):
                            return
                    except Exception as e:          # surface in consumer
                        put(e)
                        return
            put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
