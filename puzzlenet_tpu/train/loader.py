"""Host-side batched loader with thread or process prefetch.

Replaces the reference's 64-process torch DataLoader (train.py:100-109).
Two worker modes:

* threads (default): zero-copy with the device-put path; fine when item
  generation is native-C++/large-numpy (GIL-releasing), but slicing-heavy
  datasets are partially GIL-bound (~135 ms/item serial).
* processes (``use_processes=True``): true parallelism — the analogue of
  the reference's num_workers=64. Workers are SPAWNED, not forked: the
  parent runs a multithreaded JAX runtime, and forking a multithreaded
  process can deadlock in the child (the reference dodges this by forking
  before CUDA init; spawn is the portable fix). The dataset ships to each
  worker once as a pickle and is unpickled inside the worker initializer
  (after pinning the worker's JAX platform to CPU, so a worker can never
  touch the accelerator). The pool is created once per Loader and reused
  across epochs to amortize interpreter startup.

Note: the fully on-device pipeline (data/device_pipeline.py) sidesteps the
host entirely and is the fast path for training.
"""

import multiprocessing
import os
import pickle
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np

_WORKER_DATASET = None


def _init_spawn_worker(dataset_bytes):
    # keep any jax import inside the worker off the accelerator BEFORE the
    # dataset unpickle can trigger one (boundary/ops modules import jax)
    os.environ["JAX_PLATFORMS"] = "cpu"
    global _WORKER_DATASET
    _WORKER_DATASET = pickle.loads(dataset_bytes)


def _worker_getitem(task):
    """(epoch, index) -> item. The epoch rides with every task because a
    pool broadcast cannot guarantee delivery to each worker."""
    epoch, index = task
    ds = _WORKER_DATASET
    if hasattr(ds, "set_epoch") and getattr(ds, "epoch", None) != epoch:
        ds.set_epoch(epoch)
    return ds[index]


class Loader:
    def __init__(self, dataset, batch_size, shuffle=False, drop_last=True,
                 num_workers=8, seed=0, prefetch=2, use_processes=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.prefetch = prefetch
        self.use_processes = use_processes
        self.epoch = 0
        self._pool = None

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    @staticmethod
    def _collate(items):
        return tuple(np.stack([np.asarray(it[j]) for it in items])
                     for j in range(len(items[0])))

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last \
            else n
        for i in range(0, stop, self.batch_size):
            yield order[i:i + self.batch_size]

    def _get_pool(self):
        if self._pool is None:
            if self.use_processes:
                ctx = multiprocessing.get_context("spawn")
                self._pool = ProcessPoolExecutor(
                    self.num_workers, mp_context=ctx,
                    initializer=_init_spawn_worker,
                    initargs=(pickle.dumps(self.dataset),))
            else:
                self._pool = ThreadPoolExecutor(self.num_workers)
        return self._pool

    def close(self):
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __iter__(self):
        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        pool = self._get_pool()
        epoch = self.epoch

        def produce():
            try:
                for idx_batch in self._index_batches():
                    if self.use_processes:
                        tasks = [(epoch, i) for i in idx_batch.tolist()]
                        items = list(pool.map(_worker_getitem, tasks,
                                              chunksize=4))
                    else:
                        items = list(pool.map(self.dataset.__getitem__,
                                              idx_batch.tolist()))
                    q.put(self._collate(items))
                q.put(sentinel)
            except BaseException as e:  # surface worker failures
                q.put(e)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
