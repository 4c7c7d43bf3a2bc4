"""Host-side batched loader with thread or process prefetch.

Replaces the reference's 64-process torch DataLoader (train.py:100-109).
Two worker modes:

* threads (default): zero-copy with the device-put path; fine when item
  generation is native-C++/large-numpy (GIL-releasing), but slicing-heavy
  datasets are partially GIL-bound (~135 ms/item serial).
* processes (``use_processes=True``): fork-inherited dataset (copy-on-
  write, no pickling of the cloud arrays), true parallelism — the analogue
  of the reference's num_workers=64. Item results cross process boundaries
  (one pickle per item), so prefer this for generation-heavy datasets.

Note: the fully on-device pipeline (data/device_pipeline.py) sidesteps the
host entirely and is the fast path for training.
"""

import multiprocessing
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np

_FORK_DATASET = None


def _init_fork_worker(dataset):
    global _FORK_DATASET
    _FORK_DATASET = dataset


def _fork_getitem(index):
    return _FORK_DATASET[index]


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

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def set_epoch(self, epoch):
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng((self.seed, self.epoch)).shuffle(order)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last \
            else n
        for i in range(0, stop, self.batch_size):
            yield order[i:i + self.batch_size]

    @staticmethod
    def _collate(items):
        return tuple(np.stack([np.asarray(it[j]) for it in items])
                     for j in range(len(items[0])))

    def _make_pool(self):
        if self.use_processes:
            ctx = multiprocessing.get_context("fork")
            return ProcessPoolExecutor(
                self.num_workers, mp_context=ctx,
                initializer=_init_fork_worker, initargs=(self.dataset,))
        return ThreadPoolExecutor(self.num_workers)

    def __iter__(self):
        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        getitem = _fork_getitem if self.use_processes \
            else self.dataset.__getitem__

        def produce():
            with self._make_pool() as pool:
                for idx_batch in self._index_batches():
                    items = list(pool.map(getitem, idx_batch.tolist(),
                                          chunksize=4)
                                 if self.use_processes else
                                 pool.map(getitem, idx_batch.tolist()))
                    q.put(self._collate(items))
            q.put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
