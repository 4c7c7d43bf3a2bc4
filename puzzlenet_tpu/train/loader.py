"""Host-side batched loader with thread prefetch.

Replaces the reference's 64-process torch DataLoader (train.py:100-109) with
a thread-pool collator + bounded prefetch queue: item generation is numpy /
native-C++ (GIL-releasing), so threads suffice and share memory with the
device-put path.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class Loader:
    def __init__(self, dataset, batch_size, shuffle=False, drop_last=True,
                 num_workers=8, seed=0, prefetch=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.prefetch = prefetch
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

    def __iter__(self):
        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for idx_batch in self._index_batches():
                    items = list(pool.map(self.dataset.__getitem__,
                                          idx_batch.tolist()))
                    q.put(self._collate(items))
            q.put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
