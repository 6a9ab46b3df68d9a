"""Device prefetcher: overlap host batch prep + transfer with compute.

Rebuild of `efg/data/utils/prefetcher.py:4-35` (CUDA-stream prefetch): in
JAX, `jax.device_put` is asynchronous, so prefetching = keeping `depth`
batches in flight ahead of consumption.
"""

from __future__ import annotations

import collections
from typing import Any, Dict, Iterator, Optional

import numpy as np


class DevicePrefetcher:
    def __init__(self, iterator: Iterator[Dict[str, Any]], mesh=None, depth: int = 2):
        from efg_tpu.parallel.mesh import shard_batch

        self._it = iterator
        self._mesh = mesh
        self._depth = depth
        self._shard = shard_batch
        self._queue: collections.deque = collections.deque()

    def _put(self, batch):
        if self._mesh is not None:
            return self._shard(
                {k: v for k, v in batch.items() if isinstance(v, np.ndarray)},
                self._mesh,
            )
        import jax

        return {
            k: jax.device_put(v) if isinstance(v, np.ndarray) else v
            for k, v in batch.items()
        }

    def __iter__(self):
        return self

    def __next__(self):
        while len(self._queue) < self._depth:
            try:
                self._queue.append(self._put(next(self._it)))
            except StopIteration:
                break
        if not self._queue:
            raise StopIteration
        return self._queue.popleft()
