"""Index samplers (reference `efg/data/samplers/dataset_sampler.py:13-106`).

`DistributedInfiniteSampler` shards the infinite permutation stream by
`jax.process_index()` (the reference sharded by torch.distributed rank);
`InferenceSampler` gives each host a contiguous shard.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from efg_tpu.data.registry import SAMPLERS


def _proc_info():
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:  # pragma: no cover
        return 0, 1


@SAMPLERS.register()
class InfiniteSampler:
    """Infinite shuffled index stream over [0, size)."""

    def __init__(self, size: int, shuffle: bool = True, seed: Optional[int] = None,
                 rank: int = 0, world_size: int = 1):
        assert size > 0
        self._size = size
        self._shuffle = shuffle
        self._seed = 2**31 - 1 if seed is None else int(seed)
        self._rank = rank
        self._world = world_size

    def __iter__(self) -> Iterator[int]:
        g = np.random.RandomState(self._seed)
        while True:
            order = g.permutation(self._size) if self._shuffle else np.arange(self._size)
            yield from order[self._rank :: self._world].tolist()


@SAMPLERS.register()
class DistributedInfiniteSampler(InfiniteSampler):
    def __init__(self, size: int, shuffle: bool = True, seed: Optional[int] = None):
        rank, world = _proc_info()
        super().__init__(size, shuffle=shuffle, seed=seed, rank=rank, world_size=world)


@SAMPLERS.register()
class InferenceSampler:
    """One pass, contiguous per-host shards (reference `:78-106`)."""

    def __init__(self, size: int):
        rank, world = _proc_info()
        shard = size // world
        left = size % world
        begin = shard * rank + min(rank, left)
        end = begin + shard + (1 if rank < left else 0)
        self._local = list(range(begin, end))

    def __len__(self) -> int:
        return len(self._local)

    def __iter__(self) -> Iterator[int]:
        return iter(self._local)
