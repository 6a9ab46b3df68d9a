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
class SeqInferenceSampler:
    """Sequence-contiguous shards: each host gets whole sequences so a
    tracker sees frames in order (reference `playground/tracking.3d/.../
    sample.py:7-55`). The dataset must expose `sequence_of(idx)`."""

    def __init__(self, size: int, sequence_ids=None):
        rank, world = _proc_info()
        if sequence_ids is None:
            sequence_ids = [0] * size
        seqs = {}
        for i, s in enumerate(sequence_ids):
            seqs.setdefault(s, []).append(i)
        ordered = [idx for s in sorted(seqs) for idx in seqs[s]]
        seq_keys = sorted(seqs)
        my_seqs = set(seq_keys[rank::world])
        self._local = [i for s in sorted(my_seqs) for i in seqs[s]]
        del ordered

    def __len__(self):
        return len(self._local)

    def __iter__(self):
        return iter(self._local)


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


@SAMPLERS.register()
class DistributedGroupSampler:
    """Infinite aspect-ratio-grouped sampler: every emitted run of
    `samples_per_batch` indices shares one aspect-ratio group (landscape vs
    portrait), so a fixed canvas per batch wastes far less padding.

    Rebuild of the reference `DistributedGroupSampler`
    (`efg/data/samplers/dataset_sampler.py:109-192`), recast as an infinite
    stream like the other train samplers: per epoch, each group's indices
    are shuffled, padded to a multiple of samples_per_batch·world, chunked
    into whole batches, and the batch order is shuffled across groups; this
    process's share is every `world`-th batch.

    `aspect_ratios` come from the dataset attribute of the same name
    (group id per item, e.g. (h > w) as 0/1)."""

    def __init__(self, size: int, aspect_ratios=None, samples_per_batch: int = 1,
                 shuffle: bool = True, seed: Optional[int] = None):
        assert size > 0
        rank, world = _proc_info()
        self._size = size
        self._ar = (
            np.zeros(size, np.int64)
            if aspect_ratios is None
            else np.asarray(aspect_ratios, np.int64)
        )
        assert len(self._ar) == size
        self._spb = max(int(samples_per_batch), 1)
        self._shuffle = shuffle
        self._seed = 2**31 - 1 if seed is None else int(seed)
        self._rank = rank
        self._world = world

    def __iter__(self) -> Iterator[int]:
        g = np.random.RandomState(self._seed)
        epoch = 0
        while True:
            batches = []
            for grp in np.unique(self._ar):
                idx = np.nonzero(self._ar == grp)[0]
                if self._shuffle:
                    idx = idx[g.permutation(len(idx))]
                quantum = self._spb * self._world
                pad = (-len(idx)) % quantum
                if pad:
                    idx = np.concatenate([idx, idx[: pad % len(idx)] if pad <= len(idx) else np.resize(idx, pad)])
                batches.extend(idx.reshape(-1, self._spb))
            order = g.permutation(len(batches)) if self._shuffle else np.arange(len(batches))
            for bi in order[self._rank :: self._world]:
                yield from batches[bi].tolist()
            epoch += 1
