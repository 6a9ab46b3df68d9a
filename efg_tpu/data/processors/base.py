"""Processor (augmentation) base machinery.

Mirrors the reference's `(points, info) → (points, info)` composable
processor contract (`efg/data/augmentations/basic.py:19-70`,
`efg/data/base_dataset.py:60-63`). All host-side numpy, stateful RNG via
`np.random` (seeded per worker by the builder).
"""

from __future__ import annotations

import numpy as np

from efg_tpu.data.registry import PROCESSORS


class AugmentationBase:
    def _init(self, params: dict) -> None:
        for k, v in params.items():
            if k != "self" and not k.startswith("_"):
                setattr(self, k, v)

    def _rand_range(self, low=1.0, high=None, size=None):
        if high is None:
            low, high = 0, low
        if size is None:
            size = []
        return np.random.uniform(low, high, size)

    def __repr__(self) -> str:
        return self.__class__.__name__

    def __call__(self, points, info):
        raise NotImplementedError


@PROCESSORS.register()
class NoOpAugmentation(AugmentationBase):
    def __call__(self, points, info):
        return points, info


def compose_processors(processors):
    def apply(points, info):
        for p in processors:
            points, info = p(points, info)
        return points, info

    return apply
