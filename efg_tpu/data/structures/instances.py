"""`Instances`: per-image field container (reference
`efg/data/structures/instances.py`, 193 LoC)."""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


class Instances:
    def __init__(self, image_size: Tuple[int, int], **kwargs: Any):
        self._image_size = image_size
        self._fields: Dict[str, Any] = {}
        for k, v in kwargs.items():
            self.set(k, v)

    @property
    def image_size(self) -> Tuple[int, int]:
        return self._image_size

    def set(self, name: str, value: Any) -> None:
        data_len = len(value)
        if self._fields:
            assert len(self) == data_len, (
                f"Adding field '{name}' of length {data_len} to Instances of length {len(self)}"
            )
        self._fields[name] = value

    def get(self, name: str) -> Any:
        return self._fields[name]

    def has(self, name: str) -> bool:
        return name in self._fields

    def remove(self, name: str) -> None:
        del self._fields[name]

    def get_fields(self) -> Dict[str, Any]:
        return self._fields

    def __setattr__(self, name: str, val: Any) -> None:
        if name.startswith("_"):
            super().__setattr__(name, val)
        else:
            self.set(name, val)

    def __getattr__(self, name: str) -> Any:
        if name.startswith("_") or name not in self._fields:
            raise AttributeError(f"Instances has no field '{name}'")
        return self._fields[name]

    def __getitem__(self, item) -> "Instances":
        ret = Instances(self._image_size)
        for k, v in self._fields.items():
            ret.set(k, v[item])
        return ret

    def __len__(self) -> int:
        for v in self._fields.values():
            return len(v)
        return 0

    @staticmethod
    def cat(instance_lists) -> "Instances":
        assert len(instance_lists) > 0
        image_size = instance_lists[0].image_size
        ret = Instances(image_size)
        for k in instance_lists[0]._fields.keys():
            values = [i.get(k) for i in instance_lists]
            v0 = values[0]
            if isinstance(v0, np.ndarray):
                ret.set(k, np.concatenate(values, axis=0))
            elif hasattr(type(v0), "cat"):
                ret.set(k, type(v0).cat(values))
            else:
                ret.set(k, sum((list(v) for v in values), []))
        return ret

    def __repr__(self) -> str:
        return (
            f"Instances(num={len(self)}, image_size={self._image_size}, "
            f"fields={list(self._fields)})"
        )
