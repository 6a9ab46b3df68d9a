"""Mask containers: bitmasks and polygon masks (reference
`efg/data/structures/masks.py`, 436 LoC). Rasterization uses cv2 on host."""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def polygons_to_bitmask(polygons: List[np.ndarray], height: int, width: int) -> np.ndarray:
    """COCO polygon list → bool bitmask (pycocotools-free, cv2.fillPoly)."""
    mask = np.zeros((height, width), np.uint8)
    pts = [np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32) for p in polygons]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask.astype(bool)


class BitMasks:
    """[N, H, W] bool masks."""

    def __init__(self, tensor: np.ndarray):
        self.tensor = np.asarray(tensor, bool)
        assert self.tensor.ndim == 3

    def __len__(self):
        return self.tensor.shape[0]

    def __getitem__(self, item) -> "BitMasks":
        t = self.tensor[item]
        return BitMasks(t.reshape(-1, *self.tensor.shape[1:]))

    def nonempty(self) -> np.ndarray:
        return self.tensor.reshape(len(self), -1).any(axis=1)

    def get_bounding_boxes(self):
        from efg_tpu.data.structures.boxes import Boxes

        boxes = np.zeros((len(self), 4), np.float32)
        for i, m in enumerate(self.tensor):
            ys, xs = np.nonzero(m)
            if len(xs):
                boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
        return Boxes(boxes)

    def crop_and_resize(self, boxes: np.ndarray, mask_size: int) -> np.ndarray:
        """Per-box cropped masks [N, S, S] (RoIAlign-style, nearest)."""
        out = np.zeros((len(self), mask_size, mask_size), bool)
        for i, (m, b) in enumerate(zip(self.tensor, boxes)):
            x0, y0, x1, y1 = [int(round(v)) for v in b]
            x0, y0 = max(x0, 0), max(y0, 0)
            x1 = min(max(x1, x0 + 1), m.shape[1])
            y1 = min(max(y1, y0 + 1), m.shape[0])
            crop = m[y0:y1, x0:x1].astype(np.uint8)
            out[i] = cv2.resize(crop, (mask_size, mask_size), interpolation=cv2.INTER_NEAREST) > 0
        return out

    @staticmethod
    def cat(masks_list) -> "BitMasks":
        return BitMasks(np.concatenate([m.tensor for m in masks_list], axis=0))


class PolygonMasks:
    """List (per instance) of polygon lists (reference `PolygonMasks`)."""

    def __init__(self, polygons: List[List[np.ndarray]]):
        self.polygons = [
            [np.asarray(p, np.float64).reshape(-1) for p in inst] for inst in polygons
        ]

    def __len__(self):
        return len(self.polygons)

    def __getitem__(self, item):
        if isinstance(item, (int, np.integer)):
            return PolygonMasks([self.polygons[int(item)]])
        if isinstance(item, slice):
            return PolygonMasks(self.polygons[item])
        if isinstance(item, np.ndarray) and item.dtype == bool:
            return PolygonMasks([p for p, k in zip(self.polygons, item) if k])
        return PolygonMasks([self.polygons[int(i)] for i in item])

    def to_bitmasks(self, height: int, width: int) -> BitMasks:
        return BitMasks(
            np.stack(
                [polygons_to_bitmask(inst, height, width) for inst in self.polygons]
            )
            if self.polygons
            else np.zeros((0, height, width), bool)
        )

    def nonempty(self) -> np.ndarray:
        return np.asarray([len(inst) > 0 for inst in self.polygons], bool)

    def area(self) -> np.ndarray:
        """Shoelace area summed over an instance's polygons."""
        out = []
        for inst in self.polygons:
            a = 0.0
            for p in inst:
                xy = p.reshape(-1, 2)
                x, y = xy[:, 0], xy[:, 1]
                a += 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))
            out.append(a)
        return np.asarray(out)

    @staticmethod
    def cat(masks_list) -> "PolygonMasks":
        return PolygonMasks(sum((m.polygons for m in masks_list), []))
