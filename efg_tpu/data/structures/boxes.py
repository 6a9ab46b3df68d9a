"""2D box containers and mode conversions (numpy, host-side).

Rebuild of the detectron2-style structures (`efg/data/structures/boxes.py`,
474 LoC; `rotated_boxes.py`, 501 LoC): `BoxMode` conversions, `Boxes` with
clip/area/nonempty/inside checks and pairwise IoU, `RotatedBoxes` whose
pairwise IoU delegates to the device rotated-IoU kernel. Host containers
are numpy; device math stays in `efg_tpu.ops` / `efg_tpu.geometry`.
"""

from __future__ import annotations

from enum import IntEnum
from typing import Tuple

import numpy as np


class BoxMode(IntEnum):
    XYXY_ABS = 0
    XYWH_ABS = 1
    XYXY_REL = 2
    XYWH_REL = 3
    XYWHA_ABS = 4

    @staticmethod
    def convert(box: np.ndarray, from_mode: "BoxMode", to_mode: "BoxMode") -> np.ndarray:
        if from_mode == to_mode:
            return box
        box = np.asarray(box, np.float64).copy()
        if from_mode == BoxMode.XYWH_ABS and to_mode == BoxMode.XYXY_ABS:
            box[..., 2] += box[..., 0]
            box[..., 3] += box[..., 1]
            return box
        if from_mode == BoxMode.XYXY_ABS and to_mode == BoxMode.XYWH_ABS:
            box[..., 2] -= box[..., 0]
            box[..., 3] -= box[..., 1]
            return box
        if from_mode == BoxMode.XYWHA_ABS and to_mode == BoxMode.XYXY_ABS:
            # axis-aligned hull of the rotated box
            cx, cy, w, h, a = (box[..., i] for i in range(5))
            rad = np.deg2rad(-a)
            c, s = np.abs(np.cos(rad)), np.abs(np.sin(rad))
            nw = c * w + s * h
            nh = s * w + c * h
            return np.stack([cx - nw / 2, cy - nh / 2, cx + nw / 2, cy + nh / 2], axis=-1)
        raise NotImplementedError(f"BoxMode {from_mode}→{to_mode}")


class Boxes:
    """[N, 4] xyxy boxes."""

    def __init__(self, tensor: np.ndarray):
        self.tensor = np.asarray(tensor, np.float32).reshape(-1, 4)

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __getitem__(self, item) -> "Boxes":
        return Boxes(self.tensor[item].reshape(-1, 4))

    def clone(self) -> "Boxes":
        return Boxes(self.tensor.copy())

    def area(self) -> np.ndarray:
        t = self.tensor
        return np.clip(t[:, 2] - t[:, 0], 0, None) * np.clip(t[:, 3] - t[:, 1], 0, None)

    def clip(self, box_size: Tuple[int, int]) -> None:
        h, w = box_size
        self.tensor[:, 0::2] = np.clip(self.tensor[:, 0::2], 0, w)
        self.tensor[:, 1::2] = np.clip(self.tensor[:, 1::2], 0, h)

    def nonempty(self, threshold: float = 0.0) -> np.ndarray:
        t = self.tensor
        return ((t[:, 2] - t[:, 0]) > threshold) & ((t[:, 3] - t[:, 1]) > threshold)

    def get_centers(self) -> np.ndarray:
        return (self.tensor[:, :2] + self.tensor[:, 2:]) / 2

    def inside_box(self, box_size: Tuple[int, int], boundary_threshold: int = 0) -> np.ndarray:
        h, w = box_size
        t = self.tensor
        return (
            (t[:, 0] >= -boundary_threshold) & (t[:, 1] >= -boundary_threshold)
            & (t[:, 2] < w + boundary_threshold) & (t[:, 3] < h + boundary_threshold)
        )

    def scale(self, scale_x: float, scale_y: float) -> None:
        self.tensor[:, 0::2] *= scale_x
        self.tensor[:, 1::2] *= scale_y

    @staticmethod
    def cat(boxes_list) -> "Boxes":
        return Boxes(np.concatenate([b.tensor for b in boxes_list], axis=0))


def pairwise_iou(a: Boxes, b: Boxes) -> np.ndarray:
    from efg_tpu.evaluator.coco_eval_np import iou_xyxy_np

    return iou_xyxy_np(a.tensor, b.tensor)


class RotatedBoxes:
    """[N, 5] (cx, cy, w, h, angle°) rotated boxes (reference
    `rotated_boxes.py`)."""

    def __init__(self, tensor: np.ndarray):
        self.tensor = np.asarray(tensor, np.float32).reshape(-1, 5)

    def __len__(self):
        return self.tensor.shape[0]

    def __getitem__(self, item):
        return RotatedBoxes(self.tensor[item].reshape(-1, 5))

    def area(self) -> np.ndarray:
        return self.tensor[:, 2] * self.tensor[:, 3]

    def _as_boxes7(self) -> np.ndarray:
        t = self.tensor
        z = np.zeros_like(t[:, 0])
        return np.stack(
            [t[:, 0], t[:, 1], z, t[:, 2], t[:, 3], z + 1.0, np.deg2rad(t[:, 4])],
            axis=-1,
        )


def pairwise_iou_rotated(a: RotatedBoxes, b: RotatedBoxes) -> np.ndarray:
    """Rotated IoU via the device polygon-clipping kernel (reference
    `efg/operators/rotated_boxes.py:8-23`)."""
    import jax.numpy as jnp

    from efg_tpu.ops.iou_rotated import iou_bev

    return np.asarray(iou_bev(jnp.asarray(a._as_boxes7()), jnp.asarray(b._as_boxes7())))
