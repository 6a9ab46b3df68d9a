"""Keypoints container (reference `efg/data/structures/keypoints.py`, 207 LoC)."""

from __future__ import annotations

from typing import Tuple

import numpy as np


class Keypoints:
    """[N, K, 3] (x, y, visibility)."""

    def __init__(self, keypoints: np.ndarray):
        self.tensor = np.asarray(keypoints, np.float32)
        assert self.tensor.ndim == 3 and self.tensor.shape[2] == 3

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __getitem__(self, item) -> "Keypoints":
        return Keypoints(self.tensor[item].reshape(-1, *self.tensor.shape[1:]))

    def to_heatmap(self, boxes: np.ndarray, heatmap_size: int) -> Tuple[np.ndarray, np.ndarray]:
        """Per-instance integer heatmap targets within each box ROI
        (detectron2 `keypoints_to_heatmap` semantics). Returns
        (targets [N, K] flat indices, valid [N, K])."""
        n, k, _ = self.tensor.shape
        x, y, vis = self.tensor[..., 0], self.tensor[..., 1], self.tensor[..., 2]
        x0 = boxes[:, 0:1]
        y0 = boxes[:, 1:2]
        sx = heatmap_size / np.maximum(boxes[:, 2:3] - boxes[:, 0:1], 1e-6)
        sy = heatmap_size / np.maximum(boxes[:, 3:4] - boxes[:, 1:2], 1e-6)
        hx = np.floor((x - x0) * sx).astype(np.int64)
        hy = np.floor((y - y0) * sy).astype(np.int64)
        inside = (hx >= 0) & (hx < heatmap_size) & (hy >= 0) & (hy < heatmap_size)
        valid = inside & (vis > 0)
        return np.clip(hy, 0, heatmap_size - 1) * heatmap_size + np.clip(
            hx, 0, heatmap_size - 1
        ), valid

    @staticmethod
    def cat(kpts_list) -> "Keypoints":
        return Keypoints(np.concatenate([kp.tensor for kp in kpts_list], axis=0))
