"""Model-side metrics (reference `efg/modeling/metrics/accuracy.py`, `iou.py`)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def accuracy(logits, targets, topk: Sequence[int] = (1,), ignore_index: int = -1):
    """Top-k accuracy over [N, C] logits (reference `Accuracy`)."""
    valid = targets != ignore_index
    n = jnp.maximum(valid.sum(), 1)
    maxk = max(topk)
    order = jnp.argsort(-logits, axis=-1)[..., :maxk]
    correct = order == targets[..., None]
    return {
        f"top{k}": (correct[..., :k].any(-1) & valid).sum() / n for k in topk
    }


def mean_iou(pred_labels, gt_labels, num_classes: int, ignore_index: int = 255):
    """Segmentation mIoU (reference `iou.py`)."""
    valid = gt_labels != ignore_index
    ious = []
    for c in range(num_classes):
        p = (pred_labels == c) & valid
        g = (gt_labels == c) & valid
        inter = (p & g).sum()
        union = (p | g).sum()
        ious.append(jnp.where(union > 0, inter / jnp.maximum(union, 1), jnp.nan))
    ious = jnp.stack(ious)
    return {"mIoU": jnp.nanmean(ious), "per_class": ious}
