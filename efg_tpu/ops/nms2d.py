"""2D axis-aligned IoU + batched (per-class) NMS, fixed shapes under jit.

Rebuild of the reference `generalized_batched_nms` path used by the 2D
detectors (`playground/detection.2d/.../fcos.py`, torchvision `batched_nms`
semantics): class-offset trick so boxes of different classes never
suppress each other.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from efg_tpu.ops.nms import NEG_INF, _greedy_from_matrix


def iou_xyxy(a: jax.Array, b: jax.Array, eps: float = 1e-7) -> jax.Array:
    """[N, 4] × [M, 4] (x0, y0, x1, y1) → [N, M] IoU."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0, None) * jnp.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0, None) * jnp.clip(b[:, 3] - b[:, 1], 0, None)
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, eps)


@functools.partial(jax.jit, static_argnames=("pre_max", "post_max"))
def batched_nms(
    boxes: jax.Array,
    scores: jax.Array,
    labels: jax.Array,
    *,
    iou_threshold: float,
    pre_max: int = 1000,
    post_max: int = 100,
) -> Tuple[jax.Array, jax.Array]:
    """Class-aware greedy NMS. boxes [N, 4] xyxy, scores [N] (NEG_INF =
    invalid), labels [N]. Returns (indices [post_max], valid [post_max])."""
    n = boxes.shape[0]
    k = min(pre_max, n)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    tb = boxes[top_idx]
    tl = labels[top_idx]
    valid = top_scores > NEG_INF / 2

    # offset boxes per class so different classes never overlap
    span = jnp.maximum(tb.max() - tb.min(), 1.0)
    off = (tl.astype(tb.dtype) * (span + 1.0))[:, None]
    mat = iou_xyxy(tb + off, tb + off)
    keep = _greedy_from_matrix(mat > iou_threshold, valid)

    keep_scores = jnp.where(keep, top_scores, NEG_INF)
    sel_scores, sel = jax.lax.top_k(keep_scores, min(post_max, k))
    out_idx = top_idx[sel]
    out_valid = sel_scores > NEG_INF / 2
    if post_max > k:
        pad = post_max - k
        out_idx = jnp.concatenate([out_idx, jnp.zeros(pad, out_idx.dtype)])
        out_valid = jnp.concatenate([out_valid, jnp.zeros(pad, bool)])
    return out_idx, out_valid
