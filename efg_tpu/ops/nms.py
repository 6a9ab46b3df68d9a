"""Fixed-shape NMS family (rotated BEV, circle) under jit.

TPU-native replacement for `efg/operators/iou3d_nms.py:19-123` (`nms_gpu`)
and the playground `circle_nms` numba kernel: candidates are reduced to a
static top-`pre_max` set, the pairwise suppression matrix is computed
vectorized, and greedy selection runs as a `fori_loop` with a fixed
iteration count — output is a static-size index/mask pair.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from efg_tpu.ops.iou_rotated import iou_bev

NEG_INF = -1e9


def _greedy_from_matrix(suppress: jax.Array, valid: jax.Array) -> jax.Array:
    """Exact greedy NMS given a boolean suppression matrix over
    score-descending candidates. suppress[i, j] == True means j (lower
    score) is suppressed by i. Returns keep mask [N]."""
    n = suppress.shape[0]
    tri = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1).T  # only i < j suppresses
    suppress = suppress & tri

    def body(i, keep):
        row = suppress[i] & keep[i]
        return keep & ~row

    keep = jax.lax.fori_loop(0, n, body, valid)
    return keep


@functools.partial(jax.jit, static_argnames=("pre_max", "post_max", "iou_fn"))
def rotated_nms(
    boxes: jax.Array,
    scores: jax.Array,
    *,
    iou_threshold: float,
    pre_max: int = 1024,
    post_max: int = 256,
    iou_fn=None,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy rotated-BEV NMS (reference `rotate_nms_pcdet`,
    `playground/.../box_torch_ops.py:237-257`).

    boxes [N, 7] (x, y, z, dx, dy, dz, yaw), scores [N] with NEG_INF/-inf
    for invalid rows. Returns (indices [post_max] into the input, valid
    mask [post_max]).
    """
    iou = iou_fn or iou_bev
    n = boxes.shape[0]
    k = min(pre_max, n)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[top_idx]
    valid = top_scores > NEG_INF / 2

    mat = iou(top_boxes, top_boxes)
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


@functools.partial(jax.jit, static_argnames=("pre_max", "post_max"))
def circle_nms(
    centers: jax.Array,
    scores: jax.Array,
    *,
    min_radius: float,
    pre_max: int = 1024,
    post_max: int = 83,
) -> Tuple[jax.Array, jax.Array]:
    """Center-distance NMS (reference `circle_nms_jit.py`): suppress j when
    a kept higher-score i lies within `min_radius` (squared L2 < r²)."""
    n = centers.shape[0]
    k = min(pre_max, n)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    c = centers[top_idx]
    valid = top_scores > NEG_INF / 2
    d2 = ((c[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    keep = _greedy_from_matrix(d2 < min_radius**2, valid)
    keep_scores = jnp.where(keep, top_scores, NEG_INF)
    sel_scores, sel = jax.lax.top_k(keep_scores, min(post_max, k))
    return top_idx[sel], sel_scores > NEG_INF / 2
