"""Rotated (BEV) box IoU as vectorized convex polygon clipping.

TPU-native replacement for the reference CUDA kernels
`efg/operators/src/iou3d_nms/iou3d_nms_kernel.cu` and
`src/box_iou_rotated/*` (`boxes_iou_bev`, `pairwise_iou_rotated`):
Sutherland–Hodgman clipping of one quad against the other with fixed
8-vertex capacity (convex ∩ convex of two quads has ≤ 8 vertices), shoelace
area, everything batched/vmapped — no data-dependent shapes, fully
differentiable (piecewise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from efg_tpu.geometry.box_ops_jnp import boxes_to_corners_bev

_CAP = 8


def _clip_poly_by_edge(verts, count, p1, p2):
    """Clip polygon (verts [CAP, 2], count) by half-plane left of p1→p2.

    Returns new (verts, count). Emits, per input vertex i < count, the vertex
    itself when inside, and the edge intersection when the edge crosses the
    clip line — compacted via interleaved cumsum positions.
    """
    idx = jnp.arange(_CAP)
    active = idx < count
    cur = verts
    nxt = verts[(idx + 1) % jnp.maximum(count, 1)]

    e = p2 - p1
    d_cur = e[0] * (cur[:, 1] - p1[1]) - e[1] * (cur[:, 0] - p1[0])
    d_nxt = e[0] * (nxt[:, 1] - p1[1]) - e[1] * (nxt[:, 0] - p1[0])
    in_cur = d_cur >= 0
    in_nxt = d_nxt >= 0

    # intersection of segment cur→nxt with the clip line
    denom = d_cur - d_nxt
    t = d_cur / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter = cur + t[:, None] * (nxt - cur)

    emit_cur = in_cur & active
    emit_int = (in_cur ^ in_nxt) & active

    # interleave: [cur_0, int_0, cur_1, int_1, ...]
    flags = jnp.stack([emit_cur, emit_int], axis=1).reshape(-1)  # [2*CAP]
    pts = jnp.stack([cur, inter], axis=1).reshape(-1, 2)  # [2*CAP, 2]
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    out_count = jnp.where(flags.any(), pos[-1] + 1, 0)
    write = jnp.where(flags & (pos < _CAP), pos, _CAP)
    out = jnp.zeros((_CAP + 1, 2), dtype=verts.dtype).at[write].set(pts)[:_CAP]
    return out, jnp.minimum(out_count, _CAP)


def _poly_area(verts, count):
    idx = jnp.arange(_CAP)
    active = (idx < count).astype(verts.dtype)
    nxt = verts[(idx + 1) % jnp.maximum(count, 1)]
    cross = verts[:, 0] * nxt[:, 1] - nxt[:, 0] * verts[:, 1]
    return 0.5 * jnp.abs(jnp.sum(cross * active))


def _quad_intersection_area(qa, qb):
    """Intersection area of two CCW quads qa, qb [4, 2]."""
    verts = jnp.zeros((_CAP, 2), dtype=qa.dtype).at[:4].set(qa)
    count = jnp.asarray(4, dtype=jnp.int32)

    def clip(i, state):
        v, c = state
        p1 = qb[i]
        p2 = qb[(i + 1) % 4]
        return _clip_poly_by_edge(v, c, p1, p2)

    for i in range(4):
        verts, count = clip(i, (verts, count))
    return _poly_area(verts, count)


def _ensure_ccw(corners):
    """Make quad winding CCW (shoelace sign) — clipping assumes it."""
    nxt = jnp.roll(corners, -1, axis=-2)
    area2 = jnp.sum(
        corners[..., 0] * nxt[..., 1] - nxt[..., 0] * corners[..., 1], axis=-1
    )
    return jnp.where(area2[..., None, None] >= 0, corners, corners[..., ::-1, :])


def intersection_area_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Pairwise BEV intersection areas [N, M] for 7+-dim center boxes."""
    ca = _ensure_ccw(boxes_to_corners_bev(boxes_a))
    cb = _ensure_ccw(boxes_to_corners_bev(boxes_b))
    fn = jax.vmap(jax.vmap(_quad_intersection_area, in_axes=(None, 0)), in_axes=(0, None))
    return fn(ca, cb)


def iou_bev(boxes_a: jax.Array, boxes_b: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Pairwise rotated BEV IoU [N, M] (reference `boxes_iou_bev`)."""
    inter = intersection_area_bev(boxes_a, boxes_b)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, eps)


def iou_3d(boxes_a: jax.Array, boxes_b: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Pairwise rotated 3D IoU [N, M]: BEV polygon ∩ × z-overlap
    (reference `boxes_iou3d_gpu`, `iou3d_nms.cpp`)."""
    inter_bev = intersection_area_bev(boxes_a, boxes_b)
    za0 = boxes_a[:, 2] - boxes_a[:, 5] / 2
    za1 = boxes_a[:, 2] + boxes_a[:, 5] / 2
    zb0 = boxes_b[:, 2] - boxes_b[:, 5] / 2
    zb1 = boxes_b[:, 2] + boxes_b[:, 5] / 2
    zi = jnp.clip(
        jnp.minimum(za1[:, None], zb1[None, :]) - jnp.maximum(za0[:, None], zb0[None, :]),
        0,
        None,
    )
    vol_i = inter_bev * zi
    vol_a = boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5]
    vol_b = boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5]
    return vol_i / jnp.maximum(vol_a[:, None] + vol_b[None, :] - vol_i, eps)
