"""Device-side (jax.numpy, jit-able) box geometry — twins of `box_ops_np`.

Everything here is shape-static and differentiable where meaningful; used by
device ops (rotated IoU/NMS, DETR losses, heatmap decode). Same box
convention: ``[x, y, z, dx, dy, dz, (vx, vy,) yaw]``, yaw CCW about +z.
"""

from __future__ import annotations

import jax.numpy as jnp


def limit_period(val, offset: float = 0.5, period: float = jnp.pi):
    return val - jnp.floor(val / period + offset) * period


def rotate_points_along_z(points, angle):
    """points [..., P, 3+], angle [...] → rotated points (extra dims pass through)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = points[..., 0] * c[..., None] - points[..., 1] * s[..., None]
    y = points[..., 0] * s[..., None] + points[..., 1] * c[..., None]
    return jnp.concatenate(
        [x[..., None], y[..., None], points[..., 2:]], axis=-1
    )


def boxes_to_corners_bev(boxes):
    """[..., 7+] boxes → [..., 4, 2] BEV corners (CCW)."""
    template = jnp.array([[1, 1], [1, -1], [-1, -1], [-1, 1]], dtype=boxes.dtype) / 2.0
    local = boxes[..., None, 3:5] * template
    yaw = boxes[..., -1]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    x = local[..., 0] * c[..., None] - local[..., 1] * s[..., None]
    y = local[..., 0] * s[..., None] + local[..., 1] * c[..., None]
    return jnp.stack([x, y], axis=-1) + boxes[..., None, :2]


def boxes_to_corners_3d(boxes3d):
    """[..., 7+] → [..., 8, 3] corners, same corner order as numpy twin."""
    template = (
        jnp.array(
            [
                [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
                [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
            ],
            dtype=boxes3d.dtype,
        )
        / 2.0
    )
    corners = boxes3d[..., None, 3:6] * template
    corners = rotate_points_along_z(corners, boxes3d[..., -1])
    return corners + boxes3d[..., None, :3]


def points_in_rbbox(points, boxes, margin: float = 0.0):
    """[N, 3+] × [M, 7+] → [N, M] bool (inverse-transform formulation)."""
    pts = points[:, None, :3] - boxes[None, :, :3]
    yaw = boxes[:, -1]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    lx = pts[..., 0] * c[None] + pts[..., 1] * s[None]
    ly = -pts[..., 0] * s[None] + pts[..., 1] * c[None]
    lz = pts[..., 2]
    half = boxes[:, 3:6] / 2.0 + margin
    return (
        (jnp.abs(lx) <= half[None, :, 0])
        & (jnp.abs(ly) <= half[None, :, 1])
        & (jnp.abs(lz) <= half[None, :, 2])
    )


def aligned_iou_3d(boxes_a, boxes_b, eps: float = 1e-7):
    """Axis-aligned 3D IoU matrix [N, M] (ignores yaw) — the formulation the
    reference DETR losses actually use (`conquer/.../modules/utils.py:57`)."""
    min_a = boxes_a[:, None, :3] - boxes_a[:, None, 3:6] / 2
    max_a = boxes_a[:, None, :3] + boxes_a[:, None, 3:6] / 2
    min_b = boxes_b[None, :, :3] - boxes_b[None, :, 3:6] / 2
    max_b = boxes_b[None, :, :3] + boxes_b[None, :, 3:6] / 2
    inter = jnp.clip(jnp.minimum(max_a, max_b) - jnp.maximum(min_a, min_b), 0, None)
    vol_i = inter.prod(axis=-1)
    vol_a = boxes_a[:, 3:6].prod(axis=-1)
    vol_b = boxes_b[:, 3:6].prod(axis=-1)
    return vol_i / (vol_a[:, None] + vol_b[None, :] - vol_i + eps)


def aligned_giou_3d(boxes_a, boxes_b, eps: float = 1e-7):
    """Axis-aligned GIoU3D matrix [N, M] (differentiable)."""
    min_a = boxes_a[:, None, :3] - boxes_a[:, None, 3:6] / 2
    max_a = boxes_a[:, None, :3] + boxes_a[:, None, 3:6] / 2
    min_b = boxes_b[None, :, :3] - boxes_b[None, :, 3:6] / 2
    max_b = boxes_b[None, :, :3] + boxes_b[None, :, 3:6] / 2
    inter = jnp.clip(jnp.minimum(max_a, max_b) - jnp.maximum(min_a, min_b), 0, None)
    vol_i = inter.prod(axis=-1)
    vol_a = boxes_a[:, 3:6].prod(axis=-1)
    vol_b = boxes_b[:, 3:6].prod(axis=-1)
    union = vol_a[:, None] + vol_b[None, :] - vol_i
    hull = jnp.clip(jnp.maximum(max_a, max_b) - jnp.minimum(min_a, min_b), eps, None)
    vol_h = hull.prod(axis=-1)
    return vol_i / (union + eps) - (vol_h - union) / (vol_h + eps)
