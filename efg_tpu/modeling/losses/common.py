"""Loss functions (jnp, elementwise unless stated).

Rebuild of `efg/modeling/losses/focal_loss.py`, `smooth_l1_loss.py`,
`iou2d_loss.py`, and the differentiable rotated-3D GIoU
(`iou3d_loss.py:591-695` — the reference implements polygon clipping in
pure torch; here it reuses the jnp clipping kernel, which is already
piecewise-differentiable).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Elementwise focal loss (reference `focal_loss.py:5`)."""
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss


def sigmoid_focal_loss_star(logits, targets, alpha: float = 0.25, gamma: float = 1.0):
    """Focal loss* (reference `focal_loss.py:51`)."""
    shifted = gamma * (logits * (2 * targets - 1))
    loss = -jax.nn.log_sigmoid(shifted) / gamma
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss


def smooth_l1_loss(pred, target, beta: float = 1.0):
    """Huber/smooth-L1 (reference `smooth_l1_loss.py:4`)."""
    d = jnp.abs(pred - target)
    if beta < 1e-5:
        return d
    return jnp.where(d < beta, 0.5 * d**2 / beta, d - 0.5 * beta)


def iou_loss_2d(pred_xyxy, tgt_xyxy, loss_type: str = "giou", eps: float = 1e-7):
    """Pairwise-aligned 2D IoU/GIoU loss (reference `iou2d_loss.py:7-48`)."""
    lt = jnp.maximum(pred_xyxy[..., :2], tgt_xyxy[..., :2])
    rb = jnp.minimum(pred_xyxy[..., 2:], tgt_xyxy[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_p = jnp.clip(pred_xyxy[..., 2] - pred_xyxy[..., 0], 0, None) * jnp.clip(
        pred_xyxy[..., 3] - pred_xyxy[..., 1], 0, None
    )
    area_t = (tgt_xyxy[..., 2] - tgt_xyxy[..., 0]) * (tgt_xyxy[..., 3] - tgt_xyxy[..., 1])
    union = area_p + area_t - inter
    iou = inter / jnp.maximum(union, eps)
    if loss_type == "iou":
        return -jnp.log(jnp.clip(iou, eps, 1.0))
    if loss_type == "linear_iou":
        return 1 - iou
    lt_h = jnp.minimum(pred_xyxy[..., :2], tgt_xyxy[..., :2])
    rb_h = jnp.maximum(pred_xyxy[..., 2:], tgt_xyxy[..., 2:])
    wh_h = jnp.clip(rb_h - lt_h, 0, None)
    hull = jnp.maximum(wh_h[..., 0] * wh_h[..., 1], eps)
    return 1 - (iou - (hull - union) / hull)


def giou_loss_2d(pred_xyxy, tgt_xyxy, eps: float = 1e-7):
    return iou_loss_2d(pred_xyxy, tgt_xyxy, "giou", eps)


def rotated_giou_3d_loss(pred_boxes7, tgt_boxes7, eps: float = 1e-7):
    """Differentiable rotated 3D GIoU loss, pairwise-aligned [N, 7] → [N].

    BEV intersection via the polygon-clipping kernel (differentiable a.e.)
    × z overlap; enclosing volume from the corner AABB (the reference's
    pure-torch `iou3d_loss.py` construction)."""
    from efg_tpu.geometry.box_ops_jnp import boxes_to_corners_3d
    from efg_tpu.ops.iou_rotated import _ensure_ccw, _quad_intersection_area
    from efg_tpu.geometry.box_ops_jnp import boxes_to_corners_bev

    ca = _ensure_ccw(boxes_to_corners_bev(pred_boxes7))
    cb = _ensure_ccw(boxes_to_corners_bev(tgt_boxes7))
    inter_bev = jax.vmap(_quad_intersection_area)(ca, cb)
    za0 = pred_boxes7[:, 2] - pred_boxes7[:, 5] / 2
    za1 = pred_boxes7[:, 2] + pred_boxes7[:, 5] / 2
    zb0 = tgt_boxes7[:, 2] - tgt_boxes7[:, 5] / 2
    zb1 = tgt_boxes7[:, 2] + tgt_boxes7[:, 5] / 2
    zi = jnp.clip(jnp.minimum(za1, zb1) - jnp.maximum(za0, zb0), 0, None)
    vol_i = inter_bev * zi
    vol_p = pred_boxes7[:, 3] * pred_boxes7[:, 4] * pred_boxes7[:, 5]
    vol_t = tgt_boxes7[:, 3] * tgt_boxes7[:, 4] * tgt_boxes7[:, 5]
    union = vol_p + vol_t - vol_i
    iou = vol_i / jnp.maximum(union, eps)

    # enclosing box measured in the TARGET box frame (so giou(x, x) == 1
    # exactly for rotated boxes; the reference computes the true convex
    # hull via its polygon machinery — this frame-aligned hull is the
    # fixed-shape equivalent and coincides with it when yaws agree)
    cp = boxes_to_corners_3d(pred_boxes7)
    ct = boxes_to_corners_3d(tgt_boxes7)
    yaw = tgt_boxes7[:, 6]
    c, s = jnp.cos(-yaw), jnp.sin(-yaw)

    def rot(corners):
        x = corners[..., 0] * c[:, None] - corners[..., 1] * s[:, None]
        y = corners[..., 0] * s[:, None] + corners[..., 1] * c[:, None]
        return jnp.stack([x, y, corners[..., 2]], axis=-1)

    cp_r, ct_r = rot(cp), rot(ct)
    lo = jnp.minimum(cp_r.min(axis=-2), ct_r.min(axis=-2))
    hi = jnp.maximum(cp_r.max(axis=-2), ct_r.max(axis=-2))
    hull = jnp.clip(hi - lo, eps, None).prod(axis=-1)
    giou = iou - (hull - union) / jnp.maximum(hull, eps)
    return 1 - giou
