"""AutoAssign: fully differentiable label assignment for dense detection.

TPU rebuild of the reference experiment (`playground/detection.2d/coco/
auto_assign/auto_assign.res50.fpn.coco.800size.1x/auto_assign.py`): shares
the FCOS architecture (cls/box towers, objectness on the reg tower) and
replaces hand-crafted assignment with the positive/negative bag losses and
a learnable per-class center prior (μ, σ per class). Fully vectorized over
fixed-shape GT slots.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from efg_tpu.models import fcos as F
from efg_tpu.models.fcos import FCOS, level_shifts, _giou_ltrb


class AutoAssign(FCOS):
    """Same trunk/head as FCOS; adds the learnable center prior."""

    @nn.compact
    def __call__(self, images, train: bool) -> Dict[str, Any]:
        preds = FCOS.__call__(self, images, train)
        mu = self.param("mu", nn.initializers.zeros, (self.num_classes, 2))
        sigma = self.param("sigma", nn.initializers.constant(0.9), (self.num_classes, 2))
        preds["mu"] = mu
        preds["sigma"] = sigma
        return preds


def compute_loss(preds, batch, *, model_cfg):
    """Reference `AutoAssign.losses` (`auto_assign.py:72-95` bag losses)."""
    num_classes = model_cfg["num_classes"]
    strides_list = model_cfg["fpn_strides"]
    reg_weight = model_cfg.get("reg_weight", 5.0)
    alpha = model_cfg.get("focal_alpha", 0.25)
    gamma = model_cfg.get("focal_gamma", 2.0)

    shapes = preds["shapes"]
    shift_list = level_shifts(shapes, strides_list)
    shifts = jnp.concatenate(shift_list, axis=0)  # [R, 2]
    lvl = jnp.concatenate(
        [jnp.full((s.shape[0],), i, jnp.int32) for i, s in enumerate(shift_list)]
    )
    strides = jnp.asarray(strides_list, jnp.float32)[lvl]  # [R]

    cls_prob_all = jax.nn.sigmoid(preds["logits"])      # [B, R, C]
    obj_prob_all = jax.nn.sigmoid(preds["centerness"])  # [B, R, 1]
    deltas_all = preds["deltas"]                        # [B, R, 4]
    mu, sigma = preds["mu"], preds["sigma"]

    def per_image(cls_prob, obj_prob, deltas, gt_boxes, gt_classes, gt_mask):
        g = gt_boxes.shape[0]
        # ltrb of each location wrt each gt: [G, R, 4]
        l = shifts[None, :, 0] - gt_boxes[:, None, 0]
        t = shifts[None, :, 1] - gt_boxes[:, None, 1]
        r = gt_boxes[:, None, 2] - shifts[None, :, 0]
        b = gt_boxes[:, None, 3] - shifts[None, :, 1]
        tgt_deltas = jnp.stack([l, t, r, b], axis=-1)
        in_box = (tgt_deltas.min(-1) > 0) & gt_mask[:, None]

        # center prior (learnable gaussian per class)
        centers = (tgt_deltas[..., :2] - tgt_deltas[..., 2:]) / 2  # [G, R, 2]
        d = centers / strides[None, :, None]
        normal = jnp.exp(
            -((d - mu[gt_classes][:, None]) ** 2) / (2 * sigma[gt_classes][:, None] ** 2)
        ).prod(-1)  # [G, R]

        composed = cls_prob[:, gt_classes].T * obj_prob[:, 0][None, :]  # [G, R]

        giou = _giou_ltrb(deltas[None], tgt_deltas)  # [G, R]
        reg_prob = jnp.exp(-(1 - giou) * reg_weight)

        # positive bag loss per gt
        logits = composed * reg_prob  # [G, R]
        w = jnp.exp(3 * logits) * normal * in_box
        w = w / jnp.maximum(w.sum(-1, keepdims=True), 1e-12)
        bag = (w * logits).sum(-1)
        pos_loss = -jnp.log(jnp.clip(bag, 1e-12, 1.0)) * gt_mask

        # pred_box_probs (no grad): per-location max IoU with any gt
        from efg_tpu.ops.nms2d import iou_xyxy

        px0 = shifts[:, 0] - deltas[:, 0]
        py0 = shifts[:, 1] - deltas[:, 1]
        px1 = shifts[:, 0] + deltas[:, 2]
        py1 = shifts[:, 1] + deltas[:, 3]
        pred_boxes = jax.lax.stop_gradient(jnp.stack([px0, py0, px1, py1], -1))
        iou = iou_xyxy(gt_boxes, pred_boxes)  # [G, R]
        iou = jnp.where(gt_mask[:, None], iou, 0.0)
        iou_max = iou.max(0)  # [R]
        v = 1.0 / jnp.clip(1.0 - iou_max, 1e-12, None)  # [R]
        # per-gt min-max normalization over its fg locations, scatter to [R, C]
        big = 1e30
        vmin = jnp.where(in_box, v[None, :], big).min(-1)
        vmax = jnp.where(in_box, v[None, :], -big).max(-1)
        norm_v = (v[None, :] - vmin[:, None] + 1e-12) / jnp.maximum(
            vmax[:, None] - vmin[:, None], 1e-12
        )
        norm_v = jnp.clip(jnp.where(in_box, norm_v, 0.0), 0.0, 1.0)
        box_prob = jnp.zeros_like(cls_prob)  # [R, C]
        box_prob = box_prob.at[:, gt_classes].max(norm_v.T)
        box_prob = jax.lax.stop_gradient(box_prob)

        neg = cls_prob * obj_prob * (1 - box_prob)
        neg_loss = (neg**gamma) * (-jnp.log(jnp.clip(1 - neg, 1e-12, 1.0)))

        num_bg = (normal * in_box).sum()
        norm_loss = gt_mask.sum() / jnp.clip((normal * in_box).sum(), 1e-12, None)
        return pos_loss.sum(), neg_loss.sum(), gt_mask.sum(), num_bg, norm_loss

    pos, neg, nfg, nbg, norm_l = jax.vmap(per_image)(
        cls_prob_all, obj_prob_all, deltas_all,
        batch["gt_boxes2d"], batch["gt_classes2d"], batch["gt_mask2d"],
    )
    num_fg = jnp.maximum(nfg.sum(), 1.0)
    num_bg = jnp.maximum(nbg.sum(), 1.0)
    loss_pos = pos.sum() / num_fg * alpha
    loss_neg = neg.sum() / num_bg * (1 - alpha)
    loss_norm = norm_l.mean() * (1 - alpha)
    return dict(loss_pos=loss_pos, loss_neg=loss_neg, loss_norm=loss_norm,
                loss=loss_pos + loss_neg + loss_norm)


predict = F.predict  # same decode + NMS as FCOS
