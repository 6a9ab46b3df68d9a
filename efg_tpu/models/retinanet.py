"""RetinaNet: anchor-based single-stage 2D detector.

TPU rebuild of the reference experiment (`playground/detection.2d/coco/
retina_net/retinanet.res50.fpn.coco.multiscale.1x/retinanet.py`): ResNet-FPN
p3–p7, shared cls/box towers, 9 anchors/location, IoU-matched targets with
an ignore band, focal + smooth-L1 losses. Assignment vectorized on device.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from efg_tpu.modeling.assigners.anchor_generator import Box2BoxTransform, grid_anchors
from efg_tpu.models.fcos import _FPNP6P7
from efg_tpu.modeling.backbones.resnet import ResNet
from efg_tpu.models.voxel_detr import sigmoid_focal_loss
from efg_tpu.ops.nms import NEG_INF
from efg_tpu.ops.nms2d import batched_nms, iou_xyxy

_msra = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")

ANCHOR_SIZES = ((32, 40, 50), (64, 80, 101), (128, 161, 203), (256, 322, 406), (512, 645, 812))
ASPECT_RATIOS = (0.5, 1.0, 2.0)


class RetinaNetHead(nn.Module):
    num_classes: int = 80
    num_anchors: int = 9
    num_convs: int = 4
    prior_prob: float = 0.01

    @nn.compact
    def __call__(self, features: List[jax.Array]):
        cls_tower = [nn.Conv(256, (3, 3), padding=1, kernel_init=_msra, name=f"cls_conv{i}")
                     for i in range(self.num_convs)]
        box_tower = [nn.Conv(256, (3, 3), padding=1, kernel_init=_msra, name=f"box_conv{i}")
                     for i in range(self.num_convs)]
        bias = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_pred = nn.Conv(self.num_anchors * self.num_classes, (3, 3), padding=1,
                           kernel_init=_msra, bias_init=nn.initializers.constant(bias),
                           name="cls_pred")
        box_pred = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                           kernel_init=_msra, name="box_pred")
        logits, deltas = [], []
        for x in features:
            c = x
            for conv in cls_tower:
                c = jax.nn.relu(conv(c))
            b = x
            for conv in box_tower:
                b = jax.nn.relu(conv(b))
            logits.append(cls_pred(c))
            deltas.append(box_pred(b))
        return logits, deltas


class RetinaNet(nn.Module):
    num_classes: int = 80
    depth: int = 50
    freeze_at: int = 2
    fpn_strides: Sequence[int] = (8, 16, 32, 64, 128)

    @nn.compact
    def __call__(self, images, train: bool) -> Dict[str, Any]:
        feats = ResNet(depth=self.depth, out_features=("res3", "res4", "res5"),
                       freeze_at=self.freeze_at, name="backbone")(images, train)
        levels = _FPNP6P7(name="fpn")(feats, train)
        logits, deltas = RetinaNetHead(num_classes=self.num_classes, name="head")(levels)
        b = images.shape[0]
        shapes = [x.shape[1:3] for x in levels]
        flat_logits = jnp.concatenate(
            [x.reshape(b, -1, self.num_classes) for x in logits], axis=1
        )
        flat_deltas = jnp.concatenate([x.reshape(b, -1, 4) for x in deltas], axis=1)
        return dict(logits=flat_logits, deltas=flat_deltas, shapes=shapes)


def _anchors_for(shapes, strides):
    per_level = grid_anchors(shapes, strides, ANCHOR_SIZES[: len(shapes)], ASPECT_RATIOS)
    return jnp.concatenate(per_level, axis=0)  # [R, 4]


def retinanet_targets(anchors, gt_boxes, gt_classes, gt_mask, *, num_classes,
                      fg_thresh=0.5, bg_thresh=0.4):
    """IoU matching with ignore band (reference Matcher semantics):
    returns (cls [R] with num_classes=bg, -1=ignore; matched gt idx [R])."""
    iou = iou_xyxy(anchors, gt_boxes)  # [R, G]
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    best = iou.max(axis=1)
    match = iou.argmax(axis=1)
    # low-quality matches: anchors that are the best for some gt become fg
    best_per_gt = iou.max(axis=0)  # [G]
    is_best_of_gt = (iou >= jnp.maximum(best_per_gt[None, :], 1e-5)) & gt_mask[None, :]
    forced_fg = is_best_of_gt.any(axis=1)

    cls = jnp.where(best >= fg_thresh, gt_classes[match], num_classes)
    cls = jnp.where((best < fg_thresh) & (best >= bg_thresh) & ~forced_fg, -1, cls)
    cls = jnp.where(forced_fg, gt_classes[match], cls)
    return cls, match


def compute_loss(preds, batch, *, model_cfg):
    num_classes = model_cfg["num_classes"]
    coder = Box2BoxTransform()
    anchors = _anchors_for(preds["shapes"], model_cfg["fpn_strides"])

    cls_t, match = jax.vmap(
        lambda b_, c_, m_: retinanet_targets(
            anchors, b_, c_, m_, num_classes=num_classes
        )
    )(batch["gt_boxes2d"], batch["gt_classes2d"], batch["gt_mask2d"])

    fg = (cls_t >= 0) & (cls_t < num_classes)
    valid = cls_t >= 0
    num_fg = jnp.maximum(fg.sum().astype(jnp.float32), 1.0)

    onehot = jax.nn.one_hot(jnp.where(fg, cls_t, num_classes), num_classes + 1)[..., :num_classes]
    focal = sigmoid_focal_loss(preds["logits"], onehot)
    loss_cls = (focal * valid[..., None]).sum() / num_fg

    matched_boxes = jnp.take_along_axis(batch["gt_boxes2d"], match[..., None], axis=1)
    tgt_deltas = coder.get_deltas(anchors[None], matched_boxes)
    l1 = jnp.abs(preds["deltas"] - tgt_deltas)
    beta = 0.1  # smooth l1
    sl1 = jnp.where(l1 < beta, 0.5 * l1**2 / beta, l1 - 0.5 * beta)
    loss_box = (sl1 * fg[..., None]).sum() / num_fg

    return dict(loss_cls=loss_cls, loss_box_reg=loss_box, loss=loss_cls + loss_box,
                num_foreground=num_fg)


def predict(preds, *, model_cfg, score_threshold=0.05, nms_threshold=0.5,
            pre_max=1000, post_max=100):
    num_classes = model_cfg["num_classes"]
    coder = Box2BoxTransform()
    anchors = _anchors_for(preds["shapes"], model_cfg["fpn_strides"])
    boxes = coder.apply_deltas(preds["deltas"], anchors[None])
    prob = jax.nn.sigmoid(preds["logits"])

    def per_image(p, bx):
        scores = p.max(-1)
        labels = p.argmax(-1)
        masked = jnp.where(scores > score_threshold, scores, NEG_INF)
        idx, valid = batched_nms(bx, masked, labels, iou_threshold=nms_threshold,
                                 pre_max=pre_max, post_max=post_max)
        return dict(
            boxes=bx[idx] * valid[:, None], scores=jnp.where(valid, scores[idx], 0.0),
            labels=jnp.where(valid, labels[idx], -1), valid=valid,
        )

    return jax.vmap(per_image)(prob, boxes)
