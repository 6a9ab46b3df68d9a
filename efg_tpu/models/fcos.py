"""FCOS: anchor-free single-stage 2D detector (flax.linen, NHWC).

TPU rebuild of the reference experiment (`playground/detection.2d/coco/
fcos/fcos.res50.fpn.coco.800size.1x/fcos.py:89-578`): ResNet-FPN p3–p7,
shared 4-conv cls/box towers with GN, per-level learnable scales,
centerness on the regression tower, center-sampling GT assignment,
focal + centerness-weighted GIoU + BCE losses. Fixed shapes: images padded
to a static size, GT padded to G_max, assignment fully vectorized on
device (the reference loops per image on host tensors).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from efg_tpu.modeling.backbones.resnet import ResNet
from efg_tpu.ops.nms import NEG_INF
from efg_tpu.ops.nms2d import batched_nms

_msra = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")
INF = 1e8


class _FPNP6P7(nn.Module):
    """FPN producing p3..p7 (LastLevelP6P7 top block on p5, as the
    reference RetinaNet/FCOS backbone)."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, feats: Dict[str, jax.Array], train: bool) -> List[jax.Array]:
        names = ["res3", "res4", "res5"]
        prev = None
        outs = {}
        for f in reversed(names):
            lat = nn.Conv(self.out_channels, (1, 1), name=f"lateral_{f}")(feats[f])
            if prev is not None:
                b, h, w, c = prev.shape
                lat = lat + jax.image.resize(prev, (b, h * 2, w * 2, c), "nearest")
            prev = lat
            outs[f] = nn.Conv(self.out_channels, (3, 3), padding=1, name=f"output_{f}")(prev)
        p3, p4, p5 = outs["res3"], outs["res4"], outs["res5"]
        p6 = nn.Conv(self.out_channels, (3, 3), strides=2, padding=1, name="p6")(p5)
        p7 = nn.Conv(self.out_channels, (3, 3), strides=2, padding=1, name="p7")(jax.nn.relu(p6))
        return [p3, p4, p5, p6, p7]


class FCOSHead(nn.Module):
    num_classes: int = 80
    num_convs: int = 4
    num_levels: int = 5
    prior_prob: float = 0.01

    @nn.compact
    def __call__(self, features: List[jax.Array]) -> Tuple[List, List, List]:
        cls_tower = [
            (nn.Conv(256, (3, 3), padding=1, kernel_init=_msra, name=f"cls_conv{i}"),
             nn.GroupNorm(num_groups=32, name=f"cls_gn{i}"))
            for i in range(self.num_convs)
        ]
        box_tower = [
            (nn.Conv(256, (3, 3), padding=1, kernel_init=_msra, name=f"box_conv{i}"),
             nn.GroupNorm(num_groups=32, name=f"box_gn{i}"))
            for i in range(self.num_convs)
        ]
        bias_init = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_pred = nn.Conv(
            self.num_classes, (3, 3), padding=1, kernel_init=_msra,
            bias_init=nn.initializers.constant(bias_init), name="cls_pred",
        )
        box_pred = nn.Conv(4, (3, 3), padding=1, kernel_init=_msra, name="box_pred")
        ctr_pred = nn.Conv(1, (3, 3), padding=1, kernel_init=_msra, name="ctr_pred")
        scales = self.param("scales", nn.initializers.ones, (self.num_levels,))

        logits, bboxes, ctrs = [], [], []
        for lvl, x in enumerate(features):
            c = x
            for conv, gn in cls_tower:
                c = jax.nn.relu(gn(conv(c)))
            b = x
            for conv, gn in box_tower:
                b = jax.nn.relu(gn(conv(b)))
            logits.append(cls_pred(c))
            # norm_reg_targets: relu(pred)·stride applied by the caller
            bboxes.append(jax.nn.relu(box_pred(b) * scales[lvl]))
            ctrs.append(ctr_pred(b))  # centerness on reg tower
        return logits, bboxes, ctrs


def level_shifts(shapes: Sequence[Tuple[int, int]], strides: Sequence[int], dtype=jnp.float32):
    """Per-level pixel shift coordinates [(HW, 2) ...] ((x, y), reference
    shift generator: (i + 0.5)·stride)."""
    out = []
    for (h, w), s in zip(shapes, strides):
        ys, xs = jnp.meshgrid(
            (jnp.arange(h, dtype=dtype) + 0.5) * s,
            (jnp.arange(w, dtype=dtype) + 0.5) * s,
            indexing="ij",
        )
        out.append(jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1))
    return out


class FCOS(nn.Module):
    num_classes: int = 80
    depth: int = 50
    fpn_strides: Sequence[int] = (8, 16, 32, 64, 128)
    freeze_at: int = 2

    @nn.compact
    def __call__(self, images, train: bool) -> Dict[str, Any]:
        feats = ResNet(
            depth=self.depth, out_features=("res3", "res4", "res5"),
            freeze_at=self.freeze_at, name="backbone",
        )(images, train)
        levels = _FPNP6P7(name="fpn")(feats, train)
        logits, bboxes, ctrs = FCOSHead(
            num_classes=self.num_classes, num_levels=len(levels), name="head"
        )(levels)
        shapes = [x.shape[1:3] for x in levels]
        b = images.shape[0]
        flat_logits = jnp.concatenate(
            [x.reshape(b, -1, self.num_classes) for x in logits], axis=1
        )
        flat_boxes = jnp.concatenate(
            [
                (x * s).reshape(b, -1, 4)
                for x, s in zip(bboxes, self.fpn_strides)
            ],
            axis=1,
        )
        flat_ctr = jnp.concatenate([x.reshape(b, -1, 1) for x in ctrs], axis=1)
        return dict(
            logits=flat_logits, deltas=flat_boxes, centerness=flat_ctr,
            shapes=shapes,
        )


# ---------------------------------------------------------------------------
# GT assignment (reference `get_ground_truth`, fully vectorized)
# ---------------------------------------------------------------------------

SIZES_OF_INTEREST = ((-1, 64), (64, 128), (128, 256), (256, 512), (512, INF))


def fcos_targets(
    shifts: jax.Array,            # [R, 2] all-level shifts
    level_of_shift: jax.Array,    # [R] level index
    strides: jax.Array,           # [n_levels]
    soi: jax.Array,               # [n_levels, 2]
    gt_boxes: jax.Array,          # [G, 4] xyxy
    gt_classes: jax.Array,        # [G] 0-based
    gt_mask: jax.Array,           # [G]
    *,
    num_classes: int,
    center_sampling_radius: float = 1.5,
):
    """→ (classes [R] (num_classes = bg), deltas [R, 4], centerness [R])."""
    r = shifts.shape[0]
    g = gt_boxes.shape[0]
    # deltas [G, R, 4] = (l, t, r, b)
    l = shifts[None, :, 0] - gt_boxes[:, None, 0]
    t = shifts[None, :, 1] - gt_boxes[:, None, 1]
    rr = gt_boxes[:, None, 2] - shifts[None, :, 0]
    bb = gt_boxes[:, None, 3] - shifts[None, :, 1]
    deltas = jnp.stack([l, t, rr, bb], axis=-1)

    if center_sampling_radius > 0:
        centers = (gt_boxes[:, :2] + gt_boxes[:, 2:]) / 2
        radius = strides[level_of_shift] * center_sampling_radius  # [R]
        cb_lo = jnp.maximum(centers[:, None, :] - radius[None, :, None], gt_boxes[:, None, :2])
        cb_hi = jnp.minimum(centers[:, None, :] + radius[None, :, None], gt_boxes[:, None, 2:])
        cd = jnp.concatenate(
            [shifts[None, :, :] - cb_lo, cb_hi - shifts[None, :, :]], axis=-1
        )
        in_box = cd.min(axis=-1) > 0
    else:
        in_box = deltas.min(axis=-1) > 0

    max_d = deltas.max(axis=-1)
    cared = (max_d >= soi[level_of_shift][None, :, 0]) & (max_d <= soi[level_of_shift][None, :, 1])

    area = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    pos_area = jnp.where(in_box & cared & gt_mask[:, None], area[:, None], INF)
    min_area = pos_area.min(axis=0)
    match = pos_area.argmin(axis=0)

    cls = jnp.where(min_area < INF, gt_classes[match], num_classes)
    reg = jnp.take_along_axis(deltas, match[None, :, None], axis=0)[0]  # [R, 4]
    lr_ = reg[:, jnp.array([0, 2])]
    tb_ = reg[:, jnp.array([1, 3])]
    ctr = jnp.sqrt(
        jnp.clip(lr_.min(-1) / jnp.maximum(lr_.max(-1), 1e-9), 0, None)
        * jnp.clip(tb_.min(-1) / jnp.maximum(tb_.max(-1), 1e-9), 0, None)
    )
    return cls, reg, ctr


def _giou_ltrb(pred, tgt, eps=1e-7):
    """GIoU between ltrb deltas around the same shift (reference
    `iou_loss_v2`, `efg/modeling/losses/iou2d_loss.py`)."""
    p_l, p_t, p_r, p_b = pred[..., 0], pred[..., 1], pred[..., 2], pred[..., 3]
    g_l, g_t, g_r, g_b = tgt[..., 0], tgt[..., 1], tgt[..., 2], tgt[..., 3]
    p_area = (p_l + p_r) * (p_t + p_b)
    g_area = (g_l + g_r) * (g_t + g_b)
    iw = jnp.minimum(p_l, g_l) + jnp.minimum(p_r, g_r)
    ih = jnp.minimum(p_t, g_t) + jnp.minimum(p_b, g_b)
    inter = jnp.clip(iw, 0, None) * jnp.clip(ih, 0, None)
    union = p_area + g_area - inter
    iou = inter / jnp.maximum(union, eps)
    cw = jnp.maximum(p_l, g_l) + jnp.maximum(p_r, g_r)
    ch = jnp.maximum(p_t, g_t) + jnp.maximum(p_b, g_b)
    hull = jnp.maximum(cw * ch, eps)
    return iou - (hull - union) / hull


def compute_loss(preds, batch, *, model_cfg):
    """batch: images, gt_boxes2d [B, G, 4], gt_classes2d [B, G] 0-based,
    gt_mask2d [B, G]."""
    num_classes = model_cfg["num_classes"]
    strides = jnp.asarray(model_cfg["fpn_strides"], jnp.float32)
    soi = jnp.asarray(model_cfg.get("sizes_of_interest", SIZES_OF_INTEREST), jnp.float32)

    shapes = preds["shapes"]
    shift_list = level_shifts(shapes, model_cfg["fpn_strides"])
    shifts = jnp.concatenate(shift_list, axis=0)
    lvl = jnp.concatenate(
        [jnp.full((s.shape[0],), i, jnp.int32) for i, s in enumerate(shift_list)]
    )

    cls_t, reg_t, ctr_t = jax.vmap(
        lambda b_, c_, m_: fcos_targets(
            shifts, lvl, strides, soi, b_, c_, m_, num_classes=num_classes,
            center_sampling_radius=model_cfg.get("center_sampling_radius", 1.5),
        )
    )(batch["gt_boxes2d"], batch["gt_classes2d"], batch["gt_mask2d"])

    logits = preds["logits"]
    fg = cls_t < num_classes
    num_fg = jnp.maximum(fg.sum().astype(jnp.float32), 1.0)

    onehot = jax.nn.one_hot(jnp.where(fg, cls_t, num_classes), num_classes + 1)[..., :num_classes]
    from efg_tpu.models.voxel_detr import sigmoid_focal_loss

    loss_cls = sigmoid_focal_loss(logits, onehot).sum() / num_fg

    giou = _giou_ltrb(preds["deltas"], reg_t)
    fgf = fg.astype(jnp.float32)
    num_tgt = jnp.maximum((ctr_t * fgf).sum(), 1.0)
    loss_box = ((1 - giou) * ctr_t * fgf).sum() / num_tgt

    ctr_logits = preds["centerness"][..., 0]
    bce = jnp.maximum(ctr_logits, 0) - ctr_logits * ctr_t + jnp.log1p(jnp.exp(-jnp.abs(ctr_logits)))
    loss_ctr = (bce * fgf).sum() / num_fg

    return dict(loss_cls=loss_cls, loss_box_reg=loss_box, loss_centerness=loss_ctr,
                loss=loss_cls + loss_box + loss_ctr,
                num_foreground=num_fg)


def predict(preds, *, model_cfg, score_threshold=0.05, nms_threshold=0.6,
            pre_max=1000, post_max=100):
    """Decode + class-aware NMS (reference `inference_single_image`)."""
    shapes = preds["shapes"]
    shift_list = level_shifts(shapes, model_cfg["fpn_strides"])
    shifts = jnp.concatenate(shift_list, axis=0)

    prob = jax.nn.sigmoid(preds["logits"])  # [B, R, C]
    ctr = jax.nn.sigmoid(preds["centerness"])  # [B, R, 1]
    scores_all = jnp.sqrt(prob * ctr)

    deltas = preds["deltas"]
    x0 = shifts[None, :, 0] - deltas[..., 0]
    y0 = shifts[None, :, 1] - deltas[..., 1]
    x1 = shifts[None, :, 0] + deltas[..., 2]
    y1 = shifts[None, :, 1] + deltas[..., 3]
    boxes = jnp.stack([x0, y0, x1, y1], axis=-1)  # [B, R, 4]

    def per_image(s_all, bx):
        scores = s_all.max(-1)
        labels = s_all.argmax(-1)
        masked = jnp.where(scores > score_threshold, scores, NEG_INF)
        idx, valid = batched_nms(
            bx, masked, labels, iou_threshold=nms_threshold,
            pre_max=pre_max, post_max=post_max,
        )
        return dict(
            boxes=bx[idx] * valid[:, None],
            scores=jnp.where(valid, scores[idx], 0.0),
            labels=jnp.where(valid, labels[idx], -1),
            valid=valid,
        )

    return jax.vmap(per_image)(scores_all, boxes)
