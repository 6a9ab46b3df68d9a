"""CenterPoint head: separated regression heads, device-side label
assignment, fast focal + gathered L1 losses, decode + rotated NMS.

Rebuild of the reference playground CenterHead (`playground/detection.3d/
waymo/center_point/.../center_head.py:55-379`, `centernet_loss.py`,
`voxelnet.py` `assign_one`) — promoted into the framework (the reference
kept it per-experiment; SURVEY.md §2.10 lists that as an inconsistency to
fix). All maps are NHWC; label assignment runs on device as a vectorized
gaussian splat instead of per-sample numpy.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from efg_tpu.ops.gaussian import gaussian_radius_jnp, splat_gaussians
from efg_tpu.ops.nms import NEG_INF, circle_nms, rotated_nms

_conv_init = nn.initializers.variance_scaling(1 / 3, "fan_in", "uniform")


class SepHead(nn.Module):
    """Per-task separated heads: each output gets its own conv tower
    (reference `SepHead`, `center_head.py:20-52`)."""

    heads: Dict[str, Tuple[int, int]]  # name → (out_channels, num_conv)
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19

    @nn.compact
    def __call__(self, x, train: bool):
        out = {}
        for name, (classes, num_conv) in self.heads.items():
            h = x
            for i in range(num_conv - 1):
                # bf16 conv compute (f32 params / BN / final predictions)
                h = nn.Conv(
                    self.head_conv, (self.final_kernel, self.final_kernel),
                    padding=self.final_kernel // 2, use_bias=True,
                    kernel_init=_conv_init, dtype=jnp.bfloat16,
                    name=f"{name}_conv{i}",
                )(h)
                h = nn.BatchNorm(
                    momentum=0.9, epsilon=1e-5, use_running_average=not train,
                    name=f"{name}_bn{i}",
                )(h)
                h = jax.nn.relu(h)
            bias_init = (
                nn.initializers.constant(self.init_bias)
                if name == "hm"
                else nn.initializers.zeros
            )
            out[name] = nn.Conv(
                classes, (self.final_kernel, self.final_kernel),
                padding=self.final_kernel // 2, use_bias=True,
                kernel_init=_conv_init, bias_init=bias_init, name=f"{name}_final",
            )(h)
        return out


class CenterHead(nn.Module):
    """Shared conv + one SepHead per task (reference `CenterHead.forward`)."""

    tasks: Sequence[Dict[str, Any]]  # [{"num_classes": n, "class_names": [...]}]
    common_heads: Dict[str, Tuple[int, int]]  # e.g. {"reg": (2, 2), ...}
    share_conv_channel: int = 64
    num_hm_conv: int = 2
    init_bias: float = -2.19

    @nn.compact
    def __call__(self, x, train: bool) -> List[Dict[str, jax.Array]]:
        x = nn.Conv(self.share_conv_channel, (3, 3), padding=1, use_bias=True,
                    kernel_init=_conv_init, dtype=jnp.bfloat16,
                    name="shared_conv")(x)
        x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, use_running_average=not train,
                         name="shared_bn")(x)
        x = jax.nn.relu(x)
        outs = []
        for t, task in enumerate(self.tasks):
            heads = dict(self.common_heads)
            heads["hm"] = (int(task["num_classes"]), self.num_hm_conv)
            outs.append(
                SepHead(heads=heads, final_kernel=3, init_bias=self.init_bias,
                        name=f"task{t}")(x, train)
            )
        return outs


# ---------------------------------------------------------------------------
# Label assignment (device-side, vectorized `assign_one`)
# ---------------------------------------------------------------------------

def centerpoint_targets(
    gt_boxes: jax.Array,
    gt_classes: jax.Array,
    gt_mask: jax.Array,
    *,
    tasks: Sequence[Dict[str, Any]],
    feature_map_size: Tuple[int, int],  # (W, H) i.e. (nx/osf, ny/osf)
    pc_range: Sequence[float],
    voxel_size: Sequence[float],
    out_size_factor: int,
    gaussian_overlap: float,
    min_radius: int,
    with_vel: bool,
    r_cap: int = 12,
):
    """Compute CenterPoint training targets for one sample, per task.

    gt_boxes [G, 9] (x, y, z, dx, dy, dz, vx, vy, yaw) — G == max_objs,
    gt_classes [G] 1-based *global* class ids (0 = padding), gt_mask [G].
    Returns per-task dicts of hm [H, W, C], anno_box [G, 8|10], ind [G],
    mask [G], cat [G]. vmap over batch for [B, ...].
    """
    w_fm, h_fm = feature_map_size
    vx, vy = voxel_size[0], voxel_size[1]
    x0, y0 = pc_range[0], pc_range[1]

    yaw = gt_boxes[:, -1]
    # limit rad to [-pi, pi] (reference assign_one)
    yaw = yaw - jnp.floor(yaw / (2 * jnp.pi) + 0.5) * (2 * jnp.pi)

    l_px = gt_boxes[:, 3] / vx / out_size_factor
    w_px = gt_boxes[:, 4] / vy / out_size_factor
    radius = gaussian_radius_jnp(l_px, w_px, gaussian_overlap)
    radius = jnp.maximum(min_radius, radius.astype(jnp.int32))
    size_ok = (l_px > 0) & (w_px > 0)

    ct_x = (gt_boxes[:, 0] - x0) / vx / out_size_factor
    ct_y = (gt_boxes[:, 1] - y0) / vy / out_size_factor
    cti_x = ct_x.astype(jnp.int32)
    cti_y = ct_y.astype(jnp.int32)
    in_fm = (cti_x >= 0) & (cti_x < w_fm) & (cti_y >= 0) & (cti_y < h_fm)

    base_anno = [
        ct_x - cti_x.astype(ct_x.dtype),
        ct_y - cti_y.astype(ct_y.dtype),
        gt_boxes[:, 2],
        jnp.log(jnp.maximum(gt_boxes[:, 3], 1e-4)),
        jnp.log(jnp.maximum(gt_boxes[:, 4], 1e-4)),
        jnp.log(jnp.maximum(gt_boxes[:, 5], 1e-4)),
    ]
    if with_vel:
        base_anno += [gt_boxes[:, 6], gt_boxes[:, 7]]
    base_anno += [jnp.sin(yaw), jnp.cos(yaw)]
    anno = jnp.stack(base_anno, axis=-1)

    ind_all = cti_y * w_fm + cti_x

    out = []
    offset = 0
    for task in tasks:
        n_cls = int(task["num_classes"])
        in_task = (gt_classes > offset) & (gt_classes <= offset + n_cls)
        cat = jnp.clip(gt_classes - offset - 1, 0, n_cls - 1)
        m = gt_mask & in_task & size_ok & in_fm
        hm = splat_gaussians(
            jnp.stack([cti_x, cti_y], axis=-1), radius, cat, m,
            shape=(h_fm, w_fm, n_cls), r_cap=r_cap,
        )
        out.append(
            dict(
                hm=hm,
                anno_box=anno * m[:, None].astype(anno.dtype),
                ind=jnp.where(m, ind_all, 0),
                mask=m,
                cat=jnp.where(m, cat, 0),
            )
        )
        offset += n_cls
    return out


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def _gather_feat(fmap: jax.Array, ind: jax.Array) -> jax.Array:
    """fmap [B, H, W, C], ind [B, M] flat (y*W + x) → [B, M, C]."""
    b, h, w, c = fmap.shape
    flat = fmap.reshape(b, h * w, c)
    return jnp.take_along_axis(flat, ind[:, :, None], axis=1)


def fast_focal_loss(out, target, ind, mask, cat, eps: float = 1e-12):
    """CornerNet-style focal loss on sigmoided heatmaps (reference
    `FastFocalLoss`, `centernet_loss.py:29-55`). out/target [B, H, W, C]."""
    m = mask.astype(jnp.float32)
    gt_weight = jnp.power(1 - target, 4)
    neg_loss = (jnp.log(jnp.maximum(1 - out, eps)) * jnp.square(out) * gt_weight).sum()

    pos_pred_pix = _gather_feat(out, ind)  # [B, M, C]
    pos_pred = jnp.take_along_axis(pos_pred_pix, cat[:, :, None], axis=2)[..., 0]
    num_pos = m.sum()
    pos_loss = (
        jnp.log(jnp.maximum(pos_pred, eps)) * jnp.square(1 - pos_pred) * m
    ).sum()
    return jnp.where(num_pos == 0, -neg_loss, -(pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0))


def reg_loss(output, mask, ind, target):
    """Gathered L1 regression loss → per-dim vector [D] (reference `RegLoss`,
    `centernet_loss.py:8-27`). output [B, H, W, D], target [B, M, D]."""
    pred = _gather_feat(output, ind)
    m = mask.astype(jnp.float32)[:, :, None]
    loss = jnp.abs(pred * m - target * m)
    loss = loss / (m.sum() + 1e-4)
    return loss.sum(axis=(0, 1))


def center_head_loss(
    preds: List[Dict[str, jax.Array]],
    targets: List[Dict[str, jax.Array]],
    *,
    code_weights: Sequence[float],
    weight: float,
    with_vel: bool,
) -> Dict[str, jax.Array]:
    """Total CenterHead loss over tasks (reference `CenterHead.loss`)."""
    out: Dict[str, jax.Array] = {}
    for task_id, (pred, tgt) in enumerate(zip(preds, targets)):
        hm = jnp.clip(jax.nn.sigmoid(pred["hm"]), 1e-4, 1 - 1e-4)
        hm_loss = fast_focal_loss(hm, tgt["hm"], tgt["ind"], tgt["mask"], tgt["cat"])
        parts = [pred["reg"], pred["height"], pred["dim"]]
        if with_vel:
            parts.append(pred["vel"])
        parts.append(pred["rot"])
        anno_pred = jnp.concatenate(parts, axis=-1)
        box_loss = reg_loss(anno_pred, tgt["mask"], tgt["ind"], tgt["anno_box"])
        loc_loss = (box_loss * jnp.asarray(code_weights, box_loss.dtype)).sum()
        out[f"{task_id}_loss"] = hm_loss + weight * loc_loss
        out[f"{task_id}_hm_loss"] = jax.lax.stop_gradient(hm_loss)
        out[f"{task_id}_loc_loss"] = jax.lax.stop_gradient(loc_loss)
        out[f"{task_id}_num_positive"] = tgt["mask"].astype(jnp.float32).sum()
    return out


# ---------------------------------------------------------------------------
# Decode + post-processing
# ---------------------------------------------------------------------------

def decode_boxes(
    pred: Dict[str, jax.Array],
    *,
    pc_range: Sequence[float],
    voxel_size: Sequence[float],
    out_size_factor: int,
    with_vel: bool,
) -> Tuple[jax.Array, jax.Array]:
    """Dense decode of one task head: returns (boxes [B, H*W, 7|9],
    scores [B, H*W, C]) (reference `CenterHead.predict` decode section)."""
    hm = jax.nn.sigmoid(pred["hm"])
    b, h, w, c = hm.shape
    reg = pred["reg"].reshape(b, h * w, 2)
    hei = pred["height"].reshape(b, h * w, 1)
    dim = jnp.exp(pred["dim"]).reshape(b, h * w, 3)
    rots = pred["rot"][..., 0:1].reshape(b, h * w, 1)
    rotc = pred["rot"][..., 1:2].reshape(b, h * w, 1)
    rot = jnp.arctan2(rots, rotc)

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=hm.dtype), jnp.arange(w, dtype=hm.dtype), indexing="ij")
    xs = xs.reshape(1, h * w, 1) + reg[:, :, 0:1]
    ys = ys.reshape(1, h * w, 1) + reg[:, :, 1:2]
    xs = xs * out_size_factor * voxel_size[0] + pc_range[0]
    ys = ys * out_size_factor * voxel_size[1] + pc_range[1]

    if with_vel:
        vel = pred["vel"].reshape(b, h * w, 2)
        boxes = jnp.concatenate([xs, ys, hei, dim, vel, rot], axis=-1)
    else:
        boxes = jnp.concatenate([xs, ys, hei, dim, rot], axis=-1)
    return boxes, hm.reshape(b, h * w, c)


def post_process_sample(
    boxes: jax.Array,
    scores_cls: jax.Array,
    *,
    score_threshold: float,
    post_center_range: Sequence[float],
    nms_iou_threshold: float,
    nms_pre_max_size: int,
    nms_post_max_size: int,
    use_circle_nms: bool = False,
    circle_min_radius: float = 1.0,
):
    """Per-sample filtering + class-agnostic rotated NMS
    (reference `CenterHead.post_processing`). boxes [N, 7|9],
    scores_cls [N, C] → dict of fixed-size outputs."""
    pcr = jnp.asarray(post_center_range, boxes.dtype)
    scores = scores_cls.max(axis=-1)
    labels = scores_cls.argmax(axis=-1)
    keep = (
        (scores > score_threshold)
        & (boxes[:, :3] >= pcr[:3]).all(axis=-1)
        & (boxes[:, :3] <= pcr[3:]).all(axis=-1)
    )
    masked_scores = jnp.where(keep, scores, NEG_INF)
    nms_boxes = jnp.concatenate([boxes[:, :6], boxes[:, -1:]], axis=-1)
    if use_circle_nms:
        idx, valid = circle_nms(
            nms_boxes[:, :2], masked_scores,
            min_radius=circle_min_radius,
            pre_max=nms_pre_max_size, post_max=nms_post_max_size,
        )
    else:
        idx, valid = rotated_nms(
            nms_boxes, masked_scores,
            iou_threshold=nms_iou_threshold,
            pre_max=nms_pre_max_size, post_max=nms_post_max_size,
        )
    return dict(
        box3d=boxes[idx] * valid[:, None].astype(boxes.dtype),
        scores=jnp.where(valid, scores[idx], 0.0),
        labels=jnp.where(valid, labels[idx], -1),
        valid=valid,
    )
