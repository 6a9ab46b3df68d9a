"""CenterPoint detectors: VoxelNet (sparse voxel trunk) and PillarNet.

TPU rebuild of the reference playground model (`playground/detection.3d/
waymo/center_point/.../voxelnet.py`): points → (device) dynamic
voxelization → sparse/pillar backbone → RPN → CenterHead. Unlike the
reference (which voxelizes on CPU in dataloader workers and assigns labels
in numpy inside forward), everything here happens on-device inside one
jitted step over fixed-shape padded batches.

The forward returns raw per-task head maps; `loss` and `predict` are pure
functions over those maps (see `efg_tpu.modeling.heads.center_head`).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from efg_tpu.modeling.backbones.rpn import RPN
from efg_tpu.modeling.backbones.sparse_net import SpMiddleResNetFHD
from efg_tpu.modeling.heads.center_head import (
    CenterHead,
    center_head_loss,
    centerpoint_targets,
    decode_boxes,
    post_process_sample,
)
from efg_tpu.modeling.readers.voxel_reader import (
    PillarFeatureNet,
    dynamic_mean_vfe,
    pillar_scatter,
)


def _grid(pc_range, voxel_size) -> Tuple[int, int, int]:
    return tuple(
        int(round((pc_range[i + 3] - pc_range[i]) / voxel_size[i])) for i in range(3)
    )


class VoxelNet(nn.Module):
    """CenterPoint with the SpMiddleResNetFHD sparse trunk (Waymo flagship)."""

    pc_range: Tuple[float, ...] = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    voxel_size: Tuple[float, ...] = (0.1, 0.1, 0.15)
    max_voxels: int = 120000
    num_input_features: int = 5
    stage_caps: Sequence[int] = (70000, 45000, 25000, 20000)
    tasks: Sequence[Dict[str, Any]] = (
        {"num_classes": 3, "class_names": ["VEHICLE", "PEDESTRIAN", "CYCLIST"]},
    )
    common_heads: Any = (("reg", (2, 2)), ("height", (1, 2)), ("dim", (3, 2)), ("rot", (2, 2)))
    neck_cfg: Any = ()
    sparse_backend: str = "auto"
    act_dtype: str = ""  # trunk activation-storage dtype ("bfloat16" = AMP-style)

    @nn.compact
    def __call__(self, points, points_mask, train: bool) -> List[Dict[str, jax.Array]]:
        grid = _grid(self.pc_range, self.voxel_size)
        feats, coords, valid = dynamic_mean_vfe(
            points, points_mask,
            pc_range=self.pc_range, voxel_size=self.voxel_size,
            max_voxels=self.max_voxels,
            num_input_features=self.num_input_features,
        )
        feats = jax.lax.stop_gradient(feats)
        bev = SpMiddleResNetFHD(
            num_input_features=self.num_input_features,
            grid_size=grid,
            stage_caps=tuple(self.stage_caps),
            sparse_backend=self.sparse_backend,
            act_dtype=self.act_dtype,
            name="backbone",
        )(feats, coords, valid, train)
        neck_kw = dict(self.neck_cfg)
        bev = RPN(name="neck", **neck_kw)(bev, train)
        return CenterHead(
            tasks=self.tasks, common_heads=dict(self.common_heads), name="head"
        )(bev, train)


class PillarNet(nn.Module):
    """CenterPoint-Pillar: PillarFeatureNet + scatter + RPN + CenterHead —
    the spconv-free end-to-end slice (SURVEY.md §7 stage 5)."""

    pc_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    voxel_size: Tuple[float, ...] = (0.2, 0.2, 8.0)
    max_pillars: int = 30000
    num_input_features: int = 5
    pfn_filters: Sequence[int] = (64,)
    tasks: Sequence[Dict[str, Any]] = (
        {"num_classes": 1, "class_names": ["car"]},
    )
    common_heads: Any = (
        ("reg", (2, 2)), ("height", (1, 2)), ("dim", (3, 2)),
        ("rot", (2, 2)), ("vel", (2, 2)),
    )
    neck_cfg: Any = ()

    @nn.compact
    def __call__(self, points, points_mask, train: bool) -> List[Dict[str, jax.Array]]:
        nx, ny, _ = _grid(self.pc_range, self.voxel_size)
        pf, coords_yx, valid = PillarFeatureNet(
            num_filters=tuple(self.pfn_filters),
            num_input_features=self.num_input_features,
            pc_range=self.pc_range,
            voxel_size=self.voxel_size,
            max_pillars=self.max_pillars,
            name="reader",
        )(points, points_mask, train)
        bev = pillar_scatter(pf, coords_yx, valid, ny=ny, nx=nx)
        neck_kw = dict(self.neck_cfg)
        bev = RPN(name="neck", **neck_kw)(bev, train)
        return CenterHead(
            tasks=self.tasks, common_heads=dict(self.common_heads), name="head"
        )(bev, train)


# ---------------------------------------------------------------------------
# Pure loss / target / predict wrappers shared by both variants
# ---------------------------------------------------------------------------

def compute_loss(
    preds: List[Dict[str, jax.Array]],
    batch: Dict[str, jax.Array],
    *,
    model_cfg: Dict[str, Any],
) -> Dict[str, jax.Array]:
    """batch needs gt_boxes [B, G, 9], gt_classes [B, G], gt_mask [B, G]."""
    lc = model_cfg["loss"]
    with_vel = "vel" in dict(model_cfg["common_heads"])
    h, w = preds[0]["hm"].shape[1:3]

    tgt = jax.vmap(
        lambda b, c, m: centerpoint_targets(
            b, c, m,
            tasks=model_cfg["tasks"],
            feature_map_size=(w, h),
            pc_range=model_cfg["pc_range"],
            voxel_size=model_cfg["voxel_size"],
            out_size_factor=lc["out_size_factor"],
            gaussian_overlap=lc["gaussian_overlap"],
            min_radius=lc["min_radius"],
            with_vel=with_vel,
        )
    )(batch["gt_boxes"], batch["gt_classes"], batch["gt_mask"])

    losses = center_head_loss(
        preds, tgt,
        code_weights=lc["code_weights"], weight=lc["weight"], with_vel=with_vel,
    )
    losses["loss"] = sum(v for k, v in losses.items() if k.endswith("_loss") and "hm" not in k and "loc" not in k)
    return losses


def forward_double_flip(module, variables, points, points_mask):
    """Double-flip test-time augmentation (reference `CenterHead.predict`
    double_flip branch, `center_head.py:186-263`): run the model on the
    original cloud plus y-flip, x-flip, and xy-flip copies, un-flip the
    prediction maps, and average. Returns averaged per-task pred dicts."""
    def flip_pts(pts, fy, fx):
        y = -pts[..., 1] if fy else pts[..., 1]
        x = -pts[..., 0] if fx else pts[..., 0]
        return jnp.concatenate(
            [x[..., None], y[..., None], pts[..., 2:]], axis=-1
        )

    variants = [(False, False), (True, False), (False, True), (True, True)]
    all_preds = [
        module.apply(variables, flip_pts(points, fy, fx), points_mask, False)
        for fy, fx in variants
    ]

    def unflip(arr, fy, fx):
        # maps are [B, H(y), W(x), C]
        if fy:
            arr = arr[:, ::-1]
        if fx:
            arr = arr[:, :, ::-1]
        return arr

    merged = []
    for t in range(len(all_preds[0])):
        out = {}
        for key in all_preds[0][t]:
            acc = []
            for (fy, fx), preds in zip(variants, all_preds):
                a = unflip(preds[t][key], fy, fx)
                if key == "reg":
                    # sub-pixel offsets mirror: off' = 1 - off on flipped axes
                    ax = a[..., 0:1]
                    ay = a[..., 1:2]
                    if fx:
                        ax = 1.0 - ax
                    if fy:
                        ay = 1.0 - ay
                    a = jnp.concatenate([ax, ay], axis=-1)
                elif key == "rot":
                    s_, c_ = a[..., 0:1], a[..., 1:2]
                    if fy:  # y → −y: θ → −θ
                        s_ = -s_
                    if fx:  # x → −x: θ → π − θ
                        c_ = -c_
                    a = jnp.concatenate([s_, c_], axis=-1)
                elif key == "vel":
                    vx_, vy_ = a[..., 0:1], a[..., 1:2]
                    if fx:
                        vx_ = -vx_
                    if fy:
                        vy_ = -vy_
                    a = jnp.concatenate([vx_, vy_], axis=-1)
                acc.append(a)
            out[key] = sum(acc) / len(acc)
        merged.append(out)
    return merged


def predict(
    preds: List[Dict[str, jax.Array]],
    *,
    post_cfg: Dict[str, Any],
    model_cfg: Dict[str, Any],
) -> Dict[str, jax.Array]:
    """Decode + NMS every task, merge results. Returns fixed-size
    [B, T*post_max] detections (reference `CenterHead.predict`)."""
    with_vel = "vel" in dict(model_cfg["common_heads"])
    all_boxes, all_scores, all_labels, all_valid = [], [], [], []
    offset = 0
    for task_id, pred in enumerate(preds):
        boxes, scores = decode_boxes(
            pred,
            pc_range=model_cfg["pc_range"],
            voxel_size=model_cfg["voxel_size"],
            out_size_factor=post_cfg["out_size_factor"],
            with_vel=with_vel,
        )
        res = jax.vmap(
            lambda b, s: post_process_sample(
                b, s,
                score_threshold=post_cfg["score_threshold"],
                post_center_range=post_cfg["post_center_limit_range"],
                nms_iou_threshold=post_cfg["nms"]["nms_iou_threshold"],
                nms_pre_max_size=post_cfg["nms"]["nms_pre_max_size"],
                nms_post_max_size=post_cfg["nms"]["nms_post_max_size"],
            )
        )(boxes, scores)
        all_boxes.append(res["box3d"])
        all_scores.append(res["scores"])
        all_labels.append(jnp.where(res["valid"], res["labels"] + 1 + offset, 0))
        all_valid.append(res["valid"])
        offset += int(model_cfg["tasks"][task_id]["num_classes"])
    return dict(
        box3d=jnp.concatenate(all_boxes, axis=1),
        scores=jnp.concatenate(all_scores, axis=1),
        labels=jnp.concatenate(all_labels, axis=1),
        valid=jnp.concatenate(all_valid, axis=1),
    )
