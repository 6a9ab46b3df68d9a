"""TrajectoryFormer: 3D multi-object tracking by trajectory hypotheses.

TPU rebuild of the reference experiment (`playground/tracking.3d/waymo/
trajectoryformer/trajectoryformer.centerpoint/`: `trajectoryformer.py`,
`pointnet.py`, `transformer.py`, `modules/tracker.py`): per frame, each
track spawns hypotheses (current detections + motion-predicted boxes),
each hypothesis is encoded from (a) points cropped around its box via a
PointNet and (b) its trajectory history via a motion encoder, a
global-local transformer mixes hypothesis features, and per-hypothesis
heads score confidence and refine the box. A greedy host-side tracker
(`efg_tpu.tracking.tracker`) consumes scores for association.

Fixed-shape design: N_max hypotheses per frame, P points per hypothesis
(gathered with mask), T history steps — all static; invalid slots masked.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from efg_tpu.geometry.box_ops_jnp import points_in_rbbox
from efg_tpu.ops.iou_rotated import iou_bev


class PointNet(nn.Module):
    """Per-hypothesis point encoder (reference `pointnet.py:7-54`):
    pointwise MLP → max-pool → MLP."""

    channels: int = 128

    @nn.compact
    def __call__(self, pts, mask):
        """pts [N, P, C], mask [N, P] → [N, channels]."""
        x = pts
        for i, c in enumerate((64, 128, self.channels)):
            x = nn.Dense(c, name=f"mlp{i}")(x)
            x = nn.LayerNorm(name=f"ln{i}")(x)
            x = jax.nn.relu(x)
        x = jnp.where(mask[..., None], x, -1e9)
        pooled = x.max(axis=-2)
        pooled = jnp.where(mask.any(-1, keepdims=True), pooled, 0.0)
        return nn.Dense(self.channels, name="out")(pooled)


class MotionEncoder(nn.Module):
    """Trajectory (history boxes) encoder (reference `pointnet.py:56-137`):
    per-step MLP → max over valid steps → MLP, PointNet-polyline style."""

    channels: int = 128

    @nn.compact
    def __call__(self, traj, mask):
        """traj [N, T, D] box history (relative), mask [N, T] → [N, C]."""
        x = traj
        for i, c in enumerate((64, 128)):
            x = jax.nn.relu(nn.LayerNorm(name=f"ln{i}")(nn.Dense(c, name=f"mlp{i}")(x)))
        x = jnp.where(mask[..., None], x, -1e9)
        pooled = jnp.where(mask.any(-1, keepdims=True), x.max(-2), 0.0)
        return nn.Dense(self.channels, name="out")(pooled)


class GlobalLocalLayer(nn.Module):
    """One global (all hypotheses) + one local (per-track group) attention
    block (reference `TransformerEncoderLayerGlobalLocal`)."""

    d_model: int = 256
    nhead: int = 4
    dim_feedforward: int = 512

    @nn.compact
    def __call__(self, x, group_mask):
        """x [N, C]; group_mask [N, N] True = same track group."""
        xb = x[None]
        g = nn.MultiHeadDotProductAttention(num_heads=self.nhead, name="global_attn")(
            xb, inputs_k=xb, inputs_v=xb
        )[0]
        x = nn.LayerNorm(name="norm1")(x + g)
        xb = x[None]
        l = nn.MultiHeadDotProductAttention(num_heads=self.nhead, name="local_attn")(
            xb, inputs_k=xb, inputs_v=xb, mask=group_mask[None, None]
        )[0]
        x = nn.LayerNorm(name="norm2")(x + l)
        ff = nn.Dense(self.d_model, name="linear2")(
            jax.nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(x))
        )
        return nn.LayerNorm(name="norm3")(x + ff)


class TrajectoryFormer(nn.Module):
    """Hypothesis scorer/refiner. Consumes pre-cropped fixed-shape inputs."""

    d_model: int = 256
    num_layers: int = 3
    num_points: int = 128
    history: int = 10

    @nn.compact
    def __call__(
        self,
        hyp_points,   # [N, P, 4] xyz (box-frame-relative) + intensity
        hyp_pts_mask,  # [N, P]
        hyp_traj,     # [N, T, 8] history boxes relative to current (xyz, lwh, sin/cos)
        hyp_traj_mask,  # [N, T]
        hyp_boxes,    # [N, 7] current hypothesis boxes (absolute)
        group_ids,    # [N] track id per hypothesis (same id = local group)
        valid,        # [N]
        train: bool = True,
    ) -> Dict[str, jax.Array]:
        pt_feat = PointNet(128, name="point_encoder")(hyp_points, hyp_pts_mask)
        mo_feat = MotionEncoder(128, name="motion_encoder")(hyp_traj, hyp_traj_mask)
        box_feat = nn.Dense(64, name="box_embed")(hyp_boxes)
        x = nn.Dense(self.d_model, name="fuse")(
            jnp.concatenate([pt_feat, mo_feat, box_feat], axis=-1)
        )
        x = jax.nn.relu(x)

        group_mask = (group_ids[:, None] == group_ids[None, :]) & valid[:, None] & valid[None, :]
        for i in range(self.num_layers):
            x = GlobalLocalLayer(self.d_model, name=f"layer{i}")(x, group_mask)

        score = nn.Dense(1, name="cls_head")(x)[..., 0]
        refine = nn.Dense(7, name="reg_head",
                          kernel_init=nn.initializers.zeros)(x)
        return dict(scores=score, refine=refine, features=x)


# ---------------------------------------------------------------------------
# Hypothesis feature extraction (device, fixed shapes)
# ---------------------------------------------------------------------------

def crop_hypothesis_points(
    points: jax.Array,      # [Np, 4+]
    points_mask: jax.Array,  # [Np]
    boxes: jax.Array,       # [N, 7]
    *,
    num_points: int,
    margin: float = 0.5,
) -> Tuple[jax.Array, jax.Array]:
    """For each hypothesis box, take up to `num_points` points inside the
    (enlarged) box, expressed in the box frame (the reference's
    proposal-aware point feature, `trajectoryformer.py:526-571`)."""
    inside = points_in_rbbox(points[:, :3], boxes, margin=margin) & points_mask[:, None]
    # rank points per box: take first num_points by index
    order = jnp.cumsum(inside.astype(jnp.int32), axis=0) - 1  # rank of each point
    take = inside & (order < num_points)
    n = boxes.shape[0]

    def one_box(box, tk):
        idx = jnp.where(tk, jnp.arange(points.shape[0]), points.shape[0])
        idx = jnp.sort(idx)[:num_points]
        ok = idx < points.shape[0]
        p = points[jnp.minimum(idx, points.shape[0] - 1)]
        local = p[:, :3] - box[:3]
        c, s = jnp.cos(box[6]), jnp.sin(box[6])
        lx = local[:, 0] * c + local[:, 1] * s
        ly = -local[:, 0] * s + local[:, 1] * c
        feats = jnp.concatenate(
            [lx[:, None], ly[:, None], local[:, 2:3], p[:, 3:4]], axis=-1
        )
        return feats * ok[:, None], ok

    return jax.vmap(one_box)(boxes, take.T)


# ---------------------------------------------------------------------------
# Training losses (reference `get_cls_targets`/`get_reg_targets`/`get_loss`)
# ---------------------------------------------------------------------------

def smooth_l1(diff: jax.Array, beta: float) -> jax.Array:
    """Reference `WeightedSmoothL1Loss.smooth_l1_loss` (losses.py:34-41)."""
    n = jnp.abs(diff)
    if beta < 1e-5:
        return n
    return jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)


def encode_boxes(gt: jax.Array, anchors: jax.Array) -> jax.Array:
    """ResidualCoder encode — exact inverse of the reference's
    `decode_torch` (losses.py:132-159): center offsets normalized by the
    BEV diagonal (z by height), log dims, yaw delta."""
    xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, -1)
    xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(gt[..., :7], 7, -1)
    dxa = jnp.maximum(dxa, 1e-3)
    dya = jnp.maximum(dya, 1e-3)
    dza = jnp.maximum(dza, 1e-3)
    diag = jnp.sqrt(dxa**2 + dya**2)
    return jnp.concatenate(
        [
            (xg - xa) / diag, (yg - ya) / diag, (zg - za) / dza,
            jnp.log(jnp.maximum(dxg, 1e-3) / dxa),
            jnp.log(jnp.maximum(dyg, 1e-3) / dya),
            jnp.log(jnp.maximum(dzg, 1e-3) / dza),
            rg - ra,
        ],
        axis=-1,
    )


def decode_boxes(enc: jax.Array, anchors: jax.Array) -> jax.Array:
    """Reference `decode_torch` (losses.py:132-159)."""
    xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors[..., :7], 7, -1)
    xt, yt, zt, dxt, dyt, dzt, rt = jnp.split(enc[..., :7], 7, -1)
    diag = jnp.sqrt(dxa**2 + dya**2)
    return jnp.concatenate(
        [
            xt * diag + xa, yt * diag + ya, zt * dza + za,
            jnp.exp(dxt) * dxa, jnp.exp(dyt) * dya, jnp.exp(dzt) * dza,
            rt + ra,
        ],
        axis=-1,
    )


def corner_loss_lidar(pred7: jax.Array, gt7: jax.Array) -> jax.Array:
    """[N, 7] × [N, 7] → [N]: per-corner distance to GT (min over the
    yaw-flipped GT), smooth-L1 at beta=1, mean over the 8 corners
    (reference `get_corner_loss_lidar`, losses.py:79-103)."""
    from efg_tpu.geometry import box_ops_jnp as G3

    pc = G3.boxes_to_corners_3d(pred7)
    gc = G3.boxes_to_corners_3d(gt7)
    gt_flip = gt7.at[..., 6].add(jnp.pi)
    gcf = G3.boxes_to_corners_3d(gt_flip)
    d = jnp.minimum(
        jnp.linalg.norm(pc - gc, axis=-1), jnp.linalg.norm(pc - gcf, axis=-1)
    )
    return smooth_l1(d, 1.0).mean(axis=-1)


def corner_loss(point_reg: jax.Array, rois: jax.Array, gt: jax.Array) -> jax.Array:
    """[N] per-box corner loss of the DECODED refinement (reference
    `get_corner_loss`, losses.py:106-129): decode in the roi-local frame
    (anchors with xyz zeroed), rotate the decoded center by the roi yaw,
    translate by the roi center, then corner distance to GT."""
    from efg_tpu.geometry import box_ops_jnp as G3

    anchors0 = jnp.concatenate([jnp.zeros_like(rois[:, :3]), rois[:, 3:7]], -1)
    local = decode_boxes(point_reg[:, :7], anchors0)
    rot = G3.rotate_points_along_z(local[:, None, :], rois[:, 6])[:, 0]
    dec = jnp.concatenate([rot[:, :3] + rois[:, :3], rot[:, 3:]], axis=-1)
    return corner_loss_lidar(dec, gt[:, :7])


def compute_loss(
    outputs: Dict[str, jax.Array],
    hyp_boxes: jax.Array,   # [N, 7]
    gt_boxes: jax.Array,    # [G, 7]
    gt_mask: jax.Array,     # [G]
    valid: jax.Array,       # [N]
    *,
    iou_lo: float = 0.3,
    iou_hi: float = 0.7,
) -> Dict[str, jax.Array]:
    """Confidence target = clipped/scaled best IoU against GT (reference
    `get_iou_labels`, `trajectoryformer.py:847-858`); regression on
    hypotheses with IoU > hi: smooth-L1 (beta=1/9) on the ResidualCoder
    encoding + decoded corner loss, the reference `get_loss` composition
    (`trajectoryformer.py:929-972`)."""
    iou = iou_bev(hyp_boxes, gt_boxes)  # [N, G]
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    best = iou.max(axis=1)
    match = iou.argmax(axis=1)
    cls_tgt = jnp.clip((best - iou_lo) / (iou_hi - iou_lo), 0.0, 1.0)

    logits = outputs["scores"]
    bce = jnp.maximum(logits, 0) - logits * cls_tgt + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    vf = valid.astype(jnp.float32)
    loss_cls = (bce * vf).sum() / jnp.maximum(vf.sum(), 1.0)

    matched_gt = gt_boxes[match]
    residual = encode_boxes(matched_gt[:, :7], hyp_boxes[:, :7])
    pos = (best > iou_hi) & valid
    pf = pos.astype(jnp.float32)
    n_pos = jnp.maximum(pf.sum(), 1.0)
    per = smooth_l1(outputs["refine"] - residual, 1.0 / 9.0)
    loss_reg = (per * pf[:, None]).sum() / n_pos
    loss_corner = (
        corner_loss(outputs["refine"], hyp_boxes[:, :7], matched_gt[:, :7]) * pf
    ).sum() / n_pos
    loss_reg = loss_reg + loss_corner

    return dict(
        loss_cls=loss_cls, loss_reg=loss_reg, loss=loss_cls + loss_reg,
        num_pos=pos.sum().astype(jnp.float32),
    )


def apply_refinement(hyp_boxes: jax.Array, refine: jax.Array) -> jax.Array:
    """Decode the refinement exactly as the corner loss does (reference
    `get_corner_loss` decode path / `generate_refined_boxes`): roi-local
    decode, rotate the decoded center by the roi yaw, translate."""
    from efg_tpu.geometry import box_ops_jnp as G3

    hyp7 = hyp_boxes[:, :7]
    anchors0 = jnp.concatenate([jnp.zeros_like(hyp7[:, :3]), hyp7[:, 3:7]], -1)
    local = decode_boxes(refine[:, :7], anchors0)
    rot = G3.rotate_points_along_z(local[:, None, :], hyp7[:, 6])[:, 0]
    return jnp.concatenate([rot[:, :3] + hyp7[:, :3], rot[:, 3:]], axis=-1)


class TrajectoryFormerDet(nn.Module):
    """Batched detection-hypothesis wrapper: crops point features around
    the per-frame detection boxes and scores/refines them — the training
    form of the model (hypothesis augmentation happens upstream in the
    reference, `trajectoryformer.py:456-525`)."""

    d_model: int = 256
    num_layers: int = 3
    num_points: int = 128
    history: int = 10

    @nn.compact
    def __call__(self, points, points_mask, det_boxes, det_mask, train: bool):
        """points [B, Np, C], det_boxes [B, N, 7+] → per-batch outputs."""
        core = TrajectoryFormer(
            self.d_model, self.num_layers, self.num_points, self.history,
            name="core",
        )
        b, n = det_boxes.shape[:2]
        boxes7 = jnp.concatenate([det_boxes[..., :6], det_boxes[..., -1:]], -1)

        def one(pts, pm, bx, dm):
            hp, hm = crop_hypothesis_points(pts, pm, bx, num_points=self.num_points)
            traj = jnp.zeros((n, self.history, 8), pts.dtype)
            traj_mask = jnp.zeros((n, self.history), bool)
            return core(
                hp, hm, traj, traj_mask, bx,
                group_ids=jnp.arange(n), valid=dm, train=train,
            )

        return jax.vmap(one)(points, points_mask, boxes7, det_mask)


def det_compute_loss(outputs, batch):
    """Batched IoU-target loss for the detection-hypothesis wrapper."""
    det7 = jnp.concatenate([batch["det_boxes"][..., :6], batch["det_boxes"][..., -1:]], -1)
    gt7 = jnp.concatenate([batch["gt_boxes"][..., :6], batch["gt_boxes"][..., -1:]], -1)

    losses = jax.vmap(
        lambda o, hb, gb, gm, v: compute_loss(o, hb, gb, gm, v)
    )(outputs, det7, gt7, batch["gt_mask"], batch["det_mask"])
    out = {k: v.mean() for k, v in losses.items()}
    return out


def det_predict(outputs, batch):
    """Refined + rescored detections for the tracking evaluator."""
    det = batch["det_boxes"]
    det7 = jnp.concatenate([det[..., :6], det[..., -1:]], -1)
    refined = jax.vmap(apply_refinement)(det7, outputs["refine"])
    scores = jax.nn.sigmoid(outputs["scores"])
    boxes9 = jnp.concatenate(
        [refined[..., :6], det[..., 6:8], refined[..., 6:7]], -1
    )
    return dict(
        box3d=boxes9,
        scores=scores * batch["det_mask"],
        labels=jnp.where(batch["det_mask"], batch["gt_classes"], 0),
        valid=batch["det_mask"],
    )


# ---------------------------------------------------------------------------
# Motion-prediction pretraining (reference `trajectoryformer.motionpred`:
# `motionpred.py` — MotionEncoder trained to predict future box centers;
# the tracking model then loads this encoder, `config.yaml
# dataset.motion_model`)
# ---------------------------------------------------------------------------


class MotionPrediction(nn.Module):
    """Pretrain regime: encode each object's history trajectory and predict
    its future center offsets (reference `MotionPrediction.velboxembed`:
    `MotionEncoder(input_dim, hidden, out_channels=num_future*3)`).

    The encoder submodule is named `motion_encoder` so its parameters graft
    directly into `TrajectoryFormer.core.motion_encoder` at handoff.
    """

    d_model: int = 128
    num_future: int = 10

    @nn.compact
    def __call__(self, traj, traj_mask, train: bool = True):
        """traj [B, N, T, 8] history boxes (current-relative), traj_mask
        [B, N, T] → future center offsets [B, N, F, 3]."""
        b, n = traj.shape[:2]
        enc = MotionEncoder(self.d_model, name="motion_encoder")
        feat = enc(traj.reshape(b * n, *traj.shape[2:]), traj_mask.reshape(b * n, -1))
        out = nn.Dense(self.num_future * 3, name="future_head",
                       kernel_init=nn.initializers.zeros)(jax.nn.relu(feat))
        return out.reshape(b, n, self.num_future, 3)


def motion_compute_loss(pred_future, batch):
    """Smooth-L1 on future center offsets (reference `WeightedSmoothL1Loss`
    in `motionpred.py`), masked over valid (object, step) slots."""
    tgt = batch["future_offsets"]  # [B, N, F, 3]
    mask = batch["future_mask"][..., None]  # [B, N, F, 1]
    diff = pred_future - tgt
    ad = jnp.abs(diff)
    sl1 = jnp.where(ad < 1.0, 0.5 * diff * diff, ad - 0.5)
    mf = mask.astype(jnp.float32)
    loss = (sl1 * mf).sum() / jnp.maximum(mf.sum() * 3, 1.0)
    return dict(loss=loss, loss_motion=loss)


def motion_predict(pred_future, batch):
    """Fixed-shape passthrough so the evaluator pipeline can run."""
    b, n = pred_future.shape[:2]
    return dict(
        box3d=jnp.zeros((b, n, 9), pred_future.dtype),
        scores=jnp.zeros((b, n)),
        labels=jnp.zeros((b, n), jnp.int32),
        valid=jnp.zeros((b, n), bool),
    )


def load_motion_encoder(params, ckpt_path: str):
    """Graft a pretrained motion encoder (from the motionpred pretrain
    checkpoint, reference `config.yaml dataset.motion_model`) into the
    tracking model's `core/motion_encoder` subtree. Returns new params."""
    import jax as _jax
    import orbax.checkpoint as ocp
    import os

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(ckpt_path))
    src = restored["params"]["motion_encoder"]
    params = _jax.tree.map(lambda x: x, params)  # copy
    tgt = params
    for k in ("core", "motion_encoder"):
        tgt = tgt[k]

    def graft(dst, s):
        for k, v in s.items():
            if isinstance(v, dict):
                graft(dst[k], v)
            else:
                assert dst[k].shape == v.shape, (k, dst[k].shape, v.shape)
                dst[k] = v

    graft(tgt, src)
    return params
