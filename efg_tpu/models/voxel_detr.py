"""Voxel-DETR: sparse voxel backbone + box-attention DETR for 3D detection.

TPU rebuild of the reference experiment (`playground/detection.3d/waymo/
conquer/VoxelDETR.waymo.res18.p3.box_only_with_3cat.bs6.epoch6/`):
VoxelMeanVFE → SparseResNet18 + FPN (p3) → sine pos-enc → box-attention
encoder → top-k proposal head → decoder (MHA self-attn + rotated box
cross-attn) → per-layer detection heads, with focal + L1 + axis-aligned
GIoU3D + rad losses under Hungarian matching (`transformer.py`,
`heads.py`, `losses.py`, `modules/*`). Everything fixed-shape: G_max GT
slots, Q queries, matching via the host-callback matcher.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from efg_tpu.geometry.box_ops_jnp import aligned_giou_3d, limit_period
from efg_tpu.modeling.backbones.fpn import FPN, PositionEmbeddingSine
from efg_tpu.modeling.backbones.sparse_resnet import SparseResNet
from efg_tpu.modeling.readers.voxel_reader import dynamic_mean_vfe
from efg_tpu.ops import box_attention as BA
from efg_tpu.ops.matcher import hungarian_match

_xavier = nn.initializers.xavier_uniform()


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, 0, 1)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1 - x, eps, None))


# ---------------------------------------------------------------------------
# Box coder (reference `modules/box_coder.py` VoxelBoxCoder3D)
# ---------------------------------------------------------------------------

class VoxelBoxCoder3D:
    def __init__(self, voxel_size, pc_range, z_normalizer: float = 10.0):
        self.pc_range = np.asarray(pc_range, np.float32)
        self.pc_size = self.pc_range[3:] - self.pc_range[:3]
        self.z = z_normalizer

    def encode(self, gt_boxes9):
        """[..., 9] raw (x,y,z,dx,dy,dz,vx,vy,yaw) → [..., 7] normalized."""
        x = (gt_boxes9[..., 0] - self.pc_range[0]) / self.pc_size[0]
        y = (gt_boxes9[..., 1] - self.pc_range[1]) / self.pc_size[1]
        z = (gt_boxes9[..., 2] + self.z) / (2 * self.z)
        l = gt_boxes9[..., 3] / self.pc_size[0]
        w = gt_boxes9[..., 4] / self.pc_size[1]
        h = gt_boxes9[..., 5] / (2 * self.z)
        rad = limit_period(gt_boxes9[..., 8], offset=0.5, period=2 * np.pi)
        rad = (rad + np.pi) / (2 * np.pi)
        return jnp.stack([x, y, z, l, w, h, rad], axis=-1)

    def decode(self, boxes7):
        x = boxes7[..., 0] * self.pc_size[0] + self.pc_range[0]
        y = boxes7[..., 1] * self.pc_size[1] + self.pc_range[1]
        z = boxes7[..., 2] * 2 * self.z - self.z
        l = boxes7[..., 3] * self.pc_size[0]
        w = boxes7[..., 4] * self.pc_size[1]
        h = boxes7[..., 5] * 2 * self.z
        rad = boxes7[..., 6] * 2 * np.pi - np.pi
        return jnp.stack([x, y, z, l, w, h, rad], axis=-1)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class MLP(nn.Module):
    hidden_dim: int
    out_dim: int
    num_layers: int
    final_bias_init: float = 0.0
    zero_final: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = jax.nn.relu(nn.Dense(self.hidden_dim, name=f"fc{i}")(x))
        kernel_init = nn.initializers.zeros if self.zero_final else nn.initializers.lecun_normal()
        return nn.Dense(
            self.out_dim, name=f"fc{self.num_layers - 1}",
            kernel_init=kernel_init,
            bias_init=nn.initializers.constant(self.final_bias_init),
        )(x)


class Box3dAttention(nn.Module):
    """Rotated-box sampling attention (reference `modules/box_attention.py`)."""

    d_model: int
    num_level: int
    num_head: int
    with_rotation: bool = True
    kernel_size: int = 5
    # sampling backend: "sample" = exact per-point gathers (reference CUDA
    # semantics, memory-heavy on TPU); "dense" = window attention with each
    # query anchored at its own raster cell (encoder self-attn; shifted
    # slices, no gathers); "gather" = window attention around each query's
    # box center (decoder cross-attn; full-width patch rows). The window
    # backends bin bilinear taps into ±window_radius integer offsets
    # (see `ops/box_attention.py bin_window_coeffs`).
    backend: str = "sample"
    window_radius: int = 4

    @nn.compact
    def __call__(
        self,
        query: jax.Array,               # [B, L, C]
        value_levels: Sequence[jax.Array],  # list of [B, H, W, C]
        ref_windows: jax.Array,         # [B, L, 7] normalized
    ) -> jax.Array:
        nv = 5 if self.with_rotation else 4
        p = self.kernel_size**2
        b, l, _ = query.shape

        off = nn.Dense(
            self.num_head * self.num_level * nv, name="linear_box",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.uniform(scale=1.0),
        )(query).reshape(b, l, self.num_head, self.num_level, nv)

        attn = nn.Dense(
            self.num_head * self.num_level * p, name="linear_attn",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(query).reshape(b, l, self.num_head, self.num_level * p)
        attn = jax.nn.softmax(attn, axis=-1).reshape(
            b, l, self.num_head, self.num_level, p
        )

        value_proj = nn.Dense(self.d_model, name="value_proj", kernel_init=_xavier)
        values = [value_proj(v) for v in value_levels]

        ref = ref_windows[:, :, None, None, :]  # [B, L, 1, 1, 7]
        ref_boxes = ref[..., jnp.array([0, 1, 3, 4])]
        ref_angles = ref[..., 6:7]
        if self.with_rotation:
            off_boxes, off_angles = off[..., :4], off[..., 4:5]
        else:
            off_boxes, off_angles = off[..., :4], None
        grids = BA.make_box_grids(
            ref_boxes, ref_angles, off_boxes, off_angles,
            BA.kernel_indices(self.kernel_size, query.dtype),
        )  # [B, L, NH, NL, P, 2]

        if self.backend != "sample" and self.num_level == 1:
            v = values[0]
            h, w = v.shape[1:3]
            base = jnp.stack(
                [
                    jnp.clip((ref_windows[..., 1] * h).astype(jnp.int32), 0, h - 1),
                    jnp.clip((ref_windows[..., 0] * w).astype(jnp.int32), 0, w - 1),
                ],
                axis=-1,
            )
            coeffs = BA.bin_window_coeffs(
                grids, attn, base, h, w, self.window_radius
            )
            if self.backend == "dense":
                out = BA.box_attention_window_dense_mxu(
                    v, coeffs, num_heads=self.num_head,
                    radius=self.window_radius,
                )
            else:
                out = BA.box_attention_window_gather(
                    v, coeffs, base, num_heads=self.num_head,
                    radius=self.window_radius,
                )
        else:
            out = BA.box_attention_sample(values, grids, attn, num_heads=self.num_head)
        return nn.Dense(self.d_model, name="out_proj", kernel_init=_xavier)(out)


class EncoderLayer(nn.Module):
    d_model: int
    num_head: int
    num_level: int
    dim_feedforward: int
    box_attn_backend: str = "window"  # "window" → dense (self-anchored)

    @nn.compact
    def __call__(self, src, pos, value_shapes, ref_windows, train: bool):
        def unflatten(x):
            outs, start = [], 0
            for h, w in value_shapes:
                outs.append(x[:, start : start + h * w].reshape(x.shape[0], h, w, -1))
                start += h * w
            return outs

        q = src + pos
        src2 = Box3dAttention(
            self.d_model, self.num_level, self.num_head, with_rotation=False,
            backend="dense" if self.box_attn_backend == "window" else "sample",
            window_radius=4, name="self_attn",
        )(q, unflatten(src), ref_windows)
        src = nn.LayerNorm(name="norm1")(src + src2)
        ff = nn.Dense(self.dim_feedforward, name="linear1")(src)
        ff = nn.Dense(self.d_model, name="linear2")(jax.nn.relu(ff))
        return nn.LayerNorm(name="norm2")(src + ff)


class DecoderLayer(nn.Module):
    d_model: int
    num_head: int
    num_level: int
    dim_feedforward: int
    box_attn_backend: str = "window"  # "window" → gather (box-anchored)

    @nn.compact
    def __call__(self, idx, query, memory_levels, ref_windows, train: bool, attn_mask=None):
        """ref_windows [B, Q, 10] (7 box + 3 probs); attn_mask [T, T] bool,
        True = may attend (flax convention; the reference uses the inverted
        torch convention)."""
        query_pos = MLP(self.d_model, self.d_model, 3, name="pos_embed")(ref_windows)
        if idx == 0:
            query = query_pos
            q = k = query
        else:
            q = k = query + query_pos
        mask = None if attn_mask is None else attn_mask[None, None]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_head, qkv_features=self.d_model, name="self_attn"
        )(q, inputs_k=k, inputs_v=query, mask=mask)
        query = nn.LayerNorm(name="norm1")(query + attn)

        cross = Box3dAttention(
            self.d_model, self.num_level, self.num_head, with_rotation=True,
            backend="gather" if self.box_attn_backend == "window" else "sample",
            window_radius=8, name="cross_attn",
        )(query + query_pos if idx > 0 else query, memory_levels, ref_windows[..., :7])
        query = nn.LayerNorm(name="norm2")(query + cross)

        ff = nn.Dense(self.dim_feedforward, name="linear1")(query)
        ff = nn.Dense(self.d_model, name="linear2")(jax.nn.relu(ff))
        return nn.LayerNorm(name="norm3")(query + ff)


class DetHead(nn.Module):
    """Per-layer class/box embed (reference `Det3DHead.forward`)."""

    hidden_dim: int
    num_classes: int

    @nn.compact
    def __call__(self, embed, anchors):
        prior = 0.01
        cls_logits = MLP(
            self.hidden_dim, self.num_classes, 3,
            final_bias_init=-math.log((1 - prior) / prior), name="class_embed",
        )(embed)
        delta = MLP(self.hidden_dim, 7, 3, zero_final=True, name="bbox_embed")(embed)
        boxes = jax.nn.sigmoid(delta + inverse_sigmoid(anchors))
        return cls_logits, boxes


class TransformerDecoder(nn.Module):
    """Decoder stack with per-layer detection heads and iterative ref-window
    refinement (reference `TransformerDecoder`, `transformer.py:206-238`).
    Standalone so ConQueR can run it a second time with EMA ("momentum")
    parameters over GT proposals (`transformer.py:83-89,134-200` in the
    ConQueR variant)."""

    hidden_dim: int
    num_head: int
    num_level: int
    dim_feedforward: int
    dec_layers: int
    num_classes: int

    @nn.compact
    def __call__(self, memory_levels, ref, train: bool, attn_mask=None):
        """ref [B, T, 10]; attn_mask [T, T] bool with True = attend allowed.
        Returns (logits [D, B, T, C], boxes [D, B, T, 7])."""
        b, t, _ = ref.shape
        query = jnp.zeros((b, t, self.hidden_dim), ref.dtype)
        all_logits, all_boxes = [], []
        for i in range(self.dec_layers):
            query = DecoderLayer(
                self.hidden_dim, self.num_head, self.num_level,
                self.dim_feedforward, name=f"dec{i}",
            )(i, query, memory_levels, ref, train, attn_mask=attn_mask)
            logits_i, boxes_i = DetHead(
                self.hidden_dim, self.num_classes, name=f"det_head{i}"
            )(query, ref[..., :7])
            all_logits.append(logits_i)
            all_boxes.append(boxes_i)
            new_probs = jax.nn.sigmoid(logits_i)
            ref = jnp.concatenate(
                [jax.lax.stop_gradient(boxes_i), jax.lax.stop_gradient(new_probs)],
                axis=-1,
            )
        return jnp.stack(all_logits), jnp.stack(all_boxes)


class VoxelDETR(nn.Module):
    """End-to-end model. Returns the raw pieces the loss/predict fns need.

    Optional `dn_ref` [B, P, 10] (noised GT proposals + one-hot scores) and
    `dn_attn_mask` [P+Q, P+Q] enable ConQueR's contrastive denoising
    queries (`cdn.py`)."""

    pc_range: Tuple[float, ...] = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    voxel_size: Tuple[float, ...] = (0.1, 0.1, 0.15)
    max_voxels: int = 120000
    num_input_features: int = 5
    resnet_caps: Sequence[int] = (80000, 60000, 30000, 15000)
    depth: int = 18
    out_features: Sequence[str] = ("res2", "res3", "res4")
    fpn_levels: Sequence[str] = ("p3",)
    hidden_dim: int = 256
    num_head: int = 8
    enc_layers: int = 3
    dec_layers: int = 3
    dim_feedforward: int = 1024
    num_queries: int = 300
    num_classes: int = 3

    def grid(self):
        return tuple(
            int(round((self.pc_range[i + 3] - self.pc_range[i]) / self.voxel_size[i]))
            for i in range(3)
        )

    def setup(self):
        self.decoder = TransformerDecoder(
            self.hidden_dim, self.num_head, len(self.fpn_levels),
            self.dim_feedforward, self.dec_layers, self.num_classes,
            name="decoder",
        )

    def run_decoder(self, memory_levels, ref, train: bool, attn_mask=None):
        """Public sub-forward: lets the train step re-run the decoder with
        EMA parameters on GT proposals (ConQueR momentum decoder)."""
        return self.decoder(memory_levels, ref, train, attn_mask=attn_mask)

    @nn.compact
    def __call__(
        self, points, points_mask, train: bool,
        dn_ref=None, dn_attn_mask=None,
    ) -> Dict[str, Any]:
        grid = self.grid()
        feats, coords, valid = dynamic_mean_vfe(
            points, points_mask,
            pc_range=self.pc_range, voxel_size=self.voxel_size,
            max_voxels=self.max_voxels,
            num_input_features=self.num_input_features,
        )
        feats = jax.lax.stop_gradient(feats)
        bev = SparseResNet(
            depth=self.depth,
            num_input_features=self.num_input_features,
            out_features=tuple(self.out_features),
            grid_size=grid,
            stage_caps=tuple(self.resnet_caps) + (self.resnet_caps[-1],),
            name="backbone",
        )(feats, coords, valid, train)
        fpn = FPN(in_features=tuple(self.out_features), out_channels=self.hidden_dim,
                  name="fpn")(bev, train)

        levels, pos_levels, shapes = [], [], []
        for lf in self.fpn_levels:
            x = fpn[lf]
            x = nn.Conv(self.hidden_dim, (1, 1), name=f"input_proj_{lf}",
                        kernel_init=_xavier)(x)
            x = nn.GroupNorm(num_groups=32, name=f"input_gn_{lf}")(x)
            pos = PositionEmbeddingSine(self.hidden_dim // 2)(x)
            levels.append(x)
            pos_levels.append(pos)
            shapes.append(x.shape[1:3])

        b = levels[0].shape[0]
        src = jnp.concatenate([x.reshape(b, -1, self.hidden_dim) for x in levels], axis=1)
        pos = jnp.concatenate([p.reshape(b, -1, self.hidden_dim) for p in pos_levels], axis=1)

        # per-pixel reference windows (reference `_create_ref_windows`)
        refs = []
        for h, w in shapes:
            ry, rx = jnp.meshgrid(
                (jnp.arange(h, dtype=src.dtype) + 0.5) / h,
                (jnp.arange(w, dtype=src.dtype) + 0.5) / w,
                indexing="ij",
            )
            rxy = jnp.stack([rx.reshape(-1), ry.reshape(-1)], axis=-1)
            wh = jnp.full_like(rxy, 0.025)
            half = jnp.full((h * w, 1), 0.5, src.dtype)
            zero = jnp.zeros((h * w, 1), src.dtype)
            refs.append(jnp.concatenate([rxy, half, wh, half, zero], axis=-1))
        ref_windows = jnp.broadcast_to(
            jnp.concatenate(refs, axis=0)[None], (b, src.shape[1], 7)
        )

        memory = src
        for i in range(self.enc_layers):
            memory = EncoderLayer(
                self.hidden_dim, self.num_head, len(self.fpn_levels),
                self.dim_feedforward, name=f"enc{i}",
            )(memory, pos, shapes, ref_windows, train)

        # proposal head (1-class) over all positions → top-k queries
        enc_logits, enc_boxes = DetHead(self.hidden_dim, 1, name="proposal_head")(
            memory, ref_windows
        )
        probs = jax.nn.sigmoid(enc_logits[..., 0])
        topk_probs, topk_idx = jax.lax.top_k(probs, self.num_queries)
        q_ref = jnp.take_along_axis(enc_boxes, topk_idx[..., None], axis=1)
        q_ref = jax.lax.stop_gradient(q_ref)
        probs3 = jax.lax.stop_gradient(
            jnp.repeat(topk_probs[..., None], 3, axis=-1)
        )
        dec_ref = jnp.concatenate([q_ref, probs3], axis=-1)  # [B, Q, 10]

        def unflatten(x):
            outs, start = [], 0
            for h, w in shapes:
                outs.append(x[:, start : start + h * w].reshape(b, h, w, -1))
                start += h * w
            return outs

        memory_levels = unflatten(memory)
        ref = dec_ref if dn_ref is None else jnp.concatenate([dn_ref, dec_ref], axis=1)
        all_logits, all_boxes = self.decoder(memory_levels, ref, train, attn_mask=dn_attn_mask)

        pad = 0 if dn_ref is None else dn_ref.shape[1]
        return dict(
            enc_logits=enc_logits,
            enc_boxes=enc_boxes,
            topk_idx=topk_idx,
            dec_logits=all_logits[:, :, pad:],   # [D, B, Q, C]
            dec_boxes=all_boxes[:, :, pad:],     # [D, B, Q, 7]
            dn_logits=all_logits[:, :, :pad] if pad else None,
            dn_boxes=all_boxes[:, :, :pad] if pad else None,
            memory_levels=memory_levels,
        )


# ---------------------------------------------------------------------------
# Losses (reference `losses.py` Det3DLoss + `modules/matcher.py`)
# ---------------------------------------------------------------------------

def _focal_cost_class(prob, labels, alpha=0.25, gamma=2.0):
    """prob [Q, C], labels [G] → [Q, G] focal class cost."""
    neg = (1 - alpha) * prob**gamma * (-jnp.log(1 - prob + 1e-8))
    pos = alpha * (1 - prob) ** gamma * (-jnp.log(prob + 1e-8))
    return (pos - neg)[:, labels]


def match_cost(pred_logits, pred_boxes, tgt_boxes, tgt_labels, tgt_mask, mw):
    """Single-sample cost matrix [Q, G] (reference matcher forward)."""
    prob = jax.nn.sigmoid(pred_logits)
    cost_class = _focal_cost_class(prob, tgt_labels)
    cost_bbox = jnp.abs(pred_boxes[:, None, :6] - tgt_boxes[None, :, :6]).sum(-1)
    cost_rad = jnp.abs(pred_boxes[:, None, 6] - tgt_boxes[None, :, 6])
    cost_giou = -aligned_giou_3d(pred_boxes, tgt_boxes)
    c = (
        mw["bbox"] * cost_bbox
        + mw["class"] * cost_class
        + mw["giou"] * cost_giou
        + mw["rad"] * cost_rad
    )
    return jnp.where(tgt_mask[None, :], c, 1e8)


def sigmoid_focal_loss(logits, targets, alpha=0.25, gamma=2.0):
    """Elementwise focal loss (reference `efg/modeling/losses/focal_loss.py:5`)."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss


def optax_sigmoid_ce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def detr_set_loss(
    pred_logits: jax.Array,  # [B, Q, C]
    pred_boxes: jax.Array,   # [B, Q, 7]
    tgt_boxes: jax.Array,    # [B, G, 7] normalized
    tgt_labels: jax.Array,   # [B, G] 0-based
    tgt_mask: jax.Array,     # [B, G]
    num_boxes: jax.Array,
    mw: Dict[str, float],
    *,
    full_logits: Optional[jax.Array] = None,  # [B, L, C] for the enc loss
    topk_idx: Optional[jax.Array] = None,     # [B, Q] positions in L
    assign: Optional[jax.Array] = None,       # precomputed [B, G] assignment
) -> Dict[str, jax.Array]:
    if assign is None:
        cost = jax.vmap(lambda lg, bx, tb, tl, tm: match_cost(lg, bx, tb, tl, tm, mw))(
            pred_logits, pred_boxes, tgt_boxes, tgt_labels, tgt_mask
        )
        assign = hungarian_match(cost, tgt_mask)  # [B, G] query idx or -1
    ok = assign >= 0
    a = jnp.where(ok, assign, 0)

    # classification: one-hot over (positions, classes)
    if full_logits is not None:
        cls_logits = full_logits
        pos_idx = jnp.take_along_axis(topk_idx, a, axis=1)  # [B, G] in L
    else:
        cls_logits = pred_logits
        pos_idx = a
    b, l, c = cls_logits.shape
    flat = (pos_idx * c + jnp.clip(tgt_labels, 0, c - 1))
    onehot = jnp.zeros((b, l * c + 1), cls_logits.dtype)
    onehot = onehot.at[
        jnp.arange(b)[:, None], jnp.where(ok, flat, l * c)
    ].set(1.0)[:, : l * c].reshape(b, l, c)
    loss_ce = sigmoid_focal_loss(cls_logits, onehot).sum() / num_boxes

    # regression on matched pairs
    pb = jnp.take_along_axis(pred_boxes, a[..., None], axis=1)  # [B, G, 7]
    okf = ok[..., None].astype(pred_boxes.dtype)
    loss_bbox = (jnp.abs(pb[..., :6] - tgt_boxes[..., :6]) * okf).sum() / num_boxes
    loss_rad = (jnp.abs(pb[..., 6:] - tgt_boxes[..., 6:]) * okf).sum() / num_boxes

    def giou_diag(pb_i, tb_i):
        return jnp.diagonal(aligned_giou_3d(pb_i, tb_i))

    giou = jax.vmap(giou_diag)(pb, tgt_boxes)  # [B, G]
    loss_giou = ((1 - giou) * ok.astype(giou.dtype)).sum() / num_boxes

    return {
        "loss_ce": mw["class"] * loss_ce,
        "loss_bbox": mw["bbox"] * loss_bbox,
        "loss_giou": mw["giou"] * loss_giou,
        "loss_rad": mw["rad"] * loss_rad,
    }


def compute_loss(preds: Dict[str, Any], batch: Dict[str, Any], *,
                 model_cfg: Dict[str, Any], return_assign: bool = False):
    coder = VoxelBoxCoder3D(model_cfg["voxel_size"], model_cfg["pc_range"])
    mw = model_cfg["loss_weights"]  # {"class": 1, "bbox": 4, "giou": 2, "rad": 4}

    tgt_boxes = coder.encode(batch["gt_boxes"])
    tgt_labels = jnp.clip(batch["gt_classes"] - 1, 0, None)
    tgt_mask = batch["gt_mask"]
    num_boxes = jnp.maximum(tgt_mask.sum().astype(jnp.float32), 1.0)

    # ONE batched Hungarian solve for every matched layer (enc + d decoder
    # levels, [(1+d)·B, Q, G]): the device matcher's augmenting-path while
    # loops are lane-parallel under vmap, so K stacked problems cost ~one
    # solve's wall time instead of K serial solves (~19 ms each in the r4
    # ConQueR device trace).
    enc_logits_q = jnp.take_along_axis(
        preds["enc_logits"], preds["topk_idx"][..., None], axis=1)
    enc_boxes_q = jnp.take_along_axis(
        preds["enc_boxes"], preds["topk_idx"][..., None], axis=1)
    bin_labels = jnp.zeros_like(tgt_labels)
    d = preds["dec_logits"].shape[0]
    layer_logits = [enc_logits_q] + [preds["dec_logits"][i] for i in range(d)]
    layer_boxes = [enc_boxes_q] + [preds["dec_boxes"][i] for i in range(d)]
    layer_labels = [bin_labels] + [tgt_labels] * d
    cost_all = jnp.concatenate([
        jax.vmap(lambda lg, bx, tb, tl, tm: match_cost(lg, bx, tb, tl, tm, mw))(
            lg, bx, tgt_boxes, ll, tgt_mask
        )
        for lg, bx, ll in zip(layer_logits, layer_boxes, layer_labels)
    ], axis=0)
    k = 1 + d
    b, g = tgt_mask.shape
    mask_all = jnp.tile(tgt_mask, (k, 1))
    assign_all = hungarian_match(cost_all, mask_all).reshape(k, b, g)

    losses: Dict[str, jax.Array] = {}
    # encoder (binary objectness) loss over the full map
    enc = detr_set_loss(
        enc_logits_q, enc_boxes_q,
        tgt_boxes, bin_labels, tgt_mask, num_boxes, mw,
        full_logits=preds["enc_logits"], topk_idx=preds["topk_idx"],
        assign=assign_all[0],
    )
    losses.update({k_ + "_enc": v for k_, v in enc.items()})

    for i in range(d):
        li = detr_set_loss(
            preds["dec_logits"][i], preds["dec_boxes"][i],
            tgt_boxes, tgt_labels, tgt_mask, num_boxes, mw,
            assign=assign_all[1 + i],
        )
        suffix = "" if i == d - 1 else f"_{i}"
        losses.update({k_ + suffix: v for k_, v in li.items()})

    losses["loss"] = sum(losses.values())
    if return_assign:
        return losses, assign_all[-1]
    return losses


def predict(preds: Dict[str, Any], *, model_cfg: Dict[str, Any], top_k: int = 300):
    """Top-300 over Q×C sigmoid scores, decoded (reference eval path,
    `voxel_detr.py:171-199`)."""
    coder = VoxelBoxCoder3D(model_cfg["voxel_size"], model_cfg["pc_range"])
    logits = preds["dec_logits"][-1]  # [B, Q, C]
    boxes = coder.decode(preds["dec_boxes"][-1])  # [B, Q, 7]
    b, q, c = logits.shape
    prob = jax.nn.sigmoid(logits).reshape(b, q * c)
    scores, idx = jax.lax.top_k(prob, min(top_k, q * c))
    qidx = idx // c
    labels = idx % c + 1
    out_boxes = jnp.take_along_axis(boxes, qidx[..., None], axis=1)
    return dict(
        box3d=out_boxes,
        scores=scores,
        labels=labels,
        valid=jnp.ones_like(labels, bool),
    )
