"""Mask2Former: universal segmentation (panoptic / instance / semantic).

TPU rebuild of the reference experiment (`playground/panoptic_seg/coco/
mask2former/mask2former.pano_coco.res50.bs16.50e/`: `mask2former.py:18-344`,
`pixel_decoder/msdeformattn.py`, `transformer_decoder/
mask2former_transformer_decoder.py`, `criterion.py`, `matcher.py`):

- ResNet → MSDeformAttn pixel decoder (deformable encoder over the three
  low-res scales + FPN fuse up to 1/4) → per-pixel mask features
- masked-attention transformer decoder: Q learnable queries cycle through
  the three scales; cross-attention is masked to each query's current
  predicted mask region
- set criterion: Hungarian matching + class CE + point-sampled mask BCE +
  dice with PointRend importance sampling (top-k by uncertainty — fixed
  shapes, so fully jit-able; matcher costs still use a shared uniform
  point set, as the reference matcher does)

Fixed shapes throughout: static image size, G_max GT instances with masks
rasterized host-side, K sampled points.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from efg_tpu.modeling.backbones.resnet import ResNet
from efg_tpu.ops.matcher import hungarian_match
from efg_tpu.ops.ms_deform_attn import ms_deform_attn_sample

_xavier = nn.initializers.xavier_uniform()


from efg_tpu.modeling.backbones.fpn import PositionEmbeddingSine as PositionEmbeddingSine2D  # noqa: E402


class MSDeformAttnLayer(nn.Module):
    d_model: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    dim_feedforward: int = 1024

    @nn.compact
    def __call__(self, src, pos, shapes, ref_points):
        """src [B, L, C] flattened multi-scale; ref_points [L, 2] normalized."""
        b, l, c = src.shape
        q = src + pos
        off = nn.Dense(
            self.num_heads * self.num_levels * self.num_points * 2,
            kernel_init=nn.initializers.zeros, name="sampling_offsets",
        )(q).reshape(b, l, self.num_heads, self.num_levels, self.num_points, 2)
        attn = nn.Dense(
            self.num_heads * self.num_levels * self.num_points,
            kernel_init=nn.initializers.zeros, name="attention_weights",
        )(q).reshape(b, l, self.num_heads, self.num_levels * self.num_points)
        attn = jax.nn.softmax(attn, -1).reshape(
            b, l, self.num_heads, self.num_levels, self.num_points
        )
        value = nn.Dense(self.d_model, kernel_init=_xavier, name="value_proj")(src)

        # normalized sampling locations per level
        wh = jnp.asarray([[w, h] for (h, w) in shapes], jnp.float32)  # [NL, 2]
        loc = ref_points[None, :, None, None, None, :] + off / wh[None, None, None, :, None, :]

        def unflatten(x):
            outs, start = [], 0
            for h, w in shapes:
                outs.append(x[:, start : start + h * w].reshape(b, h, w, -1))
                start += h * w
            return outs

        sampled = ms_deform_attn_sample(
            unflatten(value), loc, attn, num_heads=self.num_heads
        )
        sampled = nn.Dense(self.d_model, kernel_init=_xavier, name="output_proj")(sampled)
        src = nn.LayerNorm(name="norm1")(src + sampled)
        ff = nn.Dense(self.d_model, name="linear2")(
            jax.nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(src))
        )
        return nn.LayerNorm(name="norm2")(src + ff)


class PixelDecoder(nn.Module):
    """MSDeformAttn encoder over res3-5 + FPN fuse to res2
    (reference `pixel_decoder/msdeformattn.py`)."""

    d_model: int = 256
    num_layers: int = 6
    mask_dim: int = 256

    @nn.compact
    def __call__(self, feats: Dict[str, jax.Array], train: bool):
        names = ["res3", "res4", "res5"]  # high→low res
        pos_enc = PositionEmbeddingSine2D(self.d_model // 2)
        levels, poss, shapes = [], [], []
        for f in names:
            x = nn.Conv(self.d_model, (1, 1), name=f"input_proj_{f}")(feats[f])
            x = nn.GroupNorm(num_groups=32, name=f"input_gn_{f}")(x)
            levels.append(x)
            poss.append(pos_enc(x))
            shapes.append(x.shape[1:3])
        b = levels[0].shape[0]
        src = jnp.concatenate([x.reshape(b, -1, self.d_model) for x in levels], 1)
        pos = jnp.concatenate([p.reshape(b, -1, self.d_model) for p in poss], 1)
        lvl_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (3, self.d_model)
        )
        offs = []
        for i, (h, w) in enumerate(shapes):
            offs.append(jnp.broadcast_to(lvl_embed[i], (h * w, self.d_model)))
        pos = pos + jnp.concatenate(offs, 0)[None]

        refs = []
        for h, w in shapes:
            ry, rx = jnp.meshgrid(
                (jnp.arange(h) + 0.5) / h, (jnp.arange(w) + 0.5) / w, indexing="ij"
            )
            refs.append(jnp.stack([rx.reshape(-1), ry.reshape(-1)], -1))
        ref_points = jnp.concatenate(refs, 0).astype(src.dtype)

        for i in range(self.num_layers):
            src = MSDeformAttnLayer(self.d_model, name=f"layer{i}")(src, pos, shapes, ref_points)

        outs, start = [], 0
        for h, w in shapes:
            outs.append(src[:, start : start + h * w].reshape(b, h, w, self.d_model))
            start += h * w

        # FPN fuse up to res2 → mask features at 1/4
        lat = nn.Conv(self.d_model, (1, 1), name="adapter_res2")(feats["res2"])
        lat = nn.GroupNorm(num_groups=32, name="adapter_gn")(lat)
        up = jax.image.resize(outs[0], lat.shape[:1] + lat.shape[1:3] + (self.d_model,), "nearest")
        y = lat + up
        y = nn.Conv(self.d_model, (3, 3), padding=1, name="fuse_res2")(y)
        y = jax.nn.relu(nn.GroupNorm(num_groups=32, name="fuse_gn")(y))
        mask_features = nn.Conv(self.mask_dim, (3, 3), padding=1, name="mask_features")(y)
        return mask_features, outs  # [B, H/4, W/4, D], 3 decoder scales


class DecoderLayerM2F(nn.Module):
    d_model: int = 256
    num_heads: int = 8
    dim_feedforward: int = 2048

    @nn.compact
    def __call__(self, queries, q_pos, memory, m_pos, attn_mask):
        """Masked cross-attn → self-attn → FFN (pre-order as reference)."""
        x = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, name="cross_attn"
        )(queries + q_pos, inputs_k=memory + m_pos, inputs_v=memory, mask=attn_mask)
        queries = nn.LayerNorm(name="norm1")(queries + x)
        x = nn.MultiHeadDotProductAttention(num_heads=self.num_heads, name="self_attn")(
            queries + q_pos, inputs_k=queries + q_pos, inputs_v=queries
        )
        queries = nn.LayerNorm(name="norm2")(queries + x)
        ff = nn.Dense(self.d_model, name="linear2")(
            jax.nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(queries))
        )
        return nn.LayerNorm(name="norm3")(queries + ff)


class Mask2Former(nn.Module):
    num_classes: int = 80
    num_queries: int = 100
    d_model: int = 256
    dec_layers: int = 9  # 3 rounds over 3 scales
    depth: int = 50
    freeze_at: int = 0
    mask_threshold_for_attn: float = 0.5
    backbone: str = "resnet"  # resnet | swin (reference D2SwinTransformer)
    swin_cfg: Any = ()  # kwargs for SwinTransformer (embed_dim, depths, ...)

    @nn.compact
    def __call__(self, images, train: bool) -> Dict[str, Any]:
        if self.backbone == "swin":
            from efg_tpu.modeling.backbones.swin import SwinTransformer

            feats = SwinTransformer(
                out_features=("res2", "res3", "res4", "res5"),
                name="backbone", **dict(self.swin_cfg),
            )(images, train)
        else:
            feats = ResNet(
                depth=self.depth, out_features=("res2", "res3", "res4", "res5"),
                freeze_at=self.freeze_at, name="backbone",
            )(images, train)
        mask_features, scales = PixelDecoder(
            self.d_model, mask_dim=self.d_model, name="pixel_decoder"
        )(feats, train)

        pos_enc = PositionEmbeddingSine2D(self.d_model // 2)
        b = images.shape[0]
        q = self.num_queries
        query_feat = self.param("query_feat", nn.initializers.normal(1.0), (q, self.d_model))
        query_embed = self.param("query_embed", nn.initializers.normal(1.0), (q, self.d_model))
        queries = jnp.broadcast_to(query_feat[None], (b, q, self.d_model))
        q_pos = jnp.broadcast_to(query_embed[None], (b, q, self.d_model))

        decoder_norm = nn.LayerNorm(name="decoder_norm")
        class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        mask_mlp = [
            nn.Dense(self.d_model, name="mask_embed0"),
            nn.Dense(self.d_model, name="mask_embed1"),
            nn.Dense(self.d_model, name="mask_embed2"),
        ]

        def predict_heads(x):
            x = decoder_norm(x)
            cls = class_embed(x)
            memb = x
            for lin in mask_mlp[:-1]:
                memb = jax.nn.relu(lin(memb))
            memb = mask_mlp[-1](memb)
            masks = jnp.einsum("bqc,bhwc->bqhw", memb, mask_features)
            return cls, masks

        all_cls, all_masks = [], []
        cls0, masks0 = predict_heads(queries)
        all_cls.append(cls0)
        all_masks.append(masks0)
        cur_masks = masks0

        # memory per scale (low→high res order res5, res4, res3)
        mems, mposs, mshapes = [], [], []
        for x in reversed(scales):  # scales is [res3, res4, res5]
            mems.append(x.reshape(b, -1, self.d_model))
            mposs.append(pos_enc(x).reshape(b, -1, self.d_model))
            mshapes.append(x.shape[1:3])

        for i in range(self.dec_layers):
            s = i % 3
            h, w = mshapes[s]
            # attention mask from current mask predictions (masked attention)
            am = jax.image.resize(cur_masks, (b, q, h, w), "bilinear")
            am = (jax.nn.sigmoid(am) > self.mask_threshold_for_attn).reshape(b, 1, q, h * w)
            # if a query's mask is empty, attend everywhere (reference guard)
            empty = ~am.any(axis=-1, keepdims=True)
            am = am | empty
            queries = DecoderLayerM2F(self.d_model, name=f"dec{i}")(
                queries, q_pos, mems[s], mposs[s], am
            )
            cls_i, masks_i = predict_heads(queries)
            all_cls.append(cls_i)
            all_masks.append(masks_i)
            cur_masks = masks_i

        return dict(
            cls_logits=jnp.stack(all_cls),    # [D+1, B, Q, C+1]
            mask_logits=jnp.stack(all_masks),  # [D+1, B, Q, H/4, W/4]
        )


# ---------------------------------------------------------------------------
# Criterion (reference `criterion.py` + `matcher.py`)
# ---------------------------------------------------------------------------

def _sample_points(masks, points_xy):
    """masks [..., H, W], points [K, 2] normalized (x, y) → [..., K]
    (bilinear, align_corners=False as the reference `point_sample` =
    `grid_sample(2p-1, padding_mode="zeros")`: taps outside the grid
    contribute ZERO, so values fade at the half-pixel border)."""
    h, w = masks.shape[-2:]
    gx = points_xy[:, 0] * w - 0.5
    gy = points_xy[:, 1] * h - 0.5
    x0, y0 = jnp.floor(gx), jnp.floor(gy)
    out = 0.0
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi, yi = x0 + dx, y0 + dy
        wgt = (1 - jnp.abs(gx - xi)) * (1 - jnp.abs(gy - yi))
        wgt = wgt * ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        out = out + masks[..., yi, xi] * wgt
    return out


def uncertainty_point_coords(
    rng: jax.Array,
    coarse_logits: jax.Array,  # [..., H, W] per-pair predicted mask logits
    *,
    num_points: int,
    oversample_ratio: float,
    importance_sample_ratio: float,
    cand: jax.Array | None = None,
    rand_points: jax.Array | None = None,
):
    """PointRend-style importance sampling, fixed shapes (reference
    `criterion.get_uncertain_point_coords_with_randomness`): draw
    num_points·oversample uniform candidates, keep the top
    importance_ratio·num_points by uncertainty −|logit| of the SAMPLED
    prediction, top up with fresh uniform points. Returns [..., P, 2].

    `cand` / `rand_points` override the drawn candidate and top-up point
    sets (deterministic parity tests against the torch reference)."""
    lead = coarse_logits.shape[:-2]
    n_over = int(num_points * oversample_ratio)
    n_imp = int(num_points * importance_sample_ratio)
    n_rand = num_points - n_imp
    r1, r2 = jax.random.split(rng)
    if cand is None:
        cand = jax.random.uniform(r1, lead + (n_over, 2))

    def sample_one(m, c):
        return _sample_points(m, c)

    flat_masks = coarse_logits.reshape((-1,) + coarse_logits.shape[-2:])
    flat_cand = cand.reshape(-1, n_over, 2)
    logits = jax.vmap(sample_one)(flat_masks, flat_cand)  # [N, n_over]
    unc = -jnp.abs(logits)
    idx = jax.lax.top_k(unc, n_imp)[1]  # [N, n_imp]
    imp = jnp.take_along_axis(flat_cand, idx[..., None], axis=1)
    if n_rand > 0:
        if rand_points is None:
            rnd = jax.random.uniform(r2, (flat_cand.shape[0], n_rand, 2))
        else:
            rnd = rand_points.reshape(-1, n_rand, 2)
        out = jnp.concatenate([imp, rnd], axis=1)
    else:
        out = imp
    return out.reshape(lead + (num_points, 2))


def _bce_logits(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _dice_loss(inputs, targets, eps=1.0):
    """inputs: sigmoided [..., K], targets [..., K]."""
    num = 2 * (inputs * targets).sum(-1)
    den = inputs.sum(-1) + targets.sum(-1)
    return 1 - (num + eps) / (den + eps)


def classification_loss(cls_logits, assign, ok, gt_cls, *, num_classes, no_obj):
    """Matched queries take the GT class, the rest no-object; weighted CE
    normalized by the weight sum (reference `SetCriterion.loss_labels` /
    `F.cross_entropy(..., weight=empty_weight)` semantics)."""
    a = jnp.where(ok, assign, 0)
    b, qn, _ = cls_logits.shape
    tgt_cls = jnp.full((b, qn), num_classes, jnp.int32)
    tgt_cls = tgt_cls.at[jnp.arange(b)[:, None], a].set(
        jnp.where(ok, gt_cls, num_classes)
    )
    weights = jnp.where(tgt_cls == num_classes, no_obj, 1.0)
    logp = jax.nn.log_softmax(cls_logits, -1)
    ce = -jnp.take_along_axis(logp, tgt_cls[..., None], -1)[..., 0]
    return (ce * weights).sum() / weights.sum()


def point_mask_losses(mp, gt_p, ok, *, num_points, num_boxes):
    """Point-sampled BCE + dice over matched pairs (reference
    `sigmoid_ce_loss` / `dice_loss`: per-pair point-mean BCE and dice,
    summed and divided by the GT count)."""
    okf = ok[..., None].astype(mp.dtype)
    loss_bce = (_bce_logits(mp, gt_p) * okf).sum() / (num_points * num_boxes)
    loss_dice = (
        _dice_loss(jax.nn.sigmoid(mp), gt_p) * ok.astype(mp.dtype)
    ).sum() / num_boxes
    return loss_bce, loss_dice


def matcher_cost(prob, pred_pts, gt_cls, gt_pts, gt_ok, *,
                 w_ce, w_bce, w_dice, num_points):
    """Per-image Hungarian cost [Q, G] (reference `matcher.py:118-158`):
    −softmax class prob at the GT class + per-point-mean BCE + dice over a
    shared point set; invalid GT columns get a large sentinel cost."""
    cost_cls = -prob[:, gt_cls]  # [Q, G]
    bce_pos = _bce_logits(pred_pts, jnp.ones_like(pred_pts))  # [Q, K]
    bce_neg = _bce_logits(pred_pts, jnp.zeros_like(pred_pts))
    cost_bce = (bce_pos @ gt_pts.T + bce_neg @ (1 - gt_pts).T) / num_points
    sig = jax.nn.sigmoid(pred_pts)
    num = 2 * (sig @ gt_pts.T)
    den = sig.sum(-1, keepdims=True) + gt_pts.sum(-1)[None, :]
    cost_dice = 1 - (num + 1) / (den + 1)
    c = w_ce * cost_cls + w_bce * cost_bce + w_dice * cost_dice
    return jnp.where(gt_ok[None, :], c, 1e8)


def compute_loss(
    preds: Dict[str, Any],
    batch: Dict[str, Any],
    *,
    model_cfg: Dict[str, Any],
    rng: jax.Array | None = None,
) -> Dict[str, jax.Array]:
    """batch: gt_masks [B, G, H/4, W/4] float (already at mask scale),
    gt_classes_seg [B, G] 0-based, gt_mask_valid [B, G]."""
    num_classes = model_cfg["num_classes"]
    num_points = model_cfg.get("num_points", 4096)
    w_ce = model_cfg.get("class_weight", 2.0)
    w_bce = model_cfg.get("mask_weight", 5.0)
    w_dice = model_cfg.get("dice_weight", 5.0)
    no_obj = model_cfg.get("no_object_weight", 0.1)

    gt_masks = batch["gt_masks"]
    gt_cls = batch["gt_classes_seg"]
    gt_ok = batch["gt_mask_valid"]
    num_boxes = jnp.maximum(gt_ok.sum().astype(jnp.float32), 1.0)

    rng = rng if rng is not None else jax.random.key(0)
    pts = jax.random.uniform(rng, (num_points, 2))

    gt_pts = jax.vmap(lambda m: _sample_points(m, pts))(gt_masks)  # [B, G, K]

    losses: Dict[str, jax.Array] = {}
    d = preds["cls_logits"].shape[0]
    for li in range(d):
        cls_logits = preds["cls_logits"][li]     # [B, Q, C+1]
        mask_logits = preds["mask_logits"][li]   # [B, Q, h, w]
        pred_pts = jax.vmap(lambda m: _sample_points(m, pts))(mask_logits)  # [B, Q, K]

        # matcher cost
        prob = jax.nn.softmax(cls_logits, -1)
        cost = jax.vmap(
            lambda pb, pp, tc, tp, tm: matcher_cost(
                pb, pp, tc, tp, tm, w_ce=w_ce, w_bce=w_bce, w_dice=w_dice,
                num_points=num_points,
            )
        )(prob, pred_pts, gt_cls, gt_pts, gt_ok)
        assign = hungarian_match(cost, gt_ok)  # [B, G]
        ok = assign >= 0
        a = jnp.where(ok, assign, 0)

        loss_ce = classification_loss(
            cls_logits, assign, ok, gt_cls, num_classes=num_classes, no_obj=no_obj
        )

        # importance-sampled point set per matched pair (reference
        # `loss_masks` + `get_uncertain_point_coords_with_randomness`)
        matched = jnp.take_along_axis(
            mask_logits, a[..., None, None], axis=1
        )  # [B, G, h, w]
        coords = uncertainty_point_coords(
            jax.random.fold_in(rng, li + 1), matched,
            num_points=num_points,
            oversample_ratio=model_cfg.get("oversample_ratio", 3.0),
            importance_sample_ratio=model_cfg.get("importance_sample_ratio", 0.75),
        )  # [B, G, K, 2]
        coords = jax.lax.stop_gradient(coords)
        mp = jax.vmap(jax.vmap(_sample_points))(matched, coords)  # [B, G, K]
        gt_p = jax.vmap(jax.vmap(_sample_points))(gt_masks, coords)
        gt_p = jax.lax.stop_gradient(gt_p)
        loss_bce, loss_dice = point_mask_losses(
            mp, gt_p, ok, num_points=num_points, num_boxes=num_boxes
        )

        sfx = "" if li == d - 1 else f"_{li}"
        losses[f"loss_ce{sfx}"] = w_ce * loss_ce
        losses[f"loss_mask{sfx}"] = w_bce * loss_bce
        losses[f"loss_dice{sfx}"] = w_dice * loss_dice

    losses["loss"] = sum(losses.values())
    return losses


def predict_instance(preds, *, model_cfg, top_k: int = 100):
    """Instance inference (reference `instance_inference`)."""
    num_classes = model_cfg["num_classes"]
    cls_logits = preds["cls_logits"][-1]
    mask_logits = preds["mask_logits"][-1]
    scores_all = jax.nn.softmax(cls_logits, -1)[..., :num_classes]  # [B, Q, C]
    b, qn, c = scores_all.shape
    flat = scores_all.reshape(b, qn * c)
    scores, idx = jax.lax.top_k(flat, min(top_k, qn * c))
    qidx = idx // c
    labels = idx % c
    masks = jnp.take_along_axis(
        mask_logits, qidx[:, :, None, None], axis=1
    )
    mask_bin = masks > 0
    # mask-quality rescoring (reference): score × mean mask prob inside mask
    mprob = jax.nn.sigmoid(masks)
    quality = (mprob * mask_bin).sum((-2, -1)) / jnp.maximum(mask_bin.sum((-2, -1)), 1)
    return dict(scores=scores * quality, labels=labels, masks=mask_bin,
                valid=jnp.ones_like(labels, bool))


def predict_panoptic(
    preds, *, model_cfg, object_mask_threshold: float = 0.8,
    overlap_threshold: float = 0.8,
):
    """Panoptic inference (reference `panoptic_inference`,
    `mask2former.py:258-318`): device computes the per-pixel winning query;
    returns (pan_seg [B, h, w] with ids = query index + 1 or 0 for void,
    keep_scores [B, Q], keep_labels [B, Q]) — the host assembles segment
    dicts (thing/stuff merge, area/overlap filtering) from these."""
    num_classes = model_cfg["num_classes"]
    cls_logits = preds["cls_logits"][-1]
    mask_logits = preds["mask_logits"][-1]
    probs = jax.nn.softmax(cls_logits, -1)
    scores = probs[..., :num_classes].max(-1)
    labels = probs[..., :num_classes].argmax(-1)
    keep = (labels != num_classes) & (scores > object_mask_threshold)

    mask_probs = jax.nn.sigmoid(mask_logits)  # [B, Q, h, w]
    weighted = mask_probs * jnp.where(keep, scores, 0.0)[:, :, None, None]
    winner = weighted.argmax(axis=1)  # [B, h, w]
    winner_prob = weighted.max(axis=1)
    # void where no confident mask or winning mask prob < 0.5
    win_mask_prob = jnp.take_along_axis(
        mask_probs, winner[:, None, :, :], axis=1
    )[:, 0]
    valid_px = (winner_prob > 0) & (win_mask_prob >= 0.5)
    pan_seg = jnp.where(valid_px, winner + 1, 0)

    # overlap filtering stat: fraction of each query's mask surviving
    orig_area = (mask_probs >= 0.5).sum((-2, -1))
    final_area = jax.vmap(
        lambda ps, q: (ps == q[:, None, None] + 1).sum((-2, -1))
    )(pan_seg, jnp.broadcast_to(jnp.arange(mask_probs.shape[1])[None], keep.shape))
    survive = final_area / jnp.maximum(orig_area, 1)
    keep = keep & (survive > overlap_threshold) & (final_area > 0)
    # pan_-prefixed keys so the dict can be merged with predict_instance
    # outputs for a combined instance+panoptic eval pass
    return dict(pan_seg=pan_seg, pan_scores=scores, pan_labels=labels, pan_keep=keep)


def predict_semantic(preds, *, model_cfg):
    """Semantic inference: softmax(cls) ⊗ sigmoid(mask) (reference
    `semantic_inference`)."""
    num_classes = model_cfg["num_classes"]
    cls_prob = jax.nn.softmax(preds["cls_logits"][-1], -1)[..., :num_classes]
    mask_prob = jax.nn.sigmoid(preds["mask_logits"][-1])
    return jnp.einsum("bqc,bqhw->bchw", cls_prob, mask_prob)
