"""Self-contained numpy COCO detection evaluation.

Replacement for pycocotools + the reference's C++ `COCOeval_opt`
(`efg/evaluator/fast_eval_api.py`, `src/cocoeval/cocoeval.cpp`) — neither
is available here. Implements the standard COCO protocol: 10 IoU
thresholds (.5:.05:.95), 101-point precision interpolation, area ranges
(all/small/medium/large), maxDets 100, greedy per-image matching with
crowd regions treated as ignore.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


def iou_xyxy_np(a: np.ndarray, b: np.ndarray, iscrowd=None) -> np.ndarray:
    if a.shape[0] == 0 or b.shape[0] == 0:
        return np.zeros((a.shape[0], b.shape[0]))
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    union = area_a[:, None] + area_b[None, :] - inter
    if iscrowd is not None:
        # crowd: IoU is intersection over det area (pycocotools semantics)
        union = np.where(iscrowd[None, :], area_a[:, None], union)
    return inter / np.maximum(union, 1e-9)


def _match_image(det_boxes, det_scores, gt_boxes, gt_ignore, iou_thrs):
    """Greedy score-ordered matching. Returns (tp [T, D], ignore_det [T, D])
    with det order = score-descending."""
    order = np.argsort(-det_scores)
    det_boxes = det_boxes[order]
    d, g = len(det_boxes), len(gt_boxes)
    t = len(iou_thrs)
    tp = np.zeros((t, d), bool)
    ign = np.zeros((t, d), bool)
    if g:
        iou = iou_xyxy_np(det_boxes, gt_boxes, iscrowd=gt_ignore)
        # non-ignored first (pycocotools sorts gt by ignore flag)
        gt_order = np.argsort(gt_ignore.astype(np.int8), kind="stable")
        for ti, thr in enumerate(iou_thrs):
            taken = np.zeros(g, bool)
            for di in range(d):
                best, best_iou = -1, min(thr, 1 - 1e-10)
                for gi in gt_order:
                    if taken[gi] and not gt_ignore[gi]:
                        continue
                    if best > -1 and not gt_ignore[best] and gt_ignore[gi]:
                        break  # can't beat a real match with an ignore
                    if iou[di, gi] < best_iou:
                        continue
                    best, best_iou = gi, iou[di, gi]
                if best == -1:
                    continue
                if gt_ignore[best]:
                    ign[ti, di] = True
                else:
                    taken[best] = True
                    tp[ti, di] = True
    return tp, ign, order


class COCOEvalNP:
    """Accumulate per-(image, category) detections and compute COCO APs."""

    def __init__(self, max_dets: int = 100):
        self.max_dets = max_dets
        # frames[(cat)] = list of per-image dicts
        self.frames: Dict[int, List[dict]] = defaultdict(list)

    def add_image(self, cat_id: int, det_boxes, det_scores, gt_boxes, gt_iscrowd, gt_areas):
        self.frames[cat_id].append(
            dict(
                det_boxes=np.asarray(det_boxes, np.float64).reshape(-1, 4),
                det_scores=np.asarray(det_scores, np.float64).reshape(-1),
                gt_boxes=np.asarray(gt_boxes, np.float64).reshape(-1, 4),
                gt_iscrowd=np.asarray(gt_iscrowd, bool).reshape(-1),
                gt_areas=np.asarray(gt_areas, np.float64).reshape(-1),
            )
        )

    def _ap_for(self, cat_frames, area_rng) -> np.ndarray:
        """[T] AP per IoU threshold for one category + area range."""
        t = len(IOU_THRS)
        scores_all, tp_all, ign_all = [], [], []
        num_gt = 0
        for f in cat_frames:
            det = f["det_boxes"][: self.max_dets * 4]
            sc = f["det_scores"][: self.max_dets * 4]
            order0 = np.argsort(-sc)[: self.max_dets]
            det, sc = det[order0], sc[order0]

            g_area = f["gt_areas"]
            if g_area.size == 0:
                g_area = (
                    np.clip(f["gt_boxes"][:, 2] - f["gt_boxes"][:, 0], 0, None)
                    * np.clip(f["gt_boxes"][:, 3] - f["gt_boxes"][:, 1], 0, None)
                )
            gt_ignore = f["gt_iscrowd"] | (g_area < area_rng[0]) | (g_area >= area_rng[1])
            num_gt += int((~gt_ignore).sum())

            d_area = np.clip(det[:, 2] - det[:, 0], 0, None) * np.clip(det[:, 3] - det[:, 1], 0, None)
            tp, ign, order = _match_image(det, sc, f["gt_boxes"], gt_ignore, IOU_THRS)
            # dets outside the area range that didn't match a real GT → ignore
            out_of_rng = (d_area[order] < area_rng[0]) | (d_area[order] >= area_rng[1])
            ign = ign | (out_of_rng[None, :] & ~tp)
            scores_all.append(sc[order])
            tp_all.append(tp)
            ign_all.append(ign)

        if num_gt == 0:
            return np.full(t, np.nan)
        if not scores_all:
            return np.zeros(t)
        scores = np.concatenate(scores_all)
        tp = np.concatenate(tp_all, axis=1)
        ign = np.concatenate(ign_all, axis=1)
        order = np.argsort(-scores)
        tp, ign = tp[:, order], ign[:, order]

        aps = np.zeros(t)
        for ti in range(t):
            keep = ~ign[ti]
            tps = tp[ti][keep]
            tp_cum = np.cumsum(tps)
            fp_cum = np.cumsum(~tps)
            recall = tp_cum / num_gt
            precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
            # precision envelope + 101-point interpolation
            precision = np.maximum.accumulate(precision[::-1])[::-1]
            idx = np.searchsorted(recall, REC_THRS, side="left")
            prec_at = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
            prec_at[idx >= len(precision)] = 0.0
            aps[ti] = prec_at.mean()
        return aps

    def summarize(self) -> Dict[str, float]:
        cats = sorted(self.frames.keys())
        per_cat = {
            rng: np.stack([self._ap_for(self.frames[c], AREA_RNGS[rng]) for c in cats])
            for rng in AREA_RNGS
        }  # [C, T]
        out = {}
        all_ap = per_cat["all"]
        out["AP"] = float(np.nanmean(all_ap))
        out["AP50"] = float(np.nanmean(all_ap[:, 0]))
        out["AP75"] = float(np.nanmean(all_ap[:, 5]))
        out["APs"] = float(np.nanmean(per_cat["small"]))
        out["APm"] = float(np.nanmean(per_cat["medium"]))
        out["APl"] = float(np.nanmean(per_cat["large"]))
        return out
