"""Panoptic Quality evaluator (panopticapi-free).

Rebuild of `efg/evaluator/panoptic_evaluation.py:25-191`: instead of
shelling out to panopticapi over PNG files, PQ/SQ/RQ are computed directly
from per-image (pred, gt) segment-id maps + category dicts:

    PQ = Σ_{TP} IoU / (|TP| + ½|FP| + ½|FN|),  matched at IoU > 0.5,
    with void regions excluded and crowd GT segments ignored.
"""

from __future__ import annotations

import logging
from typing import Dict, List

import numpy as np

from efg_tpu.evaluator.evaluator import DatasetEvaluator
from efg_tpu.evaluator.registry import EVALUATORS
from efg_tpu.utils import distributed as comm

logger = logging.getLogger("efg_tpu")

VOID = 0


def pq_single_image(
    pan_pred: np.ndarray,     # [H, W] segment ids (0 = void)
    pred_segments: Dict[int, int],  # seg id → category
    pan_gt: np.ndarray,
    gt_segments: Dict[int, int],
    gt_iscrowd: Dict[int, bool],
    stats: Dict[int, np.ndarray],
):
    """Accumulate per-category [iou_sum, tp, fp, fn] into `stats`."""
    # pair counting via combined ids
    combined = pan_gt.astype(np.int64) * (2**24) + pan_pred.astype(np.int64)
    ids, counts = np.unique(combined, return_counts=True)
    inter = {}
    for cid, cnt in zip(ids, counts):
        inter[(int(cid // 2**24), int(cid % 2**24))] = int(cnt)

    gt_areas = {s: 0 for s in gt_segments}
    pred_areas = {s: 0 for s in pred_segments}
    for (g, p), cnt in inter.items():
        if g in gt_areas:
            gt_areas[g] += cnt
        if p in pred_areas:
            pred_areas[p] += cnt

    matched_gt, matched_pred = set(), set()
    for (g, p), cnt in inter.items():
        if g not in gt_segments or p not in pred_segments:
            continue
        if gt_iscrowd.get(g, False):
            continue
        if gt_segments[g] != pred_segments[p]:
            continue
        union = gt_areas[g] + pred_areas[p] - cnt - inter.get((VOID, p), 0)
        iou = cnt / max(union, 1)
        if iou > 0.5:
            cat = gt_segments[g]
            st = stats.setdefault(cat, np.zeros(4))
            st[0] += iou
            st[1] += 1
            matched_gt.add(g)
            matched_pred.add(p)

    crowd_by_cat = {}
    for g, cat in gt_segments.items():
        if g in matched_gt:
            continue
        if gt_iscrowd.get(g, False):
            crowd_by_cat[cat] = g
            continue
        stats.setdefault(cat, np.zeros(4))[3] += 1  # FN
    for p, cat in pred_segments.items():
        if p in matched_pred:
            continue
        # predictions mostly covered by void or same-class crowd are ignored
        void_overlap = inter.get((VOID, p), 0)
        if cat in crowd_by_cat:
            void_overlap += inter.get((crowd_by_cat[cat], p), 0)
        if void_overlap / max(pred_areas.get(p, 1), 1) > 0.5:
            continue
        stats.setdefault(cat, np.zeros(4))[2] += 1  # FP


def summarize_pq(stats: Dict[int, np.ndarray]) -> Dict[str, float]:
    pqs, sqs, rqs, n = [], [], [], 0
    for cat, (iou_sum, tp, fp, fn) in sorted(stats.items()):
        if tp + fp + fn == 0:
            continue
        sq = iou_sum / tp if tp else 0.0
        rq = tp / (tp + 0.5 * fp + 0.5 * fn)
        pqs.append(sq * rq)
        sqs.append(sq)
        rqs.append(rq)
        n += 1
    if n == 0:
        return {"PQ": 0.0, "SQ": 0.0, "RQ": 0.0, "n_categories": 0}
    return {
        "PQ": float(np.mean(pqs)),
        "SQ": float(np.mean(sqs)),
        "RQ": float(np.mean(rqs)),
        "n_categories": n,
    }


def assemble_panoptic(pan_seg_q, labels, keep, thing_ids):
    """Host assembly of the final segment map from the device outputs of
    `mask2former.predict_panoptic` (reference `panoptic_inference`
    mask2former.py:258-318 host half): relabel winning-query ids to dense
    segment ids, merging stuff segments of the same class."""
    out = np.zeros(pan_seg_q.shape, np.int32)
    segments = {}
    stuff_memory = {}
    next_id = 1
    for q in np.nonzero(np.asarray(keep))[0]:
        m = pan_seg_q == (q + 1)
        if not m.any():
            continue
        cls = int(labels[q])
        if cls not in thing_ids and cls in stuff_memory:
            out[m] = stuff_memory[cls]
            continue
        if cls not in thing_ids:
            stuff_memory[cls] = next_id
        out[m] = next_id
        segments[next_id] = cls
        next_id += 1
    return out, segments


@EVALUATORS.register()
class PanopticEvaluator(DatasetEvaluator):
    def __init__(self, config, dataset):
        self.thing_ids = set(getattr(dataset, "thing_contiguous_ids", set()))
        self._items: List[dict] = []

    def reset(self):
        self._items = []

    def process(self, inputs, outputs):
        """outputs carry either assembled per-image `pan_pred` [H, W] +
        `pred_segments`, or the raw device fields of `predict_panoptic`
        (`pan_seg` winner map + labels/keep) which are assembled here and
        resized back to the GT's original resolution; inputs' annotations
        carry `pan_gt`, `gt_segments`, `gt_iscrowd_seg`."""
        for b in range(len(inputs["annotations"])):
            anno = inputs["annotations"][b] or {}
            if "pan_pred" in outputs:
                pan_pred = np.asarray(outputs["pan_pred"][b])
                pred_segments = outputs["pred_segments"][b]
            else:
                ps = np.asarray(outputs["pan_seg"][b])
                pan_pred, pred_segments = assemble_panoptic(
                    ps, np.asarray(outputs["pan_labels"][b]),
                    np.asarray(outputs["pan_keep"][b]), self.thing_ids,
                )
                meta = (inputs.get("metadata") or [{}] * (b + 1))[b] or {}
                gt_hw = np.asarray(anno["pan_gt"]).shape
                if "images" in inputs and "image_size" in meta:
                    # un-pad: valid region of the fixed canvas at mask scale
                    stride = max(inputs["images"].shape[1] // ps.shape[0], 1)
                    ch = -(-int(meta["image_size"][0]) // stride)
                    cw = -(-int(meta["image_size"][1]) // stride)
                    pan_pred = pan_pred[:ch, :cw]
                if pan_pred.shape != gt_hw:
                    try:
                        import cv2

                        pan_pred = cv2.resize(
                            pan_pred, (gt_hw[1], gt_hw[0]),
                            interpolation=cv2.INTER_NEAREST,
                        )
                    except ImportError:  # pragma: no cover
                        ys = (np.arange(gt_hw[0]) * pan_pred.shape[0] // gt_hw[0])
                        xs = (np.arange(gt_hw[1]) * pan_pred.shape[1] // gt_hw[1])
                        pan_pred = pan_pred[np.ix_(ys, xs)]
            self._items.append(
                dict(
                    pan_pred=pan_pred,
                    pred_segments=pred_segments,
                    pan_gt=np.asarray(anno["pan_gt"]),
                    gt_segments=anno["gt_segments"],
                    gt_iscrowd=anno.get("gt_iscrowd_seg", {}),
                )
            )

    def evaluate(self):
        shards = comm.all_gather(self._items)
        if not comm.is_main_process():
            return {}
        stats: Dict[int, np.ndarray] = {}
        for shard in shards:
            for it in shard:
                pq_single_image(
                    it["pan_pred"], it["pred_segments"], it["pan_gt"],
                    it["gt_segments"], it["gt_iscrowd"], stats,
                )
        res = summarize_pq(stats)
        return {f"panoptic/{k}": v for k, v in res.items()}
