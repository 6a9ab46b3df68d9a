"""Waymo-protocol detection evaluator.

Rebuild of `efg/evaluator/waymo_evaluator.py:22-87` without the subprocess
shell-out (SURVEY.md §2.10 lists that as an inconsistency to fix): gathers
per-frame predictions across hosts, then computes AP/APH L1/L2 in-process
via `det3d_metrics`. IoU thresholds follow the official config
(`datasets/utils/waymo_eval.py:108-130`): 0.7 vehicle / 0.5 pedestrian /
0.5 cyclist.
"""

from __future__ import annotations

import logging
from typing import Dict, List

import numpy as np

from efg_tpu.evaluator.det3d_metrics import DetectionAPCalculator
from efg_tpu.evaluator.evaluator import DatasetEvaluator
from efg_tpu.evaluator.registry import EVALUATORS
from efg_tpu.utils import distributed as comm

logger = logging.getLogger("efg_tpu")

WAYMO_IOU = {"VEHICLE": 0.7, "PEDESTRIAN": 0.5, "CYCLIST": 0.5}


@EVALUATORS.register()
class WaymoDetEvaluator(DatasetEvaluator):
    """`trainer.waymo_metric: official` (default — Hungarian matching +
    101-cutoff recall-sampled AP, `waymo_official.py`) or `greedy` (the
    fast smoke path, `det3d_metrics.py`)."""

    def __init__(self, config, dataset):
        self.class_names = list(config.dataset.classes)
        thr = {c: WAYMO_IOU.get(c, 0.5) for c in self.class_names}
        core = "official"
        try:
            core = config.trainer.get("waymo_metric", "official")
        except Exception:
            pass
        if core == "official":
            from efg_tpu.evaluator.waymo_official import WaymoOfficialCalculator

            self.calc = WaymoOfficialCalculator(self.class_names, thr)
        else:
            self.calc = DetectionAPCalculator(self.class_names, thr)
        self._frames: List[Dict] = []

    def reset(self):
        self._frames = []
        self.calc.reset()

    def process(self, inputs, outputs):
        """inputs: host batch (with `annotations` list); outputs: fixed-shape
        detection dict from `predict` (box3d/scores/labels/valid, [B, K])."""
        bsz = len(inputs["annotations"])
        for b in range(bsz):
            valid = np.asarray(outputs["valid"][b])
            anno = inputs["annotations"][b] or {}
            self._frames.append(
                dict(
                    pred_boxes=np.asarray(outputs["box3d"][b])[valid],
                    pred_scores=np.asarray(outputs["scores"][b])[valid],
                    pred_labels=np.asarray(outputs["labels"][b])[valid],
                    gt_boxes=np.asarray(anno.get("gt_boxes", np.zeros((0, 9)))),
                    gt_labels=np.asarray(anno.get("labels", np.zeros((0,), np.int64))),
                    gt_difficulty=np.asarray(anno.get("difficulty", np.zeros((0,), np.int64))),
                    gt_num_points=np.asarray(
                        anno.get("num_points_in_gt", np.full((len(anno.get("gt_boxes", []))), 100))
                    ),
                )
            )

    def evaluate(self):
        all_frames = comm.all_gather(self._frames)
        if not comm.is_main_process():
            return {}
        frames = [f for shard in all_frames for f in shard]
        logger.info(f"Waymo eval over {len(frames)} frames")
        for f in frames:
            boxes7 = f["pred_boxes"]
            if boxes7.shape[-1] > 7:
                boxes7 = boxes7[:, [0, 1, 2, 3, 4, 5, boxes7.shape[-1] - 1]]
            gt7 = f["gt_boxes"]
            if gt7.shape[-1] > 7:
                gt7 = gt7[:, [0, 1, 2, 3, 4, 5, gt7.shape[-1] - 1]]
            self.calc.add_frame(
                boxes7, f["pred_scores"], f["pred_labels"],
                gt7, f["gt_labels"], f["gt_difficulty"], f["gt_num_points"],
            )
        results = self.calc.compute()
        maph_l2 = np.nanmean([results[f"{c}/L2/APH"] for c in self.class_names])
        results["mAPH/L2"] = float(maph_l2)
        return {f"waymo/{k}": v for k, v in results.items()}
