"""COCO detection evaluator (in-process, pycocotools-free).

Rebuild of `efg/evaluator/coco_evaluator.py:33-545` on top of the numpy
COCO protocol core (`coco_eval_np.py`). Predictions arrive as the
fixed-shape dicts produced by the 2D models' `predict`; boxes are
de-scaled back to original image coordinates via the per-image resize
scale recorded by `ResizeShortestEdge`.
"""

from __future__ import annotations

import logging
from typing import List

import numpy as np

from efg_tpu.evaluator.coco_eval_np import COCOEvalNP
from efg_tpu.evaluator.evaluator import DatasetEvaluator
from efg_tpu.evaluator.registry import EVALUATORS
from efg_tpu.utils import distributed as comm

logger = logging.getLogger("efg_tpu")


@EVALUATORS.register()
class COCOEvaluator(DatasetEvaluator):
    def __init__(self, config, dataset):
        self.num_classes = len(getattr(dataset, "class_names", [])) or int(
            config.dataset.get("num_classes", 80)
        )
        self._frames: List[dict] = []

    def reset(self):
        self._frames = []

    def process(self, inputs, outputs):
        bsz = len(inputs["annotations"])
        for b in range(bsz):
            valid = np.asarray(outputs["valid"][b])
            meta = inputs["metadata"][b] or {}
            scale = float(meta.get("scale", 1.0))
            anno = inputs["annotations"][b] or {}
            self._frames.append(
                dict(
                    det_boxes=np.asarray(outputs["boxes"][b])[valid] / scale,
                    det_scores=np.asarray(outputs["scores"][b])[valid],
                    det_labels=np.asarray(outputs["labels"][b])[valid],
                    gt_boxes=np.asarray(anno.get("boxes2d", np.zeros((0, 4)))) / scale,
                    gt_classes=np.asarray(anno.get("classes", np.zeros(0, np.int64))),
                    gt_iscrowd=np.asarray(anno.get("iscrowd", np.zeros(0, np.int64))) > 0,
                    gt_areas=np.asarray(anno.get("areas", np.zeros(0))),
                )
            )

    def evaluate(self):
        shards = comm.all_gather(self._frames)
        if not comm.is_main_process():
            return {}
        frames = [f for s in shards for f in s]
        logger.info(f"COCO eval over {len(frames)} images")
        ev = COCOEvalNP()
        for f in frames:
            for c in range(self.num_classes):
                dm = f["det_labels"] == c
                gm = f["gt_classes"] == c
                if not dm.any() and not gm.any():
                    continue
                ev.add_image(
                    c,
                    f["det_boxes"][dm], f["det_scores"][dm],
                    f["gt_boxes"][gm], f["gt_iscrowd"][gm], f["gt_areas"][gm],
                )
        results = ev.summarize()
        return {f"coco/{k}": v for k, v in results.items()}
