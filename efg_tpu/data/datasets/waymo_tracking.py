"""Waymo tracking dataset: detection boxes + points per frame.

Rebuild of the reference TrajectoryFormer dataset (`playground/tracking.3d/
waymo/trajectoryformer/trajectoryformer.centerpoint/env.py` CustomWDDataset):
extends the Waymo detection dataset with per-frame detector outputs loaded
from a boxes pkl (CenterPoint/MPPNet predictions keyed per frame), with
pose-chained transforms of previous-frame boxes into the current frame for
trajectory hypothesis construction.
"""

from __future__ import annotations

import pickle
from copy import deepcopy

import numpy as np

from efg_tpu.data.datasets.waymo import WaymoDetectionDataset
from efg_tpu.data.registry import DATASETS
from efg_tpu.utils.file_io import PathManager


def transform_boxes_to_current(pred_boxes3d, pose_pre, pose_cur, lag_steps: int):
    """Move previous-frame boxes (with velocity) into the current frame
    (reference `transform_prebox_to_current_vel`)."""
    n = pred_boxes3d.shape[0]
    centers = np.concatenate([pred_boxes3d[:, :3], np.ones((n, 1))], axis=-1)
    vels = np.concatenate([pred_boxes3d[:, 6:8], np.zeros((n, 1))], axis=-1)
    centers_g = centers @ pose_pre.T
    vels_g = vels @ pose_pre[:3, :3].T
    moved = deepcopy(centers_g[:, :3])
    moved[:, :2] += lag_steps * 0.1 * vels_g[:, :2]
    moved_h = np.concatenate([moved, np.ones((n, 1))], axis=-1)
    centers_cur = moved_h @ np.linalg.inv(pose_cur.T)
    vels_cur = vels_g @ np.linalg.inv(pose_cur[:3, :3].T)
    out = pred_boxes3d.copy()
    out[:, :3] = centers_cur[:, :3]
    out[:, 6:8] = vels_cur[:, :2]
    return out


@DATASETS.register()
class WaymoTrackingDataset(WaymoDetectionDataset):
    def __init__(self, config):
        super().__init__(config)
        d = config.dataset
        boxes_path = d.train_boxes_path if config.task == "train" else d.val_boxes_path
        self.max_roi_num = int(d.get("max_roi_num", 128))
        self.score_thresh = float(d.get("score_thresh", 0.1))
        self.boxes_dicts = self._load_boxes(boxes_path)
        # sequence id per frame for SeqInferenceSampler
        self.sequence_ids = [
            info["token"].split("_frame_")[0] if "token" in info else str(i)
            for i, info in enumerate(self.dataset_dicts)
        ]

    def _load_boxes(self, path):
        boxes_all = pickle.load(PathManager.open(path, "rb"))
        if isinstance(boxes_all, dict):
            boxes_all = [boxes_all[k] for k in list(boxes_all.keys())]
        return boxes_all[:: self.load_interval]

    def __getitem__(self, idx):
        points, info = super().__getitem__(idx)
        det = self.boxes_dicts[idx]
        boxes = np.asarray(det.get("boxes3d", det.get("box3d_lidar", np.zeros((0, 9)))), np.float32)
        scores = np.asarray(det.get("scores", np.ones(len(boxes))), np.float32)
        labels = np.asarray(det.get("labels", np.ones(len(boxes))), np.int64)
        keep = scores > self.score_thresh
        order = np.argsort(-scores[keep])[: self.max_roi_num]
        boxes9 = boxes[keep][order]
        if boxes9.shape[1] == 7:
            boxes9 = np.concatenate(
                [boxes9[:, :6], np.zeros((len(boxes9), 2), np.float32), boxes9[:, 6:7]],
                axis=1,
            )
        anno = info.setdefault("annotations", {})
        anno["det_boxes"] = boxes9
        anno["det_scores"] = scores[keep][order]
        anno["det_labels"] = labels[keep][order]
        return points, info
