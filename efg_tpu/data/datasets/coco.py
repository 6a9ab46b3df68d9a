"""COCO detection dataset (pycocotools-free JSON loading).

Rebuild of `efg/data/datasets/coco/coco.py:41+` for the fixed-shape
pipeline: parses `instances_*.json` directly, emits `(image, info)` with
xyxy `boxes2d` + contiguous 0-based `classes`, runs the 2D processor chain.
Also a `SyntheticCOCODataset` for data-free smoke runs.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from efg_tpu.data.base_dataset import BaseDataset
from efg_tpu.data.builder import build_processors
from efg_tpu.data.registry import DATASETS

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# COCO person-keypoints metadata (reference
# `efg/data/datasets/coco/builtin_meta.py:157-180`): the 17 keypoint
# names in annotation order and the left/right pairs exchanged under
# horizontal flip.
COCO_PERSON_KEYPOINT_NAMES = (
    "nose",
    "left_eye", "right_eye",
    "left_ear", "right_ear",
    "left_shoulder", "right_shoulder",
    "left_elbow", "right_elbow",
    "left_wrist", "right_wrist",
    "left_hip", "right_hip",
    "left_knee", "right_knee",
    "left_ankle", "right_ankle",
)
COCO_PERSON_KEYPOINT_FLIP_MAP = (
    ("left_eye", "right_eye"),
    ("left_ear", "right_ear"),
    ("left_shoulder", "right_shoulder"),
    ("left_elbow", "right_elbow"),
    ("left_wrist", "right_wrist"),
    ("left_hip", "right_hip"),
    ("left_knee", "right_knee"),
    ("left_ankle", "right_ankle"),
)


def keypoint_hflip_indices(names=COCO_PERSON_KEYPOINT_NAMES,
                           flip_map=COCO_PERSON_KEYPOINT_FLIP_MAP) -> np.ndarray:
    """Permutation applied to the K axis under horizontal flip (reference
    `efg/data/datasets/coco/utils.py:232-250` `create_keypoint_hflip_indices`)."""
    fmap = dict(flip_map)
    fmap.update({v: k for k, v in flip_map})
    flipped = [fmap.get(n, n) for n in names]
    return np.asarray([names.index(n) for n in flipped], np.int64)


@DATASETS.register()
class COCODataset(BaseDataset):
    def __init__(self, config):
        super().__init__(config)
        d = config.dataset
        task = config.task if config.task != "test" else "val"
        source = d.source
        root = source.root
        self.image_root = root + source[f"{task}_images"]
        json_file = root + source[f"{task}_json"]
        self.is_train = config.task == "train"
        self.filter_empty = bool(d.get("filter_empty_annotations", True))
        # keypoints variant (reference `coco.py:50-51` "keypoints" in the
        # dataset name → person-keypoint task): emit [N, 17, 3] keypoints
        # and filter train images below `min_keypoints` visible ones
        # (d2 `filter_images_with_few_keypoints` semantics)
        self.keypoints_on = bool(d.get("keypoints_on", False)) or (
            "keypoints" in os.path.basename(str(source.get(f"{task}_json", "")))
        )
        self.min_keypoints = int(d.get("min_keypoints", 1)) if self.is_train else 0
        self.keypoint_hflip_indices = keypoint_hflip_indices() if self.keypoints_on else None

        with open(json_file) as f:
            coco = json.load(f)
        cat_ids = sorted(c["id"] for c in coco["categories"])
        self.cat_id_to_contiguous = {cid: i for i, cid in enumerate(cat_ids)}
        self.contiguous_to_cat_id = {i: cid for cid, i in self.cat_id_to_contiguous.items()}
        self.class_names = [
            c["name"] for c in sorted(coco["categories"], key=lambda c: c["id"])
        ]

        anns_by_img: Dict[int, List[dict]] = {}
        for a in coco.get("annotations", []):
            anns_by_img.setdefault(a["image_id"], []).append(a)

        self.items = []
        for img in coco["images"]:
            anns = anns_by_img.get(img["id"], [])
            if self.is_train and self.filter_empty and not any(
                a.get("iscrowd", 0) == 0 for a in anns
            ):
                continue
            if self.keypoints_on and self.min_keypoints > 0:
                vis = sum(
                    sum(1 for v in a.get("keypoints", [])[2::3] if v > 0)
                    for a in anns if a.get("iscrowd", 0) == 0
                )
                if vis < self.min_keypoints:
                    continue
            self.items.append((img, anns))

        self.transforms = build_processors(d.processors[config.task if config.task in d.processors else task])
        # aspect-ratio group ids for DistributedGroupSampler (reference
        # `_compute_aspect_ratios`: 0 = landscape, 1 = portrait)
        self.aspect_ratios = np.asarray(
            [int(img["height"] > img["width"]) for img, _ in self.items],
            np.int64,
        )

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx):
        img_meta, anns = self.items[idx]
        path = os.path.join(self.image_root, img_meta["file_name"])
        image = cv2.imread(path).astype(np.float32)  # BGR, reference format

        boxes, classes, iscrowd, areas = [], [], [], []
        for a in anns:
            x, y, w, h = a["bbox"]
            boxes.append([x, y, x + w, y + h])
            classes.append(self.cat_id_to_contiguous[a["category_id"]])
            iscrowd.append(a.get("iscrowd", 0))
            areas.append(a.get("area", w * h))
        info = {
            "metadata": {
                "image_id": img_meta["id"],
                "height": img_meta["height"],
                "width": img_meta["width"],
            },
            "annotations": {
                "boxes2d": np.asarray(boxes, np.float32).reshape(-1, 4),
                "classes": np.asarray(classes, np.int64),
                "iscrowd": np.asarray(iscrowd, np.int64),
                "areas": np.asarray(areas, np.float64),
            },
        }
        if self.keypoints_on:
            K = len(COCO_PERSON_KEYPOINT_NAMES)
            kpts = np.zeros((len(anns), K, 3), np.float32)
            for i, a in enumerate(anns):
                kp = np.asarray(a.get("keypoints", []), np.float32).reshape(-1, 3)
                if len(kp):
                    # COCO keypoint coords are pixel indices; +0.5 converts
                    # to the floating-point coordinate convention
                    # (reference `coco.py:364-373`)
                    kp[:, :2] += 0.5
                    kpts[i, : len(kp)] = kp[:K]
            info["annotations"]["keypoints"] = kpts
            info["metadata"]["keypoint_hflip_indices"] = self.keypoint_hflip_indices
        return self._apply_transforms(image, info)


@DATASETS.register()
class COCOPanopticDataset(COCODataset):
    """COCO panoptic: instances + the panoptic PNG segment maps
    (reference `coco.py` panoptic variant). Segment ids are decoded from
    RGB PNGs as id = R + G·256 + B·256² (COCO panoptic format)."""

    def __init__(self, config):
        super().__init__(config)
        d = config.dataset
        task = config.task if config.task != "test" else "val"
        source = d.source
        self.pan_root = source.root + source.get(
            f"panoptic_{task}_images", f"/panoptic_{task}2017"
        )
        pan_json = source.root + source[f"panoptic_{task}_json"]
        with open(pan_json) as f:
            pan = json.load(f)
        self.pan_by_img = {a["image_id"]: a for a in pan["annotations"]}
        # 133-category contiguous mapping over the PANOPTIC categories
        # (things + stuff; the instance mapping from the parent covers only
        # the 80 things) — train targets, predictions, and PQ eval all use
        # this one mapping.
        pan_cats = sorted(pan.get("categories", []), key=lambda c: c["id"])
        if pan_cats:
            self.pan_cat_to_contiguous = {c["id"]: i for i, c in enumerate(pan_cats)}
            self.class_names = [c["name"] for c in pan_cats]
            self.thing_contiguous_ids = {
                i for i, c in enumerate(pan_cats) if c.get("isthing", 0)
            }
        else:  # panoptic jsons without a categories block: things only
            self.pan_cat_to_contiguous = dict(self.cat_id_to_contiguous)
            self.thing_contiguous_ids = set(self.pan_cat_to_contiguous.values())

    def __getitem__(self, idx):
        img_meta, _ = self.items[idx]
        path = os.path.join(self.image_root, img_meta["file_name"])
        image = cv2.imread(path).astype(np.float32)
        info = {
            "metadata": {
                "image_id": img_meta["id"],
                "height": img_meta["height"],
                "width": img_meta["width"],
            },
            "annotations": {
                "boxes2d": np.zeros((0, 4), np.float32),
                "classes": np.zeros(0, np.int64),
                "iscrowd": np.zeros(0, np.int64),
                "areas": np.zeros(0, np.float64),
            },
        }
        pan_ann = self.pan_by_img.get(img_meta["id"])
        if pan_ann is not None:
            png = cv2.imread(os.path.join(self.pan_root, pan_ann["file_name"]))
            # BGR → id = R + G·256 + B·256²
            pan_id = (
                png[..., 2].astype(np.int64)
                + png[..., 1].astype(np.int64) * 256
                + png[..., 0].astype(np.int64) * 256**2
            )
            # training targets: one (class, mask) per non-crowd segment
            # (things AND stuff — the Mask2Former criterion supervises
            # both; reference d2 mapper semantics), built BEFORE the
            # transform chain so LSJ crops masks consistently
            segs = [
                s for s in pan_ann["segments_info"]
                if not s.get("iscrowd", 0)
                and s["category_id"] in self.pan_cat_to_contiguous
            ]
            masks = np.stack(
                [(pan_id == s["id"]).astype(np.uint8) for s in segs]
            ) if segs else np.zeros((0,) + pan_id.shape, np.uint8)
            boxes = np.zeros((len(segs), 4), np.float32)
            for i, m in enumerate(masks):
                ys, xs = np.nonzero(m)
                if len(ys):
                    boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
            info["annotations"].update(
                boxes2d=boxes,
                classes=np.asarray(
                    [self.pan_cat_to_contiguous[s["category_id"]] for s in segs],
                    np.int64,
                ),
                iscrowd=np.zeros(len(segs), np.int64),
                areas=np.asarray([s.get("area", 0) for s in segs], np.float64),
                masks=masks,
            )
            # evaluation-side originals: the PQ evaluator compares at the
            # ORIGINAL resolution; these fields pass through the transform
            # chain untouched
            info["annotations"]["pan_gt"] = pan_id
            info["annotations"]["gt_segments"] = {
                s["id"]: self.pan_cat_to_contiguous.get(s["category_id"], -1)
                for s in pan_ann["segments_info"]
            }
            info["annotations"]["gt_iscrowd_seg"] = {
                s["id"]: bool(s.get("iscrowd", 0)) for s in pan_ann["segments_info"]
            }
        return self._apply_transforms(image, info)


@DATASETS.register()
class SyntheticCOCODataset(BaseDataset):
    """Procedural 2D scenes: colored rectangles on noise — lets the 2D track
    train/evaluate end-to-end without COCO on disk."""

    def __init__(self, config):
        super().__init__(config)
        d = config.dataset
        self.size = int(d.get("num_frames", 64))
        self.seed = int(d.get("seed", 0))
        self.num_classes = int(d.get("num_classes", 5))
        self.image_size = int(d.get("image_size", 256))
        task = config.task if config.task != "test" else "val"
        self.transforms = build_processors(d.processors[config.task if config.task in d.processors else task])
        self.class_names = [f"class{i}" for i in range(self.num_classes)]

    def __len__(self):
        return self.size

    def __getitem__(self, idx):
        rs = np.random.RandomState(self.seed * 9176 + idx)
        s = self.image_size
        image = rs.uniform(0, 60, (s, s, 3)).astype(np.float32)
        k = rs.randint(1, 6)
        boxes, classes = [], []
        for _ in range(k):
            w, h = rs.uniform(s * 0.1, s * 0.4, 2)
            x0 = rs.uniform(0, s - w)
            y0 = rs.uniform(0, s - h)
            cls = rs.randint(self.num_classes)
            color = np.zeros(3)
            color[cls % 3] = 150 + 50 * (cls // 3)
            image[int(y0):int(y0 + h), int(x0):int(x0 + w)] += color
            boxes.append([x0, y0, x0 + w, y0 + h])
            classes.append(cls)
        info = {
            "metadata": {"image_id": idx, "height": s, "width": s},
            "annotations": {
                "boxes2d": np.asarray(boxes, np.float32),
                "classes": np.asarray(classes, np.int64),
                "iscrowd": np.zeros(k, np.int64),
                "areas": np.asarray([(b[2] - b[0]) * (b[3] - b[1]) for b in boxes], np.float64),
            },
        }
        return self._apply_transforms(image, info)
