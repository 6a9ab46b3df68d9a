"""2D image processors (host-side numpy/cv2).

Subset rebuild of `efg/data/augmentations/basic.py:71-856` covering the
transforms the shipped 2D experiments use (`ResizeShortestEdge`,
`RandomFlip`), plus the TPU fixed-shape `PadImage` terminal processor.
The 2D data contract: `data = {"image" [H, W, 3] float32, ...}`,
`info["annotations"] = {"boxes2d" [G, 4] xyxy, "classes" [G], ...}`.
"""

from __future__ import annotations

import numpy as np

from efg_tpu.data.processors.base import AugmentationBase
from efg_tpu.data.registry import PROCESSORS

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


@PROCESSORS.register()
class ResizeShortestEdge(AugmentationBase):
    """Resize so the short edge ∈ `short_edge_length` with long edge capped
    at `max_size` (reference `basic.py` ResizeShortestEdge)."""

    def __init__(self, short_edge_length, max_size=1333, sample_style="choice"):
        if isinstance(short_edge_length, (int, float)):
            short_edge_length = [int(short_edge_length)]
        self._init(locals())

    def __call__(self, image, info):
        h, w = image.shape[:2]
        if self.sample_style == "range":
            size = np.random.randint(min(self.short_edge_length), max(self.short_edge_length) + 1)
        else:
            size = int(np.random.choice(self.short_edge_length))
        scale = size / min(h, w)
        if max(h, w) * scale > self.max_size:
            scale = self.max_size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        image = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if "annotations" in info and "boxes2d" in info["annotations"]:
            info["annotations"]["boxes2d"] = info["annotations"]["boxes2d"] * scale
        info.setdefault("metadata", {})["scale"] = info.get("metadata", {}).get("scale", 1.0) * scale
        return image, info


@PROCESSORS.register()
class RandomFlip(AugmentationBase):
    def __init__(self, prob=0.5, horizontal=True, vertical=False):
        self._init(locals())

    def __call__(self, image, info):
        h, w = image.shape[:2]
        if self.horizontal and np.random.random() < self.prob:
            image = image[:, ::-1]
            if "annotations" in info and "boxes2d" in info["annotations"]:
                b = info["annotations"]["boxes2d"]
                b[:, [0, 2]] = w - b[:, [2, 0]]
        if self.vertical and np.random.random() < self.prob:
            image = image[::-1]
            if "annotations" in info and "boxes2d" in info["annotations"]:
                b = info["annotations"]["boxes2d"]
                b[:, [1, 3]] = h - b[:, [3, 1]]
        return np.ascontiguousarray(image), info


@PROCESSORS.register()
class NormalizeImage(AugmentationBase):
    def __init__(self, mean=(103.53, 116.28, 123.675), std=(1.0, 1.0, 1.0)):
        self._init(locals())

    def __call__(self, image, info):
        image = (image.astype(np.float32) - np.asarray(self.mean)) / np.asarray(self.std)
        return image.astype(np.float32), info


@PROCESSORS.register()
class RasterizeMasks(AugmentationBase):
    """Rasterize instance masks to a fixed mask-scale grid for the
    segmentation criterion (TPU fixed-shape contract). Sources, in
    priority: `annotations["masks"]` (full-res bitmasks), COCO
    `segmentation` polygons, else box rectangles."""

    def __init__(self, height: int, width: int, stride: int = 4):
        self._init(locals())

    def __call__(self, image, info):
        anno = info.get("annotations")
        if anno is None:
            return image, info
        hm, wm = self.height // self.stride, self.width // self.stride
        n = len(anno.get("boxes2d", []))
        out = np.zeros((n, hm, wm), np.float32)
        masks = anno.get("masks")
        if masks is not None:
            for i, m in enumerate(np.asarray(masks, np.float32)):
                out[i] = cv2.resize(m, (wm, hm), interpolation=cv2.INTER_NEAREST)
        else:
            boxes = np.asarray(anno.get("boxes2d", np.zeros((0, 4)))) / self.stride
            for i, (x0, y0, x1, y1) in enumerate(boxes):
                out[i, int(max(y0, 0)):int(min(y1, hm)), int(max(x0, 0)):int(min(x1, wm))] = 1.0
        anno["masks_fixed"] = out
        return image, info


@PROCESSORS.register()
class PadImage(AugmentationBase):
    """Pad to a fixed (H, W) canvas — the jit fixed-shape contract
    (TPU-specific; analog of detectron2 ImageList padding)."""

    def __init__(self, height: int, width: int):
        self._init(locals())

    def __call__(self, image, info):
        h, w = image.shape[:2]
        out = np.zeros((self.height, self.width, image.shape[2]), np.float32)
        ch, cw = min(h, self.height), min(w, self.width)
        out[:ch, :cw] = image[:ch, :cw]
        info.setdefault("metadata", {})["image_size"] = (ch, cw)
        return dict(image=out), info
