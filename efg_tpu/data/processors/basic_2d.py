"""2D image processors (host-side numpy/cv2).

Rebuild of `efg/data/augmentations/basic.py:71-856` covering the transforms
the shipped 2D experiments use: `ResizeShortestEdge`, `RandomFlip`, the
large-scale-jitter pair `ResizeScale` + `FixedSizeCrop` (the Mask2Former 50e
recipe, reference `mask2former.pano_coco...50e/config.yaml:31-43`), the HSV
`Distortion`, and the blend color augs (`RandomBrightness`,
`RandomSaturation`, `RandomLightning`, `RandomSwapChannels`), plus the TPU
fixed-shape `PadImage` / `RasterizeMasks` terminal processors.

The 2D data contract: `data = {"image" [H, W, 3] float32, ...}`,
`info["annotations"] = {"boxes2d" [G, 4] xyxy, "classes" [G],
"masks" [G, H, W] optional per-instance bitmasks, "sem_seg" [H, W]
optional}`. Geometric transforms keep image, boxes, masks, and sem_seg
consistent (the reference's apply_image/apply_box/apply_segmentation
plumbing, `basic.py:77-250`, collapsed into plain helpers)."""

from __future__ import annotations

import numpy as np

from efg_tpu.data.processors.base import AugmentationBase
from efg_tpu.data.registry import PROCESSORS

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


# ---------------------------------------------------------------------------
# geometric helpers (image + boxes2d + masks + sem_seg together)
# ---------------------------------------------------------------------------


def _resize_all(image, info, nh: int, nw: int):
    """Bilinear image resize + nearest for masks/sem_seg + box scaling
    (reference ResizeTransform semantics, `basic.py:375-409`)."""
    h, w = image.shape[:2]
    if (nh, nw) != (h, w):
        image = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    anno = info.get("annotations")
    if anno is not None:
        sx, sy = nw / w, nh / h
        if "boxes2d" in anno and len(anno["boxes2d"]):
            b = np.asarray(anno["boxes2d"], np.float32)
            b[:, [0, 2]] *= sx
            b[:, [1, 3]] *= sy
            anno["boxes2d"] = b
        if anno.get("keypoints") is not None and len(anno["keypoints"]):
            kp = np.asarray(anno["keypoints"], np.float32)
            kp[..., 0] *= sx
            kp[..., 1] *= sy
            anno["keypoints"] = kp
        if anno.get("masks") is not None and (nh, nw) != (h, w):
            m = np.asarray(anno["masks"])
            anno["masks"] = np.stack(
                [
                    cv2.resize(mi.astype(np.uint8), (nw, nh),
                               interpolation=cv2.INTER_NEAREST)
                    for mi in m
                ]
            ) if len(m) else m.reshape((0, nh, nw))
        if anno.get("sem_seg") is not None and (nh, nw) != (h, w):
            anno["sem_seg"] = cv2.resize(
                anno["sem_seg"], (nw, nh), interpolation=cv2.INTER_NEAREST
            )
    return image, info


def _crop_all(image, info, x0: int, y0: int, cw: int, ch: int):
    """img[y0:y0+ch, x0:x0+cw] + coord shift (reference CroppTransform)."""
    image = image[y0 : y0 + ch, x0 : x0 + cw]
    anno = info.get("annotations")
    if anno is not None:
        if "boxes2d" in anno and len(anno["boxes2d"]):
            b = np.asarray(anno["boxes2d"], np.float32)
            b[:, [0, 2]] -= x0
            b[:, [1, 3]] -= y0
            anno["boxes2d"] = b
        if anno.get("keypoints") is not None and len(anno["keypoints"]):
            kp = np.asarray(anno["keypoints"], np.float32)
            kp[..., 0] -= x0
            kp[..., 1] -= y0
            # keypoints cropped away become unlabeled (d2
            # `annotations_to_instances` out-of-boundary semantics)
            inside = (
                (kp[..., 0] >= 0) & (kp[..., 0] <= cw)
                & (kp[..., 1] >= 0) & (kp[..., 1] <= ch)
            )
            kp[..., 2] = np.where(inside, kp[..., 2], 0.0)
            anno["keypoints"] = kp
        if anno.get("masks") is not None and len(anno["masks"]):
            anno["masks"] = np.asarray(anno["masks"])[:, y0 : y0 + ch, x0 : x0 + cw]
        if anno.get("sem_seg") is not None:
            anno["sem_seg"] = anno["sem_seg"][y0 : y0 + ch, x0 : x0 + cw]
    return image, info


def _pad_all(image, info, px1: int, py1: int, pad_value: float, seg_pad_value: int):
    """Right/bottom padding (reference PadTransform with x0=y0=0)."""
    if px1 or py1:
        image = np.pad(
            image, ((0, py1), (0, px1), (0, 0)), constant_values=pad_value
        )
        anno = info.get("annotations")
        if anno is not None:
            if anno.get("masks") is not None and len(anno["masks"]):
                anno["masks"] = np.pad(
                    np.asarray(anno["masks"]), ((0, 0), (0, py1), (0, px1))
                )
            if anno.get("sem_seg") is not None:
                anno["sem_seg"] = np.pad(
                    anno["sem_seg"], ((0, py1), (0, px1)),
                    constant_values=seg_pad_value,
                )
    return image, info


def _flip_all(image, info, horizontal: bool):
    h, w = image.shape[:2]
    anno = info.get("annotations")
    if horizontal:
        image = image[:, ::-1]
        if anno is not None:
            if "boxes2d" in anno and len(anno["boxes2d"]):
                b = np.asarray(anno["boxes2d"], np.float32)
                b[:, [0, 2]] = w - b[:, [2, 0]]
                anno["boxes2d"] = b
            if anno.get("masks") is not None and len(anno["masks"]):
                anno["masks"] = np.asarray(anno["masks"])[:, :, ::-1]
            if anno.get("sem_seg") is not None:
                anno["sem_seg"] = anno["sem_seg"][:, ::-1]
            if anno.get("keypoints") is not None and len(anno["keypoints"]):
                kp = np.asarray(anno["keypoints"], np.float32)
                kp[..., 0] = w - kp[..., 0]
                # left/right keypoints swap under hflip (d2
                # `create_keypoint_hflip_indices` semantics); the dataset
                # places the permutation in metadata
                flip_idx = (info.get("metadata") or {}).get("keypoint_hflip_indices")
                if flip_idx is not None:
                    kp = kp[:, np.asarray(flip_idx)]
                anno["keypoints"] = kp
    else:
        image = image[::-1]
        if anno is not None:
            if "boxes2d" in anno and len(anno["boxes2d"]):
                b = np.asarray(anno["boxes2d"], np.float32)
                b[:, [1, 3]] = h - b[:, [3, 1]]
                anno["boxes2d"] = b
            if anno.get("keypoints") is not None and len(anno["keypoints"]):
                kp = np.asarray(anno["keypoints"], np.float32)
                kp[..., 1] = h - kp[..., 1]
                anno["keypoints"] = kp
            if anno.get("masks") is not None and len(anno["masks"]):
                anno["masks"] = np.asarray(anno["masks"])[:, ::-1]
            if anno.get("sem_seg") is not None:
                anno["sem_seg"] = anno["sem_seg"][::-1]
    return np.ascontiguousarray(image), info


# ---------------------------------------------------------------------------
# geometric processors
# ---------------------------------------------------------------------------


@PROCESSORS.register()
class ResizeShortestEdge(AugmentationBase):
    """Resize so the short edge ∈ `short_edge_length` with long edge capped
    at `max_size` (reference `basic.py:494-543`)."""

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
        image, info = _resize_all(image, info, nh, nw)
        info.setdefault("metadata", {})["scale"] = info.get("metadata", {}).get("scale", 1.0) * scale
        return image, info


@PROCESSORS.register()
class ResizeScale(AugmentationBase):
    """Random-scale resize toward a target box, aspect ratio kept — the
    resize half of large-scale jitter (reference `basic.py:601-637`)."""

    def __init__(self, min_scale: float, max_scale: float,
                 target_height: int, target_width: int):
        self._init(locals())

    def __call__(self, image, info):
        h, w = image.shape[:2]
        scale = np.random.uniform(self.min_scale, self.max_scale)
        tsh, tsw = self.target_height * scale, self.target_width * scale
        out_scale = min(tsh / h, tsw / w)
        nh, nw = int(round(h * out_scale)), int(round(w * out_scale))
        image, info = _resize_all(image, info, nh, nw)
        info.setdefault("metadata", {})["scale"] = info.get("metadata", {}).get("scale", 1.0) * out_scale
        return image, info


@PROCESSORS.register()
class FixedSizeCrop(AugmentationBase):
    """Random crop to `crop_size` when larger, right/bottom pad when smaller
    — the crop half of large-scale jitter (reference `basic.py:545-597`)."""

    def __init__(self, crop_size, pad: bool = True, pad_value: float = 128.0,
                 seg_pad_value: int = 255):
        crop_size = tuple(int(c) for c in crop_size)
        self._init(locals())

    def __call__(self, image, info):
        h, w = image.shape[:2]
        oh, ow = self.crop_size
        max_off = np.maximum([h - oh, w - ow], 0)
        off = np.round(max_off * np.random.uniform(0.0, 1.0)).astype(int)
        image, info = _crop_all(image, info, int(off[1]), int(off[0]), ow, oh)
        if self.pad:
            nh, nw = image.shape[:2]
            image, info = _pad_all(
                image, info, max(ow - nw, 0), max(oh - nh, 0),
                self.pad_value, self.seg_pad_value,
            )
        return image, info


@PROCESSORS.register()
class RandomFlip(AugmentationBase):
    def __init__(self, prob=0.5, horizontal=True, vertical=False):
        self._init(locals())

    def __call__(self, image, info):
        if self.horizontal and np.random.random() < self.prob:
            image, info = _flip_all(image, info, horizontal=True)
        if self.vertical and np.random.random() < self.prob:
            image, info = _flip_all(image, info, horizontal=False)
        return np.ascontiguousarray(image), info


# ---------------------------------------------------------------------------
# color processors
# ---------------------------------------------------------------------------


@PROCESSORS.register()
class Distortion(AugmentationBase):
    """HSV hue/saturation/exposure jitter (reference `basic.py:640-706`)."""

    def __init__(self, hue, saturation, exposure, image_format="BGR"):
        cvt = {
            "RGB": (cv2.COLOR_RGB2HSV, cv2.COLOR_HSV2RGB),
            "BGR": (cv2.COLOR_BGR2HSV, cv2.COLOR_HSV2BGR),
        }[image_format] if cv2 is not None else (None, None)
        if saturation > 1.0:
            saturation /= 255.0
        self._init(locals())

    @staticmethod
    def _rand_scale(upper):
        scale = np.random.uniform(1, upper)
        return scale if np.random.rand() > 0.5 else 1.0 / scale

    def __call__(self, image, info):
        dhue = np.random.uniform(-self.hue, self.hue)
        dsat = self._rand_scale(self.saturation)
        dexp = self._rand_scale(self.exposure)
        dtype = image.dtype
        img = cv2.cvtColor(image.astype(np.uint8) if dtype != np.uint8 else image, self.cvt[0])
        img = img.astype(np.float32) / 255.0
        img[:, :, 1] *= dsat
        img[:, :, 2] *= dexp
        H = img[:, :, 0] + dhue
        H = np.where(H > 1.0, H - 1.0, H) if dhue > 0 else np.where(H < 0.0, H + 1.0, H)
        img[:, :, 0] = H
        img = (img * 255).clip(0, 255).astype(np.uint8)
        img = cv2.cvtColor(img, self.cvt[1])
        return img.astype(dtype), info


class _Blend(AugmentationBase):
    """src_weight·src + dst_weight·img, clipped for uint8 (reference
    BlendTransform, `basic.py:708-742`)."""

    def _blend(self, image, src, sw, dw):
        if image.dtype == np.uint8:
            out = sw * src + dw * image.astype(np.float32)
            return np.clip(out, 0, 255).astype(np.uint8)
        return (sw * src + dw * image).astype(image.dtype)


@PROCESSORS.register()
class RandomBrightness(_Blend):
    def __init__(self, intensity_min, intensity_max, prob=1.0):
        self._init(locals())

    def __call__(self, image, info):
        if np.random.random() < self.prob:
            w = np.random.uniform(self.intensity_min, self.intensity_max)
            image = self._blend(image, 0.0, 1 - w, w)
        return image, info


@PROCESSORS.register()
class RandomSaturation(_Blend):
    def __init__(self, intensity_min, intensity_max, prob=1.0):
        self._init(locals())

    def __call__(self, image, info):
        if np.random.random() < self.prob:
            w = np.random.uniform(self.intensity_min, self.intensity_max)
            gray = image[..., :3].astype(np.float32).dot([0.299, 0.587, 0.114])[..., None]
            image = self._blend(image, gray, 1 - w, w)
        return image, info


@PROCESSORS.register()
class RandomLightning(_Blend):
    """ImageNet-PCA color jitter (reference `basic.py:808-839`)."""

    EIGEN_VECS = np.array(
        [[-0.5675, 0.7192, 0.4009], [-0.5808, -0.0045, -0.8140],
         [-0.5836, -0.6948, 0.4203]]
    )
    EIGEN_VALS = np.array([0.2175, 0.0188, 0.0045])

    def __init__(self, scale, prob=0.5):
        self._init(locals())

    def __call__(self, image, info):
        if np.random.random() < self.prob:
            weights = np.random.normal(scale=self.scale, size=3)
            src = self.EIGEN_VECS.dot(weights * self.EIGEN_VALS)
            image = self._blend(image, src, 1.0, 1.0)
        return image, info


@PROCESSORS.register()
class RandomSwapChannels(AugmentationBase):
    def __init__(self, prob=0.5):
        self._init(locals())

    def __call__(self, image, info):
        if np.random.random() < self.prob:
            image = image[..., np.random.permutation(3)]
        return image, info


@PROCESSORS.register()
class NormalizeImage(AugmentationBase):
    def __init__(self, mean=(103.53, 116.28, 123.675), std=(1.0, 1.0, 1.0)):
        self._init(locals())

    def __call__(self, image, info):
        image = (image.astype(np.float32) - np.asarray(self.mean)) / np.asarray(self.std)
        return image.astype(np.float32), info


# ---------------------------------------------------------------------------
# fixed-shape terminals (TPU jit contract)
# ---------------------------------------------------------------------------


@PROCESSORS.register()
class RasterizeMasks(AugmentationBase):
    """Rasterize instance masks to a fixed mask-scale grid for the
    segmentation criterion (TPU fixed-shape contract). Sources, in
    priority: `annotations["masks"]` (full-res bitmasks), else box
    rectangles. Instances whose transformed mask became empty (cropped
    away by LSJ) are dropped from boxes/classes/masks together."""

    def __init__(self, height: int, width: int, stride: int = 4):
        self._init(locals())

    def __call__(self, image, info):
        anno = info.get("annotations")
        if anno is None:
            return image, info
        hm, wm = self.height // self.stride, self.width // self.stride
        masks = anno.get("masks")
        if masks is not None:
            masks = np.asarray(masks)
            keep = masks.reshape(len(masks), -1).any(axis=1) if len(masks) else np.zeros(0, bool)
            for key in ("boxes2d", "classes", "iscrowd", "areas", "keypoints"):
                if key in anno and len(anno[key]) == len(keep):
                    anno[key] = np.asarray(anno[key])[keep]
            masks = masks[keep]
            out = np.zeros((len(masks), hm, wm), np.float32)
            for i, m in enumerate(masks):
                out[i] = cv2.resize(
                    m.astype(np.float32), (wm, hm),
                    interpolation=cv2.INTER_NEAREST,
                )[:hm, :wm]
        else:
            boxes = np.asarray(anno.get("boxes2d", np.zeros((0, 4)))) / self.stride
            out = np.zeros((len(boxes), hm, wm), np.float32)
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
        anno = info.get("annotations")
        if anno is not None and anno.get("keypoints") is not None and len(anno["keypoints"]):
            # keypoints outside the visible canvas are unlabeled (d2
            # `annotations_to_instances` out-of-boundary semantics)
            kp = np.asarray(anno["keypoints"], np.float32)
            inside = (
                (kp[..., 0] >= 0) & (kp[..., 0] <= cw)
                & (kp[..., 1] >= 0) & (kp[..., 1] <= ch)
            )
            kp[..., 2] = np.where(inside, kp[..., 2], 0.0)
            anno["keypoints"] = kp
        return dict(image=out), info
