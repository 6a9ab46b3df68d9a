"""Large-scale-jitter + color augmentation tests (basic_2d.py).

Covers the reference recipe transforms (`efg/data/augmentations/basic.py`:
ResizeScale 601-637, FixedSizeCrop 545-597, Distortion 640-706, blend color
augs 708-856): geometric consistency between image / boxes / masks /
sem_seg, the crop/pad size contract, and the COCOPanopticDataset
segment-target construction over a synthetic panoptic mini-set."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from efg_tpu.data.processors.basic_2d import (  # noqa: E402
    Distortion,
    FixedSizeCrop,
    RandomBrightness,
    RandomFlip,
    RandomLightning,
    RandomSaturation,
    RandomSwapChannels,
    RasterizeMasks,
    ResizeScale,
    ResizeShortestEdge,
)


def _sample(h=60, w=90, n=3, seed=0):
    rs = np.random.RandomState(seed)
    image = rs.uniform(0, 255, (h, w, 3)).astype(np.float32)
    boxes = np.zeros((n, 4), np.float32)
    masks = np.zeros((n, h, w), np.uint8)
    for i in range(n):
        x0, y0 = rs.randint(0, w - 20), rs.randint(0, h - 15)
        bw, bh = rs.randint(8, 20), rs.randint(6, 15)
        boxes[i] = [x0, y0, x0 + bw, y0 + bh]
        masks[i, y0 : y0 + bh, x0 : x0 + bw] = 1
    sem = masks.argmax(0).astype(np.uint8)
    info = {
        "annotations": {
            "boxes2d": boxes,
            "classes": np.arange(n, dtype=np.int64),
            "masks": masks,
            "sem_seg": sem,
        },
        "metadata": {},
    }
    return image, info


def _mask_box(m):
    ys, xs = np.nonzero(m)
    return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], np.float32)


def test_resize_scale_consistency():
    np.random.seed(3)
    image, info = _sample()
    out, info = ResizeScale(min_scale=0.5, max_scale=2.0, target_height=100, target_width=100)(image, info)
    a = info["annotations"]
    assert a["masks"].shape[1:] == out.shape[:2]
    assert a["sem_seg"].shape == out.shape[:2]
    # aspect ratio preserved and fits in the target box
    assert out.shape[0] <= 200 and out.shape[1] <= 200
    np.testing.assert_allclose(out.shape[0] / image.shape[0], out.shape[1] / image.shape[1], rtol=0.05)
    # boxes track the resized masks (±1 px rasterization)
    for i in range(len(a["boxes2d"])):
        mb = _mask_box(a["masks"][i])
        np.testing.assert_allclose(a["boxes2d"][i], mb, atol=1.5)


def test_fixed_size_crop_pads_small_images():
    np.random.seed(0)
    image, info = _sample(h=40, w=50)
    out, info = FixedSizeCrop(crop_size=(64, 64), pad_value=128.0)(image, info)
    assert out.shape[:2] == (64, 64)
    a = info["annotations"]
    assert a["masks"].shape[1:] == (64, 64)
    assert a["sem_seg"].shape == (64, 64)
    # padded image region holds pad_value; padded sem_seg holds 255
    assert np.all(out[50:, :] == 128.0)
    assert np.all(a["sem_seg"][:, 55:] == 255)
    # boxes unchanged (no crop when smaller)
    for i in range(len(a["boxes2d"])):
        np.testing.assert_allclose(a["boxes2d"][i], _mask_box(a["masks"][i]), atol=1.5)


def test_fixed_size_crop_crops_large_images():
    np.random.seed(1)
    image, info = _sample(h=80, w=120)
    out, info = FixedSizeCrop(crop_size=(48, 48))(image, info)
    assert out.shape[:2] == (48, 48)
    a = info["annotations"]
    # surviving masks agree with shifted boxes
    for i in range(len(a["masks"])):
        if a["masks"][i].any():
            np.testing.assert_allclose(
                np.clip(a["boxes2d"][i], 0, 48), _mask_box(a["masks"][i]), atol=1.5
            )


def test_lsj_chain_then_rasterize_drops_empty():
    np.random.seed(7)
    image, info = _sample(h=100, w=150, n=4)
    image, info = ResizeScale(0.3, 1.5, 96, 96)(image, info)
    image, info = FixedSizeCrop((96, 96))(image, info)
    image, info = RasterizeMasks(height=96, width=96, stride=4)(image, info)
    a = info["annotations"]
    n = len(a["boxes2d"])
    assert len(a["classes"]) == n and len(a["masks_fixed"]) == n
    # every kept instance has a nonempty full-res mask
    for m in a["masks"]:
        assert m.any()


def test_flip_mask_box_consistency():
    np.random.seed(2)
    image, info = _sample()
    out, info = RandomFlip(prob=1.0, horizontal=True)(image, info)
    a = info["annotations"]
    for i in range(len(a["boxes2d"])):
        np.testing.assert_allclose(a["boxes2d"][i], _mask_box(a["masks"][i]), atol=1.5)
    np.testing.assert_allclose(out, image[:, ::-1])


def test_color_augs_shapes_and_ranges():
    np.random.seed(4)
    image, info = _sample()
    img8 = image.astype(np.uint8)
    for aug in [
        Distortion(hue=0.1, saturation=1.5, exposure=1.5, image_format="BGR"),
        RandomBrightness(0.6, 1.4),
        RandomSaturation(0.6, 1.4),
        RandomLightning(0.1, prob=1.0),
        RandomSwapChannels(prob=1.0),
    ]:
        out, _ = aug(img8.copy(), dict(info))
        assert out.shape == img8.shape
        assert out.dtype == np.uint8
        assert out.min() >= 0 and out.max() <= 255


def test_brightness_blend_semantics():
    np.random.seed(5)
    image = np.full((8, 8, 3), 100, np.uint8)
    out, _ = RandomBrightness(0.5, 0.5, prob=1.0)(image, {})
    assert np.all(out == 50)  # w=0.5 → 0.5·img


def test_resize_shortest_edge_masks():
    np.random.seed(6)
    image, info = _sample(h=60, w=90)
    out, info = ResizeShortestEdge([30], max_size=1000)(image, info)
    assert min(out.shape[:2]) == 30
    assert info["annotations"]["masks"].shape[1:] == out.shape[:2]


# ---------------------------------------------------------------------------
# panoptic dataset segment targets
# ---------------------------------------------------------------------------


def _write_panoptic_set(root):
    os.makedirs(f"{root}/val2017", exist_ok=True)
    os.makedirs(f"{root}/panoptic_val2017", exist_ok=True)
    os.makedirs(f"{root}/annotations", exist_ok=True)
    h, w = 48, 64
    img = np.random.RandomState(0).uniform(0, 255, (h, w, 3)).astype(np.uint8)
    cv2.imwrite(f"{root}/val2017/000001.jpg", img)
    # panoptic PNG: two segments, ids 5 (thing) and 9 (stuff)
    pan = np.zeros((h, w), np.int64)
    pan[5:20, 5:25] = 5
    pan[30:, :] = 9
    png = np.zeros((h, w, 3), np.uint8)
    png[..., 2] = pan % 256  # R channel (cv2 writes BGR)
    cv2.imwrite(f"{root}/panoptic_val2017/000001.png", png)
    inst = {
        "images": [{"id": 1, "file_name": "000001.jpg", "height": h, "width": w}],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 1, "bbox": [5, 5, 20, 15],
             "area": 300, "iscrowd": 0}
        ],
        "categories": [{"id": 1, "name": "thing_a"}],
    }
    panj = {
        "annotations": [
            {
                "image_id": 1,
                "file_name": "000001.png",
                "segments_info": [
                    {"id": 5, "category_id": 1, "iscrowd": 0, "area": 300},
                    {"id": 9, "category_id": 200, "iscrowd": 0, "area": 800},
                ],
            }
        ],
        "categories": [
            {"id": 1, "name": "thing_a", "isthing": 1},
            {"id": 200, "name": "stuff_b", "isthing": 0},
        ],
    }
    with open(f"{root}/annotations/instances_val2017.json", "w") as f:
        json.dump(inst, f)
    with open(f"{root}/annotations/panoptic_val2017.json", "w") as f:
        json.dump(panj, f)


def test_panoptic_dataset_segment_targets(tmp_path):
    from efg_tpu.config.config import Config
    from efg_tpu.data.datasets.coco import COCOPanopticDataset

    root = str(tmp_path)
    _write_panoptic_set(root)
    cfg = Config(
        dict(
            task="val",
            dataset=dict(
                type="COCOPanopticDataset",
                source=dict(
                    root=root,
                    val_images="/val2017",
                    val_json="/annotations/instances_val2017.json",
                    panoptic_val_json="/annotations/panoptic_val2017.json",
                    panoptic_val_images="/panoptic_val2017",
                ),
                filter_empty_annotations=False,
                processors=dict(val=[]),
            ),
        )
    )
    ds = COCOPanopticDataset(cfg)
    assert ds.pan_cat_to_contiguous == {1: 0, 200: 1}
    assert ds.thing_contiguous_ids == {0}
    image, info = ds[0]
    a = info["annotations"]
    assert len(a["masks"]) == 2
    assert list(a["classes"]) == [0, 1]
    # thing segment box from its mask
    np.testing.assert_allclose(a["boxes2d"][0], [5, 5, 25, 20])
    # eval-side originals kept at full res
    assert a["pan_gt"].shape == image.shape[:2]
    assert a["gt_segments"] == {5: 0, 9: 1}
