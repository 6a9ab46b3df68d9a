"""Round-4 parity crumbs: GTDrop / GTDropByCat / RandomCropPoints /
FilterByRangeXY (reference `efg/data/augmentations/extend_3d.py:286-530`)
and the COCO keypoints variant (reference `coco.py:50-51,364-373`,
`utils.py:161-169,232-250`)."""

from __future__ import annotations

import numpy as np

from efg_tpu.data.processors.extend_3d import (
    FilterByRangeXY,
    GTDrop,
    GTDropByCat,
    RandomCropPoints,
)
from efg_tpu.geometry import box_ops_np as G


def _scene(n_boxes=6, n_points=400, seed=0):
    rs = np.random.RandomState(seed)
    boxes = np.zeros((n_boxes, 7), np.float32)
    boxes[:, :2] = rs.uniform(-30, 30, (n_boxes, 2))
    boxes[:, 2] = rs.uniform(-1, 1, n_boxes)
    boxes[:, 3:6] = rs.uniform(2, 5, (n_boxes, 3))
    boxes[:, 6] = rs.uniform(-np.pi, np.pi, n_boxes)
    points = rs.uniform(-50, 50, (n_points, 4)).astype(np.float32)
    # seed some points inside each box center
    for b in boxes:
        points = np.concatenate(
            [points, b[None, :4] * [1, 1, 1, 0] + [0, 0, 0, 0.5]], axis=0
        ).astype(np.float32)
    names = np.array(["car", "pedestrian", "cyclist"] * (n_boxes // 3 + 1))[:n_boxes]
    info = {"annotations": {"gt_boxes": boxes.copy(), "gt_names": names.copy()}}
    return points, info


def test_gtdrop_removes_boxes_and_their_points():
    np.random.seed(3)
    points, info = _scene()
    boxes0 = info["annotations"]["gt_boxes"].copy()
    aug = GTDrop(ratio=[0.999, 1.0])  # drop everything
    pts, info = aug(points.copy(), info)
    assert len(info["annotations"]["gt_boxes"]) == 0
    # no remaining point lies inside any original box
    inside = G.points_in_rbbox(pts, boxes0)
    assert not inside.any()


def test_gtdrop_zero_ratio_is_identity():
    np.random.seed(4)
    points, info = _scene()
    n0 = len(info["annotations"]["gt_boxes"])
    pts, info = GTDrop(ratio=[0.0, 0.0])(points.copy(), info)
    assert len(info["annotations"]["gt_boxes"]) == n0
    assert len(pts) == len(points)


def test_gtdrop_by_cat_only_touches_listed_categories():
    np.random.seed(5)
    points, info = _scene()
    names0 = info["annotations"]["gt_names"].copy()
    # keep all cars/pedestrians (ratio 0); cyclists unlisted -> dropped
    # entirely (reference semantics: keep-mask is the union of per-cat keeps)
    aug = GTDropByCat(ratio=[0.0, [0.0, 0.0]], categories=["car", "pedestrian"])
    pts, info = aug(points.copy(), info)
    kept = info["annotations"]["gt_names"]
    assert set(kept) <= {"car", "pedestrian"}
    assert (kept == "car").sum() == (names0 == "car").sum()
    assert (kept == "pedestrian").sum() == (names0 == "pedestrian").sum()


def test_filter_by_range_xy_uses_bev_center():
    pc_range = [-10, -10, -5, 10, 10, 5]
    boxes = np.array(
        [
            [0, 0, 100.0, 2, 2, 2, 0.0],  # center xy inside, z far out: KEPT (xy-only)
            [50, 0, 0.0, 2, 2, 2, 0.0],  # xy outside: dropped
        ],
        np.float32,
    )
    points = np.random.RandomState(0).uniform(-20, 20, (50, 4)).astype(np.float32)
    info = {"annotations": {"gt_boxes": boxes, "gt_names": np.array(["car", "car"])}}
    pts, info = FilterByRangeXY(pc_range)(points, info)
    assert len(info["annotations"]["gt_boxes"]) == 1
    assert info["annotations"]["gt_boxes"][0, 2] == 100.0
    assert G.mask_points_by_range(pts, np.asarray(pc_range)).all()


def test_random_crop_points_rescales_to_full_range():
    np.random.seed(7)
    pc_range = [-40, -40, -3, 40, 40, 3]
    points, info = _scene()
    aug = RandomCropPoints("relative", [0.5], pc_range, p=1.0)
    pts, info = aug(points.copy(), info)
    # cropped-then-rescaled points span at most the original BEV range
    assert np.abs(pts[:, 0]).max() <= 40 + 1e-3
    assert np.abs(pts[:, 1]).max() <= 40 + 1e-3
    # boxes were rescaled consistently (dims doubled at 0.5 crop)
    if len(info["annotations"]["gt_boxes"]):
        assert info["annotations"]["gt_boxes"][:, 3].min() >= 2 * 2 - 1e-4


def test_random_crop_points_p0_identity():
    points, info = _scene(seed=2)
    aug = RandomCropPoints("relative", [0.5], [-40, -40, -3, 40, 40, 3], p=0.0)
    pts, info2 = aug(points.copy(), info)
    np.testing.assert_allclose(pts, points)


# ---------------------------------------------------------------------------
# COCO keypoints variant
# ---------------------------------------------------------------------------


def test_keypoint_hflip_indices_matches_d2_semantics():
    from efg_tpu.data.datasets.coco import (
        COCO_PERSON_KEYPOINT_NAMES,
        keypoint_hflip_indices,
    )

    idx = keypoint_hflip_indices()
    names = COCO_PERSON_KEYPOINT_NAMES
    assert idx[names.index("nose")] == names.index("nose")
    assert idx[names.index("left_eye")] == names.index("right_eye")
    assert idx[names.index("right_wrist")] == names.index("left_wrist")
    # involution
    assert (idx[idx] == np.arange(len(names))).all()


def test_keypoints_flow_flip_resize_pad_collate():
    import pytest

    pytest.importorskip("cv2")
    from efg_tpu.data.builder import collate_fixed
    from efg_tpu.data.datasets.coco import keypoint_hflip_indices
    from efg_tpu.data.processors.basic_2d import PadImage, RandomFlip, ResizeShortestEdge

    h, w, K = 50, 80, 17
    image = np.zeros((h, w, 3), np.float32)
    kp = np.zeros((1, K, 3), np.float32)
    kp[0, 1] = [10.5, 20.5, 2]  # left_eye
    kp[0, 2] = [30.5, 20.5, 2]  # right_eye
    info = {
        "metadata": {"keypoint_hflip_indices": keypoint_hflip_indices()},
        "annotations": {
            "boxes2d": np.array([[5, 5, 40, 45]], np.float32),
            "classes": np.zeros(1, np.int64),
            "keypoints": kp.copy(),
        },
    }
    flip = RandomFlip(prob=1.0)
    image2, info = flip(image, info)
    got = info["annotations"]["keypoints"]
    # after hflip: left_eye slot holds the mirrored former right_eye
    np.testing.assert_allclose(got[0, 1, 0], w - 30.5)
    np.testing.assert_allclose(got[0, 2, 0], w - 10.5)
    assert got[0, 1, 2] == 2 and got[0, 2, 2] == 2

    rs = ResizeShortestEdge([100], max_size=1000)
    image2, info = rs(image2, info)
    scale = 100 / min(h, w)
    np.testing.assert_allclose(
        info["annotations"]["keypoints"][0, 2, 0], (w - 10.5) * scale, rtol=1e-5
    )

    pad = PadImage(128, 192)
    data, info = pad(image2, info)
    # in-canvas keypoints keep visibility
    assert info["annotations"]["keypoints"][0, 1, 2] == 2

    batch = collate_fixed([(data, info)], max_gt=8)
    assert batch["gt_keypoints"].shape == (1, 8, K, 3)
    np.testing.assert_allclose(
        batch["gt_keypoints"][0, 0], info["annotations"]["keypoints"][0]
    )


def test_padimage_zeroes_out_of_canvas_keypoints():
    from efg_tpu.data.processors.basic_2d import PadImage

    image = np.zeros((40, 40, 3), np.float32)
    kp = np.zeros((1, 2, 3), np.float32)
    kp[0, 0] = [10, 10, 2]
    kp[0, 1] = [-3, 10, 2]  # off-canvas (e.g. cropped away)
    info = {"annotations": {"keypoints": kp, "boxes2d": np.zeros((1, 4), np.float32),
                            "classes": np.zeros(1, np.int64)}}
    _, info = PadImage(64, 64)(image, info)
    out = info["annotations"]["keypoints"]
    assert out[0, 0, 2] == 2
    assert out[0, 1, 2] == 0
