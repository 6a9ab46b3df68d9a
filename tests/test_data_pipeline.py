"""Host data pipeline: augs, GT-database sampling, loader/collate."""

import os
import pickle

import numpy as np
import pytest

from efg_tpu.config import Config
from efg_tpu.data.builder import DataLoader, build_processors, collate_fixed
from efg_tpu.data.processors.extend_3d import (
    GlobalRotation,
    GlobalScaling,
    PadPoints,
    RandomFlip3D,
)
from efg_tpu.data.samplers.dataset_sampler import InfiniteSampler, InferenceSampler


def _info(n_gt=3, seed=0):
    rs = np.random.RandomState(seed)
    boxes = np.column_stack(
        [rs.uniform(-10, 10, (n_gt, 3)), rs.uniform(1, 4, (n_gt, 3)),
         rs.randn(n_gt, 2), rs.uniform(-np.pi, np.pi, n_gt)]
    ).astype(np.float32)
    return {
        "metadata": {"num_point_features": 5, "db_path": ""},
        "annotations": {
            "gt_boxes": boxes,
            "gt_names": np.asarray(["VEHICLE"] * n_gt),
            "labels": np.ones(n_gt, np.int64),
        },
        "sweeps": [],
    }


def test_flip_consistency():
    rs = np.random.RandomState(0)
    pts = rs.uniform(-10, 10, (100, 5)).astype(np.float32)
    info = _info()
    box0 = info["annotations"]["gt_boxes"][0].copy()
    np.random.seed(1)  # both flips fire
    aug = RandomFlip3D(p=1.0)
    pts2, info2 = aug(pts.copy(), info)
    b = info2["annotations"]["gt_boxes"][0]
    # double flip: x and y both negated
    np.testing.assert_allclose(b[:2], -box0[:2], atol=1e-6)
    # velocities flipped
    np.testing.assert_allclose(b[6:8], -box0[6:8], atol=1e-6)


def test_rotation_preserves_points_in_box_membership():
    from efg_tpu.geometry import box_ops_np as G

    rs = np.random.RandomState(2)
    info = _info(seed=3)
    boxes = info["annotations"]["gt_boxes"]
    b7 = boxes[:, [0, 1, 2, 3, 4, 5, 8]]
    # points at box centers stay inside after rotation
    pts = np.concatenate([b7[:, :3], np.zeros((3, 2))], axis=1).astype(np.float32)
    aug = GlobalRotation(rotation=0.7)
    pts2, info2 = aug(pts.copy(), info)
    b7b = info2["annotations"]["gt_boxes"][:, [0, 1, 2, 3, 4, 5, 8]]
    inside = G.points_in_rbbox(pts2, b7b)
    assert inside.diagonal().all()


def test_gt_database_sampler(tmp_path):
    # build a tiny on-disk crop db in the reference format
    from efg_tpu.data.samplers.gt_database_sampler import DataBaseSampler

    rs = np.random.RandomState(4)
    db_dir = tmp_path / "gtdb"
    db_dir.mkdir()
    infos = {"VEHICLE": []}
    for i in range(6):
        pts = rs.randn(20, 5).astype(np.float32)
        fn = f"v_{i}.bin"
        (db_dir / fn).write_bytes(pts.tobytes())
        infos["VEHICLE"].append(
            dict(
                name="VEHICLE", path=f"gtdb/{fn}",
                box3d_lidar=np.array([50.0 + 12 * i, 0, 0, 4, 2, 1.5, 0, 0, 0.0], np.float32),
                num_points_in_gt=20, difficulty=0,
            )
        )
    with open(tmp_path / "db_infos.pkl", "wb") as f:
        pickle.dump(infos, f)

    sampler = DataBaseSampler(
        str(tmp_path / "db_infos.pkl"), [{"VEHICLE": 5}], min_points=1
    )
    gt_boxes = np.array([[0, 0, 0, 4, 2, 1.5, 0, 0, 0.0]], np.float32)
    out = sampler.sample_all(str(tmp_path), gt_boxes, np.asarray(["VEHICLE"]), 5)
    assert out is not None
    assert 1 <= len(out["gt_boxes"]) <= 4  # topped up toward quota of 5
    assert out["points"].shape[1] == 5
    # sampled boxes don't collide with the original gt
    from efg_tpu.geometry import box_ops_np as G

    ca = G.boxes_to_corners_bev(gt_boxes)
    cb = G.boxes_to_corners_bev(out["gt_boxes"])
    assert not G.box_collision_test(ca, cb).any()


def test_loader_fixed_shapes_and_order():
    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            pts = np.full((50, 5), i, np.float32)
            data, info = PadPoints(num_points=64)(pts, _info(seed=i))
            return data, info

    loader = DataLoader(DS(), InferenceSampler(10), batch_size=2, max_gt=8, drop_last=False)
    batches = list(loader)
    assert len(batches) == 5
    b0 = batches[0]
    assert b0["points"].shape == (2, 64, 5)
    assert b0["gt_boxes"].shape == (2, 8, 9)
    assert b0["points_mask"][0].sum() == 50
    # order preserved for eval
    assert b0["points"][0, 0, 0] == 0 and b0["points"][1, 0, 0] == 1


def test_infinite_sampler_shards():
    s0 = InfiniteSampler(10, shuffle=False, rank=0, world_size=2)
    s1 = InfiniteSampler(10, shuffle=False, rank=1, world_size=2)
    it0, it1 = iter(s0), iter(s1)
    a = [next(it0) for _ in range(5)]
    b = [next(it1) for _ in range(5)]
    assert set(a) | set(b) == set(range(10))
    assert not (set(a) & set(b))
