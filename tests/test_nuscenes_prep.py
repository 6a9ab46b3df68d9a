"""nuScenes data prep (devkit-free): infos builder extras + KITTI converter
against a synthetic on-disk fixture of the relational JSON tables."""

import json
import os

import numpy as np


def _write_fixture(root):
    version = "v1.0-mini"
    os.makedirs(os.path.join(root, version), exist_ok=True)
    os.makedirs(os.path.join(root, "samples"), exist_ok=True)

    q = [1.0, 0.0, 0.0, 0.0]
    scenes = [dict(token="sc0", name="scene-0001", first_sample_token="s0")]
    samples = [
        dict(token="s0", scene_token="sc0", timestamp=1_000_000, prev="", next="s1",
             anns=["a0"]),
        dict(token="s1", scene_token="sc0", timestamp=1_500_000, prev="s0", next="",
             anns=["a1"]),
    ]
    sample_data, ego_pose, calib = [], [], []
    for i, s in enumerate(samples):
        fname = f"samples/LIDAR_TOP_{i}.pcd.bin"
        pts = np.random.RandomState(i).randn(50, 5).astype(np.float32)
        pts.tofile(os.path.join(root, fname))
        sample_data.append(
            dict(token=f"sd{i}", sample_token=s["token"], filename=fname,
                 is_key_frame=True, timestamp=s["timestamp"],
                 calibrated_sensor_token=f"cs{i}", ego_pose_token=f"ep{i}",
                 prev="", next="")
        )
        ego_pose.append(dict(token=f"ep{i}", rotation=q, translation=[float(i), 0.0, 0.0]))
        calib.append(dict(token=f"cs{i}", rotation=q, translation=[0.0, 0.0, 1.8]))

    anns = [
        dict(token=f"a{i}", sample_token=f"s{i}", instance_token="in0",
             translation=[5.0 + i, 2.0, 0.5], size=[1.8, 4.2, 1.6],
             rotation=q, prev="", next="")
        for i in range(2)
    ]
    instances = [dict(token="in0", category_token="cat0")]
    categories = [dict(token="cat0", name="vehicle.car")]
    lidarseg = []
    for i in range(2):
        lab = f"lidarseg/{i}.bin"
        os.makedirs(os.path.join(root, "lidarseg"), exist_ok=True)
        np.full(50, 17, np.uint8).tofile(os.path.join(root, lab))
        lidarseg.append(dict(token=f"ls{i}", sample_data_token=f"sd{i}", filename=lab))

    tables = dict(scene=scenes, sample=samples, sample_data=sample_data,
                  ego_pose=ego_pose, calibrated_sensor=calib,
                  sample_annotation=anns, instance=instances, category=categories,
                  lidarseg=lidarseg)
    for name, rows in tables.items():
        with open(os.path.join(root, version, f"{name}.json"), "w") as f:
            json.dump(rows, f)
    return version


def test_build_infos_with_seg(tmp_path):
    from cli.data_preparation.nuscenes.create_data import build_infos

    root = str(tmp_path)
    version = _write_fixture(root)
    infos = build_infos(root, version, nsweeps=2, seg=True)
    assert len(infos) == 2
    info = sorted(infos, key=lambda i: i["sample_token"])[0]
    assert info["annotations"]["gt_boxes"].shape == (1, 9)
    # box center in lidar frame: global (5, 2, 0.5) − ego(0,0,0) − sensor z 1.8
    np.testing.assert_allclose(
        info["annotations"]["gt_boxes"][0, :3], [5.0, 2.0, -1.3], atol=1e-5
    )
    assert info["annotations"]["lidarseg"]["filename"].startswith("lidarseg/")


def test_nuscenes2kitti_roundtrip(tmp_path):
    from cli.data_preparation.nuscenes.nuscenes2kitti import convert_scenes

    root = str(tmp_path / "nusc")
    out = str(tmp_path / "kitti")
    os.makedirs(root)
    version = _write_fixture(root)
    n = convert_scenes(root, out, version)
    assert n == 2
    seq = os.path.join(out, "0001")
    pts = np.fromfile(os.path.join(seq, "velodyne", "000000.bin"), np.float32).reshape(-1, 4)
    assert pts.shape == (50, 4)
    lab = np.fromfile(os.path.join(seq, "labels", "000000.label"), np.uint32)
    assert lab.shape == (50,) and (lab & 0xFFFF == 17).all()
    poses = np.loadtxt(os.path.join(seq, "poses.txt"))
    assert poses.shape == (2, 12)
    # second scan is +1 m in x relative to the first
    np.testing.assert_allclose(poses[1].reshape(3, 4)[:, 3], [1.0, 0.0, 0.0], atol=1e-6)
    assert len(open(os.path.join(seq, "lidar_tokens.txt")).read().split()) == 2
