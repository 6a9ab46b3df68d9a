"""Round-trip test for the self-contained Waymo TFRecord decoder.

Encodes a synthetic Frame proto through the same schema table, decodes it,
and checks (a) the range-image → point math against a direct oracle,
(b) the annos/box schema `data/datasets/waymo.py` consumes.
"""

import os
import struct
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "cli", "data_preparation", "waymo"))

import tfrecord_decoder as TD


# --- mini protobuf encoder (wire format) -----------------------------------

def _varint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(fnum, wtype):
    return _varint((fnum << 3) | wtype)


def f_double(fnum, val):
    return _tag(fnum, 1) + struct.pack("<d", val)


def f_varint(fnum, val):
    return _tag(fnum, 0) + _varint(val)


def f_bytes(fnum, val):
    return _tag(fnum, 2) + _varint(len(val)) + val


def f_packed_doubles(fnum, vals):
    return f_bytes(fnum, b"".join(struct.pack("<d", v) for v in vals))


def f_packed_floats(fnum, vals):
    return f_bytes(fnum, np.asarray(vals, "<f4").tobytes())


def f_packed_ints(fnum, vals):
    return f_bytes(fnum, b"".join(_varint(v) for v in vals))


def enc_matrix_float(arr):
    shape = f_bytes(TD.MATRIX_FLOAT["shape"], f_packed_ints(TD.MATRIX_SHAPE["dims"], arr.shape))
    return f_packed_floats(TD.MATRIX_FLOAT["data"], arr.ravel()) + shape


def enc_transform(mat16):
    return f_packed_doubles(TD.TRANSFORM["transform"], np.asarray(mat16).ravel())


def make_frame(rs):
    h, w = 8, 64
    ri = np.zeros((h, w, 4), np.float32)
    mask = rs.rand(h, w) < 0.6
    ri[..., 0] = np.where(mask, rs.uniform(2, 60, (h, w)), 0).astype(np.float32)
    ri[..., 1] = rs.uniform(0, 1, (h, w))
    ri[..., 2] = rs.uniform(0, 1, (h, w))

    extrinsic = np.eye(4)
    extrinsic[:3, 3] = [1.2, 0.1, 2.0]
    inc_min, inc_max = -0.3, 0.1

    calib = (
        f_varint(TD.LASER_CALIB["name"], 2)  # non-TOP: no pixel pose path
        + f_double(TD.LASER_CALIB["beam_inclination_min"], inc_min)
        + f_double(TD.LASER_CALIB["beam_inclination_max"], inc_max)
        + f_bytes(TD.LASER_CALIB["extrinsic"], enc_transform(extrinsic))
    )
    stats = f_bytes(TD.STATS["location"], b"loc") + f_bytes(TD.STATS["time_of_day"], b"Day")
    ctx = (
        f_bytes(TD.CONTEXT["name"], b"seq0")
        + f_bytes(TD.CONTEXT["laser_calibrations"], calib)
        + f_bytes(TD.CONTEXT["stats"], stats)
    )
    ri_msg = f_bytes(
        TD.RANGE_IMAGE["range_image_compressed"], zlib.compress(enc_matrix_float(ri))
    )
    laser = f_varint(TD.LASER["name"], 2) + f_bytes(TD.LASER["ri_return1"], ri_msg)

    pose = np.eye(4)
    theta = 0.3
    pose[:2, :2] = [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    pose[:3, 3] = [100.0, -50.0, 2.0]

    boxvals = dict(center_x=5.0, center_y=-2.0, center_z=0.5,
                   width=1.9, length=4.5, height=1.6, heading=0.7)
    box = b"".join(f_double(TD.BOX[k], v) for k, v in boxvals.items())
    meta = f_double(TD.METADATA["speed_x"], 3.0) + f_double(TD.METADATA["speed_y"], -1.0)
    label = (
        f_bytes(TD.LABEL["box"], box)
        + f_bytes(TD.LABEL["metadata"], meta)
        + f_varint(TD.LABEL["type"], 1)
        + f_bytes(TD.LABEL["id"], b"obj-1")
        + f_varint(TD.LABEL["detection_difficulty_level"], 0)
        + f_varint(TD.LABEL["num_lidar_points_in_box"], 12)
    )

    frame = (
        f_bytes(TD.FRAME["context"], ctx)
        + f_varint(TD.FRAME["timestamp_micros"], 1234567)
        + f_bytes(TD.FRAME["pose"], enc_transform(pose))
        + f_bytes(TD.FRAME["lasers"], laser)
        + f_bytes(TD.FRAME["laser_labels"], label)
    )
    return frame, ri, extrinsic, (inc_min, inc_max), pose, boxvals


def test_roundtrip_decode(tmp_path):
    rs = np.random.RandomState(0)
    frame, ri, extrinsic, (imin, imax), pose, boxvals = make_frame(rs)

    rec = str(tmp_path / "f.tfrecord")
    TD.write_tfrecord(rec, [frame, frame])
    payloads = list(TD.read_tfrecord(rec))
    assert len(payloads) == 2 and payloads[0] == frame

    lidar, annos = TD.decode_frame_bytes(payloads[0], 0)

    # --- points vs direct oracle -------------------------------------------
    h, w = ri.shape[:2]
    incl = TD.compute_inclination(imin, imax, h)[::-1]
    az = ((np.arange(w, 0, -1) - 0.5) / w * 2 - 1) * np.pi  # extrinsic yaw 0
    r = ri[..., 0]
    m = r > 0
    x = np.cos(incl)[:, None] * np.cos(az)[None] * r + extrinsic[0, 3]
    y = np.cos(incl)[:, None] * np.sin(az)[None] * r + extrinsic[1, 3]
    z = np.sin(incl)[:, None] * r + extrinsic[2, 3]
    want = np.stack([x[m], y[m], z[m]], -1)
    got = lidar["lidars"]["points_xyz"]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        lidar["lidars"]["points_feature"], np.stack([ri[..., 1][m], ri[..., 2][m]], -1),
        rtol=1e-6,
    )
    assert lidar["frame_name"] == "seq0_loc_Day_1234567"

    # --- annos --------------------------------------------------------------
    np.testing.assert_allclose(annos["veh_to_global"].reshape(4, 4), pose)
    (obj,) = annos["objects"]
    assert obj["label"] == 1 and obj["name"] == "obj-1"
    assert obj["num_points"] == 12
    assert obj["combined_difficulty_level"] == 1
    b = obj["box"]
    np.testing.assert_allclose(
        b[:6],
        [boxvals["center_x"], boxvals["center_y"], boxvals["center_z"],
         boxvals["length"], boxvals["width"], boxvals["height"]],
        rtol=1e-6,
    )
    assert b[8] == pytest.approx(boxvals["heading"])
    # velocity rotated into the ref frame by poseᵀ
    want_vel = pose[:3, :3].T @ np.array([3.0, -1.0, 0.0])
    np.testing.assert_allclose(b[6:8], want_vel[:2], rtol=1e-5)


def test_convert_record_writes_pipeline_schema(tmp_path):
    rs = np.random.RandomState(1)
    frame = make_frame(rs)[0]
    rec = str(tmp_path / "s.tfrecord")
    TD.write_tfrecord(rec, [frame])
    lidar_dir = str(tmp_path / "train" / "lidar")
    anno_dir = str(tmp_path / "train" / "annos")
    os.makedirs(lidar_dir)
    os.makedirs(anno_dir)
    n = TD.convert_record(rec, 0, lidar_dir, anno_dir)
    assert n == 1
    import pickle

    with open(os.path.join(lidar_dir, "seq_0_frame_0.pkl"), "rb") as f:
        lidar = pickle.load(f)
    assert set(lidar) == {"scene_name", "frame_name", "frame_id", "lidars"}
    assert lidar["lidars"]["points_xyz"].dtype == np.float32
