"""Native host kernels (C++ via ctypes) with numpy fallbacks.

The reference implemented its host hot loops natively (numba CPU voxelizer,
CUDA points-in-box); here a small C++ library covers the same host-side
work for the dataloader. `available()` is False until
`python setup_native.py` has been run — every caller falls back to the
vectorized numpy implementations transparently.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libefg_host.so")
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.points_to_voxel.restype = ctypes.c_int64
        lib.points_to_voxel.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.points_in_rbbox.restype = None
        lib.points_in_rbbox.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.box_collision_test.restype = None
        lib.box_collision_test.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.tfrecord_scan.restype = ctypes.c_int64
        lib.tfrecord_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def points_to_voxel(
    points: np.ndarray, voxel_size, pc_range, max_points: int, max_voxels: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native hard voxelizer (same contract as `ops.voxelize_np`)."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    n, c = points.shape
    vs = np.ascontiguousarray(voxel_size, np.float32)
    rng = np.ascontiguousarray(pc_range, np.float32)
    voxels = np.zeros((max_voxels, max_points, c), np.float32)
    coords = np.zeros((max_voxels, 3), np.int32)
    num = np.zeros(max_voxels, np.int32)
    nvox = lib.points_to_voxel(
        _fptr(points), n, c, _fptr(vs), _fptr(rng),
        max_points, max_voxels,
        _fptr(voxels),
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        num.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return voxels[:nvox], coords[:nvox], num[:nvox]


def points_in_rbbox(points: np.ndarray, boxes: np.ndarray, margin: float = 0.0) -> np.ndarray:
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    boxes = np.ascontiguousarray(boxes, np.float32)
    n, cp = points.shape
    m, cb = boxes.shape
    out = np.zeros((n, m), np.uint8)
    lib.points_in_rbbox(
        _fptr(points), n, cp, _fptr(boxes), m, cb,
        ctypes.c_float(margin),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)


def box_collision_test(corners_a: np.ndarray, corners_b: np.ndarray) -> np.ndarray:
    """[N, 4, 2] × [K, 4, 2] BEV corner polygons → [N, K] bool overlap
    (same contract as `geometry.box_ops_np.box_collision_test`)."""
    lib = _load()
    ca = np.ascontiguousarray(corners_a, np.float32)
    cb = np.ascontiguousarray(corners_b, np.float32)
    n, k = ca.shape[0], cb.shape[0]
    out = np.zeros((n, k), np.uint8)
    if n and k:
        lib.box_collision_test(
            _fptr(ca), n, _fptr(cb), k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
    return out.astype(bool)


def tfrecord_scan(path: str, verify_payload_crc: bool = True):
    """Scan a TFRecord file natively (framing + masked-CRC32C checks the
    pure-python decoder skips) → (offsets, lengths) int64 arrays of every
    payload. Raises on a corrupt record."""
    lib = _load()
    pathb = os.fsencode(path)
    null = ctypes.POINTER(ctypes.c_int64)()
    count = lib.tfrecord_scan(pathb, 0, int(verify_payload_crc), null, null)
    if count < 0:
        raise IOError(f"corrupt TFRecord {path!r} at record {-count - 1}")
    offsets = np.zeros(count, np.int64)
    lengths = np.zeros(count, np.int64)
    if count:
        got = lib.tfrecord_scan(
            pathb, count, 0,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
        if got != count:
            raise IOError(f"TFRecord {path!r} changed during scan")
    return offsets, lengths
