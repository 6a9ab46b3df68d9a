"""CenterPoint decode + post-processing parity vs the reference torch code.

The reference predict path (`/root/reference/playground/detection.3d/waymo/
center_point/centerpoint.waymo.voxelnet.gt_aug.ds_sample.onecycle.adam.bs48
.36e/center_head.py:204-377`) decodes dense head maps (sigmoid hm, exp dim,
atan2 rot, sub-pixel xy) and runs score/range masking + class-agnostic
rotated NMS (`box_torch_ops.py:237-263` rotate_nms_pcdet, whose kernel is
CUDA-only). Here:

- the decode section runs as the reference's own torch ops (replicated
  verbatim from center_head.py:217-292, single task, no flip) and must
  match `decode_boxes` bit-for-bit,
- `CenterHead.post_processing` runs UNMODIFIED with rotate_nms_pcdet
  stubbed by an independent numpy greedy rotated NMS (polygon-clip IoU
  written in this file, not efg_tpu code) and must agree with
  `post_process_sample` on kept boxes/scores/labels — this pins the
  masking, ordering, and suppression semantics our TPU NMS implements.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

REF_EXP = (
    "/root/reference/playground/detection.3d/waymo/center_point/"
    "centerpoint.waymo.voxelnet.gt_aug.ds_sample.onecycle.adam.bs48.36e"
)

PC_RANGE = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
VOXEL = (0.1, 0.1, 0.15)
OSF = 8


# ---------------------------------------------------------------------------
# independent numpy rotated-IoU + greedy NMS oracle (pcdet semantics)
# ---------------------------------------------------------------------------


def _corners_bev(box):
    """[x, y, z, l, w, h, yaw] → 4 BEV corners (CCW)."""
    x, y, _, dl, dw, _, yaw = box[:7]
    c, s = np.cos(yaw), np.sin(yaw)
    dx, dy = dl / 2, dw / 2
    pts = np.array([[dx, dy], [-dx, dy], [-dx, -dy], [dx, -dy]])
    rot = np.array([[c, -s], [s, c]])
    return pts @ rot.T + np.array([x, y])


def _poly_clip(subject, clip):
    """Sutherland–Hodgman clipping of polygon `subject` by convex `clip`."""
    out = list(subject)
    n = len(clip)
    for i in range(n):
        a, b = clip[i], clip[(i + 1) % n]
        edge = np.array([b[0] - a[0], b[1] - a[1]])
        inp, out = out, []
        if not inp:
            break
        prev = inp[-1]
        for cur in inp:
            side_cur = edge[0] * (cur[1] - a[1]) - edge[1] * (cur[0] - a[0])
            side_prev = edge[0] * (prev[1] - a[1]) - edge[1] * (prev[0] - a[0])
            if side_cur >= 0:
                if side_prev < 0:
                    t = side_prev / (side_prev - side_cur)
                    out.append(prev + t * (np.asarray(cur) - prev))
                out.append(np.asarray(cur, float))
            elif side_prev >= 0:
                t = side_prev / (side_prev - side_cur)
                out.append(prev + t * (np.asarray(cur) - prev))
            prev = np.asarray(cur, float)
    return out


def _poly_area(pts):
    if len(pts) < 3:
        return 0.0
    p = np.asarray(pts)
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _bev_iou(b1, b2):
    c1, c2 = _corners_bev(b1), _corners_bev(b2)
    inter = _poly_area(_poly_clip(c1, c2))
    a1 = b1[3] * b1[4]
    a2 = b2[3] * b2[4]
    return inter / max(a1 + a2 - inter, 1e-9)


def np_rotate_nms_pcdet(boxes, scores, thresh, pre_maxsize=None, post_max_size=None):
    """Greedy BEV rotated NMS with pcdet's exact outer semantics
    (box_torch_ops.py:237-263): sort by score desc, optional pre-max
    truncation, suppress IoU > thresh, optional post-max truncation.
    Returns selected indices into the ORIGINAL order (torch tensor)."""
    boxes = boxes.detach().cpu().numpy()
    scores = scores.detach().cpu().numpy()
    order = np.argsort(-scores, kind="stable")
    if pre_maxsize is not None:
        order = order[:pre_maxsize]
    keep = []
    suppressed = np.zeros(len(order), bool)
    for i in range(len(order)):
        if suppressed[i]:
            continue
        keep.append(order[i])
        bi = boxes[order[i]]
        for j in range(i + 1, len(order)):
            if suppressed[j]:
                continue
            if _bev_iou(bi, boxes[order[j]]) > thresh:
                suppressed[j] = True
    keep = np.asarray(keep, np.int64)
    if post_max_size is not None:
        keep = keep[:post_max_size]
    return torch.from_numpy(keep)


# ---------------------------------------------------------------------------
# reference import (post_processing only; NMS kernel stubbed)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref():
    # stub numba (circle_nms_jit) and the efg.modeling bits center_head
    # pulls at import (only used for module construction, not post_processing)
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
        numba.njit = numba.jit
        sys.modules["numba"] = numba
    btop = types.ModuleType("box_torch_ops")
    btop.rotate_nms_pcdet = np_rotate_nms_pcdet
    sys.modules["box_torch_ops"] = btop
    for name, attrs in [
        ("efg", {}),
        ("efg.modeling", {}),
        ("efg.modeling.common", {"get_norm": lambda *a, **k: torch.nn.Identity(),
                                 "weight_init": types.SimpleNamespace()}),
        ("efg.modeling.utils", {"Sequential": torch.nn.Sequential}),
    ]:
        if name not in sys.modules:
            m = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(m, k, v)
            sys.modules[name] = m
    sys.path.insert(0, REF_EXP)
    import center_head

    # make sure the module-level name points at the stub regardless of any
    # cached real import
    center_head.box_torch_ops = btop
    yield center_head
    sys.path.remove(REF_EXP)


def _head_maps(rs, b=2, h=12, w=12, c=3):
    return {
        "hm": rs.randn(b, h, w, c).astype(np.float32) * 2,
        "reg": rs.uniform(0, 1, (b, h, w, 2)).astype(np.float32),
        "height": rs.uniform(-1, 2, (b, h, w, 1)).astype(np.float32),
        "dim": rs.uniform(-0.5, 1.5, (b, h, w, 3)).astype(np.float32),
        "rot": rs.randn(b, h, w, 2).astype(np.float32),
    }


def _ref_decode(maps):
    """The reference decode section (center_head.py:217-292), verbatim
    torch ops, single task, no double flip."""
    hm = torch.sigmoid(torch.from_numpy(maps["hm"]))
    dim = torch.exp(torch.from_numpy(maps["dim"]))
    rots = torch.from_numpy(maps["rot"])[..., 0:1]
    rotc = torch.from_numpy(maps["rot"])[..., 1:2]
    reg = torch.from_numpy(maps["reg"])
    hei = torch.from_numpy(maps["height"])
    rot = torch.atan2(rots, rotc)
    batch, H, W, num_cls = hm.size()
    reg = reg.reshape(batch, H * W, 2)
    hei = hei.reshape(batch, H * W, 1)
    rot = rot.reshape(batch, H * W, 1)
    dim = dim.reshape(batch, H * W, 3)
    hm2 = hm.reshape(batch, H * W, num_cls)
    ys, xs = torch.meshgrid([torch.arange(0, H), torch.arange(0, W)], indexing="ij")
    ys = ys.view(1, H, W).repeat(batch, 1, 1).to(hm)
    xs = xs.view(1, H, W).repeat(batch, 1, 1).to(hm)
    xs = xs.view(batch, -1, 1) + reg[:, :, 0:1]
    ys = ys.view(batch, -1, 1) + reg[:, :, 1:2]
    xs = xs * OSF * VOXEL[0] + PC_RANGE[0]
    ys = ys * OSF * VOXEL[1] + PC_RANGE[1]
    boxes = torch.cat([xs, ys, hei, dim, rot], dim=2)
    return boxes, hm2


def test_decode_parity(ref):
    rs = np.random.RandomState(0)
    maps = _head_maps(rs)
    want_boxes, want_hm = _ref_decode(maps)

    from efg_tpu.modeling.heads.center_head import decode_boxes

    got_boxes, got_scores = decode_boxes(
        {k: jnp.asarray(v) for k, v in maps.items()},
        pc_range=PC_RANGE, voxel_size=VOXEL, out_size_factor=OSF,
        with_vel=False,
    )
    np.testing.assert_allclose(
        np.asarray(got_boxes), want_boxes.numpy(), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_scores), want_hm.numpy(), rtol=1e-6, atol=1e-7
    )


class _Cfg(dict):
    """Attribute+get access like omegaconf for the reference post_processing."""

    def __getattr__(self, k):
        v = self[k]
        return _Cfg(v) if isinstance(v, dict) else v


def test_post_processing_parity(ref):
    """Reference CenterHead.post_processing (score/range mask + rotated NMS
    via the numpy oracle) vs post_process_sample on identical decoded boxes."""
    rs = np.random.RandomState(1)
    n, c = 160, 3
    # clustered boxes so NMS actually suppresses
    centers = rs.uniform(-60, 60, (20, 2))
    pick = rs.randint(0, 20, n)
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, :2] = centers[pick] + rs.randn(n, 2) * 1.0
    boxes[:, 2] = rs.uniform(-1, 2, n)
    boxes[:, 3:6] = rs.uniform(1.5, 5.0, (n, 3))
    boxes[:, 6] = rs.uniform(-np.pi, np.pi, n)
    # a few boxes outside the post-center range
    boxes[:5, 0] = 90.0
    hm = rs.uniform(0, 1, (n, c)).astype(np.float32)
    hm[5:10] *= 0.05  # below score threshold

    cfg = _Cfg(
        score_threshold=0.1,
        nms=dict(nms_pre_max_size=100, nms_post_max_size=30, nms_iou_threshold=0.5),
    )
    pcr = torch.tensor([-80.0, -80.0, -10.0, 80.0, 80.0, 10.0])
    out = ref.CenterHead.post_processing(
        None,
        torch.from_numpy(boxes)[None],
        torch.from_numpy(hm)[None],
        cfg,
        pcr,
        task_id=0,
    )[0]
    want_boxes = out["box3d_lidar"].numpy()
    want_scores = out["scores"].numpy()
    want_labels = out["label_preds"].numpy()

    from efg_tpu.modeling.heads.center_head import post_process_sample

    got = post_process_sample(
        jnp.asarray(boxes), jnp.asarray(hm),
        score_threshold=0.1,
        post_center_range=(-80, -80, -10.0, 80, 80, 10.0),
        nms_iou_threshold=0.5,
        nms_pre_max_size=100,
        nms_post_max_size=30,
    )
    valid = np.asarray(got["valid"])
    gb = np.asarray(got["box3d"])[valid]
    gsc = np.asarray(got["scores"])[valid]
    glb = np.asarray(got["labels"])[valid]

    assert len(gb) == len(want_boxes), (len(gb), len(want_boxes))
    # reference keeps original (spatial) order of selected indices?
    # rotate_nms_pcdet returns score-descending order; ours likewise — sort
    # both by score to be robust to stable-sort tie details
    o_w = np.argsort(-want_scores, kind="stable")
    o_g = np.argsort(-gsc, kind="stable")
    np.testing.assert_allclose(gsc[o_g], want_scores[o_w], rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(gb[o_g], want_boxes[o_w], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(glb[o_g], want_labels[o_w])
