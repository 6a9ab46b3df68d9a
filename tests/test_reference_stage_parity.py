"""Stage-level golden parity vs the reference's torch modules (CPU).

The reference CenterPoint loss stack is importable without CUDA/spconv
(`/root/reference/playground/detection.3d/waymo/center_point/...36e/
{centernet_loss.py, center_utils.py}`) with numba stubbed to identity
decorators. These tests feed IDENTICAL inputs through the reference torch
code and the efg_tpu jax code:

- gaussian heatmap target assignment (reference `voxelnet.py assign_one`
  loop, re-run here with the reference's own `gaussian_radius` /
  `draw_umich_gaussian`) vs `centerpoint_targets`
- FastFocalLoss / RegLoss vs `fast_focal_loss` / `reg_loss`
- the full per-task loss combination vs `center_head_loss`
"""

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


@pytest.fixture(scope="module")
def ref():
    # numba is not installed: stub jit decorators to identity so the
    # reference numpy helpers run as plain python
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
        numba.njit = numba.jit
        sys.modules["numba"] = numba
    sys.path.insert(0, REF_EXP)
    import center_utils
    import centernet_loss

    yield types.SimpleNamespace(cu=center_utils, cl=centernet_loss)
    sys.path.remove(REF_EXP)


def _rand_boxes(rs, n, pc=70.0):
    b = np.zeros((n, 9), np.float32)
    b[:, :2] = rs.uniform(-pc, pc, (n, 2))
    b[:, 2] = rs.uniform(-1, 2, n)
    b[:, 3:6] = rs.uniform(0.5, 6.0, (n, 3))
    b[:, 6:8] = rs.uniform(-3, 3, (n, 2))
    b[:, 8] = rs.uniform(-np.pi, np.pi, n)
    return b


CFG = dict(
    pc_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
    voxel_size=(0.1, 0.1, 0.15),
    out_size_factor=8,
    gaussian_overlap=0.1,
    min_radius=2,
)
FM = 188  # 1504 / 8


def _reference_assign(ref, gt_boxes, gt_classes, max_objs, n_classes, with_vel):
    """The reference `assign_one` inner loop (voxelnet.py), single task,
    using the reference gaussian helpers as the oracle."""
    vx, vy = CFG["voxel_size"][:2]
    osf = CFG["out_size_factor"]
    x0, y0 = CFG["pc_range"][:2]
    hm = np.zeros((n_classes, FM, FM), np.float32)
    dims = 10 if with_vel else 10  # reference always builds 10, slices later
    anno_box = np.zeros((max_objs, dims), np.float32)
    ind = np.zeros(max_objs, np.int64)
    mask = np.zeros(max_objs, np.uint8)
    cat = np.zeros(max_objs, np.int64)
    # reference limit_period on yaw
    yaw = gt_boxes[:, 8] - np.floor(gt_boxes[:, 8] / (2 * np.pi) + 0.5) * 2 * np.pi
    for k in range(min(len(gt_boxes), max_objs)):
        if gt_classes[k] == 0:
            continue
        cls_id = int(gt_classes[k]) - 1
        L, W = gt_boxes[k, 3] / vx / osf, gt_boxes[k, 4] / vy / osf
        if L <= 0 or W <= 0:
            continue
        radius = ref.cu.gaussian_radius((L, W), min_overlap=CFG["gaussian_overlap"])
        radius = max(CFG["min_radius"], int(radius))
        x, y, z = gt_boxes[k, 0], gt_boxes[k, 1], gt_boxes[k, 2]
        coor_x, coor_y = (x - x0) / vx / osf, (y - y0) / vy / osf
        ct = np.array([coor_x, coor_y], np.float32)
        ct_int = ct.astype(np.int32)
        if not (0 <= ct_int[0] < FM and 0 <= ct_int[1] < FM):
            continue
        ref.cu.draw_umich_gaussian(hm[cls_id], ct, radius)
        xi, yi = ct_int
        cat[k] = cls_id
        ind[k] = yi * FM + xi
        mask[k] = 1
        rot = yaw[k]
        anno_box[k] = np.concatenate(
            [
                ct - (xi, yi),
                [z],
                np.log(gt_boxes[k, 3:6]),
                gt_boxes[k, 6:8],
                [np.sin(rot), np.cos(rot)],
            ]
        )
    if not with_vel:
        anno_box = anno_box[:, [0, 1, 2, 3, 4, 5, -2, -1]]
    return hm, anno_box, ind, mask, cat


@pytest.mark.parametrize("with_vel", [False, True])
def test_target_assignment_parity(ref, with_vel):
    from efg_tpu.modeling.heads.center_head import centerpoint_targets

    rs = np.random.RandomState(0)
    max_objs = 24
    n = 14
    gt = np.zeros((max_objs, 9), np.float32)
    gt[:n] = _rand_boxes(rs, n)
    cls = np.zeros(max_objs, np.int32)
    cls[:n] = rs.randint(1, 4, n)
    m = np.zeros(max_objs, bool)
    m[:n] = True

    want = _reference_assign(ref, gt, cls * m, max_objs, 3, with_vel)

    tgt = centerpoint_targets(
        jnp.asarray(gt), jnp.asarray(cls), jnp.asarray(m),
        tasks=[{"num_classes": 3, "class_names": ["VEHICLE", "PEDESTRIAN", "CYCLIST"]}],
        feature_map_size=(FM, FM),
        pc_range=CFG["pc_range"], voxel_size=CFG["voxel_size"],
        out_size_factor=CFG["out_size_factor"],
        gaussian_overlap=CFG["gaussian_overlap"],
        min_radius=CFG["min_radius"], with_vel=with_vel,
    )[0]

    got_hm = np.asarray(tgt["hm"]).transpose(2, 0, 1)  # NHWC -> CHW
    np.testing.assert_allclose(got_hm, want[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tgt["anno_box"]), want[1], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(tgt["ind"]), want[2])
    np.testing.assert_array_equal(np.asarray(tgt["mask"]).astype(np.uint8), want[3])
    np.testing.assert_array_equal(np.asarray(tgt["cat"]), want[4])


def test_loss_stack_parity(ref):
    from efg_tpu.modeling.heads.center_head import center_head_loss

    rs = np.random.RandomState(1)
    B, C, H, W, M = 2, 3, 32, 32, 12
    code_weights = [1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 1.0, 1.0]
    weight = 2.0

    logits = rs.randn(B, C, H, W).astype(np.float32)
    hm_tgt = np.clip(rs.rand(B, C, H, W) ** 3, 0, 1).astype(np.float32)
    ind = rs.randint(0, H * W, (B, M)).astype(np.int64)
    mask = (rs.rand(B, M) < 0.7).astype(np.uint8)
    cat = rs.randint(0, C, (B, M)).astype(np.int64)
    # make the indexed peaks exact 1 so pos-loss fires like real targets
    for b in range(B):
        for k in range(M):
            if mask[b, k]:
                hm_tgt[b, cat[b, k], ind[b, k] // W, ind[b, k] % W] = 1.0

    reg = rs.randn(B, 2, H, W).astype(np.float32)
    hei = rs.randn(B, 1, H, W).astype(np.float32)
    dim = rs.randn(B, 3, H, W).astype(np.float32)
    rot = rs.randn(B, 2, H, W).astype(np.float32)
    anno_tgt = rs.randn(B, M, 8).astype(np.float32)

    # ---- reference torch ----------------------------------------------------
    t = torch.from_numpy
    out_sig = torch.clamp(torch.sigmoid(t(logits)), 1e-4, 1 - 1e-4)
    hm_loss_ref = ref.cl.FastFocalLoss()(out_sig, t(hm_tgt), t(ind), t(mask), t(cat))
    anno_pred = torch.cat([t(reg), t(hei), t(dim), t(rot)], dim=1)
    box_loss_ref = ref.cl.RegLoss()(anno_pred, t(mask), t(ind), t(anno_tgt))
    loc_loss_ref = (box_loss_ref * box_loss_ref.new_tensor(code_weights)).sum()
    total_ref = float(hm_loss_ref + weight * loc_loss_ref)

    # ---- efg_tpu -------------------------------------------------------------
    preds = {
        "hm": jnp.asarray(logits.transpose(0, 2, 3, 1)),
        "reg": jnp.asarray(reg.transpose(0, 2, 3, 1)),
        "height": jnp.asarray(hei.transpose(0, 2, 3, 1)),
        "dim": jnp.asarray(dim.transpose(0, 2, 3, 1)),
        "rot": jnp.asarray(rot.transpose(0, 2, 3, 1)),
    }
    tgts = {
        "hm": jnp.asarray(hm_tgt.transpose(0, 2, 3, 1)),
        "anno_box": jnp.asarray(anno_tgt),
        "ind": jnp.asarray(ind),
        "mask": jnp.asarray(mask.astype(bool)),
        "cat": jnp.asarray(cat),
    }
    out = center_head_loss([preds], [tgts], code_weights=code_weights,
                           weight=weight, with_vel=False)
    assert float(out["0_hm_loss"]) == pytest.approx(float(hm_loss_ref), rel=1e-4)
    assert float(out["0_loc_loss"]) == pytest.approx(float(loc_loss_ref), rel=1e-4)
    assert float(out["0_loss"]) == pytest.approx(total_ref, rel=1e-4)
