"""Parity oracles: validate efg_tpu ops against the reference's own
pure-torch implementations (torch CPU available; CUDA-bound reference
modules can't import and are covered by the independent oracles in the
other test files). Reference at /root/reference is read-only."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

jax = pytest.importorskip("jax")
import jax.numpy as jnp


@pytest.fixture(scope="module")
def rs():
    return np.random.RandomState(0)


def test_rotated_bev_iou_matches_reference(rs):
    """Our polygon-clipping IoU vs the reference's pure-torch vectorized
    rotated IoU (`efg/modeling/losses/iou3d_loss.py:591`)."""
    from efg.modeling.losses.iou3d_loss import box_iou as ref_box_iou

    from efg_tpu.geometry import box_ops_np as G
    from efg_tpu.ops.iou_rotated import iou_bev

    boxes_a = np.column_stack(
        [rs.uniform(-3, 3, (6, 2)), np.zeros(6), rs.uniform(2, 5, (6, 2)),
         np.full(6, 2.0), rs.uniform(-np.pi, np.pi, 6)]
    ).astype(np.float32)
    boxes_b = np.column_stack(
        [rs.uniform(-3, 3, (5, 2)), np.zeros(5), rs.uniform(2, 5, (5, 2)),
         np.full(5, 2.0), rs.uniform(-np.pi, np.pi, 5)]
    ).astype(np.float32)

    ours = np.asarray(iou_bev(jnp.asarray(boxes_a), jnp.asarray(boxes_b)))

    # reference wants CCW corner lists (x0,y0..x3,y3)
    def corners8(b):
        c = G.boxes_to_corners_bev(b)  # [N, 4, 2]
        # ensure CCW
        nxt = np.roll(c, -1, axis=1)
        area2 = (c[..., 0] * nxt[..., 1] - nxt[..., 0] * c[..., 1]).sum(-1)
        c = np.where(area2[:, None, None] >= 0, c, c[:, ::-1])
        return torch.tensor(c.reshape(len(b), 8), dtype=torch.float32)

    ref, _ = ref_box_iou(corners8(boxes_a), corners8(boxes_b))
    np.testing.assert_allclose(ours, ref.numpy(), rtol=2e-3, atol=2e-3)


def test_focal_loss_matches_reference(rs):
    from efg.modeling.losses.focal_loss import sigmoid_focal_loss as ref_focal

    from efg_tpu.modeling.losses import sigmoid_focal_loss

    logits = rs.randn(64, 5).astype(np.float32) * 3
    targets = (rs.rand(64, 5) > 0.7).astype(np.float32)
    ref = ref_focal(
        torch.tensor(logits), torch.tensor(targets), alpha=0.25, gamma=2.0,
        reduction="none",
    ).numpy()
    ours = np.asarray(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_smooth_l1_matches_reference(rs):
    from efg.modeling.losses.smooth_l1_loss import smooth_l1_loss as ref_sl1

    from efg_tpu.modeling.losses import smooth_l1_loss

    pred = rs.randn(32, 4).astype(np.float32) * 2
    tgt = rs.randn(32, 4).astype(np.float32)
    ref = ref_sl1(torch.tensor(pred), torch.tensor(tgt), beta=0.5, reduction="none").numpy()
    ours = np.asarray(smooth_l1_loss(jnp.asarray(pred), jnp.asarray(tgt), beta=0.5))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_iou2d_loss_matches_reference(rs):
    from efg.modeling.losses.iou2d_loss import iou_loss_v2 as ref_iou

    from efg_tpu.modeling.losses import iou_loss_2d

    # ltrb mode around shared shifts (FCOS regression form)
    pred = np.abs(rs.randn(40, 4).astype(np.float32)) * 5 + 0.1
    tgt = np.abs(rs.randn(40, 4).astype(np.float32)) * 5 + 0.1
    ref = ref_iou(
        torch.tensor(pred), torch.tensor(tgt), box_mode="ltrb",
        loss_type="giou", reduction="none",
    ).numpy()
    # our ltrb giou: reuse the FCOS internal
    from efg_tpu.models.fcos import _giou_ltrb

    ours = 1 - np.asarray(_giou_ltrb(jnp.asarray(pred), jnp.asarray(tgt)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_limit_period_and_corners_match_reference(rs):
    from efg.geometry import box_ops_torch as ref_ops

    from efg_tpu.geometry import box_ops_np as G

    vals = rs.uniform(-10, 10, 100).astype(np.float32)
    ref = ref_ops.limit_period(torch.tensor(vals), offset=0.5, period=2 * np.pi).numpy()
    ours = G.limit_period(vals, offset=0.5, period=2 * np.pi)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_gaussian_radius_and_splat_match_reference(rs, tmp_path):
    """Load the playground center_utils with its numba import stripped."""
    import types

    src_path = (
        "/root/reference/playground/detection.3d/waymo/center_point/"
        "centerpoint.waymo.voxelnet.gt_aug.ds_sample.onecycle.adam.bs48.36e/center_utils.py"
    )
    src = open(src_path).read().replace("from circle_nms_jit import circle_nms", "")
    mod = types.ModuleType("ref_center_utils")
    exec(compile(src, src_path, "exec"), mod.__dict__)

    from efg_tpu.geometry import box_ops_np as G
    from efg_tpu.ops.gaussian import splat_gaussians

    for l, w in [(3.0, 2.0), (10.0, 4.0), (1.0, 1.0)]:
        np.testing.assert_allclose(
            G.gaussian_radius((l, w), 0.1), mod.gaussian_radius((l, w), 0.1), rtol=1e-6
        )

    # splat parity on one object
    hm_ref = np.zeros((1, 32, 32), np.float32)
    mod.draw_umich_gaussian(hm_ref[0], (10, 12), 4)
    ours = np.asarray(
        splat_gaussians(
            jnp.asarray([[10, 12]]), jnp.asarray([4]), jnp.asarray([0]),
            jnp.asarray([True]), shape=(32, 32, 1), r_cap=8,
        )
    )[..., 0]
    np.testing.assert_allclose(ours, hm_ref[0], atol=2e-6)
