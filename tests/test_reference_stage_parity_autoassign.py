"""AutoAssign bag-loss parity vs the reference pure-torch stack.

Imports the reference `auto_assign.py` (`/root/reference/playground/
detection.2d/coco/auto_assign/auto_assign.res50.fpn.coco.800size.1x/
auto_assign.py`) on CPU and asserts the jax `models/autoassign.py` positive
/ negative / norm losses agree on identical inputs. GT classes are kept
distinct per image: for same-class overlapping GTs the reference's
`pred_box_prob` scatter is last-write-wins in index order while the jax
version takes the per-(location, class) max — equivalent supervision, not
bit-equal.
"""

import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from efg_tpu.models import autoassign as JA
from efg_tpu.models.fcos import level_shifts
from ref_stubs import load_ref_file

REF = (
    "/root/reference/playground/detection.2d/coco/auto_assign/"
    "auto_assign.res50.fpn.coco.800size.1x/auto_assign.py"
)


@pytest.fixture(scope="module")
def ref():
    return load_ref_file("ref_autoassign", REF)


def _make_ref_model(ref, num_classes, strides, mu, sigma):
    from efg.modeling.assigners.box_regression import Shift2BoxTransform

    m = ref.AutoAssign.__new__(ref.AutoAssign)
    torch.nn.Module.__init__(m)
    m.num_classes = num_classes
    m.fpn_strides = list(strides)
    m.shift2box_transform = Shift2BoxTransform(weights=(1.0, 1.0, 1.0, 1.0))
    m.focal_loss_alpha = 0.25
    m.focal_loss_gamma = 2.0
    m.iou_loss_type = "giou"
    m.reg_weight = 5.0
    m.mu = torch.nn.Parameter(torch.from_numpy(mu))
    m.sigma = torch.nn.Parameter(torch.from_numpy(sigma))
    return m


@pytest.mark.parametrize("seed", [1, 4])
def test_autoassign_losses_match(ref, seed):
    num_classes = 6
    strides = (8, 16)
    shapes = [(12, 16), (6, 8)]
    rs = np.random.RandomState(seed)

    mu = rs.randn(num_classes, 2).astype(np.float32) * 0.1
    sigma = (rs.rand(num_classes, 2).astype(np.float32) * 0.4 + 0.7)

    n_gt = 4
    xy = rs.uniform(0, 80, (n_gt, 2)).astype(np.float32)
    wh = rs.uniform(12, 70, (n_gt, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    classes = rs.choice(num_classes, n_gt, replace=False).astype(np.int64)

    r_tot = sum(h * w for h, w in shapes)
    logits = rs.randn(1, r_tot, num_classes).astype(np.float32)
    deltas = np.abs(rs.randn(1, r_tot, 4)).astype(np.float32) * 15 + 1
    obj = rs.randn(1, r_tot, 1).astype(np.float32)

    shift_list = [np.asarray(s) for s in level_shifts(shapes, strides)]

    # --- reference ----------------------------------------------------------
    from efg.data.structures.boxes import Boxes
    from efg.data.structures.instances import Instances

    tgt = Instances((128, 160))
    tgt.gt_boxes = Boxes(torch.from_numpy(boxes))
    tgt.gt_classes = torch.from_numpy(classes)

    def to_levels(flat, ch):
        out, off = [], 0
        for h, w in shapes:
            out.append(
                torch.from_numpy(flat[:, off : off + h * w].reshape(1, h, w, ch))
                .permute(0, 3, 1, 2)
                .contiguous()
            )
            off += h * w
        return out

    rmodel = _make_ref_model(ref, num_classes, strides, mu, sigma)
    r_losses = rmodel.losses(
        [[torch.from_numpy(s) for s in shift_list]], [tgt],
        to_levels(logits, num_classes), to_levels(deltas, 4), to_levels(obj, 1),
    )

    # --- jax ----------------------------------------------------------------
    preds = dict(
        logits=jnp.asarray(logits), deltas=jnp.asarray(deltas),
        centerness=jnp.asarray(obj), shapes=shapes,
        mu=jnp.asarray(mu), sigma=jnp.asarray(sigma),
    )
    batch = dict(
        gt_boxes2d=jnp.asarray(boxes)[None],
        gt_classes2d=jnp.asarray(classes.astype(np.int32))[None],
        gt_mask2d=jnp.ones((1, n_gt), bool),
    )
    model_cfg = dict(num_classes=num_classes, fpn_strides=strides,
                     reg_weight=5.0, focal_alpha=0.25, focal_gamma=2.0)
    j_losses = JA.compute_loss(preds, batch, model_cfg=model_cfg)
    for k in ("loss_pos", "loss_neg", "loss_norm"):
        np.testing.assert_allclose(
            float(j_losses[k]), float(r_losses[k]), rtol=5e-5, atol=1e-6,
            err_msg=k,
        )
