"""RetinaNet anchor matching + loss parity vs the reference pure-torch stack.

Imports the reference `retinanet.py` + its experiment-local `matcher.py`
(`/root/reference/playground/detection.2d/coco/retina_net/
retinanet.res50.fpn.coco.multiscale.1x/`) on CPU and asserts the jax
`models/retinanet.py` assignment (incl. the ignore band and low-quality
forcing) and loss_cls / loss_box_reg agree on identical anchors and inputs.
"""

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from efg_tpu.models import retinanet as JR
from ref_stubs import load_ref_file

REF_DIR = (
    "/root/reference/playground/detection.2d/coco/retina_net/"
    "retinanet.res50.fpn.coco.multiscale.1x"
)


@pytest.fixture(scope="module")
def ref():
    saved = {
        k: sys.modules.pop(k)
        for k in list(sys.modules)
        if k == "matcher" or k == "modules" or k.startswith("modules.")
    }
    sys.path.insert(0, REF_DIR)
    try:
        mod = load_ref_file("ref_retinanet", f"{REF_DIR}/retinanet.py")
        # the experiment-local matcher.py: several playground dirs ship a
        # module named `matcher` (m2f's lacks `Matcher`) — load by path and
        # stash the class on the returned namespace
        mmod = load_ref_file("ref_retinanet_matcher", f"{REF_DIR}/matcher.py")
        mod._Matcher = mmod.Matcher
        return mod
    finally:
        sys.path.remove(REF_DIR)
        sys.modules.pop("matcher", None)
        sys.modules.update(saved)


def _make_ref_model(ref, num_classes):
    from efg.modeling.assigners.box_regression import Box2BoxTransform

    Matcher = ref._Matcher
    m = ref.RetinaNet.__new__(ref.RetinaNet)
    torch.nn.Module.__init__(m)
    m.num_classes = num_classes
    m.matcher = Matcher([0.4, 0.5], [0, -1, 1], allow_low_quality_matches=True)
    m.box2box_transform = Box2BoxTransform(weights=(1.0, 1.0, 1.0, 1.0))
    m.focal_loss_alpha = 0.25
    m.focal_loss_gamma = 2.0
    m.smooth_l1_loss_beta = 0.1
    return m


@pytest.mark.parametrize("seed", [2, 9])
def test_retinanet_assignment_and_losses_match(ref, seed):
    num_classes = 6
    strides = (8, 16)
    shapes = [(10, 12), (5, 6)]
    rs = np.random.RandomState(seed)

    anchors = np.asarray(JR._anchors_for(shapes, strides), np.float32)  # [R, 4]
    r_tot = anchors.shape[0]
    n_anch = r_tot // sum(h * w for h, w in shapes)  # anchors per location

    n_gt = 5
    xy = rs.uniform(0, 70, (n_gt, 2)).astype(np.float32)
    wh = rs.uniform(10, 60, (n_gt, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    classes = rs.randint(0, num_classes, n_gt).astype(np.int64)

    # --- reference assignment ------------------------------------------------
    from efg.data.structures.boxes import Boxes
    from efg.data.structures.instances import Instances

    tgt = Instances((96, 112))
    tgt.gt_boxes = Boxes(torch.from_numpy(boxes))
    tgt.gt_classes = torch.from_numpy(classes)
    rmodel = _make_ref_model(ref, num_classes)
    # reference takes per-image, per-level anchor Boxes
    offs, anchor_levels = 0, []
    for h, w in shapes:
        n = h * w * n_anch
        anchor_levels.append(Boxes(torch.from_numpy(anchors[offs : offs + n])))
        offs += n
    g_cls, g_deltas = rmodel.get_ground_truth([anchor_levels], [tgt])

    # --- jax assignment --------------------------------------------------------
    j_cls, j_match = JR.retinanet_targets(
        jnp.asarray(anchors), jnp.asarray(boxes),
        jnp.asarray(classes.astype(np.int32)), jnp.ones(n_gt, bool),
        num_classes=num_classes,
    )
    np.testing.assert_array_equal(np.asarray(j_cls), g_cls[0].numpy())

    # --- losses ------------------------------------------------------------------
    logits = rs.randn(1, r_tot, num_classes).astype(np.float32)
    deltas = rs.randn(1, r_tot, 4).astype(np.float32)

    def to_levels(flat, ch):
        out, off = [], 0
        for h, w in shapes:
            n = h * w
            out.append(
                torch.from_numpy(
                    flat[:, off : off + n * n_anch].reshape(1, h, w, n_anch * ch)
                ).permute(0, 3, 1, 2).contiguous()
            )
            off += n * n_anch
        return out

    r_losses = rmodel.losses(
        g_cls, g_deltas, to_levels(logits, num_classes), to_levels(deltas, 4)
    )

    preds = dict(logits=jnp.asarray(logits), deltas=jnp.asarray(deltas),
                 shapes=shapes)
    batch = dict(
        gt_boxes2d=jnp.asarray(boxes)[None],
        gt_classes2d=jnp.asarray(classes.astype(np.int32))[None],
        gt_mask2d=jnp.ones((1, n_gt), bool),
    )
    model_cfg = dict(num_classes=num_classes, fpn_strides=strides)
    j_losses = JR.compute_loss(preds, batch, model_cfg=model_cfg)
    for k in ("loss_cls", "loss_box_reg"):
        np.testing.assert_allclose(
            float(j_losses[k]), float(r_losses[k]), rtol=5e-5, atol=1e-6,
            err_msg=k,
        )
