"""FCOS tiny end-to-end tests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from efg_tpu.models import fcos as F

CFG = dict(num_classes=5, fpn_strides=[8, 16, 32, 64, 128])


def _batch(seed=0, bsz=2, size=128, g=6):
    rs = np.random.RandomState(seed)
    imgs = rs.uniform(-1, 1, (bsz, size, size, 3)).astype(np.float32)
    boxes = np.zeros((bsz, g, 4), np.float32)
    classes = np.zeros((bsz, g), np.int32)
    mask = np.zeros((bsz, g), bool)
    for b in range(bsz):
        k = rs.randint(1, 4)
        x0 = rs.uniform(0, size - 40, (k, 1))
        y0 = rs.uniform(0, size - 40, (k, 1))
        w = rs.uniform(16, 40, (k, 1))
        h = rs.uniform(16, 40, (k, 1))
        boxes[b, :k] = np.concatenate([x0, y0, x0 + w, y0 + h], axis=1)
        classes[b, :k] = rs.randint(0, 5, k)
        mask[b, :k] = True
    return dict(
        images=jnp.asarray(imgs),
        gt_boxes2d=jnp.asarray(boxes),
        gt_classes2d=jnp.asarray(classes),
        gt_mask2d=jnp.asarray(mask),
    )


def test_targets_inside_box_assignment():
    shifts = jnp.asarray([[20.0, 20.0], [100.0, 100.0]])
    lvl = jnp.zeros(2, jnp.int32)
    strides = jnp.asarray([8.0])
    soi = jnp.asarray([[-1.0, 1e8]])
    gt = jnp.asarray([[10.0, 10.0, 30.0, 30.0]])
    cls, reg, ctr = F.fcos_targets(
        shifts, lvl, strides, soi, gt, jnp.asarray([2]), jnp.asarray([True]),
        num_classes=5, center_sampling_radius=0.0,
    )
    assert int(cls[0]) == 2       # inside the box
    assert int(cls[1]) == 5       # background
    np.testing.assert_allclose(np.asarray(reg[0]), [10, 10, 10, 10])
    assert float(ctr[0]) == pytest.approx(1.0)  # dead center


def test_targets_min_area_wins():
    shifts = jnp.asarray([[20.0, 20.0]])
    lvl = jnp.zeros(1, jnp.int32)
    strides = jnp.asarray([8.0])
    soi = jnp.asarray([[-1.0, 1e8]])
    gt = jnp.asarray([[0.0, 0.0, 100.0, 100.0], [15.0, 15.0, 25.0, 25.0]])
    cls, _, _ = F.fcos_targets(
        shifts, lvl, strides, soi, gt, jnp.asarray([1, 3]),
        jnp.asarray([True, True]), num_classes=5, center_sampling_radius=0.0,
    )
    assert int(cls[0]) == 3  # the smaller box


@pytest.fixture(scope="module")
def fcos_setup():
    model = F.FCOS(num_classes=5, depth=50, freeze_at=0)
    batch = _batch()
    variables = model.init(jax.random.key(0), batch["images"], True)
    return model, variables, batch


def test_fcos_forward_and_loss(fcos_setup):
    model, variables, batch = fcos_setup

    def loss_fn(params):
        preds = model.apply({"params": params, "batch_stats": variables.get("batch_stats", {})},
                            batch["images"], True)
        losses = F.compute_loss(preds, batch, model_cfg=CFG)
        return losses["loss"], losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    assert float(losses["num_foreground"]) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


def test_fcos_predict(fcos_setup):
    model, variables, batch = fcos_setup
    preds = model.apply(variables, batch["images"], False)
    out = F.predict(preds, model_cfg=CFG, post_max=20)
    assert out["boxes"].shape == (2, 20, 4)
    assert np.isfinite(np.asarray(out["boxes"])).all()
