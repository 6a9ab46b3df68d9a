"""RetinaNet + AutoAssign tiny tests (share the FCOS test scene)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from efg_tpu.models import autoassign as AA
from efg_tpu.models import retinanet as RN
from tests.test_fcos import _batch

CFG = dict(num_classes=5, fpn_strides=[8, 16, 32, 64, 128])


def test_anchor_generation():
    from efg_tpu.modeling.assigners.anchor_generator import grid_anchors

    anchors = grid_anchors([(4, 4)], [8], [(32,)], [1.0, 2.0])
    a = np.asarray(anchors[0])
    assert a.shape == (4 * 4 * 2, 4)
    # first anchor centered at (4, 4) with size 32, ar 1 → [-12, -12, 20, 20]
    np.testing.assert_allclose(a[0], [4 - 16, 4 - 16, 4 + 16, 4 + 16])


def test_box2box_roundtrip():
    from efg_tpu.modeling.assigners.anchor_generator import Box2BoxTransform

    coder = Box2BoxTransform()
    rs = np.random.RandomState(0)
    src = jnp.asarray(np.column_stack([rs.uniform(0, 50, (8, 2)), rs.uniform(60, 120, (8, 2))]))
    tgt = jnp.asarray(np.column_stack([rs.uniform(0, 50, (8, 2)), rs.uniform(60, 120, (8, 2))]))
    deltas = coder.get_deltas(src, tgt)
    rec = coder.apply_deltas(deltas, src)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(tgt), atol=1e-3)


def test_retinanet_loss_and_grads():
    model = RN.RetinaNet(num_classes=5, depth=50, freeze_at=0)
    batch = _batch(seed=3)
    variables = model.init(jax.random.key(0), batch["images"], True)

    def loss_fn(params):
        preds = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            batch["images"], True)
        losses = RN.compute_loss(preds, batch, model_cfg=CFG)
        return losses["loss"], losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    assert float(losses["num_foreground"]) > 0
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))
    preds = model.apply(variables, batch["images"], False)
    out = RN.predict(preds, model_cfg=CFG, post_max=10)
    assert out["boxes"].shape == (2, 10, 4)


def test_autoassign_loss_and_grads():
    model = AA.AutoAssign(num_classes=5, depth=50, freeze_at=0)
    batch = _batch(seed=4)
    variables = model.init(jax.random.key(0), batch["images"], True)
    assert "mu" in variables["params"]

    def loss_fn(params):
        preds = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            batch["images"], True)
        losses = AA.compute_loss(preds, batch, model_cfg=CFG)
        return losses["loss"], losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss)), {k: float(v) for k, v in losses.items()}
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree_util.tree_leaves(grads))
    # center prior receives gradient
    assert np.abs(np.asarray(grads["mu"])).sum() >= 0
