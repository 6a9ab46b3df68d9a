"""Mask2Former tiny end-to-end tests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from efg_tpu.models import mask2former as M2F

CFG = dict(num_classes=4, num_points=256, class_weight=2.0, mask_weight=5.0,
           dice_weight=5.0, no_object_weight=0.1)


def _batch(seed=0, bsz=2, size=64, g=4):
    rs = np.random.RandomState(seed)
    imgs = rs.uniform(-1, 1, (bsz, size, size, 3)).astype(np.float32)
    hm, wm = size // 4, size // 4
    masks = np.zeros((bsz, g, hm, wm), np.float32)
    classes = np.zeros((bsz, g), np.int32)
    valid = np.zeros((bsz, g), bool)
    for b in range(bsz):
        k = rs.randint(1, 4)
        for i in range(k):
            x0, y0 = rs.randint(0, hm - 4, 2)
            w, h = rs.randint(3, 8, 2)
            masks[b, i, y0:y0 + h, x0:x0 + w] = 1.0
            classes[b, i] = rs.randint(0, 4)
            valid[b, i] = True
    return dict(
        images=jnp.asarray(imgs),
        gt_masks=jnp.asarray(masks),
        gt_classes_seg=jnp.asarray(classes),
        gt_mask_valid=jnp.asarray(valid),
    )


@pytest.fixture(scope="module")
def m2f_setup():
    model = M2F.Mask2Former(num_classes=4, num_queries=8, d_model=32,
                            dec_layers=3, depth=50, freeze_at=0)
    batch = _batch()
    variables = model.init(jax.random.key(0), batch["images"], True)
    return model, variables, batch


def test_forward_shapes(m2f_setup):
    model, variables, batch = m2f_setup
    preds = model.apply(variables, batch["images"], False)
    assert preds["cls_logits"].shape == (4, 2, 8, 5)   # dec_layers+1 outputs
    assert preds["mask_logits"].shape == (4, 2, 8, 16, 16)
    assert np.isfinite(np.asarray(preds["mask_logits"])).all()


def test_loss_and_grads(m2f_setup):
    model, variables, batch = m2f_setup

    def loss_fn(params):
        preds = model.apply(
            {"params": params, "batch_stats": variables.get("batch_stats", {})},
            batch["images"], True,
        )
        losses = M2F.compute_loss(preds, batch, model_cfg=CFG, rng=jax.random.key(1))
        return losses["loss"], losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss)), {k: float(v) for k, v in losses.items()}
    assert "loss_dice" in losses and "loss_mask_0" in losses
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert sum(float(np.abs(np.asarray(g)).sum()) for g in leaves) > 0


def test_instance_and_semantic_inference(m2f_setup):
    model, variables, batch = m2f_setup
    preds = model.apply(variables, batch["images"], False)
    inst = M2F.predict_instance(preds, model_cfg=CFG, top_k=10)
    assert inst["masks"].shape == (2, 10, 16, 16)
    assert inst["scores"].shape == (2, 10)
    sem = M2F.predict_semantic(preds, model_cfg=CFG)
    assert sem.shape == (2, 4, 16, 16)
    assert np.isfinite(np.asarray(sem)).all()


def test_importance_sampling_matches_reference_selection():
    """uncertainty_point_coords vs a numpy replica of the reference
    `get_uncertain_point_coords_with_randomness` given identical candidate
    points: the importance-selected coordinates must agree exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from efg_tpu.models.mask2former import _sample_points, uncertainty_point_coords

    rs = np.random.RandomState(0)
    n, h, w = 3, 16, 16
    num_points, over, ratio = 16, 3.0, 0.75
    coarse = jnp.asarray(rs.randn(n, h, w).astype(np.float32) * 3)

    rng = jax.random.key(7)
    got = np.asarray(
        uncertainty_point_coords(
            rng, coarse, num_points=num_points, oversample_ratio=over,
            importance_sample_ratio=ratio,
        )
    )

    # numpy replica of the reference, fed the SAME candidates jax drew
    r1, _ = jax.random.split(rng)
    n_over = int(num_points * over)
    cand = np.asarray(jax.random.uniform(r1, (n, n_over, 2)))
    logits = np.asarray(
        jax.vmap(lambda m, c: _sample_points(m, c))(coarse, jnp.asarray(cand))
    )
    n_imp = int(num_points * ratio)
    for i in range(n):
        unc = -np.abs(logits[i])
        idx = np.argsort(-unc, kind="stable")[:n_imp]
        want = cand[i][idx]
        np.testing.assert_allclose(np.sort(got[i, :n_imp], axis=0), np.sort(want, axis=0), rtol=1e-6)
