"""End-to-end model tests on tiny synthetic scenes (CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from efg_tpu.models import centerpoint as CP

PC_RANGE = (-8.0, -8.0, -2.0, 8.0, 8.0, 4.0)
VOXEL = (0.1, 0.1, 0.15)  # grid 160x160x40 → BEV 20x20 after /8
TASKS = ({"num_classes": 2, "class_names": ["VEHICLE", "PEDESTRIAN"]},)
COMMON_HEADS = (("reg", (2, 2)), ("height", (1, 2)), ("dim", (3, 2)), ("rot", (2, 2)))

MODEL_CFG = dict(
    pc_range=PC_RANGE,
    voxel_size=VOXEL,
    tasks=[dict(t) for t in TASKS],
    common_heads=COMMON_HEADS,
    loss=dict(
        out_size_factor=8, gaussian_overlap=0.1, min_radius=2, max_objs=16,
        code_weights=[1.0] * 8, weight=2,
    ),
)
POST_CFG = dict(
    post_center_limit_range=[-10, -10, -5, 10, 10, 5],
    nms=dict(nms_pre_max_size=128, nms_post_max_size=16, nms_iou_threshold=0.7),
    score_threshold=0.1,
    out_size_factor=8,
)


def _scene(seed=0, bsz=2, n=1024, max_objs=16):
    rs = np.random.RandomState(seed)
    points = rs.uniform(-7, 7, (bsz, n, 3)).astype(np.float32)
    points = np.concatenate(
        [points, rs.uniform(0, 1, (bsz, n, 2)).astype(np.float32)], axis=-1
    )
    mask = np.ones((bsz, n), bool)
    mask[:, -50:] = False
    gt_boxes = np.zeros((bsz, max_objs, 9), np.float32)
    gt_classes = np.zeros((bsz, max_objs), np.int32)
    gt_mask = np.zeros((bsz, max_objs), bool)
    for b in range(bsz):
        k = rs.randint(2, 6)
        gt_boxes[b, :k, :3] = rs.uniform(-6, 6, (k, 3))
        gt_boxes[b, :k, 3:6] = rs.uniform(1, 3, (k, 3))
        gt_boxes[b, :k, -1] = rs.uniform(-np.pi, np.pi, k)
        gt_classes[b, :k] = rs.randint(1, 3, k)
        gt_mask[b, :k] = True
    return dict(
        points=jnp.asarray(points), points_mask=jnp.asarray(mask),
        gt_boxes=jnp.asarray(gt_boxes), gt_classes=jnp.asarray(gt_classes),
        gt_mask=jnp.asarray(gt_mask),
    )


def _make_voxelnet():
    return CP.VoxelNet(
        pc_range=PC_RANGE, voxel_size=VOXEL, max_voxels=2048,
        stage_caps=(1536, 1024, 768, 768),
        tasks=TASKS, common_heads=COMMON_HEADS,
        neck_cfg=(
            ("layer_nums", (2, 2)), ("ds_layer_strides", (1, 2)),
            ("ds_num_filters", (32, 64)), ("us_layer_strides", (1, 2)),
            ("us_num_filters", (32, 32)),
        ),
    )


@pytest.fixture(scope="module")
def voxelnet_state():
    model = _make_voxelnet()
    batch = _scene()
    variables = model.init(jax.random.key(0), batch["points"], batch["points_mask"], True)
    return model, variables, batch


def test_voxelnet_forward_shapes(voxelnet_state):
    model, variables, batch = voxelnet_state
    preds, _ = model.apply(
        variables, batch["points"], batch["points_mask"], True, mutable=["batch_stats"]
    )
    assert len(preds) == 1
    p = preds[0]
    assert p["hm"].shape == (2, 20, 20, 2)
    assert p["reg"].shape == (2, 20, 20, 2)
    assert p["dim"].shape == (2, 20, 20, 3)
    assert p["rot"].shape == (2, 20, 20, 2)


def test_voxelnet_loss_and_grads(voxelnet_state):
    model, variables, batch = voxelnet_state

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch["points"], batch["points_mask"], True, mutable=["batch_stats"],
        )
        losses = CP.compute_loss(preds, batch, model_cfg=MODEL_CFG)
        return losses["loss"], losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    assert float(losses["0_num_positive"]) > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    total_norm = sum(float(np.abs(np.asarray(g)).sum()) for g in leaves)
    assert total_norm > 0


def test_voxelnet_predict_shapes(voxelnet_state):
    model, variables, batch = voxelnet_state
    preds = model.apply(variables, batch["points"], batch["points_mask"], False)
    out = CP.predict(preds, post_cfg=POST_CFG, model_cfg=MODEL_CFG)
    assert out["box3d"].shape == (2, 16, 7)
    assert out["scores"].shape == (2, 16)
    assert out["labels"].shape == (2, 16)


def test_training_reduces_loss(voxelnet_state):
    import optax

    model, variables, batch = voxelnet_state
    params = variables["params"]
    bs = variables["batch_stats"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bs, opt_state):
        def loss_fn(p):
            preds, new_state = model.apply(
                {"params": p, "batch_stats": bs},
                batch["points"], batch["points_mask"], True, mutable=["batch_stats"],
            )
            losses = CP.compute_loss(preds, batch, model_cfg=MODEL_CFG)
            return losses["loss"], new_state["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state2, loss

    losses = []
    for _ in range(8):
        params, bs, opt_state, loss = step(params, bs, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_pillarnet_forward_and_loss():
    model = CP.PillarNet(
        pc_range=PC_RANGE, voxel_size=(0.8, 0.8, 6.0), max_pillars=512,
        tasks=TASKS, common_heads=COMMON_HEADS,
        neck_cfg=(
            ("layer_nums", (1, 1)), ("ds_layer_strides", (1, 2)),
            ("ds_num_filters", (32, 64)), ("us_layer_strides", (1, 2)),
            ("us_num_filters", (32, 32)),
        ),
    )
    batch = _scene(seed=7)
    variables = model.init(jax.random.key(1), batch["points"], batch["points_mask"], True)
    preds, _ = model.apply(
        variables, batch["points"], batch["points_mask"], True, mutable=["batch_stats"]
    )
    assert preds[0]["hm"].shape == (2, 20, 20, 2)
    cfg = dict(MODEL_CFG, voxel_size=(0.8, 0.8, 6.0))
    cfg["loss"] = dict(MODEL_CFG["loss"], out_size_factor=1)
    losses = CP.compute_loss(preds, batch, model_cfg=cfg)
    assert np.isfinite(float(losses["loss"]))


def test_double_flip_tta(voxelnet_state):
    model, variables, batch = voxelnet_state
    merged = CP.forward_double_flip(model, variables, batch["points"], batch["points_mask"])
    plain = model.apply(variables, batch["points"], batch["points_mask"], False)
    assert merged[0]["hm"].shape == plain[0]["hm"].shape
    for k in ("hm", "reg", "rot", "dim", "height"):
        assert np.isfinite(np.asarray(merged[0][k])).all()
    out = CP.predict(merged, post_cfg=POST_CFG, model_cfg=MODEL_CFG)
    assert out["box3d"].shape == (2, 16, 7)
