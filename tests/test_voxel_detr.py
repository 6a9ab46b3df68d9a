"""Voxel-DETR end-to-end tiny tests + unit tests for its ops."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from efg_tpu.models import voxel_detr as VD
from efg_tpu.ops import box_attention as BA
from efg_tpu.ops.matcher import hungarian_match

PC = (-8.0, -8.0, -2.0, 8.0, 8.0, 4.0)
VOX = (0.1, 0.1, 0.15)

MODEL_CFG = dict(
    pc_range=PC, voxel_size=VOX,
    loss_weights={"class": 1.0, "bbox": 4.0, "giou": 2.0, "rad": 4.0},
)


def test_hungarian_matcher_basic():
    cost = jnp.asarray(
        [[[1.0, 9.0], [9.0, 1.0], [5.0, 5.0]]]  # [1, Q=3, G=2]
    )
    mask = jnp.asarray([[True, True]])
    out = np.asarray(hungarian_match(cost, mask))
    np.testing.assert_array_equal(out[0], [0, 1])
    # masked column gets -1
    mask2 = jnp.asarray([[True, False]])
    out2 = np.asarray(hungarian_match(cost, mask2))
    assert out2[0, 0] == 0 and out2[0, 1] == -1


def test_hungarian_under_jit():
    @jax.jit
    def f(c, m):
        return hungarian_match(c, m)

    cost = jnp.asarray(np.random.RandomState(0).rand(2, 8, 4).astype(np.float32))
    mask = jnp.ones((2, 4), bool)
    out = np.asarray(f(cost, mask))
    assert out.shape == (2, 4)
    assert (out >= 0).all() and (out < 8).all()
    # each query assigned at most once
    for b in range(2):
        assert len(set(out[b])) == 4


def test_box_attention_sample_uniform_weights_center():
    # constant value map → sampling must return that constant
    b, h, w, nh, hd = 1, 8, 8, 2, 4
    value = jnp.full((b, h, w, nh * hd), 3.0)
    grids = jnp.full((b, 5, nh, 1, 9, 2), 0.5)  # all sample at center
    weights = jnp.full((b, 5, nh, 1, 9), 1.0 / 9)
    out = BA.box_attention_sample([value], grids, weights, num_heads=nh)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


def test_box_attention_grid_rotation():
    ki = BA.kernel_indices(3)
    ref_boxes = jnp.zeros((1, 1, 1, 1, 4)).at[..., :2].set(0.5).at[..., 2:].set(0.2)
    ref_angles = jnp.zeros((1, 1, 1, 1, 1))
    off = jnp.zeros((1, 1, 1, 1, 4))
    g0 = BA.make_box_grids(ref_boxes, ref_angles, off, None, ki)
    # 90° rotation: angle normalized 0.25 → pi/2
    g90 = BA.make_box_grids(ref_boxes, ref_angles + 0.25, off, None, ki)
    # rotating the grid by 90° maps (dx, dy) → (-dy, dx)
    d0 = np.asarray(g0[0, 0, 0, 0]) - 0.5
    d90 = np.asarray(g90[0, 0, 0, 0]) - 0.5
    np.testing.assert_allclose(d90[:, 0], -d0[:, 1], atol=1e-6)
    np.testing.assert_allclose(d90[:, 1], d0[:, 0], atol=1e-6)


def test_box_coder_roundtrip():
    coder = VD.VoxelBoxCoder3D(VOX, PC)
    rs = np.random.RandomState(0)
    boxes9 = np.column_stack(
        [
            rs.uniform(-7, 7, (16, 2)), rs.uniform(-1, 3, 16),
            rs.uniform(0.5, 5, (16, 3)), rs.randn(16, 2),
            rs.uniform(-np.pi, np.pi, 16),
        ]
    ).astype(np.float32)
    enc = coder.encode(jnp.asarray(boxes9))
    assert (np.asarray(enc) >= 0).all() and (np.asarray(enc) <= 1).all()
    dec = np.asarray(coder.decode(enc))
    np.testing.assert_allclose(dec[:, :6], boxes9[:, :6], atol=1e-4)
    np.testing.assert_allclose(dec[:, 6], boxes9[:, 8], atol=1e-4)


@pytest.fixture(scope="module")
def detr_setup():
    model = VD.VoxelDETR(
        pc_range=PC, voxel_size=VOX, max_voxels=2048,
        resnet_caps=(1536, 1024, 512, 256),
        hidden_dim=32, num_head=4, enc_layers=1, dec_layers=2,
        dim_feedforward=64, num_queries=16, num_classes=3,
    )
    rs = np.random.RandomState(0)
    pts = np.concatenate(
        [rs.uniform(-7, 7, (2, 1024, 3)), rs.uniform(0, 1, (2, 1024, 2))], axis=-1
    ).astype(np.float32)
    gt = np.zeros((2, 8, 9), np.float32)
    gt[:, :3, :3] = rs.uniform(-6, 6, (2, 3, 3))
    gt[:, :3, 3:6] = rs.uniform(1, 4, (2, 3, 3))
    gt[:, :3, 8] = rs.uniform(-np.pi, np.pi, (2, 3))
    batch = dict(
        points=jnp.asarray(pts),
        points_mask=jnp.ones((2, 1024), bool),
        gt_boxes=jnp.asarray(gt),
        gt_classes=jnp.zeros((2, 8), jnp.int32).at[:, :3].set(jnp.asarray([[1, 2, 3], [2, 1, 3]])),
        gt_mask=jnp.zeros((2, 8), bool).at[:, :3].set(True),
    )
    variables = model.init(jax.random.key(0), batch["points"], batch["points_mask"], True)
    return model, variables, batch


def test_detr_forward_shapes(detr_setup):
    model, variables, batch = detr_setup
    preds, _ = model.apply(
        variables, batch["points"], batch["points_mask"], True, mutable=["batch_stats"]
    )
    assert preds["dec_logits"].shape == (2, 2, 16, 3)
    assert preds["dec_boxes"].shape == (2, 2, 16, 7)
    assert preds["topk_idx"].shape == (2, 16)
    assert np.isfinite(np.asarray(preds["dec_boxes"])).all()
    assert (np.asarray(preds["dec_boxes"]) >= 0).all()
    assert (np.asarray(preds["dec_boxes"]) <= 1).all()


def test_detr_loss_and_grads(detr_setup):
    model, variables, batch = detr_setup

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch["points"], batch["points_mask"], True, mutable=["batch_stats"],
        )
        losses = VD.compute_loss(preds, batch, model_cfg=MODEL_CFG)
        return losses["loss"], losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss)), losses
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert sum(float(np.abs(np.asarray(g)).sum()) for g in flat) > 0
    assert "loss_ce_enc" in losses and "loss_giou_0" in losses and "loss_ce" in losses


def test_detr_predict(detr_setup):
    model, variables, batch = detr_setup
    preds = model.apply(variables, batch["points"], batch["points_mask"], False)
    out = VD.predict(preds, model_cfg=MODEL_CFG, top_k=20)
    assert out["box3d"].shape == (2, 20, 7)
    assert out["labels"].min() >= 1 and out["labels"].max() <= 3
    assert np.isfinite(np.asarray(out["box3d"])).all()


def _window_problem(rs, b=1, h=12, w=10, nh=2, hd=4, l=None, p=5, radius=3,
                    spread=2.0):
    """Random sampling problem whose points all fall within `radius` of the
    anchors (so window == exact sample path)."""
    c = nh * hd
    value = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    if l is None:  # encoder: one query per cell, anchored at itself
        yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        base = np.stack([yy.reshape(-1), xx.reshape(-1)], -1)[None]
        base = np.broadcast_to(base, (b, h * w, 2)).astype(np.int32)
    else:
        base = np.stack(
            [rs.randint(0, h, (b, l)), rs.randint(0, w, (b, l))], -1
        ).astype(np.int32)
    lq = base.shape[1]
    # sample positions: anchor center ± spread cells (within the radius)
    off = rs.uniform(-spread, spread, (b, lq, nh, 1, p, 2)).astype(np.float32)
    centers = np.stack(
        [(base[..., 1] + 0.5), (base[..., 0] + 0.5)], -1
    )[:, :, None, None, None, :]
    pos = centers + off  # (x, y) cell offsets
    grids = (pos / np.asarray([w, h], np.float32)).astype(np.float32)
    attn = rs.rand(b, lq, nh, 1, p).astype(np.float32)
    attn /= attn.sum(axis=(-1,), keepdims=True)
    return value, jnp.asarray(grids), jnp.asarray(attn), jnp.asarray(base)


def test_box_attention_window_dense_matches_sample():
    rs = np.random.RandomState(0)
    nh, radius = 2, 3
    value, grids, attn, base = _window_problem(rs, nh=nh, radius=radius)
    want = BA.box_attention_sample([value], grids, attn, num_heads=nh)
    a = BA.bin_window_coeffs(grids, attn, base, value.shape[1], value.shape[2],
                             radius)
    got = BA.box_attention_window_dense(value, a, num_heads=nh, radius=radius)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_box_attention_window_dense_mxu_matches_sample():
    """Tile-local MXU formulation == exact sample path (bf16 tolerance),
    including gradients through the shifted-reshape key patches."""
    rs = np.random.RandomState(0)
    nh, radius = 2, 3
    value, grids, attn, base = _window_problem(rs, nh=nh, radius=radius)
    want = BA.box_attention_sample([value], grids, attn, num_heads=nh)
    a = BA.bin_window_coeffs(grids, attn, base, value.shape[1], value.shape[2],
                             radius)
    got = BA.box_attention_window_dense_mxu(value, a, num_heads=nh, radius=radius)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
    import jax

    g_mxu = jax.grad(lambda v: jnp.sum(BA.box_attention_window_dense_mxu(
        v, a, num_heads=nh, radius=radius) ** 2))(value)
    g_ref = jax.grad(lambda v: jnp.sum(BA.box_attention_window_dense(
        v, a, num_heads=nh, radius=radius) ** 2))(value)
    np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_ref),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("runs", [False, True])
def test_box_attention_window_gather_matches_sample(runs):
    rs = np.random.RandomState(1)
    nh, radius = 2, 4
    value, grids, attn, base = _window_problem(rs, l=7, nh=nh, radius=radius)
    want = BA.box_attention_sample([value], grids, attn, num_heads=nh)
    a = BA.bin_window_coeffs(grids, attn, base, value.shape[1], value.shape[2],
                             radius)
    got = BA.box_attention_window_gather(
        value, a, base, num_heads=nh, radius=radius, chunk=4, runs=runs
    )
    tol = 2e-2 if runs else 1e-4  # runs path gathers bf16 patches
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol, atol=tol)


def test_box_attention_window_gather_custom_vjp():
    """runs=True custom VJP (re-gather dA + serial window-accumulate dV,
    no XLA scatter) == autodiff of the per-row oracle, end-to-end through
    bin_window_coeffs (whose ok-mask kills the dead out-of-map bins)."""
    import jax

    rs = np.random.RandomState(3)
    b, h, w, c, nh, radius, l = 2, 14, 11, 8, 2, 3, 20
    value = jnp.asarray(rs.randn(b, h, w, c).astype(np.float32))
    base = jnp.asarray(
        np.stack([rs.randint(0, h, (b, l)), rs.randint(0, w, (b, l))], -1), jnp.int32
    )
    cen = np.stack([np.asarray(base)[..., 1], np.asarray(base)[..., 0]], -1) + 0.5
    pts = cen[:, :, None, None, :] + rs.uniform(-2.5, 2.5, (b, l, nh, 4, 2))
    grids = jnp.asarray((pts[:, :, :, None] / np.array([w, h])).astype(np.float32))
    logits = jnp.asarray(rs.randn(b, l, nh, 1, 4).astype(np.float32))

    def f(runs):
        def inner(v, lg):
            attn = jax.nn.softmax(lg, -1)
            a = BA.bin_window_coeffs(grids, attn, base, h, w, radius)
            o = BA.box_attention_window_gather(
                v, a, base, num_heads=nh, radius=radius, chunk=8, runs=runs
            )
            return jnp.sum(o ** 2)
        return inner

    gv1, gl1 = jax.grad(f(True), argnums=(0, 1))(value, logits)
    gv2, gl2 = jax.grad(f(False), argnums=(0, 1))(value, logits)
    sv = float(jnp.max(jnp.abs(gv2))) + 1e-9
    sl = float(jnp.max(jnp.abs(gl2))) + 1e-9
    assert float(jnp.max(jnp.abs(gv1 - gv2))) / sv < 2e-2
    assert float(jnp.max(jnp.abs(gl1 - gl2))) / sl < 2e-2


@pytest.mark.parametrize("runs", [False, True])
def test_box_attention_window_edge_zeroing(runs):
    """Points sampling outside the map contribute zero on both paths."""
    rs = np.random.RandomState(2)
    nh, radius = 2, 4
    value, grids, attn, base = _window_problem(rs, l=5, nh=nh, radius=radius)
    # shift some anchors to the map corner so taps fall outside
    base = base.at[:, :2].set(0)
    h, w = value.shape[1:3]
    centers = jnp.stack(
        [(base[..., 1] + 0.5) / w, (base[..., 0] + 0.5) / h], -1
    )[:, :, None, None, None, :]
    off = jnp.asarray(
        rs.uniform(-3.5, 3.5, grids.shape).astype(np.float32)
    ) / jnp.asarray([w, h], jnp.float32)
    grids = centers + off
    want = BA.box_attention_sample([value], grids, attn, num_heads=nh)
    a = BA.bin_window_coeffs(grids, attn, base, h, w, radius)
    got = BA.box_attention_window_gather(
        value, a, base, num_heads=nh, radius=radius, chunk=8, runs=runs
    )
    tol = 5e-3 if runs else 1e-4  # runs path gathers bf16 patches
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=tol, atol=tol)
