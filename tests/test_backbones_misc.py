"""Swin / BiFPN / MultiGroupHead / region-attention smoke tests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


def test_swin_shapes_and_shift():
    from efg_tpu.modeling.backbones.swin import SwinTransformer

    m = SwinTransformer(embed_dim=32, depths=(2, 2), num_heads=(2, 4), window_size=4,
                        out_features=("res2", "res3"))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32))
    v = m.init(jax.random.key(0), x, True)
    out = m.apply(v, x, True)
    assert out["res2"].shape == (2, 16, 16, 32)
    assert out["res3"].shape == (2, 8, 8, 64)
    assert all(np.isfinite(np.asarray(o)).all() for o in out.values())


def test_bifpn_fusion_weights_positive():
    from efg_tpu.modeling.backbones.bifpn import BiFPN

    feats = {
        f"res{i}": jnp.asarray(
            np.random.RandomState(i).randn(1, 2 ** (7 - i), 2 ** (7 - i), 8).astype(np.float32)
        )
        for i in (3, 4, 5)
    }
    m = BiFPN(features=16, num_layers=2)
    v = m.init(jax.random.key(0), feats, True)
    out, _ = m.apply(v, feats, True, mutable=["batch_stats"])
    assert len(out) == 5
    assert out[0].shape == (1, 16, 16, 16)
    assert out[4].shape == (1, 1, 1, 16)


def test_multigroup_head():
    from efg_tpu.modeling.heads.multigroup_head import MultiGroupHead

    tasks = [{"num_classes": 1, "class_names": ["car"]},
             {"num_classes": 2, "class_names": ["ped", "cyc"]}]
    m = MultiGroupHead(tasks=tasks, box_code_size=7, use_dir=True)
    x = jnp.zeros((2, 8, 8, 64))
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out[0]["box_preds"].shape == (2, 8, 8, 2 * 7)    # 2 anchors
    assert out[0]["cls_preds"].shape == (2, 8, 8, 2 * 1)
    assert out[1]["box_preds"].shape == (2, 8, 8, 4 * 7)    # 4 anchors
    assert out[1]["dir_cls_preds"].shape == (2, 8, 8, 4 * 2)


def test_region_attention():
    from efg_tpu.modeling.modules.region_attention import (
        AttentionWithRelPos,
        R2LAttentionPlusFFN,
    )

    rs = np.random.RandomState(1)
    tokens = jnp.asarray(rs.randn(3, 16, 32).astype(np.float32))
    m = AttentionWithRelPos(dim=32, num_heads=4, window_size=(4, 4))
    v = m.init(jax.random.key(0), tokens)
    out = m.apply(v, tokens)
    assert out.shape == tokens.shape

    region = jnp.asarray(rs.randn(2, 4, 32).astype(np.float32))
    local = jnp.asarray(rs.randn(2, 64, 32).astype(np.float32))
    m2 = R2LAttentionPlusFFN(dim=32, num_heads=4)
    v2 = m2.init(jax.random.key(1), region, local)
    out2 = m2.apply(v2, region, local)
    assert out2.shape == region.shape
    assert np.isfinite(np.asarray(out2)).all()


def test_keypoints_heatmap():
    from efg_tpu.data.structures.keypoints import Keypoints

    kp = Keypoints(np.array([[[5.0, 5.0, 2.0], [100.0, 100.0, 0.0]]]))
    boxes = np.array([[0.0, 0.0, 10.0, 10.0]])
    tgt, valid = kp.to_heatmap(boxes, heatmap_size=8)
    assert valid[0, 0] and not valid[0, 1]
    assert tgt[0, 0] == 4 * 8 + 4  # center of the box


def test_swin_nondivisible_size_and_drop_path():
    """Window padding (H, W not multiples of ws) + stochastic depth rng."""
    from efg_tpu.modeling.backbones.swin import SwinTransformer

    m = SwinTransformer(embed_dim=32, depths=(2, 2), num_heads=(2, 4), window_size=4,
                        drop_path_rate=0.3, out_features=("res2", "res3"))
    x = jnp.asarray(np.random.RandomState(1).randn(2, 52, 68, 3).astype(np.float32))
    v = m.init(jax.random.key(0), x, False)
    out = m.apply(v, x, False)
    assert out["res2"].shape == (2, 13, 17, 32)
    assert out["res3"].shape == (2, 7, 9, 64)  # ceil(13/2), ceil(17/2)... patch merge halves
    out_t = m.apply(v, x, True, rngs={"dropout": jax.random.key(1)})
    assert all(np.isfinite(np.asarray(o)).all() for o in out_t.values())


def test_resnet_deform_stages():
    """deform_on_per_stage wires DeformConv into conv2 (reference
    DeformBottleneckBlock); zero-init offsets → v1 == plain conv sampling
    at integer taps, so outputs stay finite and shaped identically."""
    import jax
    import jax.numpy as jnp

    from efg_tpu.modeling.backbones.resnet import ResNet

    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    net = ResNet(
        depth=50, out_features=("res3",), freeze_at=0,
        deform_on_per_stage=(False, True, False, False),
        deform_modulated=True,
    )
    vars_ = net.init(jax.random.key(0), x, False)
    flat = jax.tree_util.tree_flatten_with_path(vars_["params"])[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("offset_conv" in n and "res3" in n for n in names), sorted(names)[:5]
    out = net.apply(vars_, x, False)
    assert out["res3"].shape == (1, 8, 8, 512)
    assert bool(jnp.isfinite(out["res3"]).all())
