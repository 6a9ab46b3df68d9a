"""Deform conv, KNN, MS-deform-attn, mask paste, metrics tests."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from efg_tpu.modeling.metrics import accuracy
from efg_tpu.modeling.post_processing import paste_masks_in_image
from efg_tpu.ops.deform_conv import deform_conv2d
from efg_tpu.ops.knn import knn_gather, knn_points
from efg_tpu.ops.ms_deform_attn import ms_deform_attn_sample


def test_deform_conv_zero_offsets_equals_conv():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 8, 4).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 3, 4, 6).astype(np.float32) * 0.2)
    off = jnp.zeros((2, 8, 8, 18))
    got = deform_conv2d(x, off, w, stride=1, padding=1)
    import jax.lax as lax

    exp = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(exp), rtol=1e-4, atol=1e-4)


def test_knn_matches_bruteforce():
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(2, 32, 3).astype(np.float32))
    p = jnp.asarray(rs.randn(2, 64, 3).astype(np.float32))
    d, idx = knn_points(q, p, k=4)
    # brute force
    qd = np.asarray(q)[:, :, None] - np.asarray(p)[:, None]
    d2 = (qd**2).sum(-1)
    exp_idx = np.argsort(d2, axis=-1)[..., :4]
    np.testing.assert_array_equal(np.sort(np.asarray(idx), -1), np.sort(exp_idx, -1))
    g = knn_gather(p, idx)
    assert g.shape == (2, 32, 4, 3)


def test_knn_respects_mask():
    q = jnp.zeros((1, 1, 3))
    p = jnp.asarray([[[0.1, 0, 0], [5, 5, 5], [0.2, 0, 0]]])
    pm = jnp.asarray([[True, True, False]])
    _, idx = knn_points(q, p, points_mask=pm, k=2)
    assert set(np.asarray(idx)[0, 0].tolist()) == {0, 1}  # masked point excluded


def test_ms_deform_attn_constant_map():
    value = jnp.full((1, 6, 6, 8), 2.0)
    loc = jnp.full((1, 3, 2, 1, 4, 2), 0.5)
    w = jnp.full((1, 3, 2, 1, 4), 0.25)
    out = ms_deform_attn_sample([value], loc, w, num_heads=2)
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)


def test_paste_masks():
    masks = jnp.ones((1, 4, 4))
    boxes = jnp.asarray([[2.0, 2.0, 6.0, 6.0]])
    out = np.asarray(paste_masks_in_image(masks, boxes, (10, 10)))
    assert out.shape == (1, 10, 10)
    assert out[0, 3, 3] and not out[0, 0, 0] and not out[0, 8, 8]


def test_accuracy_metric():
    logits = jnp.asarray([[2.0, 1.0, 0.0], [0.0, 2.0, 1.0], [0.0, 1.0, 2.0]])
    tgt = jnp.asarray([0, 1, 0])
    m = accuracy(logits, tgt, topk=(1, 2))
    assert float(m["top1"]) == pytest.approx(2 / 3)
    assert float(m["top2"]) == pytest.approx(2 / 3)
