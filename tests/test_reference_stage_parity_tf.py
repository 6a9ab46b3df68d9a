"""TrajectoryFormer loss-stack parity vs the reference torch code.

The reference losses (`/root/reference/playground/tracking.3d/waymo/
trajectoryformer/trajectoryformer.centerpoint/losses.py`) are pure torch:
WeightedSmoothL1Loss, decode_torch (ResidualCoder decode), and the
decoded corner loss `get_corner_loss`. Feed IDENTICAL inputs through them
and the jax twins in `efg_tpu/models/trajectoryformer.py` and assert
agreement; also assert encode_boxes is decode_torch's exact inverse.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from efg_tpu.models import trajectoryformer as TF

REF_DIR = (
    "/root/reference/playground/tracking.3d/waymo/trajectoryformer/"
    "trajectoryformer.centerpoint"
)


@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF_DIR)
    # several reference playground dirs ship a package named `modules`;
    # evict any cached one (e.g. ConQueR's, loaded by the detr parity test)
    # so `from modules.utils import ...` resolves against THIS experiment
    saved = {
        k: sys.modules.pop(k)
        for k in list(sys.modules)
        if k == "modules" or k.startswith("modules.")
    }
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_tf_losses", f"{REF_DIR}/losses.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(REF_DIR)
        for k in list(sys.modules):
            if k == "modules" or k.startswith("modules."):
                del sys.modules[k]
        sys.modules.update(saved)


def _boxes(rs, n):
    return np.column_stack(
        [rs.uniform(-10, 10, (n, 2)), rs.uniform(-2, 2, n),
         rs.uniform(0.8, 6, (n, 3)), rs.uniform(-np.pi, np.pi, n)]
    ).astype(np.float32)


def test_smooth_l1_parity(ref):
    rs = np.random.RandomState(0)
    diff = rs.randn(64, 7).astype(np.float32) * 0.3
    for beta in (1.0 / 9.0, 1.0, 1e-9):
        want = ref.WeightedSmoothL1Loss.smooth_l1_loss(
            torch.from_numpy(diff), beta
        ).numpy()
        got = np.asarray(TF.smooth_l1(jnp.asarray(diff), beta))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_decode_parity_and_encode_inverse(ref):
    rs = np.random.RandomState(1)
    anchors = _boxes(rs, 32)
    enc = (rs.randn(32, 7) * 0.2).astype(np.float32)
    want = ref.decode_torch(
        torch.from_numpy(enc)[None], torch.from_numpy(anchors)[None]
    )[0].numpy()
    got = np.asarray(TF.decode_boxes(jnp.asarray(enc), jnp.asarray(anchors)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # encode is the exact inverse
    back = np.asarray(TF.encode_boxes(jnp.asarray(got), jnp.asarray(anchors)))
    np.testing.assert_allclose(back, enc, rtol=1e-4, atol=1e-4)


def test_corner_loss_lidar_parity(ref):
    rs = np.random.RandomState(2)
    pred = _boxes(rs, 24)
    gt = pred + (rs.randn(24, 7) * 0.2).astype(np.float32)
    want = ref.get_corner_loss_lidar(
        torch.from_numpy(pred), torch.from_numpy(gt)
    ).numpy()
    got = np.asarray(TF.corner_loss_lidar(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_get_corner_loss_parity(ref):
    """Full decoded corner loss: roi-local decode → rotate → translate →
    corner distance, fg-masked mean (reference get_corner_loss,
    losses.py:106-129)."""
    rs = np.random.RandomState(3)
    n = 40
    rois = _boxes(rs, n)
    gt = rois + (rs.randn(n, 7) * 0.15).astype(np.float32)
    reg = (rs.randn(n, 7) * 0.2).astype(np.float32)
    fg = rs.rand(n) > 0.4

    want = ref.get_corner_loss(
        torch.from_numpy(reg), torch.from_numpy(rois), torch.from_numpy(gt),
        torch.from_numpy(fg),
    ).item()
    per = np.asarray(TF.corner_loss(jnp.asarray(reg), jnp.asarray(rois), jnp.asarray(gt)))
    got = per[fg].mean()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
