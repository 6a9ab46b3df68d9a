"""FCOS GT-assignment + loss parity vs the reference pure-torch stack.

Imports the reference `fcos.py` (`/root/reference/playground/detection.2d/
coco/fcos/fcos.res50.fpn.coco.800size.1x/fcos.py`) on CPU with dependency
stubs, instantiates the FCOS module WITHOUT its backbone (`__new__` + the
attrs `get_ground_truth`/`losses` read), and asserts the jax
`models/fcos.py` assignment and per-loss values agree on identical inputs.
"""

import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from efg_tpu.models import fcos as JF

REF = "/root/reference/playground/detection.2d/coco/fcos/fcos.res50.fpn.coco.800size.1x/fcos.py"


def _stub(name, **attrs):
    if name in sys.modules:
        m = sys.modules[name]
        for k, v in attrs.items():
            if not hasattr(m, k):
                setattr(m, k, v)
        return m
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module")
def ref():
    class _FakeSp(object):
        class _Mod(torch.nn.Module):  # placeholder layers, never constructed
            pass

    _stub("omegaconf", OmegaConf=object, DictConfig=dict, ListConfig=list)
    pm = _stub("pycocotools.mask", frPyObjects=None, decode=None, merge=None)
    _stub("pycocotools", mask=pm)

    def _box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    tv = _stub("torchvision")
    tvo = _stub("torchvision.ops")
    tvob = _stub("torchvision.ops.boxes", box_area=_box_area)
    tvo.boxes = tvob
    tvo.RoIAlign = type("RoIAlign", (), {})
    tvo.box_area = _box_area
    tv.ops = tvo
    jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
    _stub("numba", jit=jit, njit=jit)
    _stub("pyquaternion", Quaternion=type("Quaternion", (), {}))
    _stub("nuscenes")
    _stub("nuscenes.utils")
    _stub("nuscenes.utils.data_classes", Box=type("Box", (), {}))
    sp_attrs = dict(
        SparseConv3d=_FakeSp._Mod, SubMConv3d=_FakeSp._Mod,
        SparseModule=_FakeSp._Mod, SparseSequential=_FakeSp._Mod,
        SparseConvTensor=type("SparseConvTensor", (), {}),
    )
    sp = _stub("spconv", **sp_attrs)
    sp.pytorch = _stub("spconv.pytorch", **sp_attrs)
    # stale import path in the playground file (SURVEY §2.10): the nms op
    # is only used by inference, which this test doesn't exercise
    _stub("efg.modeling.operators", nms=None)
    _stub("efg.modeling.operators.nms", generalized_batched_nms=lambda *a, **k: None)
    if "efg" not in sys.modules:
        pkg = types.ModuleType("efg")
        pkg.__path__ = ["/root/reference/efg"]
        sys.modules["efg"] = pkg
    # permissive CUDA-extension stub: `from efg._C import whatever` resolves
    # to a dummy (the ops are never called on this import-only path)
    c = types.ModuleType("efg._C")
    c.__getattr__ = lambda name: (lambda *a, **k: None)
    sys.modules["efg._C"] = c
    sys.modules["efg"]._C = c

    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_fcos", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _make_ref_model(ref, num_classes, strides, soi, radius):
    from efg.modeling.assigners.box_regression import Shift2BoxTransform

    m = ref.FCOS.__new__(ref.FCOS)
    m.num_classes = num_classes
    m.fpn_strides = list(strides)
    m.object_sizes_of_interest = [list(s) for s in soi]
    m.center_sampling_radius = radius
    m.shift2box_transform = Shift2BoxTransform(weights=(1.0, 1.0, 1.0, 1.0))
    m.focal_loss_alpha = 0.25
    m.focal_loss_gamma = 2.0
    m.iou_loss_type = "giou"
    return m


def _data(seed=0, n_gt=5, num_classes=6):
    rs = np.random.RandomState(seed)
    xy = rs.uniform(0, 90, (n_gt, 2)).astype(np.float32)
    wh = rs.uniform(8, 80, (n_gt, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], axis=1)
    classes = rs.randint(0, num_classes, n_gt).astype(np.int64)
    return boxes, classes


@pytest.mark.parametrize("seed", [0, 7])
def test_fcos_assignment_and_losses_match(ref, seed):
    num_classes = 6
    strides = (8, 16)
    soi = ((-1, 64), (64, 100000))
    radius = 1.5
    shapes = [(12, 16), (6, 8)]

    shift_list = [np.asarray(s) for s in JF.level_shifts(shapes, strides)]
    boxes, classes = _data(seed=seed, num_classes=num_classes)

    # --- reference assignment -------------------------------------------
    from efg.data.structures.boxes import Boxes
    from efg.data.structures.instances import Instances

    tgt = Instances((128, 160))
    tgt.gt_boxes = Boxes(torch.from_numpy(boxes))
    tgt.gt_classes = torch.from_numpy(classes)
    shifts_torch = [[torch.from_numpy(s) for s in shift_list]]
    rmodel = _make_ref_model(ref, num_classes, strides, soi, radius)
    g_cls, g_deltas, g_ctr = rmodel.get_ground_truth(shifts_torch, [tgt])

    # --- jax assignment ---------------------------------------------------
    shifts = jnp.concatenate([jnp.asarray(s) for s in shift_list], axis=0)
    lvl = jnp.concatenate(
        [jnp.full((s.shape[0],), i, jnp.int32) for i, s in enumerate(shift_list)]
    )
    j_cls, j_deltas, j_ctr = JF.fcos_targets(
        shifts, lvl, jnp.asarray(strides, jnp.float32),
        jnp.asarray(soi, jnp.float32),
        jnp.asarray(boxes), jnp.asarray(classes.astype(np.int32)),
        jnp.ones(len(boxes), bool),
        num_classes=num_classes, center_sampling_radius=radius,
    )
    np.testing.assert_array_equal(np.asarray(j_cls), g_cls[0].numpy())
    fg = g_cls[0].numpy() < num_classes
    np.testing.assert_allclose(
        np.asarray(j_deltas)[fg], g_deltas[0].numpy()[fg], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_ctr)[fg], g_ctr[0].numpy()[fg], rtol=1e-5, atol=1e-5
    )

    # --- losses on identical random predictions ---------------------------
    rs = np.random.RandomState(seed + 100)
    r_tot = sum(h * w for h, w in shapes)
    logits = rs.randn(1, r_tot, num_classes).astype(np.float32)
    deltas = np.abs(rs.randn(1, r_tot, 4)).astype(np.float32) * 20 + 1
    ctr = rs.randn(1, r_tot, 1).astype(np.float32)

    # reference losses() takes per-level [N, K·A, H, W] tensors
    def to_levels(flat, ch):
        out, off = [], 0
        for h, w in shapes:
            t = torch.from_numpy(
                flat[:, off : off + h * w].reshape(1, h, w, ch)
            ).permute(0, 3, 1, 2).contiguous()
            out.append(t)
            off += h * w
        return out

    r_losses = rmodel.losses(
        g_cls, g_deltas, g_ctr,
        to_levels(logits, num_classes), to_levels(deltas, 4), to_levels(ctr, 1),
    )

    preds = dict(
        logits=jnp.asarray(logits), deltas=jnp.asarray(deltas),
        centerness=jnp.asarray(ctr), shapes=shapes,
    )
    batch = dict(
        gt_boxes2d=jnp.asarray(boxes)[None],
        gt_classes2d=jnp.asarray(classes.astype(np.int32))[None],
        gt_mask2d=jnp.ones((1, len(boxes)), bool),
    )
    model_cfg = dict(
        num_classes=num_classes, fpn_strides=strides, sizes_of_interest=soi,
        center_sampling_radius=radius,
    )
    j_losses = JF.compute_loss(preds, batch, model_cfg=model_cfg)
    for k in ("loss_cls", "loss_box_reg", "loss_centerness"):
        np.testing.assert_allclose(
            float(j_losses[k]), float(r_losses[k]), rtol=2e-5, atol=1e-6,
            err_msg=k,
        )
