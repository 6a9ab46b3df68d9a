"""Whole-model weight-transplant decode parity: reference CenterPoint →
efg_tpu VoxelNet (VERDICT r4 item 5).

A torch CenterPoint VoxelNet is assembled with the reference's EXACT
module tree and state-dict naming:

- sparse trunk: module names / Sequential indices replicated from
  `/root/reference/efg/modeling/backbones/sparse_net.py:473-545`
  (SpMiddleResNetFHD), with spconv layers emulated DENSELY — a SubM conv
  equals a dense conv masked to the active sites (inactive inputs
  contribute zero), and a strided SparseConv3d equals a dense strided conv
  masked to the dilated active set. Weights are stored in the spconv 2.x
  layout [Cout, kd, kh, kw, Cin].
- neck: the reference's real `RPN` class
  (`efg/modeling/backbones/configurable_rpn.py:13-123`), imported as-is.
- head: the reference's real `CenterHead`/`SepHead` classes (playground
  `center_head.py:19-110`), imported as-is.

The randomly-initialised torch state dict (incl. random BN running stats)
is transplanted into the flax model via
`torch_import.import_centerpoint_voxelnet`, both stacks run eval-mode
forward on the SAME voxelized input, and every head map plus the dense
`decode_boxes` output must agree — the full VFE → SpMiddleResNetFHD →
RPN → CenterHead → decode chain under shared weights.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp
import torch.nn.functional as F
from torch import nn as tnn

from ref_stubs import ensure_reference_stubs, load_ref_file

from efg_tpu.models import centerpoint as CP
from efg_tpu.modeling.heads.center_head import decode_boxes
from efg_tpu.modeling.readers.voxel_reader import dynamic_mean_vfe
from efg_tpu.utils.torch_import import import_centerpoint_voxelnet

REF_EXP = (
    "/root/reference/playground/detection.3d/waymo/center_point/"
    "centerpoint.waymo.voxelnet.gt_aug.ds_sample.onecycle.adam.bs48.36e"
)

PC_RANGE = (-8.0, -8.0, -2.0, 8.0, 8.0, 4.0)
VOXEL = (0.1, 0.1, 0.15)  # grid 160x160x40; sparse D = 41; BEV 20x20
GRID = (160, 160, 40)
MAX_VOXELS = 512
STAGE_CAPS = (1200, 8192, 2048, 800)  # stages 3/4 cover their full grids
TASKS = ({"num_classes": 2, "class_names": ["VEHICLE", "PEDESTRIAN"]},)
COMMON_HEADS = {"reg": (2, 2), "height": (1, 2), "dim": (3, 2), "rot": (2, 2)}
NECK = dict(layer_nums=(5, 5), ds_layer_strides=(1, 2), ds_num_filters=(128, 256),
            us_layer_strides=(1, 2), us_num_filters=(256, 256))


# ---------------------------------------------------------------------------
# Dense emulation of the spconv layers (weights in spconv 2.x layout)
# ---------------------------------------------------------------------------

def _t3(v):
    return (v,) * 3 if isinstance(v, int) else tuple(v)


class _SpConv3d(tnn.Module):
    """SubMConv3d / SparseConv3d with dense-conv forward; weight layout
    [Cout, kd, kh, kw, Cin] (spconv 2.x)."""

    def __init__(self, cin, cout, ksize, stride=1, padding=0, bias=False,
                 subm=False):
        super().__init__()
        self.ks = _t3(ksize)
        self.stride = _t3(stride)
        self.padding = _t3(padding)
        self.subm = subm
        self.weight = tnn.Parameter(torch.randn(cout, *self.ks, cin) * 0.05)
        self.bias = tnn.Parameter(torch.zeros(cout)) if bias else None

    def forward(self, x, mask):
        w = self.weight.permute(0, 4, 1, 2, 3).contiguous()
        y = F.conv3d(x, w, self.bias, stride=self.stride, padding=self.padding)
        if self.subm:
            newmask = mask
        else:
            ones = torch.ones(1, 1, *self.ks)
            newmask = (
                F.conv3d(mask, ones, stride=self.stride, padding=self.padding)
                > 0.5
            ).float()
        return y * newmask, newmask


def _bn_apply(bn, x, mask):
    """Eval-mode BN over the channel dim of NCDHW, re-masked (sparse BN
    touches active rows only)."""
    sh = (1, -1, 1, 1, 1)
    y = (x - bn.running_mean.view(sh)) / torch.sqrt(bn.running_var.view(sh) + bn.eps)
    return (y * bn.weight.view(sh) + bn.bias.view(sh)) * mask


class _SparseSeq(tnn.Sequential):
    """SparseSequential stand-in: threads (dense, mask) through members."""

    def forward(self, xm):
        x, m = xm
        for mod in self:
            if isinstance(mod, _SpConv3d):
                x, m = mod(x, m)
            elif isinstance(mod, tnn.BatchNorm1d):
                x = _bn_apply(mod, x, m)
            elif isinstance(mod, tnn.ReLU):
                x = torch.relu(x)
            else:
                x, m = mod((x, m))
        return x, m


class _SparseBasicBlock(tnn.Module):
    """Reference `SparseBasicBlock` (`sparse_net.py:429-470`): member names
    conv1/bn1/relu/conv2/bn2, conv bias=True (bias = norm is not None)."""

    def __init__(self, c):
        super().__init__()
        self.conv1 = _SpConv3d(c, c, 3, padding=1, bias=True, subm=True)
        self.bn1 = tnn.BatchNorm1d(c)
        self.relu = tnn.ReLU()
        self.conv2 = _SpConv3d(c, c, 3, padding=1, bias=True, subm=True)
        self.bn2 = tnn.BatchNorm1d(c)

    def forward(self, xm):
        x, m = xm
        idt = x
        out, _ = self.conv1(x, m)
        out = torch.relu(_bn_apply(self.bn1, out, m))
        out, _ = self.conv2(out, m)
        out = _bn_apply(self.bn2, out, m)
        return torch.relu(out + idt) * m, m


class _SpMiddleResNetFHD(tnn.Module):
    """Name-exact twin of reference SpMiddleResNetFHD (`sparse_net.py:
    473-545`): conv_input / conv1..conv4 / extra_conv Sequential indices."""

    def __init__(self, num_input_features=5):
        super().__init__()
        self.conv_input = _SparseSeq(
            _SpConv3d(num_input_features, 16, 3, padding=1, subm=True),
            tnn.BatchNorm1d(16), tnn.ReLU(),
        )
        self.conv1 = _SparseSeq(_SparseBasicBlock(16), _SparseBasicBlock(16))
        self.conv2 = _SparseSeq(
            _SpConv3d(16, 32, 3, stride=2, padding=1),
            tnn.BatchNorm1d(32), tnn.ReLU(),
            _SparseBasicBlock(32), _SparseBasicBlock(32),
        )
        self.conv3 = _SparseSeq(
            _SpConv3d(32, 64, 3, stride=2, padding=1),
            tnn.BatchNorm1d(64), tnn.ReLU(),
            _SparseBasicBlock(64), _SparseBasicBlock(64),
        )
        self.conv4 = _SparseSeq(
            _SpConv3d(64, 128, 3, stride=2, padding=(0, 1, 1)),
            tnn.BatchNorm1d(128), tnn.ReLU(),
            _SparseBasicBlock(128), _SparseBasicBlock(128),
        )
        self.extra_conv = _SparseSeq(
            _SpConv3d(128, 128, (3, 1, 1), stride=(2, 1, 1)),
            tnn.BatchNorm1d(128), tnn.ReLU(),
        )

    def forward(self, feats, coords_zyx, valid, sparse_shape):
        bsz = feats.shape[0]
        d, h, w = sparse_shape
        dense = torch.zeros(bsz, feats.shape[-1], d, h, w)
        mask = torch.zeros(bsz, 1, d, h, w)
        for b in range(bsz):
            v = valid[b]
            z, y, x = coords_zyx[b, v].T
            dense[b, :, z, y, x] = feats[b, v].T
            mask[b, 0, z, y, x] = 1.0
        x, m = self.conv_input((dense, mask))
        x, m = self.conv1((x, m))
        x, m = self.conv2((x, m))
        x, m = self.conv3((x, m))
        x, m = self.conv4((x, m))
        x, m = self.extra_conv((x, m))
        n, c, dd, hh, ww = x.shape
        return x.reshape(n, c * dd, hh, ww)  # reference `.dense()` + view


# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_mods():
    ensure_reference_stubs()
    sys.path.insert(0, REF_EXP)
    try:
        from efg.modeling.backbones.configurable_rpn import RPN as RefRPN

        ch = load_ref_file("ref_center_head", f"{REF_EXP}/center_head.py")
        yield types.SimpleNamespace(RPN=RefRPN, CenterHead=ch.CenterHead)
    finally:
        sys.path.remove(REF_EXP)


def _head_config():
    """Minimal attribute-access config for the reference CenterHead."""
    misc = types.SimpleNamespace(
        code_weights=[1.0] * 8, weight=2, dataset="waymo",
        common_heads=dict(COMMON_HEADS),
    )
    head = types.SimpleNamespace(
        tasks=[dict(t) for t in TASKS], misc=misc,
        in_channels=sum(NECK["us_num_filters"]),
    )
    neck = types.SimpleNamespace(norm="BN")
    return types.SimpleNamespace(model=types.SimpleNamespace(head=head, neck=neck))


class _RefVoxelNet(tnn.Module):
    """Top-level naming of the reference VoxelNet (`voxelnet.py:26-28`:
    reader has no params; backbone / neck / center_head)."""

    def __init__(self, ref_mods):
        super().__init__()
        self.backbone = _SpMiddleResNetFHD(5)
        rpn_cfg = types.SimpleNamespace(
            num_input_features=256, norm="BN", **NECK
        )
        self.neck = ref_mods.RPN(rpn_cfg)
        self.center_head = ref_mods.CenterHead(_head_config())


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in model.named_parameters():
            if p.ndim > 1:
                p.normal_(0.0, 0.05, generator=g)
            else:
                p.normal_(0.0, 0.05, generator=g)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.normal_(0.0, 0.1, generator=g)
            elif name.endswith("running_var"):
                b.uniform_(0.5, 1.5, generator=g)


def _scene(seed=0, bsz=2, n=128):
    rs = np.random.RandomState(seed)
    pts = rs.uniform(-7.5, 7.5, (bsz, n, 3)).astype(np.float32)
    pts[..., 2] = rs.uniform(-1.9, 3.9, (bsz, n))
    extra = rs.uniform(0, 1, (bsz, n, 2)).astype(np.float32)
    pts = np.concatenate([pts, extra], axis=-1)
    mask = np.ones((bsz, n), bool)
    mask[:, -13:] = False
    return pts, mask


def test_centerpoint_weight_transplant_forward_parity(ref_mods):
    torch.manual_seed(0)
    tmodel = _RefVoxelNet(ref_mods).eval()
    _randomize(tmodel)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    jmodel = CP.VoxelNet(
        pc_range=PC_RANGE, voxel_size=VOXEL, max_voxels=MAX_VOXELS,
        stage_caps=STAGE_CAPS, tasks=[dict(t) for t in TASKS],
        common_heads=tuple(COMMON_HEADS.items()),
        neck_cfg=tuple(NECK.items()),
    )
    pts, mask = _scene()
    variables = jmodel.init(jax.random.key(0), jnp.asarray(pts), jnp.asarray(mask), True)

    variables, n_assigned, skipped = import_centerpoint_voxelnet(sd, variables)
    assert skipped == [], f"unmapped reference keys: {skipped[:8]}"
    n_tracked = sum(k.endswith("num_batches_tracked") for k in sd)
    assert n_assigned == len(sd)
    assert n_tracked > 0  # the dropped buffers counted as handled

    # identical voxelized input for both stacks
    feats, coords, valid = jax.jit(
        lambda p, m: dynamic_mean_vfe(
            p, m, pc_range=PC_RANGE, voxel_size=VOXEL,
            max_voxels=MAX_VOXELS, num_input_features=5,
        )
    )(jnp.asarray(pts), jnp.asarray(mask))

    with torch.no_grad():
        bev_t = tmodel.backbone(
            torch.from_numpy(np.asarray(feats)),
            torch.from_numpy(np.asarray(coords)).long(),
            torch.from_numpy(np.asarray(valid)),
            (GRID[2] + 1, GRID[1], GRID[0]),
        )
        neck_t = tmodel.neck(bev_t)
        maps_t = tmodel.center_head(neck_t)

    preds_j = jmodel.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(pts), jnp.asarray(mask), False,
    )

    assert len(preds_j) == len(maps_t) == 1
    for head in ("hm", "reg", "height", "dim", "rot"):
        got = np.asarray(preds_j[0][head])                 # NHWC
        want = maps_t[0][head].numpy().transpose(0, 2, 3, 1)  # NCHW → NHWC
        scale = max(np.abs(want).max(), 1e-3)
        np.testing.assert_allclose(
            got, want, rtol=0, atol=0.03 * scale,
            err_msg=f"head map {head!r} diverged after transplant",
        )

    # dense decode parity: same decode applied to both map sets
    dec = jax.jit(
        lambda p: decode_boxes(
            p, pc_range=PC_RANGE, voxel_size=VOXEL, out_size_factor=8,
            with_vel=False,
        )
    )
    boxes_j, scores_j = dec({k: jnp.asarray(np.asarray(v)) for k, v in preds_j[0].items()})
    maps_np = {k: jnp.asarray(v.numpy().transpose(0, 2, 3, 1)) for k, v in maps_t[0].items()}
    boxes_t, scores_t = dec(maps_np)
    np.testing.assert_allclose(np.asarray(boxes_j), np.asarray(boxes_t), atol=0.08)
    np.testing.assert_allclose(np.asarray(scores_j), np.asarray(scores_t), atol=0.02)
