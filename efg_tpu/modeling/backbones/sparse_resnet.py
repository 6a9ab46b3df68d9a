"""Sparse ResNet family → multi-scale BEV maps (flax.linen).

Rebuild of the reference `SparseBasicStem`/`SparseBasicResBlock`/
`SparseBottleneckBlock`/`SparseResNet` + `build_sparse_resnet_backbone`
(`efg/modeling/backbones/sparse_net.py:79-401`): SubM/strided gather-GEMM
convs with per-stage fixed capacities; each requested `out_feature` passes
a z-compressing `(3,1,1)/(2,1,1)` conv and densifies to an NHWC BEV map
with channels × the reference's [6, 3, 2] depth multipliers.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
from flax import linen as nn

from efg_tpu.modeling.backbones.sparse_net import (
    SparseBasicBlock,
    SparseConvDown,
    SubMConv,
    _BNReLU,
)
from efg_tpu.ops import sparse as sp

# depth → blocks per stage (reference `num_blocks_per_stage`)
_BLOCKS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}
_STEM_WIDTH = {18: 16, 34: 16}
_OUT_MULTIPLIER = (6, 3, 2)  # z-planes after the per-output compress conv


class _ResStage(nn.Module):
    """One res stage: strided first block + SubM residual blocks sharing a
    rulebook (reference `SparseBasicResBlock` + `make_stage`)."""

    out_channels: int
    num_blocks: int
    max_out: int
    backend: str = "xla"

    @nn.compact
    def __call__(self, st: sp.SparseTensor, train: bool) -> sp.SparseTensor:
        identity = SparseConvDown(
            self.out_channels, max_out=self.max_out, backend=self.backend,
            name="down",
        )(st)
        out = _BNReLU(relu=False, name="down_bn")(identity, train)
        # first block's residual shortcut is the strided projection itself
        rb = sp.build_rulebook(out, 3, self.backend)
        x = SubMConv(self.out_channels, name="b0_conv2")(out, rb)
        x = _BNReLU(relu=False, name="b0_bn2")(x, train)
        x = x.replace_features(
            jax.nn.relu(x.features + out.features) * x.valid[:, None].astype(x.features.dtype)
        )
        for i in range(1, self.num_blocks):
            x = SparseBasicBlock(self.out_channels, name=f"b{i}")(x, rb, train)
        return x


class SparseResNet(nn.Module):
    """Reference `SparseResNet` (`sparse_net.py:240-310`) producing BEV maps."""

    depth: int = 18
    num_input_features: int = 5
    stem_out_channels: int = 32
    res1_out_channels: int = 64
    out_features: Sequence[str] = ("res2", "res3", "res4")
    grid_size: Tuple[int, int, int] = (1504, 1504, 40)
    stage_caps: Sequence[int] = (60000, 40000, 25000, 15000, 10000)
    # PER-SAMPLE caps: [after stem stride-2, after res2, res3, res4, res5];
    # multiplied by the batch size internally (same semantics as
    # SpMiddleResNetFHD.stage_caps)
    sparse_backend: str = "auto"  # auto | xla | pallas

    @nn.compact
    def __call__(self, features, coords_zyx, valid, train: bool) -> Dict[str, jax.Array]:
        nx, ny, nz = self.grid_size
        st = sp.from_batched_voxels(features, coords_zyx, valid, (nz + 1, ny, nx))
        stem_w = _STEM_WIDTH[self.depth]
        backend = (
            sp.default_backend() if self.sparse_backend == "auto"
            else self.sparse_backend
        )

        # stem: strided conv + 2 SubM convs (reference `SparseBasicStem`)
        bsz = st.batch_size
        st = SparseConvDown(
            stem_w, max_out=self.stage_caps[0] * bsz, backend=backend,
            name="stem_down",
        )(st)
        st = _BNReLU(name="stem_bn0")(st, train)
        rb = sp.build_rulebook(st, 3, backend)
        st = SubMConv(stem_w, name="stem_conv1")(st, rb)
        st = _BNReLU(name="stem_bn1")(st, train)
        st = SubMConv(self.stem_out_channels, name="stem_conv2")(st, rb)
        st = _BNReLU(name="stem_bn2")(st, train)

        out_stage_idx = [int(f[-1]) for f in self.out_features]
        max_stage = max(out_stage_idx)
        blocks = _BLOCKS[self.depth]

        outputs: Dict[str, sp.SparseTensor] = {}
        out_channels = self.res1_out_channels
        for i, stage_idx in enumerate(range(2, max_stage + 1)):
            st = _ResStage(
                out_channels, blocks[i], max_out=self.stage_caps[1 + i] * bsz,
                backend=backend, name=f"res{stage_idx}",
            )(st, train)
            if f"res{stage_idx}" in self.out_features:
                outputs[f"res{stage_idx}"] = st
            out_channels *= 2

        bev: Dict[str, jax.Array] = {}
        for k, (name, s) in enumerate(sorted(outputs.items())):
            c = s.num_channels
            o = SparseConvDown(
                c, kernel_size=(3, 1, 1), stride=(2, 1, 1), padding=(1, 0, 0),
                max_out=s.capacity, backend=backend, name=f"{name}_out",
            )(s)
            o = _BNReLU(name=f"{name}_out_bn")(o, train)
            dense = sp.to_dense(o)  # [B, C, D, H, W]
            b, cc, d, h, w = dense.shape
            bev[name] = dense.transpose(0, 3, 4, 1, 2).reshape(b, h, w, cc * d)
        return bev

    def output_channels(self) -> Dict[str, int]:
        out = {}
        c = self.res1_out_channels
        for k, f in enumerate(sorted(self.out_features)):
            idx = int(f[-1]) - 2
            out[f] = self.res1_out_channels * (2**idx) * _OUT_MULTIPLIER[k]
        return out
