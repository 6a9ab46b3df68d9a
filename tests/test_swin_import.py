"""Swin pretrained import + APE parity vs the reference swin (CPU).

The reference's real `SwinTransformer` (playground `backbone/swin.py:470-
645`, pure torch; timm provides only DropPath/to_2tuple/trunc_normal_ —
stubbed) runs eval-mode forward on a random image; its state dict is
imported into our flax swin via `torch_import.import_swin` and every
res2..res5 output map must match. APE is exercised at the no-interpolation
size (pretrain_img_size == input size, where torch bicubic resize is the
identity) so the comparison is interpolation-convention-free.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp
from torch import nn as tnn

from ref_stubs import ensure_reference_stubs, load_ref_file

from efg_tpu.modeling.backbones.swin import SwinTransformer
from efg_tpu.utils.torch_import import import_swin

REF_SWIN = (
    "/root/reference/playground/panoptic_seg/coco/mask2former/"
    "mask2former.pano_coco.res50.bs16.50e/backbone/swin.py"
)


def _stub_timm():
    class DropPath(tnn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-mode identity; rates are 0 here anyway
            return x

    def to_2tuple(v):
        return v if isinstance(v, tuple) else (v, v)

    tm = types.ModuleType("timm")
    tml = types.ModuleType("timm.models")
    tmll = types.ModuleType("timm.models.layers")
    tmll.DropPath = DropPath
    tmll.to_2tuple = to_2tuple
    tmll.trunc_normal_ = torch.nn.init.trunc_normal_
    tml.layers = tmll
    tm.models = tml
    sys.modules.setdefault("timm", tm)
    sys.modules["timm.models"] = tml
    sys.modules["timm.models.layers"] = tmll


@pytest.fixture(scope="module")
def ref_swin_mod():
    ensure_reference_stubs()
    _stub_timm()
    return load_ref_file("ref_swin", REF_SWIN)


def test_swin_import_forward_parity(ref_swin_mod):
    torch.manual_seed(0)
    size = 56  # 14x14 patch map; window 7 → shifted path exercised
    tmodel = ref_swin_mod.SwinTransformer(
        pretrain_img_size=size, embed_dim=32, depths=[2, 2], num_heads=[2, 4],
        window_size=7, ape=True, drop_path_rate=0.0, out_indices=(0, 1),
    )
    tmodel.eval()  # (the reference train() override returns None)
    with torch.no_grad():  # non-trivial APE + bias tables
        tmodel.absolute_pos_embed.normal_(0, 0.1)
        for name, p in tmodel.named_parameters():
            if "relative_position_bias_table" in name:
                p.normal_(0, 0.1)
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    jmodel = SwinTransformer(
        embed_dim=32, depths=(2, 2), num_heads=(2, 4), window_size=7,
        ape=True, pretrain_img_size=size, out_features=("res2", "res3"),
    )
    img = np.random.RandomState(0).randn(2, size, size, 3).astype(np.float32)
    variables = jmodel.init(jax.random.key(0), jnp.asarray(img), False)

    variables, n, skipped = import_swin(sd, variables)
    assert skipped == [], f"unmapped swin keys: {skipped[:8]}"
    assert n == len(sd)

    with torch.no_grad():
        outs_t = tmodel(torch.from_numpy(img.transpose(0, 3, 1, 2)))
    outs_j = jmodel.apply({"params": variables["params"]}, jnp.asarray(img), False)

    assert set(outs_j) == set(outs_t) == {"res2", "res3"}
    for k in outs_j:
        want = outs_t[k].numpy().transpose(0, 2, 3, 1)
        got = np.asarray(outs_j[k])
        np.testing.assert_allclose(
            got, want, rtol=0, atol=1e-4,
            err_msg=f"swin {k} diverged after import",
        )


def test_swin_ape_resizes_to_map(ref_swin_mod):
    """APE trained at 224 applies to other input sizes (resize path)."""
    jmodel = SwinTransformer(
        embed_dim=32, depths=(2,), num_heads=(2,), window_size=7,
        ape=True, pretrain_img_size=224, out_features=("res2",),
    )
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jmodel.init(jax.random.key(0), img, False)
    assert variables["params"]["absolute_pos_embed"].shape == (1, 56, 56, 32)
    out = jmodel.apply(variables, img, False)
    assert out["res2"].shape == (1, 16, 16, 32)
