"""ms-deform-attn parity vs the reference's own pure-torch mirror.

The reference ships `ms_deform_attn_core_pytorch` (`/root/reference/efg/
operators/ms_deform_attn.py:55-77`) as the documented semantic spec of its
CUDA kernel (grid_sample bilinear, padding_mode="zeros",
align_corners=False). Feed IDENTICAL inputs through it and through
`efg_tpu.ops.ms_deform_attn.ms_deform_attn_sample` (the op driving
Mask2Former's pixel decoder) and assert the outputs agree — including
out-of-map sampling locations (zero-padding semantics) and multi-level
value pyramids.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from efg_tpu.ops.ms_deform_attn import ms_deform_attn_sample


@pytest.fixture(scope="module")
def ref_core():
    # `from efg import _C` guards the CUDA extension; stub it for CPU import.
    # Other parity tests may already have imported the REAL reference `efg`
    # package (which has no compiled `_C`) — always ensure the attribute.
    if "efg" not in sys.modules:
        pkg = types.ModuleType("efg")
        pkg.__path__ = ["/root/reference/efg"]
        sys.modules["efg"] = pkg
    pkg = sys.modules["efg"]
    if not hasattr(pkg, "_C"):
        pkg._C = types.SimpleNamespace()
    sys.modules.setdefault("efg._C", pkg._C)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_msda", "/root/reference/efg/operators/ms_deform_attn.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.ms_deform_attn_core_pytorch


@pytest.mark.parametrize("shapes", [
    [(12, 9)],                      # single level
    [(16, 16), (8, 8), (4, 4)],     # pyramid
])
def test_msda_matches_reference_core(ref_core, shapes):
    rs = np.random.RandomState(0)
    b, lq, nh, hd, p = 2, 10, 4, 8, 4
    c = nh * hd
    nlvl = len(shapes)
    s_total = sum(h * w for h, w in shapes)
    value = rs.randn(b, s_total, nh, hd).astype(np.float32)
    # locations include out-of-map points (< 0 and > 1): zero padding
    locs = rs.uniform(-0.15, 1.15, (b, lq, nh, nlvl, p, 2)).astype(np.float32)
    attn = rs.rand(b, lq, nh, nlvl, p).astype(np.float32)
    attn /= attn.sum(axis=(-1, -2), keepdims=True)

    want = ref_core(
        torch.from_numpy(value),
        [(h, w) for h, w in shapes],
        torch.from_numpy(locs),
        torch.from_numpy(attn),
    ).numpy()  # [B, Lq, C] with c = head·hd + d

    # our op takes NHWC per-level maps with head-major channels
    levels, start = [], 0
    for h, w in shapes:
        lvl = value[:, start:start + h * w]  # [B, HW, NH, hd]
        levels.append(jnp.asarray(lvl.reshape(b, h, w, c)))
        start += h * w
    got = ms_deform_attn_sample(
        levels, jnp.asarray(locs), jnp.asarray(attn), num_heads=nh
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)
