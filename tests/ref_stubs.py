"""Shared scaffolding for importing reference playground files on CPU.

The reference modules import CUDA extensions and uninstalled packages
(spconv, pycocotools, torchvision, numba, omegaconf, nuscenes...); these
helpers register permissive stubs so the pure-torch code paths run
unmodified. Used by the 2D-family parity tests.
"""

import sys
import types

import torch


def stub(name, **attrs):
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


_KEEP_STUBBED = {
    "efg", "efg._C", "efg.modeling.operators", "efg.modeling.operators.nms",
}


def ensure_reference_stubs():
    class _Mod(torch.nn.Module):  # placeholder layers, never constructed
        pass

    # other parity tests stub real reference modules with minimal fakes
    # (e.g. m2f's `efg.data.structures.boxes` with only `cat`); evict any
    # file-less `efg.*` entry so the real module loads for these tests
    for k in list(sys.modules):
        if (k == "efg" or k.startswith("efg.")) and k not in _KEEP_STUBBED:
            m = sys.modules[k]
            if getattr(m, "__file__", None) is None:
                del sys.modules[k]
    pkg = sys.modules.get("efg")
    if pkg is not None and not getattr(pkg, "__path__", None):
        pkg.__path__ = ["/root/reference/efg"]

    stub("omegaconf", OmegaConf=object, DictConfig=dict, ListConfig=list)
    pm = stub("pycocotools.mask", frPyObjects=None, decode=None, merge=None)
    stub("pycocotools", mask=pm)

    def _box_area(boxes):
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    tv = stub("torchvision")
    tvo = stub("torchvision.ops", RoIAlign=type("RoIAlign", (), {}),
               box_area=_box_area)
    tvob = stub("torchvision.ops.boxes", box_area=_box_area)
    tvo.boxes = tvob
    tv.ops = tvo
    jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
    stub("numba", jit=jit, njit=jit)
    stub("pyquaternion", Quaternion=type("Quaternion", (), {}))
    stub("nuscenes")
    stub("nuscenes.utils")
    stub("nuscenes.utils.data_classes", Box=type("Box", (), {}))
    sp_attrs = dict(
        SparseConv3d=_Mod, SubMConv3d=_Mod, SparseModule=_Mod,
        SparseSequential=_Mod, SparseConvTensor=type("SparseConvTensor", (), {}),
    )
    sp = stub("spconv", **sp_attrs)
    sp.pytorch = stub("spconv.pytorch", **sp_attrs)
    # stale import path in playground files (SURVEY §2.10)
    stub("efg.modeling.operators", nms=None)
    stub("efg.modeling.operators.nms",
         generalized_batched_nms=lambda *a, **k: None,
         batched_nms=lambda *a, **k: None)
    if "efg" not in sys.modules:
        pkg = types.ModuleType("efg")
        pkg.__path__ = ["/root/reference/efg"]
        sys.modules["efg"] = pkg
    # permissive CUDA-extension stub: `from efg._C import x` → dummy
    c = types.ModuleType("efg._C")
    c.__getattr__ = lambda name: (lambda *a, **k: None)
    sys.modules["efg._C"] = c
    sys.modules["efg"]._C = c


def load_ref_file(modname, path):
    import importlib.util

    ensure_reference_stubs()
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
