"""Torch/detectron2 checkpoint import shim.

Rebuild of the reference's checkpoint-conversion machinery
(`efg/utils/checkpoint.py:58-157`, `d2_model_loading.py`,
`catalog.py`): loads a `.pth`/`.pkl` state dict (torch CPU or pickled
numpy), strips DDP prefixes, and converts conv/linear/BN tensors into the
flax NHWC parameter convention:

  torch Conv2d [O, I, kh, kw]  → flax [kh, kw, I, O]
  torch Linear [O, I]          → flax [I, O]
  torch BN weight/bias/mean/var → scale/bias + batch_stats mean/var

Used both for importing reference-pretrained backbones (parity testing)
and ImageNet weights.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Tuple

import numpy as np


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pth (CPU) or detectron2 .pkl into numpy arrays."""
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        sd = data.get("model", data)
        return {k: np.asarray(v) for k, v in sd.items() if isinstance(v, np.ndarray)}
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    sd = data.get("model", data.get("state_dict", data))
    out = {}
    for k, v in sd.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().numpy()
    return out


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str = "module.") -> Dict[str, np.ndarray]:
    """Strip DDP 'module.' prefixes (reference `checkpoint.py:97-106`)."""
    if all(k.startswith(prefix) for k in sd):
        return {k[len(prefix):]: v for k, v in sd.items()}
    return sd


def convert_tensor(name: str, value: np.ndarray) -> Tuple[str, np.ndarray]:
    """Map one torch tensor to the flax layout. Returns (kind, array) where
    kind ∈ {kernel, bias, scale, mean, var}."""
    if name.endswith(".weight"):
        if value.ndim == 4:  # conv OIHW → HWIO
            return "kernel", value.transpose(2, 3, 1, 0)
        if value.ndim == 2:  # linear OI → IO
            return "kernel", value.T
        if value.ndim == 1:  # norm scale
            return "scale", value
    if name.endswith(".bias"):
        return "bias", value
    if name.endswith(".running_mean"):
        return "mean", value
    if name.endswith(".running_var"):
        return "var", value
    return "raw", value


def assign_into_tree(tree: Dict[str, Any], path: str, value: np.ndarray) -> bool:
    """Place `value` at slash/dot path into a nested param dict if the leaf
    exists with a matching shape (shape-mismatch skip, reference
    `checkpoint.py:122-139`). Returns True when assigned."""
    parts = path.replace("/", ".").split(".")
    cur = tree
    for p in parts[:-1]:
        if not isinstance(cur, dict) or p not in cur:
            return False
        cur = cur[p]
    leaf = parts[-1]
    if not isinstance(cur, dict) or leaf not in cur:
        return False
    if tuple(np.shape(cur[leaf])) != tuple(value.shape):
        return False
    cur[leaf] = value.astype(np.asarray(cur[leaf]).dtype)
    return True


# ---------------------------------------------------------------------------
# torchvision / d2 ResNet name mapping (reference `d2_model_loading.py:11` —
# 289 LoC of detectron2 name conversion; here the target is the flax ResNet
# in `modeling/backbones/resnet.py`)
# ---------------------------------------------------------------------------

def _resnet_rename(key: str) -> str:
    """torchvision resnet key → flax ResNet tree path (without leaf kind).

    conv1/bn1 → stem; layer{i}.{b} → res{i+1}_block{b}; conv{j}/bn{j} →
    conv{j}/norm{j}; downsample.0/.1 → shortcut/shortcut_norm.
    """
    if key.startswith("backbone."):
        key = key[len("backbone."):]
    if key.startswith("conv1."):
        return "stem_conv1"
    if key.startswith("bn1."):
        return "stem_norm"
    if key.startswith("layer"):
        parts = key.split(".")
        stage = int(parts[0][len("layer"):]) + 1
        block = parts[1]
        rest = parts[2]
        base = f"res{stage}_block{block}"
        if rest.startswith("conv"):
            return f"{base}.conv{rest[4:]}"
        if rest.startswith("bn"):
            return f"{base}.norm{rest[2:]}"
        if rest == "downsample":
            which = parts[3]
            return f"{base}.shortcut" if which == "0" else f"{base}.shortcut_norm"
    return ""


def import_torchvision_resnet(
    sd: Dict[str, np.ndarray], variables: Dict[str, Any], prefix: str = ""
) -> Tuple[Dict[str, Any], int, list]:
    """Load a torchvision-style ResNet state dict into flax ResNet
    variables (params + batch_stats), converting layouts.

    `prefix` locates the ResNet inside a larger param tree (e.g.
    "backbone"). Returns (new_variables, n_assigned, skipped_keys).
    """
    import copy

    variables = copy.deepcopy(
        {k: jax_tree_to_numpy(v) for k, v in variables.items()}
    )
    n, skipped = 0, []
    for key, val in strip_prefix(sd).items():
        if key.startswith("fc."):
            continue
        base = _resnet_rename(key)
        if not base:
            skipped.append(key)
            continue
        kind, arr = convert_tensor(key, val)
        coll = "batch_stats" if kind in ("mean", "var") else "params"
        path = f"{prefix}.{base}.{kind}" if prefix else f"{base}.{kind}"
        if assign_into_tree(variables.get(coll, {}), path, arr):
            n += 1
        else:
            skipped.append(key)
    return variables, n, skipped


def jax_tree_to_numpy(tree):
    """Deep-copy a (possibly frozen) param tree into plain nested dicts of
    numpy arrays so it can be mutated in place."""
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: jax_tree_to_numpy(v) for k, v in tree.items()}
    return np.asarray(tree)
