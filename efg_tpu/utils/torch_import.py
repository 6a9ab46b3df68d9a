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
