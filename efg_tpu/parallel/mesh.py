"""Device mesh construction and sharding helpers.

The TPU-native replacement for the reference's DDP/NCCL plumbing
(`efg/engine/launch.py`, `efg/utils/distributed.py` — SURVEY.md §2.7):
a named-axis `jax.sharding.Mesh` with `data` (and a reserved `model`)
axis; batches shard over `data`, parameters replicate, and XLA compiles
the gradient reduction into the step over ICI.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(mesh_cfg: Optional[Dict[str, Any]] = None, devices=None) -> Mesh:
    """mesh_cfg: {"axes": ["data", "model"], "shape": [-1, 1]}; -1 takes all
    remaining devices."""
    devices = devices if devices is not None else jax.devices()
    axes = list(mesh_cfg["axes"]) if mesh_cfg else ["data", "model"]
    shape = list(mesh_cfg["shape"]) if mesh_cfg else [-1, 1]
    n = len(devices)
    known = int(np.prod([s for s in shape if s != -1]))
    shape = [n // known if s == -1 else s for s in shape]
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data") -> Dict[str, Any]:
    """Device-put array entries sharded on the leading (batch) dim; non-array
    entries (metadata lists) pass through untouched."""
    bs = batch_sharding(mesh, axis)
    out = {}
    for k, v in batch.items():
        if isinstance(v, (np.ndarray, jax.Array)):
            out[k] = jax.device_put(v, bs)
        else:
            out[k] = v
    return out


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
