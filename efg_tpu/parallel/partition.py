"""Rule-based parameter partitioning: tensor parallelism over the `model`
mesh axis.

The reference framework is data-parallel only (`efg/engine/launch.py`,
`efg/utils/distributed.py` wrap DDP/NCCL); on TPU, tensor parallelism
needs no communication code at all — parameters carry `NamedSharding`s
and GSPMD inserts the all-gathers/reduce-scatters over ICI. This module
is the rulebook: regex → `PartitionSpec`, first match wins, with
divisibility guards so any rule that cannot shard a given leaf falls
back to replication instead of failing.

The default CenterPoint rule set applies the Megatron column/row pattern
to the dense BEV trunk (where TP pays): RPN block convs alternate
cout-sharded (column) and cin-sharded (row, output partial-summed by
GSPMD), head tower convs are column-parallel with the tiny `*_final`
projections row-parallel. The sparse voxel backbone stays replicated —
it is batch-dominated and runs under the data axis.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over the '/'-joined param path, PartitionSpec). First match wins.
# Specs name mesh axes; a spec whose sharded dim does not divide by the
# axis size is replaced by replication for that leaf.
Rules = List[Tuple[str, P]]

_COL4 = P(None, None, None, "model")  # NHWC conv kernel, cout sharded
_ROW4 = P(None, None, "model", None)  # NHWC conv kernel, cin sharded
_VEC = P("model")                     # per-channel vector


def centerpoint_tp_rules() -> Rules:
    """Megatron-style column/row alternation for the dense BEV trunk."""
    return [
        # RPN blocks: in/0/2/4 column-parallel, 1/3 row-parallel — each
        # col→row pair contracts the sharded channel without a resharding
        # in between; GSPMD emits one psum after the row conv.
        (r"neck/block\d+_(in|conv0|conv2|conv4)/.*kernel$", _COL4),
        (r"neck/block\d+_(conv1|conv3)/.*kernel$", _ROW4),
        (r"neck/block\d+_(in|conv0|conv2|conv4)/.*(scale|bias|mean|var)$", _VEC),
        (r"neck/deblock\d+_(conv|deconv)/kernel$", _COL4),
        (r"neck/deblock\d+_bn/(scale|bias|mean|var)$", _VEC),
        # head towers: shared/tower convs column-parallel, final row
        (r"head/.*(shared_conv|_conv\d+)/kernel$", _COL4),
        (r"head/.*(shared_bn|_bn\d+)/(scale|bias|mean|var)$", _VEC),
        (r"head/.*(shared_conv|_conv\d+)/bias$", _VEC),
        (r"head/.*_final/kernel$", _ROW4),
    ]


def detr_tp_rules() -> Rules:
    """Megatron rules for the DETR family (VoxelDETR/ConQueR/Mask2Former
    transformer stacks): FFN column→row, attention projections sharded by
    head (flax attention kernels are [d, NH, hd] / [NH, hd, d]; the box-
    attention value/out projections shard d_model, which the window paths'
    head-major reshape turns into head parallelism). Per-head coefficient
    projections (`linear_attn`/`linear_box`) and norms stay replicated."""
    return [
        (r"(enc|dec)\d+/linear1/kernel$", P(None, "model")),
        (r"(enc|dec)\d+/linear1/bias$", _VEC),
        (r"(enc|dec)\d+/linear2/kernel$", P("model", None)),
        (r"self_attn/(query|key|value)/kernel$", P(None, "model", None)),
        (r"self_attn/(query|key|value)/bias$", P("model", None)),
        (r"self_attn/out/kernel$", P("model", None, None)),
        (r"(self_attn|cross_attn)/value_proj/kernel$", P(None, "model")),
        (r"(self_attn|cross_attn)/value_proj/bias$", _VEC),
        (r"(self_attn|cross_attn)/out_proj/kernel$", P("model", None)),
    ]


def _spec_fits(spec: P, shape: Sequence[int], mesh: Mesh) -> bool:
    if len(spec) > len(shape):
        return False
    for dim, axes in enumerate(spec):
        if axes is None:
            continue
        names = (axes,) if isinstance(axes, str) else tuple(axes)
        size = 1
        for n in names:
            if n not in mesh.shape:
                return False
            size *= mesh.shape[n]
        if shape[dim] % size != 0:
            return False
    return True


def make_param_shardings(
    mesh: Mesh,
    params: Any,
    rules: Optional[Rules] = None,
    *,
    default: Optional[P] = None,
) -> Any:
    """Pytree of NamedShardings matching `params`. Leaves whose first
    matching rule cannot shard their shape (axis absent or non-divisible)
    replicate instead."""
    rules = list(rules or [])
    compiled = [(re.compile(pat), spec) for pat, spec in rules]
    repl = NamedSharding(mesh, default if default is not None else P())

    flat = traverse_util.flatten_dict(params, sep="/")
    out: Dict[str, Any] = {}
    for path, leaf in flat.items():
        sh = repl
        for pat, spec in compiled:
            if pat.search(path):
                if _spec_fits(spec, getattr(leaf, "shape", ()), mesh):
                    sh = NamedSharding(mesh, spec)
                break
        out[path] = sh
    return traverse_util.unflatten_dict(out, sep="/")


def shard_params(mesh: Mesh, params: Any, rules: Optional[Rules] = None) -> Any:
    """device_put each parameter with its rule-derived sharding."""
    shardings = make_param_shardings(mesh, params, rules)
    return jax.tree.map(jax.device_put, params, shardings)
