"""Pipeline parallelism: GPipe-style microbatch streaming over a mesh axis.

The reference framework has no pipeline parallelism (DDP only); on TPU it
is a natural third axis next to data/tensor sharding for deep stacks
(transformer encoder/decoder layers). Implementation follows the rotating
shard_map pattern: stage i's parameters live on mesh index i of the
pipeline axis, M microbatches stream through N stages in M+N-1 rotations,
and `jax.lax.ppermute` shifts activations one stage forward over ICI each
rotation. Every device computes every rotation (bubble steps produce
masked garbage), so utilization is M/(M+N-1) — the standard GPipe bubble.

Differentiable end-to-end: the backward pass reverses the ppermute chain
automatically under `jax.grad`.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def pipeline_apply(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stage_params: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    axis: str = "model",
) -> jax.Array:
    """Run `x` through N pipelined stages sharded over `axis`.

    stage_fn: (params_i, act [mb, ...]) → act [mb, ...] (shape-preserving).
    stage_params: pytree whose leaves are stacked on a leading dim N
      (= mesh.shape[axis]); stage i's slice lives on pipeline index i.
    x: [M, mb, ...] microbatched input; returns [M, mb, ...] outputs equal
      to folding the stages sequentially over each microbatch.
    """
    n = mesh.shape[axis]
    m = x.shape[0]
    leaves = jax.tree.leaves(stage_params)
    assert all(l.shape[0] == n for l in leaves), (
        f"stage_params leaves must be stacked on a leading dim of {n}"
    )

    def per_device(params, xs):
        # params: [1, ...] this device's stage; xs: [M, mb, ...] replicated
        p0 = jax.tree.map(lambda l: l[0], params)
        d = jax.lax.axis_index(axis)
        act0 = jnp.zeros_like(xs[0])
        out0 = jnp.zeros((1,) + xs.shape, xs.dtype)
        perm = [(i, (i + 1) % n) for i in range(n)]

        def rotate(carry, t):
            act, out = carry
            # stage 0 ingests microbatch t; downstream stages take the
            # activation handed over by the previous rotation
            x_t = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, m - 1), keepdims=False
            )
            inp = jnp.where(d == 0, x_t, act)
            y = stage_fn(p0, inp)
            mb = t - d  # this device's microbatch index at rotation t
            valid = (mb >= 0) & (mb < m) & (d == n - 1)
            out = jax.lax.dynamic_update_index_in_dim(
                out,
                jnp.where(valid, y, out[0, jnp.clip(mb, 0, m - 1)])[None],
                jnp.clip(mb, 0, m - 1),
                axis=1,
            )
            act = jax.lax.ppermute(y, axis, perm)
            return (act, out), None

        (_, out), _ = jax.lax.scan(
            rotate, (act0, out0), jnp.arange(m + n - 1, dtype=jnp.int32)
        )
        return out

    spec_p = jax.tree.map(lambda _: P(axis), stage_params)
    out = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(spec_p, P()), out_specs=P(axis),
        check_vma=False,
    )(stage_params, x)
    return out[n - 1]


def stack_stage_params(params_list) -> Any:
    """[{stage0 params}, {stage1 params}, ...] → one pytree stacked on a
    leading stage dim (the layout `pipeline_apply` consumes)."""
    return jax.tree.map(lambda *ls: jnp.stack(ls), *params_list)


def shard_stage_params(stacked: Any, mesh: Mesh, axis: str = "model") -> Any:
    """device_put the stacked stage params with stage i on pipeline index
    i (leading-dim sharding over `axis`)."""
    def put(l):
        spec = P(axis, *([None] * (l.ndim - 1)))
        return jax.device_put(l, NamedSharding(mesh, spec))

    return jax.tree.map(put, stacked)
