"""GPipe pipeline parallelism (`parallel/pipeline.py`) on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from efg_tpu.parallel.mesh import build_mesh
from efg_tpu.parallel.pipeline import (
    pipeline_apply,
    shard_stage_params,
    stack_stage_params,
)

N_STAGES, M, MB, F = 4, 6, 3, 16


def _mesh():
    return build_mesh(
        {"axes": ["data", "model"], "shape": [-1, N_STAGES]},
        devices=jax.devices()[:2 * N_STAGES],
    )


def _stage(params, x):
    return jnp.tanh(x @ params["w"] + params["b"])


def _problem():
    rs = np.random.RandomState(0)
    params = [
        {"w": jnp.asarray(rs.randn(F, F).astype(np.float32) * 0.3),
         "b": jnp.asarray(rs.randn(F).astype(np.float32) * 0.1)}
        for _ in range(N_STAGES)
    ]
    x = jnp.asarray(rs.randn(M, MB, F).astype(np.float32))
    return params, x


def _sequential(params_list, x):
    for p in params_list:
        x = jax.vmap(lambda mb: _stage(p, mb))(x)
    return x


def test_pipeline_matches_sequential():
    mesh = _mesh()
    params, x = _problem()
    stacked = shard_stage_params(stack_stage_params(params), mesh)
    got = jax.jit(
        lambda sp, xs: pipeline_apply(_stage, sp, xs, mesh=mesh)
    )(stacked, x)
    want = _sequential(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_pipeline_grads_match_sequential():
    """Backward streams through the reversed ppermute chain; grads wrt the
    stacked stage params must equal the sequential fold's grads."""
    mesh = _mesh()
    params, x = _problem()
    stacked = stack_stage_params(params)
    stacked_sharded = shard_stage_params(stacked, mesh)

    def loss_pp(sp):
        return jnp.sum(pipeline_apply(_stage, sp, x, mesh=mesh) ** 2)

    def loss_seq(sp):
        ps = [jax.tree.map(lambda l: l[i], sp) for i in range(N_STAGES)]
        return jnp.sum(_sequential(ps, x) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(stacked_sharded)
    g_seq = jax.grad(loss_seq)(stacked)
    for k in ("w", "b"):
        np.testing.assert_allclose(
            np.asarray(g_pp[k]), np.asarray(g_seq[k]), rtol=1e-4, atol=1e-5
        )
