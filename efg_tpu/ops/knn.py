"""K-nearest-neighbors over point clouds (jit, fixed shapes).

TPU-native replacement for the reference CUDA KNN
(`efg/operators/src/knn/knn.cu`, wrapper `efg/operators/knn.py:13-242`):
pairwise squared distances + `lax.top_k`, with length masks for padded
clouds; `knn_gather` mirrors the reference gather helper. For large N the
distance matrix is computed in row chunks to bound memory.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_points(
    query: jax.Array,        # [B, N, D]
    points: jax.Array,       # [B, M, D]
    query_mask: Optional[jax.Array] = None,  # [B, N]
    points_mask: Optional[jax.Array] = None,  # [B, M]
    *,
    k: int,
    chunk: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """→ (dists [B, N, K] squared, idx [B, N, K]). Invalid target points
    never selected (distance +inf); invalid queries get idx 0 / dist inf."""
    b, n, d = query.shape
    m = points.shape[1]
    inf = jnp.asarray(jnp.inf, query.dtype)
    pm = points_mask if points_mask is not None else jnp.ones((b, m), bool)

    def row_block(q_blk):
        # q_blk [B, C, D] → dists [B, C, M]
        d2 = (
            (q_blk**2).sum(-1, keepdims=True)
            - 2 * jnp.einsum("bcd,bmd->bcm", q_blk, points)
            + (points**2).sum(-1)[:, None, :]
        )
        d2 = jnp.where(pm[:, None, :], d2, inf)
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    if n <= chunk:
        dists, idx = row_block(query)
    else:
        n_pad = -(-n // chunk) * chunk
        qp = jnp.pad(query, ((0, 0), (0, n_pad - n), (0, 0)))
        qp = qp.reshape(b, n_pad // chunk, chunk, d).transpose(1, 0, 2, 3)
        dists, idx = jax.lax.map(row_block, qp)
        dists = dists.transpose(1, 0, 2, 3).reshape(b, n_pad, k)[:, :n]
        idx = idx.transpose(1, 0, 2, 3).reshape(b, n_pad, k)[:, :n]

    if query_mask is not None:
        dists = jnp.where(query_mask[..., None], dists, inf)
        idx = jnp.where(query_mask[..., None], idx, 0)
    return dists, idx


def knn_gather(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points [B, M, D], idx [B, N, K] → [B, N, K, D]
    (reference `knn_gather`, `efg/operators/knn.py`)."""
    b, n, k = idx.shape
    flat = idx.reshape(b, n * k)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(b, n, k, points.shape[-1])
