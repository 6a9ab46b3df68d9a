"""Hungarian matching under jit with fixed shapes.

The reference matcher runs scipy `linear_sum_assignment` on a CPU-synced
cost matrix (`conquer/.../modules/matcher.py:89`). Here the cost matrix has
static shape [B, Q, G_max] with a validity mask over GT columns; the solve
itself runs as a host callback (`jax.pure_callback`) returning fixed-shape
per-GT assignments — the jitted graph never sees dynamic shapes. An
on-device auction solver can slot in later behind the same signature.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _solve_batch(cost: np.ndarray, gt_mask: np.ndarray) -> np.ndarray:
    """cost [B, Q, G], gt_mask [B, G] → assignment [B, G] (query index per
    valid GT, -1 otherwise)."""
    from scipy.optimize import linear_sum_assignment

    cost = np.nan_to_num(np.asarray(cost, np.float64), posinf=1e8, neginf=-1e8)
    gt_mask = np.asarray(gt_mask)
    b, q, g = cost.shape
    out = np.full((b, g), -1, np.int32)
    for i in range(b):
        cols = np.flatnonzero(gt_mask[i])
        if cols.size == 0:
            continue
        row, col = linear_sum_assignment(cost[i][:, cols])
        out[i, cols[col]] = row.astype(np.int32)
    return out


def hungarian_match(cost: jax.Array, gt_mask: jax.Array) -> jax.Array:
    """[B, Q, G] cost + [B, G] mask → [B, G] matched query index (-1 pad).

    The assignment is a non-differentiable decision (the reference matcher
    runs under `torch.no_grad`, `modules/matcher.py:20`), so gradients are
    stopped before the host callback.
    """
    cost = jax.lax.stop_gradient(cost)
    gt_mask = jax.lax.stop_gradient(gt_mask)
    b, _, g = cost.shape
    return jax.pure_callback(
        _solve_batch,
        jax.ShapeDtypeStruct((b, g), jnp.int32),
        cost,
        gt_mask,
        vmap_method="sequential",
    )
