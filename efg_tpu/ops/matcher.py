"""Hungarian matching under jit with fixed shapes.

The reference matcher runs scipy `linear_sum_assignment` on a CPU-synced
cost matrix (`conquer/.../modules/matcher.py:89`). Here the cost matrix has
static shape [B, Q, G_max] with a validity mask over GT columns and two
interchangeable solvers behind one signature:

- `host`: scipy via `jax.pure_callback` (exact; a host sync per step).
- `device`: Jonker-Volgenant shortest augmenting path (the same algorithm
  scipy uses) in pure `lax` control flow — exact, no host round-trip, and
  the only option on TPU runtimes without host-callback support.

Default is `auto`: host on CPU (bit-exact for tests), device elsewhere.
Override with `set_matcher_backend()` or `EFG_MATCHER_BACKEND`.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_BACKEND = os.environ.get("EFG_MATCHER_BACKEND", "auto")


def set_matcher_backend(backend: str) -> None:
    """'host' | 'device' | 'auto'."""
    global _BACKEND
    assert backend in ("host", "device", "auto"), backend
    _BACKEND = backend


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


def device_match(cost: jax.Array, gt_mask: jax.Array) -> jax.Array:
    """Device-side EXACT assignment: [B, Q, G] cost + [B, G] mask → [B, G]
    query index per valid GT (-1 pad).

    Shortest-augmenting-path Jonker-Volgenant (the same algorithm as scipy's
    `linear_sum_assignment`), in pure `lax` control flow with fixed shapes:
    one Dijkstra per valid GT row over the Q columns (≤ G+1 column removals
    each, every step O(Q) vector work), then a dual update and an
    augmentation walk. Exact optimum — unlike forward-only auction, which is
    suboptimal on asymmetric (Q > G) problems."""

    def single(c: jax.Array, m: jax.Array) -> jax.Array:
        q, g = c.shape
        cst = jnp.nan_to_num(c.astype(jnp.float32).T, posinf=1e8, neginf=-1e8)  # [G, Q]
        valid = m.astype(bool)
        INF = jnp.float32(jnp.inf)

        def solve_row(state, cur):
            u, v, row4col, col4row = state
            # skip invalid rows; also guard infeasibility (#valid rows > Q)
            do = valid[cur] & jnp.any(row4col < 0)

            def run(args):
                u, v, row4col, col4row = args

                # Under vmap, lax.cond lowers to select and BOTH branches run
                # for every lane — including lanes where `do` is False and no
                # free column exists. Every loop below must therefore
                # terminate unconditionally (the dead branch's results are
                # discarded by the select), hence the explicit step bounds.
                def dcond(st):
                    sink, _, _, remaining, _, _, _, steps = st
                    return (sink < 0) & jnp.any(remaining) & (steps <= g)

                def dbody(st):
                    sink, i, min_val, remaining, spc, path, in_tree, steps = st
                    in_tree = in_tree.at[i].set(True)
                    r = min_val + cst[i] - u[i] - v  # [Q]
                    upd = remaining & (r < spc)
                    path = jnp.where(upd, i, path)
                    spc = jnp.where(upd, r, spc)
                    masked = jnp.where(remaining, spc, INF)
                    j = jnp.argmin(masked).astype(jnp.int32)
                    min_val = masked[j]
                    remaining = remaining.at[j].set(False)
                    owner = row4col[j]
                    sink = jnp.where(owner < 0, j, jnp.int32(-1))
                    i = jnp.where(owner < 0, i, owner)
                    return sink, i, min_val, remaining, spc, path, in_tree, steps + 1

                sink, _, min_val, remaining, spc, path, in_tree, _ = lax.while_loop(
                    dcond,
                    dbody,
                    (
                        jnp.int32(-1), cur, jnp.float32(0.0),
                        jnp.ones((q,), bool), jnp.full((q,), INF),
                        jnp.zeros((q,), jnp.int32), jnp.zeros((g,), bool),
                        jnp.int32(0),
                    ),
                )
                # dual update (crouse's formulation, as in scipy)
                u = u.at[cur].add(min_val)
                others = in_tree & (jnp.arange(g) != cur)
                spc_at = spc[jnp.clip(col4row, 0, q - 1)]
                u = jnp.where(others, u + (min_val - spc_at), u)
                v = jnp.where(~remaining, v - (min_val - spc), v)

                # augment: walk predecessors from the sink back to cur
                def acond(st):
                    return (~st[3]) & (st[4] <= g)

                def abody(st):
                    j, row4col, col4row, _, steps = st
                    i = path[j]
                    row4col = row4col.at[j].set(i)
                    j_next = col4row[i]
                    col4row = col4row.at[i].set(j)
                    return j_next, row4col, col4row, i == cur, steps + 1

                _, row4col, col4row, _, _ = lax.while_loop(
                    acond,
                    abody,
                    (sink, row4col, col4row, sink < 0, jnp.int32(0)),
                )
                return u, v, row4col, col4row

            return lax.cond(do, run, lambda a: a, (u, v, row4col, col4row)), None

        init = (
            jnp.zeros((g,), jnp.float32), jnp.zeros((q,), jnp.float32),
            jnp.full((q,), -1, jnp.int32), jnp.full((g,), -1, jnp.int32),
        )
        (_, _, _, col4row), _ = lax.scan(
            solve_row, init, jnp.arange(g, dtype=jnp.int32)
        )
        return jnp.where(valid, col4row, -1)

    return jax.vmap(single)(lax.stop_gradient(cost), lax.stop_gradient(gt_mask))


def hungarian_match(cost: jax.Array, gt_mask: jax.Array, backend: str | None = None) -> jax.Array:
    """[B, Q, G] cost + [B, G] mask → [B, G] matched query index (-1 pad).

    The assignment is a non-differentiable decision (the reference matcher
    runs under `torch.no_grad`, `modules/matcher.py:20`), so gradients are
    stopped before the solve. Backend: see module docstring.
    """
    backend = backend or _BACKEND
    if backend == "auto":
        backend = "host" if jax.default_backend() == "cpu" else "device"
    if backend == "device":
        return device_match(cost, gt_mask)
    cost = lax.stop_gradient(cost)
    gt_mask = lax.stop_gradient(gt_mask)
    b, _, g = cost.shape
    return jax.pure_callback(
        _solve_batch,
        jax.ShapeDtypeStruct((b, g), jnp.int32),
        cost,
        gt_mask,
        vmap_method="sequential",
    )
