"""Normalization layers (flax.linen), incl. masked BN for sparse voxel rows.

Rebuild of `efg/modeling/common/batch_norm.py` for TPU: under jit with a
sharded batch axis, batch statistics are computed over the FULL logical
batch (XLA inserts the cross-replica reduction), so plain BatchNorm here is
already the reference's `NaiveSyncBatchNorm`. `MaskedBatchNorm` adds
validity weighting so the padding rows of fixed-capacity sparse tensors
don't bias the statistics (the dynamic-shape spconv sees only real voxels).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over rows [N, C] with a validity mask [N].

    Statistics use only masked rows; running stats live in the
    `batch_stats` collection like `nn.BatchNorm`.
    """

    momentum: float = 0.9  # torch momentum 0.1 ≡ linen 0.9
    epsilon: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(c, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask.astype(jnp.float32)[:, None]
            cnt = jnp.maximum(m.sum(), 1.0)
            xf = x.astype(jnp.float32)
            # E[x²]−E[x]² so both reductions fuse into ONE pass over the
            # (lane-padded) rows — the two-pass (x−mean)² form re-read the
            # whole array; fine in f32 at BN-scale magnitudes
            xm = xf * m
            mean = xm.sum(axis=0) / cnt
            var = jnp.maximum((xm * xf).sum(axis=0) / cnt - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var

        y = (x.astype(jnp.float32) - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        y = y * scale + bias
        y = y * mask.astype(y.dtype)[:, None]
        return y.astype(self.dtype or x.dtype)


def get_norm(norm: Any, *, use_running_average_default: bool = False) -> Callable:
    """Factory mirroring the reference `get_norm` string/config contract
    (`efg/modeling/common/batch_norm.py:140`): "BN"/"BN1d"/{"type": "BN"}
    → BatchNorm (NHWC, feature-last), "GN" → GroupNorm, None/"" → identity."""
    if isinstance(norm, dict) or hasattr(norm, "get"):
        norm = norm.get("type", "BN")
    if not norm:
        return lambda: (lambda x: x)
    if norm in ("BN", "BN1d", "SyncBN", "naiveSyncBN"):
        return lambda **kw: nn.BatchNorm(momentum=0.9, epsilon=1e-5, **kw)
    if norm == "GN":
        return lambda **kw: nn.GroupNorm(num_groups=32, **kw)
    if norm == "LN":
        return lambda **kw: nn.LayerNorm(**kw)
    raise KeyError(f"Unknown norm type: {norm}")


def get_activation(name: Optional[str]):
    """Reference `get_activation` (`batch_norm.py:171`)."""
    import jax

    table = {
        None: lambda x: x,
        "": lambda x: x,
        "relu": jax.nn.relu,
        "ReLU": jax.nn.relu,
        "gelu": jax.nn.gelu,
        "GELU": jax.nn.gelu,
        "silu": jax.nn.silu,
        "SiLU": jax.nn.silu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.01),
    }
    if name in table:
        return table[name]
    raise KeyError(f"Unknown activation: {name}")
