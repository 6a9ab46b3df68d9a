"""Micro-bench box_attention_sample at ConQueR encoder scale.

Measures compile-time memory analysis (peak temp allocation) and runtime of
the fwd+bwd pass for the current implementation and candidate layouts.

Usage: python tools/bench_boxattn.py [variant ...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from efg_tpu.ops import box_attention as BA

B, L, NH, NL, P, C = 2, 35344, 8, 1, 25, 256
H = W = 188
N = 8


def make_inputs(rs):
    vals = [jnp.asarray(rs.randn(B, H, W, C).astype(np.float32) * 0.1)]
    grids = jnp.asarray(rs.rand(B, L, NH, NL, P, 2).astype(np.float32))
    attn = jax.nn.softmax(
        jnp.asarray(rs.randn(B, L, NH, NL * P).astype(np.float32)), -1
    ).reshape(B, L, NH, NL, P)
    return vals, grids, attn


def run(name, fn):
    rs = np.random.RandomState(0)
    vals, grids, attn = make_inputs(rs)

    def loss(v):
        return (fn([v], grids, attn) ** 2).sum()

    def n_steps(v):
        def body(carry, _):
            val, acc = carry
            l, g = jax.value_and_grad(loss)(val)
            # anti-CSE: evolve the input
            return (val + 1e-6 * g, acc + l), ()

        (v2, acc), _ = jax.lax.scan(body, (v, 0.0), None, length=N)
        return acc

    c = jax.jit(n_steps).lower(vals[0]).compile()
    ma = c.memory_analysis()
    peak = getattr(ma, "temp_size_in_bytes", None)
    out = c(vals[0])
    _ = float(out)
    t0 = time.perf_counter()
    _ = float(c(vals[0]))
    dt = (time.perf_counter() - t0) / N
    print(f"{name}: {dt * 1e3:.2f} ms/iter (fwd+bwd), peak temps "
          f"{(peak or 0) / 1e9:.2f} GB")


VARIANTS = {}


def variant(f):
    VARIANTS[f.__name__] = f
    return f


@variant
def current(vals, grids, attn):
    return BA.box_attention_sample(vals, grids, attn, num_heads=NH)


@variant
def scan_points(vals, grids, attn):
    """lax.scan over the P sample points, f32 merged accumulator."""
    v = vals[0]
    b, h, w, c = v.shape
    hd = c // NH
    flat = v.reshape(b, h * w, c)

    gp = jnp.moveaxis(grids[:, :, :, 0], 3, 0)     # [P, B, L, NH, 2]
    ap = jnp.moveaxis(attn[:, :, :, 0], 3, 0)      # [P, B, L, NH]

    def body(acc, xs):
        g, a = xs
        gx = g[..., 0] * w - 0.5
        gy = g[..., 1] * h - 0.5
        s = BA._bilinear_gather(flat, gx, gy, h, w)  # [B, L, NH, hd]
        return acc + (s * a[..., None]).reshape(b, L, c), ()

    acc0 = jnp.zeros((b, L, c), v.dtype)
    acc, _ = jax.lax.scan(body, acc0, (gp, ap))
    return acc


@variant
def scan_points_remat(vals, grids, attn):
    v = vals[0]
    b, h, w, c = v.shape
    flat = v.reshape(b, h * w, c)
    gp = jnp.moveaxis(grids[:, :, :, 0], 3, 0)
    ap = jnp.moveaxis(attn[:, :, :, 0], 3, 0)

    @jax.checkpoint
    def body(acc, xs):
        g, a = xs
        gx = g[..., 0] * w - 0.5
        gy = g[..., 1] * h - 0.5
        s = BA._bilinear_gather(flat, gx, gy, h, w)
        return acc + (s * a[..., None]).reshape(b, L, c), ()

    acc0 = jnp.zeros((b, L, c), v.dtype)
    acc, _ = jax.lax.scan(body, acc0, (gp, ap))
    return acc


RADIUS = 4


@variant
def window_dense(vals, grids, attn):
    v = vals[0]
    b, h, w, c = v.shape
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = jnp.asarray(
        np.broadcast_to(
            np.stack([yy.reshape(-1), xx.reshape(-1)], -1)[None], (b, h * w, 2)
        ).astype(np.int32)
    )
    a = BA.bin_window_coeffs(grids, attn, base, h, w, RADIUS)
    return BA.box_attention_window_dense(v, a, num_heads=NH, radius=RADIUS)


@variant
def window_gather_dec(vals, grids, attn):
    """Decoder-scale: 1600 scattered queries, radius 8."""
    v = vals[0]
    b, h, w, c = v.shape
    lq = 1600
    rs2 = np.random.RandomState(7)
    base = jnp.asarray(
        np.stack(
            [rs2.randint(0, h, (b, lq)), rs2.randint(0, w, (b, lq))], -1
        ).astype(np.int32)
    )
    g = grids[:, :lq]
    a_w = attn[:, :lq]
    a = BA.bin_window_coeffs(g, a_w, base, h, w, 8)
    return BA.box_attention_window_gather(
        v, a, base, num_heads=NH, radius=8, chunk=512
    )


@variant
def window_gather_dec_rows(vals, grids, attn):
    """Decoder-scale, legacy per-row gather + autodiff scatter bwd."""
    v = vals[0]
    b, h, w, c = v.shape
    lq = 1600
    rs2 = np.random.RandomState(7)
    base = jnp.asarray(
        np.stack(
            [rs2.randint(0, h, (b, lq)), rs2.randint(0, w, (b, lq))], -1
        ).astype(np.int32)
    )
    a = BA.bin_window_coeffs(grids[:, :lq], attn[:, :lq], base, h, w, 8)
    return BA.box_attention_window_gather(
        v, a, base, num_heads=NH, radius=8, chunk=512, runs=False
    )


@variant
def window_dense_mxu(vals, grids, attn):
    """Encoder-scale tile-local dense attention on the MXU."""
    v = vals[0]
    b, h, w, c = v.shape
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = jnp.asarray(
        np.broadcast_to(
            np.stack([yy.reshape(-1), xx.reshape(-1)], -1)[None], (b, h * w, 2)
        ).astype(np.int32)
    )
    a = BA.bin_window_coeffs(grids, attn, base, h, w, RADIUS)
    return BA.box_attention_window_dense_mxu(v, a, num_heads=NH, radius=RADIUS)


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        run(n, VARIANTS[n])
