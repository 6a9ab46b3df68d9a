"""Micro-bench dV accumulation strategies for the decoder window gather.

The r4 ConQueR trace showed the runs-gather custom VJP's dV pass at
~1.05 s/layer: a 634-step scan whose K=8 unrolled dynamic_slice +
dynamic_update_slice chain on the [B, H+2R, W+2R, C] carry cannot be
aliased by XLA (dynamic-index read-after-write hazards), so every DUS
copies the ~100 MB buffer (27 visible 133 ms copies/iter).

Candidates at exact decoder shapes (B=2, H=W=204, C=256, NH=8, S=17,
L=2536):
  dus_k8    — current code path
  dus_k1    — one query per scan step (aliasable read-modify-write?)
  offset299 — per-offset scatter-add rows: 289 × dv.at[cells].add(vals)
  scatter1  — one scatter-add of all B·L·S² window rows
  autodiff  — gather-transpose of the runs=False forward

Usage: python tools/bench_dv.py [name ...]
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

B, H, W, C, NH, R, L = 2, 204, 204, 256, 8, 8, 2536
S = 2 * R + 1
N = 10


def inputs(seed=0):
    rs = np.random.RandomState(seed)
    coeffs = jnp.asarray(rs.rand(B, L, NH, S * S).astype(np.float32))
    g = jnp.asarray(rs.randn(B, L, C).astype(np.float32))
    base = jnp.asarray(
        np.stack([rs.randint(0, H, (B, L)), rs.randint(0, W, (B, L))], -1).astype(np.int32)
    )
    return coeffs, g, base


def timed(name, fn, args, n=N):
    @jax.jit
    def run(args):
        def body(c, _):
            a = jax.tree.map(
                lambda x: x + c.astype(x.dtype) * 1e-30
                if jnp.issubdtype(x.dtype, jnp.floating) else x, args)
            out = fn(*a)
            s = jnp.sum(jnp.abs(out).astype(jnp.float32)) * 1e-30
            return c + s, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return c

    t0 = time.perf_counter(); _ = float(run(args)); tc = time.perf_counter() - t0
    t0 = time.perf_counter(); _ = float(run(args))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:24s} {dt * 1e3:9.2f} ms/call  (compile {tc:.0f}s)", flush=True)
    return dt


def hd():
    return C // NH


def dv_dus(coeffs, g, base, K):
    """Current strategy at unroll K (K=8 is the shipped code)."""
    lt = B * L
    pad = (-lt) % K if K > 1 else 0
    a_flat = jnp.concatenate([coeffs.reshape(lt, NH, S * S),
                              jnp.zeros((pad, NH, S * S), coeffs.dtype)])
    g_flat = jnp.concatenate([g.reshape(lt, C), jnp.zeros((pad, C), g.dtype)])
    base_flat = jnp.concatenate([base.reshape(lt, 2), jnp.zeros((pad, 2), jnp.int32)])
    bidx = jnp.concatenate([
        jnp.repeat(jnp.arange(B, dtype=jnp.int32), L), jnp.zeros((pad,), jnp.int32)])
    ltp = lt + pad
    dv0 = jnp.zeros((B, H + 2 * R, W + 2 * R, C), jnp.float32)

    def body(dv, args):
        a_k, g_k, by_k, bi_k = args
        for j in range(K):
            t = jnp.einsum("no,dn->odn", a_k[j], g_k[j].reshape(hd(), NH)).reshape(1, S, S, C)
            y0, x0 = by_k[j, 0], by_k[j, 1]
            cur = jax.lax.dynamic_slice(dv, (bi_k[j], y0, x0, 0), (1, S, S, C))
            dv = jax.lax.dynamic_update_slice(dv, cur + t, (bi_k[j], y0, x0, 0))
        return dv, None

    dv, _ = jax.lax.scan(
        body, dv0,
        (a_flat.reshape(ltp // K, K, NH, S * S), g_flat.reshape(ltp // K, K, C),
         base_flat.reshape(ltp // K, K, 2), bidx.reshape(ltp // K, K)))
    return dv[:, R:R + H, R:R + W]


def dv_offsets(coeffs, g, base):
    """289 per-offset row scatter-adds on the flattened padded map."""
    hp, wp = H + 2 * R, W + 2 * R
    dv = jnp.zeros((B, hp * wp, C), jnp.float32)
    # window start = base (in padded coords); offset o = (oy, ox)
    gi = g  # [B, L, C]

    def body(dv, o):
        oy, ox = o // S, o % S
        rows = (base[..., 0] + oy) * wp + (base[..., 1] + ox)  # [B, L]
        a_o = coeffs[..., o]  # [B, L, NH]
        # expand head coeff to channels (head-major channel layout)
        a_c = jnp.repeat(a_o[..., None], hd(), axis=-1).reshape(B, L, C)
        vals = a_c * gi
        dv = jax.vmap(lambda d, r, v: d.at[r].add(v))(dv, rows, vals)
        return dv, None

    dv, _ = jax.lax.scan(body, dv, jnp.arange(S * S, dtype=jnp.int32))
    dv = dv.reshape(B, hp, wp, C)[:, R:R + H, R:R + W]
    return dv


def dv_scatter1(coeffs, g, base):
    """One scatter-add over all B·L·S² window rows."""
    hp, wp = H + 2 * R, W + 2 * R
    oy, ox = jnp.divmod(jnp.arange(S * S, dtype=jnp.int32), S)
    rows = ((base[..., 0][..., None] + oy) * wp
            + (base[..., 1][..., None] + ox))  # [B, L, S²]
    a_c = jnp.repeat(coeffs[..., None], hd(), axis=-1)  # [B, L, NH, S², hd]
    vals = jnp.einsum("blnoh,blnh->blonh", a_c,
                      g.reshape(B, L, hd(), NH).transpose(0, 1, 3, 2))
    vals = vals.reshape(B, L * S * S, C)
    dv = jnp.zeros((B, hp * wp, C), jnp.float32)
    dv = jax.vmap(lambda d, r, v: d.at[r].add(v))(dv, rows.reshape(B, -1), vals)
    return dv.reshape(B, hp, wp, C)[:, R:R + H, R:R + W]


def dv_autodiff(coeffs, g, base):
    """Gather-transpose: vjp of the plain per-row forward."""
    from efg_tpu.ops.box_attention import box_attention_window_gather

    value = jnp.zeros((B, H, W, C), jnp.float32)

    def f(v):
        return box_attention_window_gather(
            v, coeffs, base, num_heads=NH, radius=R, runs=False)

    _, vjp = jax.vjp(f, value)
    return vjp(g)[0]


def main():
    names = sys.argv[1:] or ["dus_k1", "offset289", "autodiff", "dus_k8", "scatter1"]
    args = inputs()
    for name in names:
        try:
            if name == "dus_k8":
                timed(name, functools.partial(dv_dus, K=8), args)
            elif name == "dus_k1":
                timed(name, functools.partial(dv_dus, K=1), args)
            elif name == "offset289":
                timed(name, dv_offsets, args)
            elif name == "scatter1":
                timed(name, dv_scatter1, args)
            elif name == "autodiff":
                timed(name, dv_autodiff, args)
        except Exception as e:
            print(f"{name:24s} FAILED: {e!r}"[:200], flush=True)


if __name__ == "__main__":
    main()
