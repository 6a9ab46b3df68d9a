"""Microbench: Pallas fused gather-GEMM vs XLA gather_gemm9 on the TPU."""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 50


def timed(name, fn, x, *rest, n=N):
    @jax.jit
    def run(x, rest):
        def body(c, _):
            xp = jax.tree.map(
                lambda a: a + c.astype(a.dtype) * 1e-30
                if jnp.issubdtype(a.dtype, jnp.floating) else a, x)
            out = fn(xp, *rest)
            s = sum(jnp.sum(jnp.abs(l).astype(jnp.float32)) * 1e-30
                    for l in jax.tree.leaves(out)
                    if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.inexact))
            return c + s, None
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return c

    t0 = time.perf_counter(); _ = float(run(x, rest)); tc = time.perf_counter() - t0
    t0 = time.perf_counter(); _ = float(run(x, rest))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt * 1e3:9.3f} ms/iter  (compile {tc:.1f}s)", flush=True)
    return dt


def main():
    from efg_tpu.modeling.readers.voxel_reader import dynamic_mean_vfe
    from efg_tpu.ops import sparse as S
    from efg_tpu.ops.pallas import sparse_kernels as PK
    import __graft_entry__ as ge

    PC = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    VOX = (0.1, 0.1, 0.15)
    batch = ge._batch(160000, bsz=2, pc=70.0)
    grid = tuple(int(round((PC[i + 3] - PC[i]) / VOX[i])) for i in range(3))
    sshape = (grid[2] + 1, grid[1], grid[0])

    feats, coords, valid = jax.jit(
        lambda p, m: dynamic_mean_vfe(p, m, pc_range=PC, voxel_size=VOX,
                                      max_voxels=120000, num_input_features=5)
    )(batch["points"], batch["points_mask"])
    st = jax.jit(lambda f, c, v: S.from_batched_voxels(f, c, v, sshape))(feats, coords, valid)
    print("valid rows:", int(st.valid.sum()), "/", st.capacity, flush=True)

    timed("build_monotone_rule9 @240k", lambda f, s: PK.build_monotone_rule9(s.replace(features=f), 3), st.features, st)

    raw = jax.jit(lambda s: PK.build_monotone_rule9(s, 3))(st)
    rs = np.random.RandomState(0)

    tiles = [int(t) for t in (sys.argv[1:] or [512])]
    chans = [int(c) for c in os.environ.get("BP_CHANS", "16,32,64,128").split(",")]
    for tile in tiles:
        for c in chans:
            band = int(os.environ.get("BP_BAND", "192"))
            wslack = int(os.environ.get("BP_WSLACK", "512"))
            packed = jax.jit(
                lambda r: PK.prep_rulebook(r, st.capacity, c, tile=tile,
                                           band=band, wslack=wslack)
            )(raw)
            f = jnp.asarray(rs.randn(st.capacity, c).astype(np.float32))
            w = jnp.asarray(rs.randn(27, c, c).astype(np.float32) * 0.05)
            timed(
                f"pallas subm C{c} T{tile} B{band} @240k fwd",
                lambda f, w, packed=packed: PK.subm_conv9(f, packed, w, st.valid), f, w,
            )
            timed(
                f"pallas subm C{c} T{tile} B{band} @240k fwd+bwd",
                lambda f, w, packed=packed: jax.grad(
                    lambda ff, ww: jnp.sum(PK.subm_conv9(ff, packed, ww, st.valid) ** 2),
                    argnums=(0, 1))(f, w),
                f, w,
            )


if __name__ == "__main__":
    main()
