"""Microbench: merge_rank_flags / build_monotone_rule9 variants on the TPU.

The r4 bs=2 device trace shows the rank kernel (rulebook structure build)
is the single largest component of the CenterPoint step (~36 ms/iter across
all stages/pairs: [1880,128,8] 8.6 ms, strided-inverse [2115,128,8] 7.9 ms,
...). This times the SubM rule9 build and raw merge_rank_flags at the exact
trace shapes for each variant (seq 128-key chunks vs seq4 512-key
super-chunks, bands-per-tile nb) so winners can be picked without a full
bench compile per variant.

Usage: python tools/bench_rank.py
"""

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


def timed(name, fn, *args, n=N):
    @jax.jit
    def run(args):
        def body(c, _):
            # perturb an input so the body is carry-dependent and XLA can
            # neither CSE nor hoist it: (c > 1e30) is 0 at runtime but not
            # foldable at compile time
            bump = (c > jnp.float32(1e30)).astype(args[0].dtype)
            a0 = args[0] + bump
            out = fn(a0, *args[1:])
            s = sum(
                jnp.sum(jnp.abs(l).astype(jnp.float32)) * 1e-30
                for l in jax.tree.leaves(out)
            )
            return c + s, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return c

    t0 = time.perf_counter()
    _ = float(run(args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(run(args))
    dt = (time.perf_counter() - t0) / n
    # tc includes one full n-iteration timed run (the first call both
    # compiles and executes), so label it "first call", not "compile"
    print(f"{name:56s} {dt * 1e3:9.3f} ms/iter  (first call {tc:.1f}s)", flush=True)
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
    st = jax.jit(lambda f, c, v: S.from_batched_voxels(f, c, v, sshape))(
        feats, coords, valid
    )
    print("valid rows:", int(st.valid.sum()), "/", st.capacity, flush=True)

    # REAL rule9 pair queries: keys + (dz*h + dy)*w — these cross z/y plane
    # gaps, which the sequential-window kernels scan linearly (suspected
    # source of the 8.6 ms trace cost vs 0.86 ms for gap-free queries)
    d_, h_, w_ = st.spatial_shape
    key_base = jnp.where(st.valid, st.keys, PK._CLAMP_Q)
    qreal = jnp.stack(
        [key_base + (dz * h_ + dy) * w_
         for dz in (-1, 0, 1) for dy in (-1, 0, 1) if not (dz == 0 and dy == 0)]
    )
    qeasy = jnp.stack([key_base + d for d in range(-4, 4)])

    variants = sys.argv[1:] or ["seq", "seq4", "hostwin"]
    for impl in variants:
        PK._RANK_IMPL = impl if impl != "hostwin" else "seq"
        seq = impl != "hostwin"

        timed(f"build_monotone_rule9 @240k [{impl}]",
              lambda k, s=st: PK.build_monotone_rule9(s.replace(keys=k), 3),
              st.keys)

        timed(f"merge_rank_flags 8xREAL 240k [{impl}]",
              lambda q, k=st.keys, seq=seq: PK.merge_rank_flags(k, q, seq=seq),
              qreal)
        timed(f"merge_rank_flags 8xEASY 240k [{impl}]",
              lambda q, k=st.keys, seq=seq: PK.merge_rank_flags(k, q, seq=seq),
              qeasy)


if __name__ == "__main__":
    main()
