"""Microbench: strided-INVERSE rulebook — merge-join builder vs the
transposed-forward derivation (`derive_strided_inverse`) — at the real
Waymo bs=4 stage0→down1 shape (V_in=480k, V_out=320k), plus the raw
scatter/cummax primitives the derivation is made of (decides whether the
same transpose trick pays for the SubM rule9 negative pairs).

Usage: python tools/bench_inverse.py [n_iters]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50


def timed(name, fn, *args, n=N):
    @jax.jit
    def run(args):
        def body(c, _):
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
    print(f"{name:58s} {dt * 1e3:9.3f} ms/iter  (first call {tc:.1f}s)",
          flush=True)
    return dt


def main():
    from efg_tpu.modeling.readers.voxel_reader import dynamic_mean_vfe
    from efg_tpu.ops import sparse as S
    from efg_tpu.ops.pallas import sparse_kernels as PK

    import __graft_entry__ as ge

    PC = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
    VOX = (0.1, 0.1, 0.15)
    BS = 4
    batch = ge._batch(160000, bsz=BS, pc=70.0)
    grid = tuple(int(round((PC[i + 3] - PC[i]) / VOX[i])) for i in range(3))
    sshape = (grid[2] + 1, grid[1], grid[0])

    # ONE jit for VFE + sparse-tensor build, exactly like the train step
    # (separately-jitted fbv at this scale hit repeated TPU-worker crashes
    # on the tunnel, 2026-08-20; the fused program is the proven-good path)
    def _prep(p, m):
        f, c, v = dynamic_mean_vfe(p, m, pc_range=PC, voxel_size=VOX,
                                   max_voxels=120000, num_input_features=5)
        return S.from_batched_voxels(f, c, v, sshape)

    st = jax.jit(_prep)(batch["points"], batch["points_mask"])
    v_in = st.capacity
    print("valid rows:", int(st.valid.sum()), "/", v_in, flush=True)

    ks, s, p = (3, 3, 3), (2, 2, 2), (1, 1, 1)
    max_out = 80000 * BS

    # output sites exactly as spconv_downsample computes them
    def out_sites(keys):
        st2 = st.replace(keys=keys)
        o = S.spconv_downsample(
            st2, jnp.zeros((27, st.num_channels, 1), jnp.float32),
            kernel_size=ks, stride=s, padding=p, max_out=max_out,
        )
        return o.keys, o.coords, o.valid

    out_keys, out_coords, out_valid = jax.jit(out_sites)(st.keys)
    od, oh, ow = ((sshape[0] + 2 - 3) // 2 + 1, (sshape[1] + 2 - 3) // 2 + 1,
                  (sshape[2] + 2 - 3) // 2 + 1)
    print("out rows:", int(out_valid.sum()), "/", max_out, flush=True)

    fwd = jax.jit(
        lambda k: PK.build_monotone_rule_strided(
            st.replace(keys=k), out_coords[:, 0], out_coords[:, 1],
            out_coords[:, 2], out_coords[:, 3], out_valid, ks, s, p)
    )(st.keys)

    timed("fwd strided builder (merge) 480k->320k",
          lambda k: PK.build_monotone_rule_strided(
              st.replace(keys=k), out_coords[:, 0], out_coords[:, 1],
              out_coords[:, 2], out_coords[:, 3], out_valid, ks, s, p),
          st.keys)
    timed("OLD inverse builder (merge) 480k vs 320k",
          lambda k: PK.build_monotone_rule_strided_inverse(
              st.replace(keys=k), out_keys, (od, oh, ow), ks, s, p)[0],
          st.keys)
    timed("NEW derive_strided_inverse (scatter+cummax)",
          lambda f: PK.derive_strided_inverse(f, out_keys, v_in, ks, s, p)[0],
          fwd)

    # SubM rule9 @480k: full merge (8 rows) vs half-merge + transpose
    os.environ.pop("EFG_SUBM_DERIVE", None)
    timed("SubM rule9 build 480k [full merge]",
          lambda k: PK.build_monotone_rule9(st.replace(keys=k), 3), st.keys)
    os.environ["EFG_SUBM_DERIVE"] = "1"
    timed("SubM rule9 build 480k [half merge + transpose]",
          lambda k: PK.build_monotone_rule9(st.replace(keys=k), 3), st.keys)
    os.environ.pop("EFG_SUBM_DERIVE", None)

    # raw primitive costs at these sizes
    idx = jnp.clip(fwd[0] >> 3, 0, v_in)
    vals = jnp.arange(fwd.shape[1], dtype=jnp.int32) * 8 + 2
    timed("raw scatter-max 320k rows -> [480k]",
          lambda i: jnp.zeros(v_in + 1, jnp.int32).at[i].max(
              vals, mode="drop")[:v_in],
          idx)
    timed("raw cummax [480k] i32",
          lambda a: jax.lax.cummax(a), jnp.abs(fwd[0]))
    timed("raw cummax [8, 480k] i32 (batched, SubM-pair count)",
          lambda a: jax.lax.cummax(a, axis=1), jnp.abs(fwd[:8]))


if __name__ == "__main__":
    main()
