"""Component-level TPU timing for the CenterPoint step.

Each piece runs N times inside one jitted lax.scan with a scalar fetch
(the only reliable sync on the tunneled chip — see CLAUDE.md).
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 5
BS = 2
NPTS = 160000
MAXVOX = 120000
PC = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
VOX = (0.1, 0.1, 0.15)


def timed(name, fn, *args):
    @functools.partial(jax.jit)
    def run(args):
        def body(c, _):
            out = fn(*args)
            # fold a scalar out of the result to keep a data dependency
            s = sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.number))
            return c + s.astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=N)
        return c

    out = run(args)
    _ = float(out)
    t0 = time.perf_counter()
    out = run(args)
    _ = float(out)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:40s} {dt * 1e3:9.2f} ms/iter")
    return dt


def main():
    rs = np.random.RandomState(0)
    pts = jnp.asarray(
        np.concatenate(
            [rs.uniform(-70, 70, (BS, NPTS, 2)), rs.uniform(-2, 4, (BS, NPTS, 1)),
             rs.uniform(0, 1, (BS, NPTS, 2))], axis=-1
        ).astype(np.float32)
    )
    mask = jnp.ones((BS, NPTS), bool)

    from efg_tpu.modeling.readers.voxel_reader import dynamic_mean_vfe
    from efg_tpu.ops import sparse as S

    def vfe(pts, mask):
        return dynamic_mean_vfe(
            pts, mask, pc_range=PC, voxel_size=VOX, max_voxels=MAXVOX,
            num_input_features=5,
        )

    timed("dynamic_mean_vfe (voxelize+mean)", vfe, pts, mask)

    feats, coords, valid = jax.jit(vfe)(pts, mask)
    feats = jax.block_until_ready(feats)

    grid = tuple(int(round((PC[i + 3] - PC[i]) / VOX[i])) for i in range(3))
    st = S.from_batched_voxels(feats, coords, valid, (grid[2] + 1, grid[1], grid[0]))

    timed("from_batched_voxels (flatten+sort)", lambda f, c, v: S.from_batched_voxels(f, c, v, (grid[2] + 1, grid[1], grid[0])), feats, coords, valid)

    timed("build_subm_rulebook k3 (27 offsets)", lambda s: S.build_subm_rulebook(s, 3), st)

    rb = jax.jit(lambda s: S.build_subm_rulebook(s, 3))(st)
    w16 = jnp.asarray(rs.randn(27, 5, 16).astype(np.float32) * 0.1)

    timed("subm_conv C5->16 (gather-GEMM)", lambda s, r, w: S.gather_gemm(s.features, r, w, s.valid), st, rb, w16)

    w128 = jnp.asarray(rs.randn(27, 128, 128).astype(np.float32) * 0.05)
    feat128 = jnp.asarray(rs.randn(st.capacity, 128).astype(np.float32))

    timed("gather_gemm C128->128 @240k rows", lambda f, r, w, v: S.gather_gemm(f, r, w, v), feat128, rb, w128, st.valid)

    wdown = jnp.asarray(rs.randn(27, 16, 32).astype(np.float32) * 0.1)
    st16 = st.replace(features=jnp.asarray(rs.randn(st.capacity, 16).astype(np.float32)))

    timed("spconv_downsample 16->32 s2", lambda s, w: S.spconv_downsample(
        s, w, kernel_size=3, stride=2, padding=1, max_out=80000), st16, wdown)

    # dense RPN-ish conv block at 188x188
    from flax import linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(12):
                x = nn.Conv(128 if i < 6 else 256, (3, 3), padding=1,
                            strides=2 if i == 6 else 1, name=f"c{i}")(x)
                x = jax.nn.relu(x)
            return x

    net = Net()
    bev = jnp.asarray(rs.randn(BS, 188, 188, 256).astype(np.float32))
    nv = net.init(jax.random.key(0), bev)

    timed("dense 12x conv BEV 188^2 (fwd)", lambda v, x: net.apply(v, x), nv, bev)

    def fwd_bwd(v, x):
        return jax.grad(lambda vv: (net.apply(vv, x) ** 2).mean())(v)

    timed("dense 12x conv BEV (fwd+bwd)", fwd_bwd, nv, bev)

    from efg_tpu.ops.gaussian import splat_gaussians

    ctr = jnp.asarray(rs.randint(0, 188, (500, 2)))
    rad = jnp.full((500,), 4)
    cat = jnp.asarray(rs.randint(0, 3, (500,)))
    gm = jnp.ones(500, bool)

    timed("gaussian splat 500 obj", lambda c, r, k, m: splat_gaussians(
        c, r, k, m, shape=(188, 188, 3)), ctr, rad, cat, gm)


if __name__ == "__main__":
    main()


def profile_rule9():
    rs = np.random.RandomState(0)
    pts = jnp.asarray(
        np.concatenate(
            [rs.uniform(-70, 70, (BS, NPTS, 2)), rs.uniform(-2, 4, (BS, NPTS, 1)),
             rs.uniform(0, 1, (BS, NPTS, 2))], axis=-1
        ).astype(np.float32)
    )
    mask = jnp.ones((BS, NPTS), bool)
    from efg_tpu.modeling.readers.voxel_reader import dynamic_mean_vfe
    from efg_tpu.ops import sparse as S

    grid = tuple(int(round((PC[i + 3] - PC[i]) / VOX[i])) for i in range(3))
    feats, coords, valid = jax.jit(
        lambda p, m: dynamic_mean_vfe(p, m, pc_range=PC, voxel_size=VOX,
                                      max_voxels=MAXVOX, num_input_features=5)
    )(pts, mask)
    st = S.from_batched_voxels(feats, coords, valid, (grid[2] + 1, grid[1], grid[0]))
    timed("build_subm_rulebook9", lambda s: S.build_subm_rulebook9(s, 3), st)
    r9 = jax.jit(lambda s: S.build_subm_rulebook9(s, 3))(st)
    w16 = jnp.asarray(np.random.RandomState(1).randn(27, 5, 16).astype(np.float32) * 0.1)
    timed("gather_gemm9 C5->16", lambda f, p, fo, w, v: S.gather_gemm9(f, p, fo, w, v),
          st.features, r9[0], r9[1], w16, st.valid)
    w128 = jnp.asarray(np.random.RandomState(2).randn(27, 128, 128).astype(np.float32) * 0.05)
    f128 = jnp.asarray(np.random.RandomState(3).randn(st.capacity, 128).astype(np.float32))
    timed("gather_gemm9 C128->128", lambda f, p, fo, w, v: S.gather_gemm9(f, p, fo, w, v),
          f128, r9[0], r9[1], w128, st.valid)

    def bwd128(f, w):
        return jax.grad(lambda ff: (S.gather_gemm9(ff, r9[0], r9[1], w, st.valid) ** 2).sum())(f)

    timed("gather_gemm9 C128 bwd(dfeat)", bwd128, f128, w128)


if __name__ == "__main__" and __import__("os").environ.get("PROFILE_RULE9"):
    profile_rule9()
