"""Round-2 component timing at bench scale on the real TPU.

Anti-CSE: every timed body perturbs its main input with the evolving scan
carry (CLAUDE.md gotcha — constant-input scan bodies are hoisted by XLA and
report total/N). One scalar fetch per measurement = one tunnel roundtrip.

Usage: python tools/profile_r2.py [piece ...]
Pieces: step fwd vfe sort backbone neck loss layers down rulebook dense
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

N = 8
BS = 2
PC = (-75.2, -75.2, -2.0, 75.2, 75.2, 4.0)
VOX = (0.1, 0.1, 0.15)
MAXVOX = 120000
STAGE_CAPS = (80000, 50000, 30000, 25000)
NPTS = 160000


def timed(name, fn, x, *rest, n=N):
    """fn(x_perturbed, *rest) timed over n scan iters; x leads and is
    perturbed by the carry so the body cannot be CSE'd out of the loop."""

    @jax.jit
    def run(x, rest):
        def body(c, _):
            xp = jax.tree.map(
                lambda a: a + c.astype(a.dtype) * 1e-30
                if jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                x,
            )
            out = fn(xp, *rest)
            s = sum(
                jnp.sum(jnp.abs(l).astype(jnp.float32)) * 1e-30
                for l in jax.tree.leaves(out)
                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.inexact)
            )
            return c + s, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return c

    t0 = time.perf_counter()
    _ = float(run(x, rest))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(run(x, rest))
    dt = (time.perf_counter() - t0) / n
    print(f"{name:48s} {dt * 1e3:9.2f} ms/iter   (compile+first {tc:.1f}s)", flush=True)
    return dt


def make_batch():
    import __graft_entry__ as ge

    return ge._batch(NPTS, bsz=BS, pc=70.0)


def get_model():
    import __graft_entry__ as ge

    return ge._flagship(bench_scale=True)


def main():
    want = set(sys.argv[1:]) or {"step"}
    rs = np.random.RandomState(0)
    batch = make_batch()

    if want & {"vfe", "sort", "backbone", "layers", "down", "rulebook", "dense", "fwd", "neck", "loss"}:
        from efg_tpu.modeling.readers.voxel_reader import dynamic_mean_vfe
        from efg_tpu.ops import sparse as S

        grid = tuple(int(round((PC[i + 3] - PC[i]) / VOX[i])) for i in range(3))
        sshape = (grid[2] + 1, grid[1], grid[0])

        def vfe(pts, mask):
            return dynamic_mean_vfe(
                pts, mask, pc_range=PC, voxel_size=VOX, max_voxels=MAXVOX,
                num_input_features=5,
            )

        if "vfe" in want:
            timed("dynamic_mean_vfe", vfe, batch["points"], batch["points_mask"])

        feats, coords, valid = jax.jit(vfe)(batch["points"], batch["points_mask"])

        if "sort" in want:
            timed(
                "from_batched_voxels (flatten+sort)",
                lambda f, c, v: S.from_batched_voxels(f, c, v, sshape),
                feats, coords, valid,
            )

        st = jax.jit(
            lambda f, c, v: S.from_batched_voxels(f, c, v, sshape)
        )(feats, coords, valid)

        if "rulebook" in want:
            timed("rule9 @240k full grid", lambda f, s: S.build_subm_rulebook9(s.replace(features=f), 3), st.features, st)

        if "layers" in want:
            rb = jax.jit(lambda s: S.build_subm_rulebook9(s, 3))(st)
            for c in (16, 32, 64, 128):
                f = jnp.asarray(rs.randn(st.capacity, c).astype(np.float32))
                w = jnp.asarray(rs.randn(27, c, c).astype(np.float32) * 0.05)
                timed(
                    f"gather_gemm9 C{c} @240k fwd",
                    lambda f, w, p, fd, v: S.gather_gemm9(f, p, fd, w, v),
                    f, w, rb[0], rb[1], st.valid,
                )
                timed(
                    f"gather_gemm9 C{c} @240k fwd+bwd",
                    lambda f, w, p, fd, v: jax.grad(
                        lambda ff, ww: jnp.sum(S.gather_gemm9(ff, p, fd, ww, v) ** 2)
                    , argnums=(0, 1))(f, w),
                    f, w, rb[0], rb[1], st.valid,
                )

        if "down" in want:
            f16 = jnp.asarray(rs.randn(st.capacity, 16).astype(np.float32))
            w = jnp.asarray(rs.randn(27, 16, 32).astype(np.float32) * 0.1)
            timed(
                "spconv_downsample 16->32 s2 @240k",
                lambda f, w, s: S.spconv_downsample(
                    s.replace(features=f), w, kernel_size=3, stride=2,
                    padding=1, max_out=2 * STAGE_CAPS[0],
                ),
                f16, w, st,
            )

        if "backbone" in want:
            from efg_tpu.modeling.backbones.sparse_net import SpMiddleResNetFHD

            bk = SpMiddleResNetFHD(
                num_input_features=5, grid_size=grid,
                stage_caps=tuple(2 * c for c in STAGE_CAPS),
            )
            bv = bk.init(jax.random.key(0), feats, coords, valid, False)

            timed(
                "backbone fwd (train=False)",
                lambda f, c, v: bk.apply(bv, f, c, v, False),
                feats, coords, valid,
            )

            def bwd(f, c, v):
                return jax.grad(
                    lambda p: jnp.sum(
                        bk.apply({"params": p, "batch_stats": bv["batch_stats"]}, f, c, v, True,
                                 mutable=["batch_stats"])[0] ** 2
                    )
                )(bv["params"])

            timed("backbone fwd+bwd (train)", bwd, feats, coords, valid)

        if "dense" in want:
            f128 = jnp.asarray(rs.randn(2 * STAGE_CAPS[3], 128).astype(np.float32))
            # final coords after 3 downsamples: shape (6, 188, 188)
            st4 = S.SparseTensor(
                features=f128,
                coords=jnp.zeros((2 * STAGE_CAPS[3], 4), jnp.int32),
                keys=jnp.arange(2 * STAGE_CAPS[3], dtype=jnp.int32),
                valid=jnp.ones((2 * STAGE_CAPS[3],), bool),
                spatial_shape=(3, 188, 188),
                batch_size=BS,
            )
            timed("to_dense BEV scatter", lambda f, s: S.bev_dense(s.replace(features=f)), f128, st4)

    if "neck" in want or "loss" in want:
        model, model_cfg, _ = get_model()
        from efg_tpu.modeling.backbones.rpn import RPN
        from efg_tpu.modeling.heads.center_head import CenterHead

        neck_kw = dict(model.neck_cfg)
        neck = RPN(**neck_kw)
        bev = jnp.asarray(rs.randn(BS, 188, 188, 384).astype(np.float32))
        nv = neck.init(jax.random.key(0), bev, False)
        if "neck" in want:
            timed("RPN neck fwd", lambda x: neck.apply(nv, x, False), bev)

            def nbwd(x):
                return jax.grad(
                    lambda p: jnp.sum(
                        neck.apply({"params": p, "batch_stats": nv["batch_stats"]}, x, True,
                                   mutable=["batch_stats"])[0] ** 2
                    )
                )(nv["params"])

            timed("RPN neck fwd+bwd", nbwd, bev)

        if "loss" in want:
            from efg_tpu.models import centerpoint as CP

            head = CenterHead(tasks=model.tasks, common_heads=dict(model.common_heads))
            bev2 = jnp.asarray(rs.randn(BS, 188, 188, 512).astype(np.float32))
            hv = head.init(jax.random.key(0), bev2, False)
            preds = jax.jit(lambda x: head.apply(hv, x, False))(bev2)
            timed(
                "targets+loss",
                lambda p: CP.compute_loss(p, batch, model_cfg=model_cfg),
                preds,
            )

    if "fwd" in want:
        model, model_cfg, _ = get_model()
        variables = model.init(
            jax.random.key(0), batch["points"][:1], batch["points_mask"][:1], True
        )
        timed(
            "full model fwd (train)",
            lambda pts: model.apply(
                variables, pts, batch["points_mask"], True,
                mutable=["batch_stats"],
            ),
            batch["points"],
        )

    if "step" in want:
        import optax

        from efg_tpu.engine.train_state import TrainState
        from efg_tpu.models import centerpoint as CP

        model, model_cfg, _ = get_model()
        variables = model.init(
            jax.random.key(0), batch["points"][:1], batch["points_mask"][:1], True
        )
        tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(3e-3))
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )

        def step_fn(state, batch):
            def loss_fn(params):
                preds, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["points"], batch["points_mask"], True, mutable=["batch_stats"],
                )
                losses = CP.compute_loss(preds, batch, model_cfg=model_cfg)
                return losses["loss"], mutated["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return (
                TrainState(step=state.step + 1, params=params, batch_stats=new_bs,
                           opt_state=new_opt),
                loss,
            )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def run_n(state, batch):
            def body(s, _):
                s, loss = step_fn(s, batch)
                return s, loss

            state, losses = jax.lax.scan(body, state, None, length=N)
            return state, losses[-1]

        t0 = time.perf_counter()
        state, loss = run_n(state, batch)
        _ = float(loss)
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, loss = run_n(state, batch)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / N
        print(f"{'FULL TRAIN STEP (state carried)':48s} {dt * 1e3:9.2f} ms/iter   (compile+first {tc:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
