"""Benchmark: CenterPoint VoxelNet training throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured number is training frames/sec/chip at Waymo scale (160k-point
clouds, 120k voxel cap, 0.1×0.1×0.15 voxels over ±75.2 m, full
SpMiddleResNetFHD + RPN + CenterHead, forward+backward+adamw). The
reference publishes no throughput (BASELINE.md); `A100_REF_FPS` below is
the documented estimate of the reference's per-A100 training throughput
used as the comparison point, and the BASELINE.json target is ≥2× that.
vs_baseline = measured_fps / A100_REF_FPS (so the target is ≥2.0).
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

# Estimated reference training throughput per A100 (CenterPoint Waymo,
# spconv + torch, bs6/GPU). The reference publishes no throughput
# (BASELINE.md). Corroboration from public reproductions of the same
# architecture (SpMiddleResNetFHD + RPN + CenterHead, 0.1m voxels):
#   - mmdetection3d model zoo: CenterPoint-voxel01 nuScenes trains at
#     ~0.4 s/iter for bs 4 x 8 V100 (32 frames / 0.4 s = 80 f/s on 8
#     V100s = 10 f/s per V100); Waymo frames are ~2x the points but A100
#     is ~2x a V100 on spconv workloads -> ~10-15 f/s per A100.
#   - OpenPCDet CenterPoint Waymo configs report ~11-14 h for 30 epochs
#     of 20% data on 8 A100s (~158k frames x 30 / 8 / 12 h ~= 17 f/s per
#     A100).
# 20 f/s per A100 is therefore the GENEROUS end of the plausible range;
# vs_baseline >= 2.0 means >= 2x that. The JSON also reports absolute
# s/step and achieved model TFLOP/s so progress is measurable
# independently of this constant.
A100_REF_FPS = 20.0


def main():
    import os

    import jax

    # persistent compile cache: the full-scale step takes minutes to build
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import __graft_entry__ as ge

    bsz = 2
    model, model_cfg, n_points = ge._flagship(bench_scale=True)
    batch = ge._batch(n_points, bsz=bsz, pc=70.0)

    import jax.numpy as jnp
    import optax

    from efg_tpu.engine.train_state import TrainState
    from efg_tpu.models import centerpoint as CP

    variables = model.init(jax.random.key(0), batch["points"][:1], batch["points_mask"][:1], True)
    tx = optax.flatten(optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(3e-3)))
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
            TrainState(step=state.step + 1, params=params, batch_stats=new_bs, opt_state=new_opt),
            loss,
        )

    # NOTE: on the tunneled single-chip setup, `block_until_ready` does not
    # actually synchronize (measured: it reports impossible TFLOP/s), and
    # each dispatch pays a large network roundtrip. So: run N steps inside
    # ONE jitted lax.scan and force a scalar value fetch — one roundtrip,
    # honest amortized per-step time.
    n_iters = 10

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_n(state, batch):
        def body(s, _):
            s, loss = step_fn(s, batch)
            return s, loss

        state, losses = jax.lax.scan(body, state, None, length=n_iters)
        return state, losses[-1]

    # compile once; reuse the executable for warmup + timed run (the state
    # is donated, so lower/cost-analysis must happen before execution)
    compiled = run_n.lower(state, batch).compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        model_flops = float(cost.get("flops", 0.0)) / n_iters
    except Exception:
        model_flops = 0.0

    state, loss = compiled(state, batch)
    _ = float(loss)

    t0 = time.perf_counter()
    state, loss = compiled(state, batch)
    _ = float(loss)  # device->host fetch = real sync
    dt = time.perf_counter() - t0

    fps = bsz * n_iters / dt
    sec_per_step = dt / n_iters
    extras = {}
    try:
        flops = model_flops
        extras = {
            "sec_per_step_bs2": round(sec_per_step, 4),
            "model_tflops_per_step": round(flops / 1e12, 3),
            "achieved_tflops_per_sec": round(flops / sec_per_step / 1e12, 2),
        }
    except Exception:
        extras = {"sec_per_step_bs2": round(sec_per_step, 4)}
    print(
        json.dumps(
            {
                "metric": "centerpoint_waymo_train_frames_per_sec_per_chip",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / A100_REF_FPS, 3),
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
