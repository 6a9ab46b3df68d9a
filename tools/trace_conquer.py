"""Device-trace the ConQueR train step (bench_conquer's exact step) and
aggregate per-op device time. Same xplane recipe as trace_step.py.

Usage: python tools/trace_conquer.py [n_top]
"""

from __future__ import annotations

import functools
import glob
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 12  # match bench_conquer n_iters so the persistent compile cache is shared


def build():
    import optax

    import __graft_entry__ as ge
    from efg_tpu.engine.train_state import TrainState
    from efg_tpu.models import conquer as CQ

    bsz = 2
    detr_kwargs = dict(
        pc_range=(-75.2, -75.2, -2.0, 75.2, 75.2, 4.0),
        voxel_size=(0.1, 0.1, 0.15),
        max_voxels=120000,
        resnet_caps=(80000, 60000, 30000, 15000),
        depth=18,
        out_features=("res2", "res3", "res4"),
        fpn_levels=("p3",),
        hidden_dim=256,
        num_head=8,
        enc_layers=3,
        dec_layers=3,
        dim_feedforward=1024,
        num_queries=1000,
        num_classes=3,
    )
    model_cfg = dict(
        pc_range=detr_kwargs["pc_range"], voxel_size=detr_kwargs["voxel_size"],
        loss_weights={"class": 1.0, "bbox": 4.0, "giou": 2.0, "rad": 4.0},
        dn=dict(enabled=True, dn_number=3, dn_box_noise_scale=0.4,
                dn_label_noise_ratio=0.5),
        contrastive=dict(mom=0.999, dim=256, eqco=1000, tau=0.7, loss_coeff=0.2),
    )
    mdef = CQ.make_model_def(detr_kwargs, model_cfg)
    batch = ge._batch(160000, bsz=bsz, pc=70.0)
    variables = mdef.module.init(
        jax.random.key(0), batch["points"][:1], batch["points_mask"][:1], True
    )
    tx = optax.flatten(optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(1e-3)))
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        ema_params=mdef.ema_init(params) if mdef.ema_init else None,
    )

    def step_fn(state, batch):
        rng = jax.random.fold_in(jax.random.key(0), state.step)

        def loss_fn(params):
            loss, losses, new_bs = mdef.custom_loss(
                mdef.module, params, state.batch_stats, state.ema_params,
                batch, rng,
            )
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = mdef.ema_update(state.ema_params, params) if mdef.ema_update else None
        return (
            TrainState(step=state.step + 1, params=params, batch_stats=new_bs,
                       opt_state=new_opt, ema_params=ema),
            loss,
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_n(state, batch):
        def body(s, _):
            s, loss = step_fn(s, batch)
            return s, loss

        state, losses = jax.lax.scan(body, state, None, length=N)
        return state, losses[-1]

    return run_n, state, batch


sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from trace_step import CATEGORIES, categorize  # noqa: E402


def main():
    n_top = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    run_n, state, batch = build()
    t0 = time.perf_counter()
    state, loss = run_n(state, batch)
    _ = float(loss)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    trace_dir = "/tmp/trace_conquer"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    state, loss = run_n(state, batch)
    _ = float(loss)
    wall = (time.perf_counter() - t0) / N
    jax.profiler.stop_trace()
    print(f"wall: {wall * 1e3:.1f} ms/iter (bs=2 → {2 / wall:.2f} f/s)", flush=True)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    assert files, "no xplane written"
    xs = xplane_pb2.XSpace()
    with open(files[0], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name or "#" in plane.name:
            continue
        meta = {mid: m.name for mid, m in plane.event_metadata.items()}
        stat_meta = {mid: m.name for mid, m in plane.stat_metadata.items()}
        per_op = defaultdict(float)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = None
                for st in ev.stats:
                    if stat_meta.get(st.metadata_id) == "device_duration_ps":
                        dur = st.uint64_value or st.int64_value
                if dur is None:
                    dur = ev.duration_ps
                per_op[meta.get(ev.metadata_id, "?")] += dur / 1e12
        if not per_op:
            continue
        total = sum(per_op.values())
        print(f"\n== plane {plane.name}: device total {total / N * 1e3:.1f} ms/iter ==")
        cats = defaultdict(float)
        for name, t in per_op.items():
            cats[categorize(name)] += t
        print("\n-- by category (ms/iter) --")
        for cat, t in sorted(cats.items(), key=lambda kv: -kv[1]):
            print(f"  {cat:20s} {t / N * 1e3:9.2f}")
        print(f"\n-- top {n_top} ops (ms/iter) --")
        for name, t in sorted(per_op.items(), key=lambda kv: -kv[1])[:n_top]:
            print(f"  {t / N * 1e3:9.3f}  {name[:130]}")


if __name__ == "__main__":
    main()
