"""Whole-model fwd / fwd+bwd timing split for CenterPoint at bench scale."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import __graft_entry__ as ge
from efg_tpu.engine.train_state import TrainState
from efg_tpu.models import centerpoint as CP

N = 5
BSZ = 2


def timed(name, run, *args):
    out = run(*args)
    _ = float(out)
    t0 = time.perf_counter()
    out = run(*args)
    _ = float(out)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:32s} {dt * 1e3:9.1f} ms/iter")


def main():
    model, model_cfg, n_points = ge._flagship(bench_scale=True)
    batch = ge._batch(n_points, bsz=BSZ, pc=70.0)
    variables = model.init(
        jax.random.key(0), batch["points"][:1], batch["points_mask"][:1], True
    )
    params = variables["params"]
    bs = variables.get("batch_stats", {})

    @jax.jit
    def fwd_scan(params, batch):
        def body(c, _):
            preds, _ = model.apply(
                {"params": params, "batch_stats": bs},
                batch["points"], batch["points_mask"], True, mutable=["batch_stats"],
            )
            return c + preds[0]["hm"].sum(), None

        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=N)
        return c

    timed("model fwd only", fwd_scan, params, batch)

    @jax.jit
    def loss_scan(params, batch):
        def body(c, _):
            preds, _ = model.apply(
                {"params": params, "batch_stats": bs},
                batch["points"], batch["points_mask"], True, mutable=["batch_stats"],
            )
            losses = CP.compute_loss(preds, batch, model_cfg=model_cfg)
            return c + losses["loss"], None

        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=N)
        return c

    timed("model fwd + loss", loss_scan, params, batch)

    @jax.jit
    def grad_scan(params, batch):
        def body(c, _):
            def loss_fn(p):
                preds, _ = model.apply(
                    {"params": p, "batch_stats": bs},
                    batch["points"], batch["points_mask"], True, mutable=["batch_stats"],
                )
                return CP.compute_loss(preds, batch, model_cfg=model_cfg)["loss"]

            g = jax.grad(loss_fn)(params)
            return c + jax.tree_util.tree_leaves(g)[0].sum(), None

        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=N)
        return c

    timed("fwd + loss + grad", grad_scan, params, batch)


if __name__ == "__main__":
    main()
