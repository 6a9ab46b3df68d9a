"""`efg_run` CLI entry point.

Rebuild of `cli/main.py:55-162`: same workflow — run from an experiment
directory containing `config.yaml` + `net.py`; the trainer is built from
the experiment's `build_model`. Launch differences (SURVEY.md §2.7): no
process-per-GPU spawn — one process per host, all local devices form the
mesh; multi-host comes up via `jax.distributed.initialize` when the
standard cluster env vars are present.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys


def get_parser():
    parser = argparse.ArgumentParser(description="efg_tpu runner")
    parser.add_argument("--config", default="config.yaml", help="experiment config path")
    parser.add_argument("--task", default=None, help="override config task: train|val|test")
    parser.add_argument("--resume", action="store_true", help="resume from latest checkpoint")
    parser.add_argument("--num-machines", type=int, default=1)
    parser.add_argument("--machine-rank", type=int, default=0)
    parser.add_argument("--dist-url", default=None, help="coordinator address for multi-host")
    parser.add_argument(
        "opts", nargs=argparse.REMAINDER,
        help="config overrides: a.b.c value or a.b=value",
    )
    return parser


def _slurm_first_host(nodelist: str) -> str:
    """First hostname of a SLURM nodelist, in-process (the reference shells
    out to `scontrol show hostname` — `efg/engine/launch.py:150`).

    Handles "host1,host2", "prefix[001-004,007]", "prefix[3]suffix"."""
    # cut at the first comma that is not inside brackets
    depth, first = 0, nodelist
    for i, ch in enumerate(nodelist):
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == "," and depth == 0:
            first = nodelist[:i]
            break
    lb = first.find("[")
    if lb == -1:
        return first
    rb = first.index("]", lb)
    token = first[lb + 1:rb].split(",")[0].split("-")[0]
    return first[:lb] + token + first[rb + 1:]


def resolve_distributed_env(args, env) -> tuple | None:
    """(coordinator_address, num_processes, process_id) for multi-host
    bring-up, or None for single-process.

    Priority mirrors the reference launchers (`efg/engine/launch.py:31-182`):
    explicit CLI flags, then SLURM env (SLURM_PROCID/SLURM_NTASKS/
    SLURM_NODELIST + MASTER_PORT, default 29500), then generic torchrun-style
    env (RANK/WORLD_SIZE/MASTER_ADDR/MASTER_PORT)."""
    if args.num_machines > 1:
        return args.dist_url, args.num_machines, args.machine_rank
    if "SLURM_PROCID" in env and "SLURM_NTASKS" in env:
        ntasks = int(env["SLURM_NTASKS"])
        if ntasks <= 1:
            return None
        addr = env.get("MASTER_ADDR") or _slurm_first_host(env["SLURM_NODELIST"])
        port = env.get("MASTER_PORT", "29500")
        return f"{addr}:{port}", ntasks, int(env["SLURM_PROCID"])
    if "RANK" in env and "WORLD_SIZE" in env and int(env["WORLD_SIZE"]) > 1:
        addr = env.get("MASTER_ADDR", "127.0.0.1")
        port = env.get("MASTER_PORT", "29500")
        return f"{addr}:{port}", int(env["WORLD_SIZE"]), int(env["RANK"])
    return None


def load_experiment_module(exp_dir: str, name: str = "net"):
    """Import the experiment-local net.py (reference `cli/main.py:120`)."""
    path = os.path.join(exp_dir, f"{name}.py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.path.insert(0, exp_dir)
    spec.loader.exec_module(mod)
    return mod


def setup_output_dir(config, config_path: str) -> str:
    """Experiment output under $EFG_CACHE_DIR/EFG/<experiment-relpath> with a
    ./log symlink (reference `cli/main.py:74-86`)."""
    cache = os.environ.get("EFG_CACHE_DIR", os.path.expanduser("~/.efg_tpu/cache"))
    exp_dir = os.path.dirname(os.path.abspath(config_path))
    marker = "playground"
    rel = exp_dir.split(marker, 1)[-1].lstrip("/") if marker in exp_dir else os.path.basename(exp_dir)
    out = os.path.join(cache, "EFG", rel)
    os.makedirs(out, exist_ok=True)
    config["trainer"]["output_dir"] = out
    link = os.path.join(exp_dir, "log")
    try:
        if os.path.islink(link):
            os.remove(link)
        if not os.path.exists(link):
            os.symlink(out, link)
    except OSError:
        pass
    return out


def main():
    args = get_parser().parse_args()

    # Some PJRT plugins self-register regardless of JAX_PLATFORMS; make the
    # env var authoritative before any backend is initialized.
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    dist = resolve_distributed_env(args, os.environ)
    if dist is not None:
        import jax

        coordinator, num_processes, process_id = dist
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )

    # registrations
    import efg_tpu.data  # noqa: F401
    import efg_tpu.evaluator  # noqa: F401
    from efg_tpu.config import Configuration
    from efg_tpu.engine.trainer import build_trainer
    from efg_tpu.utils import distributed as comm
    from efg_tpu.utils.logger import setup_logger
    from efg_tpu.utils.seed import seed_all_rng

    config = Configuration(config_file=args.config, opts=list(args.opts)).get_config()
    if args.task:
        config["task"] = args.task

    out_dir = setup_output_dir(config, args.config)
    logger = setup_logger(out_dir, comm.get_rank())
    logger.info(f"Running with config: {args.config}; output: {out_dir}")

    seed = config.misc.get("seed", -1)
    seed = seed_all_rng(None if seed is None or seed < 0 else seed + comm.get_rank())
    logger.info(f"Seed: {seed}")

    exp_dir = os.path.dirname(os.path.abspath(args.config))
    net = load_experiment_module(exp_dir)
    if hasattr(net, "register"):  # experiment-local registrations
        net.register(config)

    trainer = build_trainer(config, net.build_model)

    task = config.task
    if task == "train":
        trainer.resume_or_load(resume=args.resume)
        trainer.train()
        if getattr(trainer, "_preempted", False):
            return  # preemption checkpoint saved; relaunch resumes cleanly
        if config.trainer.get("evaluators"):
            trainer.evaluate()
    elif task in ("val", "test"):
        trainer.resume_or_load(resume=True)
        trainer.evaluate()
    else:
        raise ValueError(f"Unknown task {task}")


if __name__ == "__main__":
    main()
