"""Trainer: hook-driven loop around a jitted, mesh-sharded train step.

Rebuild of `efg/engine/trainer.py:27-317`. The step function — forward,
loss, grad, clip, optimizer update, BN-stat update — is ONE compiled XLA
program; the batch is sharded over the `data` mesh axis and XLA inserts the
gradient all-reduce over ICI (replacing DDP/NCCL). Host code does only:
data feeding, metric/event writing, checkpointing, hooks.

NaN/Inf anomaly detection (reference `_detect_anomaly`, `trainer.py:
307-311`) is performed on the already-computed loss scalar at logging
boundaries so it never forces an extra device sync.
"""

from __future__ import annotations

import logging
import math
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from efg_tpu.data.builder import build_dataloader, build_dataset
from efg_tpu.engine.hooks import (
    EvalHook,
    HookBase,
    IterTimer,
    LRSchedulerHook,
    PeriodicCheckpoint,
    PeriodicWriter,
    attach,
)
from efg_tpu.engine.registry import TRAINERS
from efg_tpu.engine.train_state import ModelDef, TrainState
from efg_tpu.parallel.mesh import build_mesh, replicate_tree, shard_batch
from efg_tpu.solver import build_optimizer, build_scheduler
from efg_tpu.utils import distributed as comm
from efg_tpu.utils.events import (
    CommonMetricPrinter,
    EventStorage,
    JSONWriter,
)

logger = logging.getLogger("efg_tpu")


@TRAINERS.register()
class DefaultTrainer:
    def __init__(self, config, build_model):
        self.config = config
        self.model_def: ModelDef = build_model(config)
        self.mesh = build_mesh(dict(config.get("mesh", {"axes": ["data", "model"], "shape": [-1, 1]})))

        self.setup_data()
        self.setup_optimizer()
        self.setup_state()
        self.setup_step()
        self.setup_hooks()

        self.start_iter = 0
        self.iter = 0

    # ------------------------------------------------------------------ data
    def setup_data(self):
        cfg = self.config
        self.dataset = build_dataset(cfg)
        self.dataloader = build_dataloader(cfg, self.dataset, train=cfg.task == "train")
        self._data_iter = None

        # epoch → iteration conversion (reference `trainer.py:145-150`)
        sched = cfg.solver.lr_scheduler
        bs = int(cfg.dataloader.batch_size)
        global_bs = bs * comm.get_world_size()
        self.iters_per_epoch = max(1, len(self.dataset) // global_bs)
        if sched.get("max_iters") or 0:
            self.max_iters = int(sched.max_iters)
        elif sched.get("max_epochs") or 0:
            self.max_iters = int(sched.max_epochs * self.iters_per_epoch)
        else:
            self.max_iters = 1
        sched["max_iters"] = self.max_iters

        n_data_devices = self.mesh.shape["data"]
        assert bs % n_data_devices == 0, (
            f"dataloader.batch_size={bs} must divide the data mesh axis "
            f"({n_data_devices} devices)"
        )

    # ----------------------------------------------------------------- model
    def _tp_rules(self):
        """Tensor-parallel rule set from `mesh.tp_rules` (config), active
        only when the model mesh axis is wider than 1."""
        mesh_cfg = dict(self.config.get("mesh", {}) or {})
        name = mesh_cfg.get("tp_rules")
        if not name or self.mesh.shape.get("model", 1) <= 1:
            return None
        from efg_tpu.parallel import partition

        factory = {
            "centerpoint": partition.centerpoint_tp_rules,
            "detr": partition.detr_tp_rules,
        }.get(str(name))
        assert factory is not None, f"unknown mesh.tp_rules={name!r}"
        return factory()

    def setup_optimizer(self):
        cfg = self.config.solver
        sched_cfg = dict(cfg.lr_scheduler)
        sched_cfg["lr"] = cfg.optimizer.lr
        self.lr_schedule, self.momentum_schedule = build_scheduler(sched_cfg)
        self.tx = build_optimizer(
            cfg.optimizer, self.lr_schedule, self.momentum_schedule,
            grad_clip_cfg=cfg.get("grad_clipper"),
            allow_flatten=self._tp_rules() is None,
        )

    def setup_state(self):
        sample = next(iter(self.dataloader))
        self._sample_batch = sample
        kwargs = self.model_def.apply_args(sample)
        variables = self.model_def.module.init(
            jax.random.key(max(0, int(self.config.misc.get("seed", 0) or 0))),
            **kwargs, train=True,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if getattr(self.model_def, "init_params", None):
            params = self.model_def.init_params(params)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
        logger.info(f"Model parameters: {n_params / 1e6:.2f}M")
        rules = self._tp_rules()
        if rules is not None:
            # tensor parallelism: parameters carry rule-derived shardings;
            # the optimizer moments inherit them through jit propagation
            from efg_tpu.parallel.partition import make_param_shardings

            def place(tree):
                return jax.tree.map(
                    jax.device_put, tree,
                    make_param_shardings(self.mesh, tree, rules),
                )

            params = place(params)
            batch_stats = place(batch_stats)
            opt_state = jax.jit(self.tx.init)(params)
            ema = (
                place(self.model_def.ema_init(params))
                if self.model_def.ema_init else None
            )
            self.state = TrainState(
                step=replicate_tree(jnp.zeros((), jnp.int32), self.mesh),
                params=params, batch_stats=batch_stats,
                opt_state=opt_state, ema_params=ema,
            )
            logger.info(
                f"Tensor parallelism active: mesh={dict(self.mesh.shape)}, "
                f"rules={self.config.mesh.tp_rules}"
            )
            return
        opt_state = self.tx.init(params)
        ema = self.model_def.ema_init(params) if self.model_def.ema_init else None
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=batch_stats, opt_state=opt_state, ema_params=ema,
        )
        self.state = replicate_tree(state, self.mesh)

    def setup_step(self):
        model_def = self.model_def
        tx = self.tx

        seed = max(0, int(self.config.misc.get("seed", 0) or 0))
        # loss_fns that declare an `rng` parameter get the per-step key
        # (fresh point sampling per iteration, e.g. Mask2Former PointRend).
        import inspect

        loss_takes_rng = False
        try:
            loss_takes_rng = "rng" in inspect.signature(model_def.loss_fn).parameters
        except (TypeError, ValueError):
            pass

        def step_fn(state: TrainState, batch: Dict[str, Any]):
            rng = jax.random.fold_in(jax.random.key(seed), state.step)

            def loss_fn(params):
                if model_def.custom_loss is not None:
                    loss, losses, new_bs = model_def.custom_loss(
                        model_def.module, params, state.batch_stats,
                        state.ema_params, batch, rng,
                    )
                    return loss, (losses, new_bs)
                kwargs = model_def.apply_args(batch)
                preds, mutated = model_def.module.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    **kwargs, train=True, mutable=["batch_stats"],
                    rngs={"dropout": rng},
                )
                if loss_takes_rng:
                    losses = model_def.loss_fn(preds, batch, rng=jax.random.fold_in(rng, 1))
                else:
                    losses = model_def.loss_fn(preds, batch)
                return losses["loss"], (losses, mutated.get("batch_stats", state.batch_stats))

            (loss, (losses, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_ema = state.ema_params
            if model_def.ema_update is not None and state.ema_params is not None:
                new_ema = model_def.ema_update(state.ema_params, new_params)
            metrics = {k: v for k, v in losses.items()}
            metrics["grad_norm"] = optax.global_norm(grads)
            new_state = TrainState(
                step=state.step + 1, params=new_params,
                batch_stats=new_bs, opt_state=new_opt, ema_params=new_ema,
            )
            return new_state, metrics

        self.train_step = jax.jit(step_fn, donate_argnums=(0,))

        def eval_fn(state: TrainState, batch: Dict[str, Any]):
            kwargs = model_def.apply_args(batch)
            preds = model_def.module.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                **kwargs, train=False,
            )
            if model_def.predict_fn is None:
                return preds
            return model_def.predict_fn(preds, batch)

        self.eval_step = jax.jit(eval_fn)

    # ----------------------------------------------------------------- hooks
    def setup_hooks(self):
        cfg = self.config.trainer
        out_dir = self.output_dir
        writers = []
        if comm.is_main_process():
            writers.append(CommonMetricPrinter(self.max_iters, window_size=int(cfg.window_size)))
            writers.append(JSONWriter(os.path.join(out_dir, "metrics.json"), int(cfg.window_size)))
            if cfg.get("tensorboard", False):
                from efg_tpu.utils.events import TensorboardWriter

                writers.append(TensorboardWriter(out_dir, int(cfg.window_size)))
        ckpt_period = cfg.get("checkpoint_iter") or None
        if ckpt_period is None and cfg.get("checkpoint_epoch"):
            ckpt_period = int(cfg.checkpoint_epoch * self.iters_per_epoch)
        if ckpt_period is None:
            ckpt_period = int(cfg.get("checkpoint_period", 10000))
        from efg_tpu.engine.hooks import AugFadeHook, ProfilerHook

        prof = cfg.get("profiler")  # e.g. {start_iter: 10, num_iters: 5} or true
        if prof is True:
            prof = {}
        elif not isinstance(prof, dict):
            prof = None  # absent / false / null -> no profiling
        eval_period = cfg.get("eval_period")
        hooks: List[Optional[HookBase]] = [
            IterTimer(),
            LRSchedulerHook(self.lr_schedule),
            ProfilerHook(out_dir, int(prof.get("start_iter", 10)), int(prof.get("num_iters", 5)))
            if prof is not None and comm.is_main_process() else None,
            AugFadeHook(float(cfg.fade), self.max_iters) if cfg.get("fade") else None,
            PeriodicWriter(writers, period=int(cfg.log_interval)) if writers else None,
            PeriodicCheckpoint(ckpt_period) if comm.is_main_process() else None,
            EvalHook(int(eval_period * self.iters_per_epoch), self.evaluate)
            if eval_period and cfg.get("evaluators") else None,
        ]
        self.hooks = attach(self, hooks)

    @property
    def output_dir(self) -> str:
        d = self.config.trainer.output_dir
        os.makedirs(d, exist_ok=True)
        return d

    # ------------------------------------------------------------ checkpoint
    @property
    def _checkpointer(self):
        """Lazy async checkpointer: the device→host snapshot happens in the
        caller (one device_get, same cost as a sync save) but file writes
        run on a background thread so the train loop never blocks on disk
        (SURVEY §5 asks for async checkpointing; reference saves are
        synchronous torch.save)."""
        if getattr(self, "_ckptr", None) is None:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler(), timeout_secs=600
            )
        return self._ckptr

    def save_checkpoint(self, name: str, blocking: bool = True):
        """Durable by default (reference torch.save semantics). The train
        loop's PeriodicCheckpoint hook passes blocking=False so in-loop
        saves overlap compute; train() waits on exit either way."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.output_dir, name))
        state = jax.device_get(self.state)
        self._checkpointer.save(path, args=ocp.args.StandardSave(state), force=True)
        if blocking:
            self._checkpointer.wait_until_finished()
        logger.info(f"Saved checkpoint to {path}"
                    + ("" if blocking else " (async)"))

    def wait_for_checkpoints(self):
        """Block until all in-flight async checkpoint writes are durable."""
        if getattr(self, "_ckptr", None) is not None:
            self._ckptr.wait_until_finished()

    def resume_or_load(self, resume: bool = True):
        """Resume from the latest `model_*` checkpoint in output_dir
        (reference `trainer.py:211-245`) or load config.model.weights."""
        import orbax.checkpoint as ocp

        self.wait_for_checkpoints()  # in-flight async writes become durable
        ckpts = sorted(
            [
                f
                for f in os.listdir(self.output_dir)
                if f.startswith("model_")
                and ".orbax-checkpoint-tmp" not in f  # uncommitted async write
                and os.path.isdir(os.path.join(self.output_dir, f))
            ]
        ) if os.path.isdir(self.output_dir) else []
        path = None
        if resume and ckpts:
            path = os.path.join(self.output_dir, ckpts[-1])
        elif self.config.model.get("weights"):
            path = self.config.model.weights
            if "://" in path:
                # catalog:// / detectron2:// / http(s):// zoo URIs
                # (reference `utils/catalog.py`): resolve + cache locally
                from efg_tpu.utils.catalog import PathManager  # registers handlers

                path = PathManager.get_local_path(path)
        if not path:
            return
        if path.endswith((".pth", ".pkl")):
            # torch / d2 weight import (reference `checkpoint.py:58-157`,
            # `d2_model_loading.py`): backbone init, not a resume point.
            # model.weights_format picks the name map: torchvision-style
            # ResNet (default), mmdet-style Swin, or a full reference
            # CenterPoint VoxelNet state dict
            from efg_tpu.utils import torch_import as TI

            sd = TI.load_state_dict(path)
            state = jax.device_get(self.state)
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            prefix = self.config.model.get("weights_prefix", "backbone")
            fmt = self.config.model.get("weights_format", "resnet")
            if fmt == "swin":
                variables, n, skipped = TI.import_swin(sd, variables, prefix)
            elif fmt == "centerpoint":
                variables, n, skipped = TI.import_centerpoint_voxelnet(sd, variables)
            else:
                variables, n, skipped = TI.import_torchvision_resnet(sd, variables, prefix)
            logger.info(
                f"Imported {n} tensors from {path} (prefix '{prefix}'); "
                f"skipped {len(skipped)}: {skipped[:8]}"
            )
            state = state.replace(
                params=variables["params"], batch_stats=variables["batch_stats"]
            )
            self.state = self._place_like_current(state)
            return
        abstract = jax.device_get(self.state)
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.abspath(path), abstract)
        self.state = self._place_like_current(restored)
        self.start_iter = int(restored.step)
        self.iter = self.start_iter
        # fast-forward the data stream: the loader discards the first
        # start_iter batches of sampler indices, and per-ordinal RNG
        # derivation makes the remaining stream bit-identical to an
        # uninterrupted run (tests/test_resume_continuity.py)
        if hasattr(self.dataloader, "start_batch"):
            self.dataloader.start_batch = self.start_iter
        logger.info(f"Restored checkpoint {path} at step {self.start_iter}")

    def _place_like_current(self, state):
        """Re-place a host-side state with the live state's shardings —
        replication in the dp case, the rule-derived TP placement
        otherwise (checkpoint restore must not silently drop TP)."""
        if self._tp_rules() is None:
            return replicate_tree(state, self.mesh)
        return jax.tree.map(
            lambda x, ref: jax.device_put(x, ref.sharding), state, self.state
        )

    # ----------------------------------------------------------------- train
    def _install_preemption_handler(self):
        """Preemption-safe training: SIGTERM (what TPU/SLURM preemptions
        deliver) sets a flag; the loop checkpoints at the next step boundary
        and exits cleanly, so `resume=True` continues bit-identically
        (per-ordinal data RNG + step-folded dropout RNG). Returns the
        previous handler, or None when not installable (non-main thread)."""
        import signal

        self._preempted = False

        def _on_term(signum, frame):
            self._preempted = True

        try:
            return signal.signal(signal.SIGTERM, _on_term)
        except ValueError:  # not in the main thread (e.g. under pytest workers)
            return None

    def train(self):
        logger.info(f"Starting training: {self.max_iters} iters "
                    f"({self.iters_per_epoch} it/epoch) on mesh {dict(self.mesh.shape)}")
        prev_handler = self._install_preemption_handler()
        with EventStorage(self.iter) as self.storage:
            for h in self.hooks:
                h.before_train()
            from efg_tpu.data.prefetcher import DevicePrefetcher

            self._data_iter = DevicePrefetcher(iter(self.dataloader), mesh=self.mesh)
            pending = None  # (iter, metrics) — fetched one step late to avoid syncs
            while self.iter < self.max_iters:
                for h in self.hooks:
                    h.before_step()
                device_batch = next(self._data_iter)
                self.state, metrics = self.train_step(self.state, device_batch)
                if pending is not None:
                    self._write_metrics(*pending)
                pending = (self.iter, metrics)
                self.storage.iter = self.iter
                for h in self.hooks:
                    h.after_step()
                self.iter += 1
                self.storage.step()
                if self._preempted:
                    logger.warning(
                        f"SIGTERM: saving preemption checkpoint at iter {self.iter} and exiting"
                    )
                    self.save_checkpoint(f"model_{self.iter:07d}", blocking=True)
                    break
            if pending is not None:
                self._write_metrics(*pending)
            for h in self.hooks:
                h.after_train()
            self.wait_for_checkpoints()  # don't exit with writes in flight
        if prev_handler is not None:
            import signal

            signal.signal(signal.SIGTERM, prev_handler)

    def _write_metrics(self, it: int, metrics: Dict[str, Any]):
        host = {k: float(v) for k, v in jax.device_get(metrics).items()}
        loss = host.get("loss", 0.0)
        if not math.isfinite(loss):
            raise FloatingPointError(
                f"Loss became infinite or NaN at iteration={it}! metrics={host}"
            )
        cur = self.storage.iter
        self.storage.iter = it
        self.storage.put_scalars(**host)
        self.storage.iter = cur

    # ------------------------------------------------------------------ eval
    def evaluate(self, evaluators=None):
        from efg_tpu.evaluator.build import build_evaluators

        cfg = self.config
        eval_cfg = type(cfg)(dict(cfg))
        eval_cfg["task"] = "val"
        dataset = build_dataset(eval_cfg)
        loader = build_dataloader(eval_cfg, dataset, train=False)
        evaluators = evaluators or build_evaluators(cfg, dataset)
        for ev in evaluators:
            ev.reset()
        n_batches = len(loader)
        n_data = int(self.mesh.shape.get("data", 1))
        for i, batch in enumerate(loader):
            arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            # eval loaders may emit batches smaller than the data mesh axis
            # (sequential trackers use bs=1); pad with repeats of the last
            # frame so the batch shards, and trim the outputs back
            bs = min((v.shape[0] for v in arrays.values()), default=0)
            pad = (-bs) % n_data if bs else 0
            if pad:
                arrays = {
                    k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)], axis=0)
                    if v.shape[0] == bs else v
                    for k, v in arrays.items()
                }
            device_batch = shard_batch(arrays, self.mesh)
            outputs = self.eval_step(self.state, device_batch)
            outputs = jax.device_get(outputs)
            if pad:
                outputs = jax.tree.map(
                    lambda a: a[:bs]
                    if getattr(a, "ndim", 0) >= 1 and a.shape[0] == bs + pad
                    else a,
                    outputs,
                )
            for ev in evaluators:
                ev.process(batch, outputs)
            if (i + 1) % 50 == 0:
                logger.info(f"Inference {i + 1}/{n_batches}")
        results = {}
        for ev in evaluators:
            r = ev.evaluate()
            if r:
                results.update(r)
        if comm.is_main_process():
            logger.info(f"Evaluation results: {results}")
        return results


def build_trainer(config, build_model):
    """Reference `build_trainer` (`efg/engine/__init__.py:1-8`)."""
    kind = config.trainer.get("type", "DefaultTrainer")
    return TRAINERS.get(kind)(config, build_model)
