"""Motion-prediction pretrain regime: synthetic e2e train + checkpoint
handoff into the tracking model (reference trajectoryformer.motionpred →
trajectoryformer.centerpoint `dataset.motion_model` flow)."""

import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PRETRAIN = os.path.join(REPO, "playground/tracking.3d/synthetic/trajectoryformer.motionpred.pretrain")
TRACK = os.path.join(REPO, "playground/tracking.3d/synthetic/trajectoryformer.synth")


def _load_net(exp):
    sys.path.insert(0, exp)
    import importlib
    if "net" in sys.modules:
        del sys.modules["net"]
    net = importlib.import_module("net")
    sys.path.remove(exp)
    return net


def test_pretrain_and_handoff(tmp_path, monkeypatch):
    from efg_tpu.config import Configuration
    from efg_tpu.engine.trainer import build_trainer

    monkeypatch.setenv("EFG_CACHE_DIR", str(tmp_path))
    cfg = Configuration(config_file=os.path.join(PRETRAIN, "config.yaml")).get_config()
    cfg.solver.lr_scheduler.max_iters = 2
    cfg.dataloader.batch_size = 8  # 8-device CPU test mesh
    cfg.trainer.output_dir = str(tmp_path / "pretrain")
    net = _load_net(PRETRAIN)
    trainer = build_trainer(cfg, net.build_model)
    trainer.train()
    loss0 = None  # training ran without NaN (trainer raises otherwise)
    trainer.save_checkpoint("model_final")
    ckpt = os.path.join(trainer.output_dir, "model_final")
    assert os.path.isdir(ckpt)

    # handoff into the tracking model
    cfg2 = Configuration(config_file=os.path.join(TRACK, "config.yaml")).get_config()
    cfg2.solver.lr_scheduler.max_iters = 1
    cfg2.dataloader.batch_size = 8
    cfg2.trainer.output_dir = str(tmp_path / "track")
    cfg2.model.motion_model = ckpt
    # pretrain encoder width must match the tracking core (128 default)
    net2 = _load_net(TRACK)
    trainer2 = build_trainer(cfg2, net2.build_model)

    pre = jax.device_get(trainer.state.params)["motion_encoder"]
    post = jax.device_get(trainer2.state.params)["core"]["motion_encoder"]

    def leaves(t):
        return {k: v for k, v in jax.tree_util.tree_leaves_with_path(t)}

    for (kp, a), (kq, b) in zip(
        jax.tree_util.tree_leaves_with_path(pre),
        jax.tree_util.tree_leaves_with_path(post),
    ):
        assert jax.tree_util.keystr(kp) == jax.tree_util.keystr(kq)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), err_msg=str(kp))
