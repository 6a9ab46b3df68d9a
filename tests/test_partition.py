"""Tensor-parallel partitioning rules (`parallel/partition.py`).

The full dp×tp train-step equivalence runs in `__graft_entry__.
dryrun_multichip` (driver-executed); here we unit-test the rulebook:
spec selection, first-match-wins, and the divisibility fallback.
"""

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P

from efg_tpu.parallel.mesh import build_mesh
from efg_tpu.parallel.partition import (
    centerpoint_tp_rules,
    make_param_shardings,
    shard_params,
)


def _mesh():
    return build_mesh(
        {"axes": ["data", "model"], "shape": [-1, 2]}, devices=jax.devices()[:4]
    )


def _fake_params():
    z = np.zeros
    return {
        "neck": {
            "block0_in": {"Conv_0": {"kernel": z((3, 3, 256, 128))}},
            "block0_conv1": {"Conv_0": {"kernel": z((3, 3, 128, 128))},
                             "BatchNorm_0": {"scale": z((128,))}},
            "deblock1_deconv": {"kernel": z((2, 2, 256, 256))},
        },
        "head": {
            "task0": {
                "reg_conv0": {"kernel": z((3, 3, 64, 64)), "bias": z((64,))},
                "reg_final": {"kernel": z((3, 3, 64, 2)), "bias": z((2,))},
                "hm_bn0": {"scale": z((64,))},
            }
        },
        "backbone": {"res0a": {"conv1": {"kernel": z((27, 16, 16))}}},
    }


def test_rule_specs():
    mesh = _mesh()
    sh = make_param_shardings(mesh, _fake_params(), centerpoint_tp_rules())
    assert sh["neck"]["block0_in"]["Conv_0"]["kernel"].spec == P(None, None, None, "model")
    assert sh["neck"]["block0_conv1"]["Conv_0"]["kernel"].spec == P(None, None, "model", None)
    # BN after a row-parallel conv sees full channels → replicated default
    assert sh["neck"]["block0_conv1"]["BatchNorm_0"]["scale"].spec == P()
    assert sh["neck"]["deblock1_deconv"]["kernel"].spec == P(None, None, None, "model")
    assert sh["head"]["task0"]["reg_conv0"]["kernel"].spec == P(None, None, None, "model")
    assert sh["head"]["task0"]["reg_conv0"]["bias"].spec == P("model")
    # final: cin-sharded; its 2-wide cout/bias can't shard → fallback
    assert sh["head"]["task0"]["reg_final"]["kernel"].spec == P(None, None, "model", None)
    assert sh["head"]["task0"]["reg_final"]["bias"].spec == P()
    # sparse backbone stays replicated (no rule matches)
    assert sh["backbone"]["res0a"]["conv1"]["kernel"].spec == P()


def test_divisibility_fallback():
    mesh = _mesh()
    params = {"head": {"task0": {"hm_conv0": {"kernel": np.zeros((3, 3, 64, 3))}}}}
    sh = make_param_shardings(mesh, params, centerpoint_tp_rules())
    # cout=3 not divisible by model=2 → replicate instead of failing
    assert sh["head"]["task0"]["hm_conv0"]["kernel"].spec == P()


def test_detr_tp_loss_matches_replicated():
    """VoxelDETR loss+grads under head/FFN tensor parallelism == the
    replicated computation (TP is pure layout under GSPMD)."""
    import jax.numpy as jnp
    from efg_tpu.models import voxel_detr as VD
    from efg_tpu.parallel.mesh import shard_batch
    from efg_tpu.parallel.partition import detr_tp_rules

    mesh = _mesh()
    model = VD.VoxelDETR(
        pc_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 4.0),
        voxel_size=(0.1, 0.1, 0.15), max_voxels=1024,
        resnet_caps=(768, 512, 256, 128),
        hidden_dim=32, num_head=4, enc_layers=1, dec_layers=1,
        dim_feedforward=64, num_queries=8, num_classes=3,
    )
    cfg = dict(
        pc_range=(-8.0, -8.0, -2.0, 8.0, 8.0, 4.0),
        voxel_size=(0.1, 0.1, 0.15),
        loss_weights={"class": 1.0, "bbox": 4.0, "giou": 2.0, "rad": 4.0},
    )
    rs = np.random.RandomState(0)
    pts = np.concatenate(
        [rs.uniform(-7, 7, (4, 512, 3)), rs.uniform(0, 1, (4, 512, 2))], -1
    ).astype(np.float32)
    gt = np.zeros((4, 8, 9), np.float32)
    gt[:, :2, :3] = rs.uniform(-6, 6, (4, 2, 3))
    gt[:, :2, 3:6] = rs.uniform(1, 4, (4, 2, 3))
    batch = dict(
        points=jnp.asarray(pts), points_mask=jnp.ones((4, 512), bool),
        gt_boxes=jnp.asarray(gt),
        gt_classes=jnp.zeros((4, 8), jnp.int32).at[:, :2].set(1),
        gt_mask=jnp.zeros((4, 8), bool).at[:, :2].set(True),
    )
    variables = model.init(jax.random.key(0), batch["points"], batch["points_mask"], True)
    init = jax.device_get(variables)

    def loss_fn(params, bstats, batch):
        preds, _ = model.apply(
            {"params": params, "batch_stats": bstats},
            batch["points"], batch["points_mask"], True, mutable=["batch_stats"],
        )
        return VD.compute_loss(preds, batch, model_cfg=cfg)["loss"]

    vg = jax.jit(jax.value_and_grad(loss_fn))
    loss_ref, g_ref = vg(init["params"], init["batch_stats"], batch)

    sh = make_param_shardings(mesh, init["params"], detr_tp_rules())
    params_tp = jax.tree.map(jax.device_put, init["params"], sh)
    batch_tp = shard_batch(batch, mesh)
    loss_tp, g_tp = vg(params_tp, init["batch_stats"], batch_tp)

    assert abs(float(loss_tp) - float(loss_ref)) < 1e-3 * max(1.0, abs(float(loss_ref)))
    leaf_ref = np.asarray(
        g_ref["decoder"]["dec0"]["linear1"]["kernel"], np.float32
    )
    leaf_tp = np.asarray(g_tp["decoder"]["dec0"]["linear1"]["kernel"], np.float32)
    np.testing.assert_allclose(leaf_tp, leaf_ref, rtol=1e-3, atol=1e-4)
    # the rules actually sharded the transformer
    assert sh["decoder"]["dec0"]["linear1"]["kernel"].spec == P(None, "model")
    assert sh["decoder"]["dec0"]["self_attn"]["query"]["kernel"].spec == P(None, "model", None)


def test_shard_params_places_arrays():
    mesh = _mesh()
    params = {"neck": {"block0_in": {"Conv_0": {"kernel": np.ones((3, 3, 8, 4), np.float32)}}}}
    out = shard_params(mesh, params, centerpoint_tp_rules())
    leaf = out["neck"]["block0_in"]["Conv_0"]["kernel"]
    assert leaf.sharding.spec == P(None, None, None, "model")
    np.testing.assert_allclose(np.asarray(leaf), 1.0)


def test_trainer_tp_e2e(tmp_path, monkeypatch):
    """`mesh.tp_rules` config wiring: DefaultTrainer places params with the
    rule shardings, trains under dp×tp, and checkpoint restore keeps the
    TP placement (trainer.py `_tp_rules`/`_place_like_current`)."""
    import os

    from efg_tpu.config import Configuration
    from efg_tpu.engine.trainer import build_trainer

    exp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "playground/detection.3d/synthetic/centerpoint.synth.voxelnet",
    )
    monkeypatch.setenv("EFG_CACHE_DIR", str(tmp_path))
    import importlib
    import sys

    sys.path.insert(0, exp)
    if "net" in sys.modules:
        del sys.modules["net"]
    net = importlib.import_module("net")
    sys.path.remove(exp)

    cfg = Configuration(config_file=os.path.join(exp, "config.yaml")).get_config()
    cfg.solver.lr_scheduler.max_iters = 2
    cfg.dataloader.batch_size = 4
    cfg.trainer.output_dir = str(tmp_path / "tp")
    cfg["mesh"] = {"axes": ["data", "model"], "shape": [-1, 2], "tp_rules": "centerpoint"}
    trainer = build_trainer(cfg, net.build_model)
    assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
    kern = trainer.state.params["neck"]["block0_in"]["Conv_0"]["kernel"]
    assert kern.sharding.spec == P(None, None, None, "model")
    trainer.train()
    trainer.save_checkpoint("model_tp")
    kern = trainer.state.params["neck"]["block0_in"]["Conv_0"]["kernel"]

    cfg2 = Configuration(config_file=os.path.join(exp, "config.yaml")).get_config()
    cfg2.solver.lr_scheduler.max_iters = 2
    cfg2.dataloader.batch_size = 4
    cfg2.trainer.output_dir = trainer.output_dir
    cfg2["mesh"] = {"axes": ["data", "model"], "shape": [-1, 2], "tp_rules": "centerpoint"}
    trainer2 = build_trainer(cfg2, net.build_model)
    trainer2.resume_or_load(resume=True)
    k2 = trainer2.state.params["neck"]["block0_in"]["Conv_0"]["kernel"]
    assert k2.sharding.spec == P(None, None, None, "model")
    np.testing.assert_allclose(
        np.asarray(jax.device_get(k2)), np.asarray(jax.device_get(kern)), atol=0
    )
