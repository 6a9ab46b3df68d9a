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


def test_shard_params_places_arrays():
    mesh = _mesh()
    params = {"neck": {"block0_in": {"Conv_0": {"kernel": np.ones((3, 3, 8, 4), np.float32)}}}}
    out = shard_params(mesh, params, centerpoint_tp_rules())
    leaf = out["neck"]["block0_in"]["Conv_0"]["kernel"]
    assert leaf.sharding.spec == P(None, None, None, "model")
    np.testing.assert_allclose(np.asarray(leaf), 1.0)
