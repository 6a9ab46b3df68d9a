"""2D ResNet trunk tests: depth 18/34 (BasicBlock) + 50 (Bottleneck).

Reference: `efg/modeling/backbones/resnet.py` build_resnet_backbone —
depth->block map {18,34: BasicBlock, 50,101: BottleneckBlock}, stage
channel doubling, freeze-at semantics.
"""

import jax
import jax.numpy as jnp
import pytest

from efg_tpu.modeling.backbones.resnet import ResNet


@pytest.mark.parametrize(
    "depth,channels",
    [(18, (64, 128, 256, 512)), (34, (64, 128, 256, 512)),
     (50, (256, 512, 1024, 2048))],
)
def test_resnet_depths_shapes(depth, channels):
    model = ResNet(depth=depth, out_features=("res2", "res3", "res4", "res5"))
    x = jnp.ones((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    for i, name in enumerate(("res2", "res3", "res4", "res5")):
        stride = 2 ** (i + 2)
        assert out[name].shape == (1, 64 // stride, 64 // stride, channels[i]), name
        assert jnp.all(jnp.isfinite(out[name])), name


def test_resnet18_freeze_at_blocks_gradients():
    model = ResNet(depth=18, out_features=("res5",), freeze_at=2)
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        return model.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}},
                           x, train=False)["res5"].sum()

    g = jax.grad(loss)(variables["params"])
    # stem + res2 are frozen; res5 trains
    assert jnp.all(g["stem_conv1"]["kernel"] == 0)
    assert jnp.all(g["res2_block0"]["conv1"]["kernel"] == 0)
    assert jnp.any(g["res5_block0"]["conv1"]["kernel"] != 0)


def test_resnet18_rejects_deform():
    model = ResNet(depth=18, deform_on_per_stage=(False, False, True, False))
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    with pytest.raises(AssertionError):
        model.init(jax.random.PRNGKey(0), x, train=False)
