"""ConQueR: CDN construction, dn losses, momentum decoder, contrast loss."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from efg_tpu.models import conquer as CQ
from efg_tpu.models import voxel_detr as VD

PC = (-8.0, -8.0, -2.0, 8.0, 8.0, 4.0)
VOX = (0.1, 0.1, 0.15)

MODEL_CFG = dict(
    pc_range=PC, voxel_size=VOX,
    loss_weights={"class": 1.0, "bbox": 4.0, "giou": 2.0, "rad": 4.0},
    dn=dict(dn_number=2, dn_label_noise_ratio=0.5, dn_box_noise_scale=0.4),
    contrastive=dict(mom=0.999, dim=32, tau=0.7, loss_coeff=0.2),
)

DETR_KW = dict(
    pc_range=PC, voxel_size=VOX, max_voxels=2048,
    resnet_caps=(1536, 1024, 512, 256),
    hidden_dim=32, num_head=4, enc_layers=1, dec_layers=2,
    dim_feedforward=64, num_queries=16, num_classes=3,
)


def _batch(seed=0, bsz=2, g=4):
    rs = np.random.RandomState(seed)
    pts = np.concatenate(
        [rs.uniform(-7, 7, (bsz, 512, 3)), rs.uniform(0, 1, (bsz, 512, 2))], axis=-1
    ).astype(np.float32)
    gt = np.zeros((bsz, g, 9), np.float32)
    gt[:, :2, :3] = rs.uniform(-6, 6, (bsz, 2, 3))
    gt[:, :2, 3:6] = rs.uniform(1, 4, (bsz, 2, 3))
    gt[:, :2, 8] = rs.uniform(-np.pi, np.pi, (bsz, 2))
    cls = np.zeros((bsz, g), np.int32)
    cls[:, :2] = rs.randint(1, 4, (bsz, 2))
    mask = np.zeros((bsz, g), bool)
    mask[:, :2] = True
    return dict(
        points=jnp.asarray(pts), points_mask=jnp.ones((bsz, 512), bool),
        gt_boxes=jnp.asarray(gt), gt_classes=jnp.asarray(cls), gt_mask=jnp.asarray(mask),
    )


def test_prepare_cdn_shapes_and_mask():
    batch = _batch()
    coder = VD.VoxelBoxCoder3D(VOX, PC)
    tgt = coder.encode(batch["gt_boxes"])
    labels = jnp.clip(batch["gt_classes"] - 1, 0, None)
    dn_ref, attn_mask, valid = CQ.prepare_cdn(
        tgt, labels, batch["gt_mask"], jax.random.key(0),
        dn_number=2, label_noise_ratio=0.5, box_noise_scale=0.4,
        num_classes=3, num_queries=16,
    )
    g = 4
    p = 2 * g * 2
    assert dn_ref.shape == (2, p, 10)
    assert attn_mask.shape == (p + 16, p + 16)
    am = np.asarray(attn_mask)
    # queries can't see dn slots and vice versa
    assert not am[p:, :p].any()
    assert not am[:p, p:].any()
    # group 0 can't see group 1
    assert not am[: 2 * g, 2 * g : 4 * g].any()
    # within-group visible
    assert am[: 2 * g, : 2 * g].all()
    assert am[p:, p:].all()
    # boxes stay in [0, 1]
    assert (np.asarray(dn_ref[..., :7]) >= 0).all() and (np.asarray(dn_ref[..., :7]) <= 1).all()


def test_cdn_negatives_are_farther():
    # with no label noise, positives (first G of each group) should on average
    # be closer to the GT than negatives (second G)
    batch = _batch(seed=1)
    coder = VD.VoxelBoxCoder3D(VOX, PC)
    tgt = coder.encode(batch["gt_boxes"])
    labels = jnp.clip(batch["gt_classes"] - 1, 0, None)
    dn_ref, _, _ = CQ.prepare_cdn(
        tgt, labels, batch["gt_mask"], jax.random.key(1),
        dn_number=4, label_noise_ratio=0.0, box_noise_scale=0.4,
        num_classes=3, num_queries=8,
    )
    g = 4
    ref = np.asarray(dn_ref[..., :7])
    tgt_np = np.asarray(tgt)
    mask = np.asarray(batch["gt_mask"])
    pos_d, neg_d = [], []
    for grp in range(4):
        pos = ref[:, 2 * g * grp : 2 * g * grp + g]
        neg = ref[:, 2 * g * grp + g : 2 * g * (grp + 1)]
        pos_d.append(np.abs(pos - tgt_np)[mask].mean())
        neg_d.append(np.abs(neg - tgt_np)[mask].mean())
    assert np.mean(pos_d) < np.mean(neg_d)


@pytest.mark.slow
def test_conquer_train_step_end_to_end():
    import optax

    model_def = CQ.make_model_def(DETR_KW, MODEL_CFG)
    batch = _batch(seed=2)
    variables = model_def.module.init(
        jax.random.key(0), batch["points"], batch["points_mask"], True
    )
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    assert "detr" in params and "projector" in params and "predictor" in params

    ema = model_def.ema_init(params)

    def loss_fn(p):
        loss, losses, new_bs = model_def.custom_loss(
            model_def.module, p, bs, ema, batch, jax.random.key(3)
        )
        return loss, losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss)), {k: float(v) for k, v in losses.items()}
    assert any(k.startswith("loss_contrastive") for k in losses)
    assert any(k.endswith("_dn") for k in losses)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # contrastive projector receives gradient
    pj = jax.tree_util.tree_leaves(grads["projector"])
    assert sum(float(np.abs(np.asarray(x)).sum()) for x in pj) > 0

    # EMA update moves toward params
    ema2 = model_def.ema_update(ema, params)
    d0 = jax.tree_util.tree_leaves(ema["decoder"])[0]
    d2 = jax.tree_util.tree_leaves(ema2["decoder"])[0]
    assert d0.shape == d2.shape
