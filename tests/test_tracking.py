"""TrajectoryFormer model + greedy tracker tests."""

import numpy as np
import pytest

from efg_tpu.tracking.tracker import GreedyTracker

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from efg_tpu.models import trajectoryformer as TF


def _simulate_scene(n_frames=10, n_obj=4, seed=0):
    """Objects moving with constant velocity; returns per-frame det lists."""
    rs = np.random.RandomState(seed)
    starts = rs.uniform(-30, 30, (n_obj, 2))
    vels = rs.uniform(-5, 5, (n_obj, 2))
    names = [("VEHICLE", "PEDESTRIAN", "CYCLIST")[i % 3] for i in range(n_obj)]
    frames = []
    for f in range(n_frames):
        dets = []
        for i in range(n_obj):
            ct = starts[i] + vels[i] * f * 0.1
            dets.append(
                dict(
                    translation=[ct[0] + rs.randn() * 0.05, ct[1] + rs.randn() * 0.05, 0.0],
                    velocity=vels[i].tolist(),
                    detection_name=names[i],
                    score=0.9,
                    box=np.array([ct[0], ct[1], 0, 4, 2, 1.5, 0.0]),
                )
            )
        frames.append(dets)
    return frames


def test_tracker_id_consistency():
    frames = _simulate_scene()
    tracker = GreedyTracker()
    id_history = []
    for dets in frames:
        tracks = tracker.step(dets, time_lag=0.1)
        ids = sorted(
            (t["detection_name"], round(t["translation"][0], 0), t["tracking_id"])
            for t in tracks
        )
        id_history.append({t["tracking_id"] for t in tracks})
    # same 4 ids persist across all frames
    assert all(h == id_history[0] for h in id_history[1:])
    assert len(id_history[0]) == 4


def test_tracker_birth_and_death():
    tracker = GreedyTracker(max_age=2)
    d0 = dict(translation=[0, 0, 0], velocity=[0, 0], detection_name="VEHICLE",
              score=0.9, box=np.zeros(7))
    tracks = tracker.step([d0], 0.1)
    tid = tracks[0]["tracking_id"]
    # object disappears; coasts for max_age-1 more frames then dies
    tracker.step([], 0.1)
    assert any(t["tracking_id"] == tid for t in tracker.tracks)
    tracker.step([], 0.1)
    assert not any(t["tracking_id"] == tid for t in tracker.tracks)


def test_crop_hypothesis_points():
    pts = jnp.asarray(
        np.concatenate(
            [np.random.RandomState(0).uniform(-1, 1, (50, 3)) * [2, 1, 0.7],
             np.random.RandomState(1).uniform(5, 6, (30, 3))], axis=0
        ).astype(np.float32)
    )
    pts = jnp.concatenate([pts, jnp.ones((80, 1))], axis=1)
    mask = jnp.ones(80, bool)
    boxes = jnp.asarray([[0, 0, 0, 4.0, 2.0, 1.5, 0.0]])
    feats, ok = TF.crop_hypothesis_points(pts, mask, boxes, num_points=64)
    assert feats.shape == (1, 64, 4)
    n_in = int(np.asarray(ok).sum())
    assert 40 <= n_in <= 60  # the 50 in-box points (minus z-outliers)
    # all selected local coords inside the (enlarged) box
    sel = np.asarray(feats[0])[np.asarray(ok[0])]
    assert (np.abs(sel[:, 0]) <= 2.0 + 0.51).all()


def test_trajectoryformer_forward_loss():
    model = TF.TrajectoryFormer(d_model=64, num_layers=2, num_points=32, history=5)
    rs = np.random.RandomState(2)
    n = 12
    args = dict(
        hyp_points=jnp.asarray(rs.randn(n, 32, 4).astype(np.float32)),
        hyp_pts_mask=jnp.ones((n, 32), bool),
        hyp_traj=jnp.asarray(rs.randn(n, 5, 8).astype(np.float32)),
        hyp_traj_mask=jnp.ones((n, 5), bool),
        hyp_boxes=jnp.asarray(
            np.column_stack([rs.uniform(-10, 10, (n, 3)), rs.uniform(1, 4, (n, 3)),
                             rs.uniform(-3, 3, (n, 1))]).astype(np.float32)
        ),
        group_ids=jnp.asarray(np.repeat(np.arange(4), 3)),
        valid=jnp.ones(n, bool),
    )
    variables = model.init(jax.random.key(0), **args, train=True)
    gt = jnp.asarray(
        np.column_stack([rs.uniform(-10, 10, (5, 3)), rs.uniform(1, 4, (5, 3)),
                         rs.uniform(-3, 3, (5, 1))]).astype(np.float32)
    )
    gt_mask = jnp.ones(5, bool)

    def loss_fn(params):
        out = model.apply({"params": params}, **args, train=True)
        losses = TF.compute_loss(out, args["hyp_boxes"], gt, gt_mask, args["valid"])
        return losses["loss"], losses

    (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)

    out = model.apply(variables, **args, train=False)
    refined = TF.apply_refinement(args["hyp_boxes"], out["refine"])
    assert refined.shape == (n, 7)
    # zero-init reg head → refinement starts as identity
    np.testing.assert_allclose(np.asarray(refined), np.asarray(args["hyp_boxes"]), atol=1e-5)


def test_trajectoryformer_tracker_loop():
    """End-to-end hypothesis tracker: moving objects, points, model in the
    loop — IDs persist across frames."""
    model = TF.TrajectoryFormer(d_model=32, num_layers=1, num_points=32, history=5)
    rs = np.random.RandomState(5)
    dummy = dict(
        hyp_points=jnp.zeros((8, 32, 4)), hyp_pts_mask=jnp.ones((8, 32), bool),
        hyp_traj=jnp.zeros((8, 5, 8)), hyp_traj_mask=jnp.ones((8, 5), bool),
        hyp_boxes=jnp.zeros((8, 7)), group_ids=jnp.arange(8), valid=jnp.ones(8, bool),
    )
    variables = model.init(jax.random.key(0), **dummy, train=False)

    from efg_tpu.tracking.tf_tracker import TrajectoryFormerTracker

    tracker = TrajectoryFormerTracker(
        model, variables, class_names=("VEHICLE", "PEDESTRIAN", "CYCLIST"),
        max_candidates=16, history=5, num_points=32, score_fuse=0.3,
    )
    starts = rs.uniform(-20, 20, (3, 2))
    vels = rs.uniform(-3, 3, (3, 2))
    ids_per_frame = []
    for f in range(6):
        dets = []
        pts_list = []
        for i in range(3):
            ct = starts[i] + vels[i] * f * 0.1
            box = np.array([ct[0], ct[1], 0, 4, 2, 1.5, vels[i][0], vels[i][1], 0.0], np.float32)
            dets.append(dict(box=box, score=0.9, detection_name="VEHICLE",
                             translation=box[:3].tolist(), velocity=vels[i].tolist()))
            local = rs.uniform(-0.4, 0.4, (40, 3)) * [4, 2, 1.5]
            pts_list.append(local + [ct[0], ct[1], 0])
        pts = np.concatenate(pts_list).astype(np.float32)
        pts = np.concatenate([pts, np.ones((len(pts), 1), np.float32)], axis=1)
        pad = np.zeros((256, 4), np.float32)
        pad[: len(pts)] = pts
        mask = np.zeros(256, bool)
        mask[: len(pts)] = True
        tracks = tracker.step(pad, mask, dets)
        ids_per_frame.append(sorted(t["tracking_id"] for t in tracks))
    assert len(ids_per_frame[-1]) == 3
    assert ids_per_frame[1] == ids_per_frame[-1]  # stable identities
