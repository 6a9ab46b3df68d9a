import numpy as np
import pytest

from efg_tpu.ops import voxelize_np

PC_RANGE = (-4.0, -4.0, -1.0, 4.0, 4.0, 3.0)
VOXEL = (0.5, 0.5, 0.5)


def _rand_points(n=2000, seed=0):
    rs = np.random.RandomState(seed)
    pts = rs.uniform(-5, 5, (n, 3)).astype(np.float32)
    extra = rs.uniform(0, 1, (n, 2)).astype(np.float32)
    return np.concatenate([pts, extra], axis=1)


def test_np_voxelizer_basic():
    pts = np.array(
        [
            [0.1, 0.1, 0.1, 9.0],
            [0.2, 0.2, 0.2, 5.0],  # same voxel as above
            [1.6, 0.1, 0.1, 1.0],
            [99.0, 0.0, 0.0, 1.0],  # out of range
        ],
        dtype=np.float32,
    )
    voxels, coords, nper = voxelize_np.points_to_voxel(pts, VOXEL, PC_RANGE, max_points=5, max_voxels=10)
    assert voxels.shape == (2, 5, 4)
    np.testing.assert_array_equal(nper, [2, 1])
    # first-appearance order: voxel of point0 first
    np.testing.assert_allclose(voxels[0, 0], pts[0])
    np.testing.assert_allclose(voxels[0, 1], pts[1])
    np.testing.assert_allclose(voxels[1, 0], pts[2])
    # coords are (z, y, x): point0 at (0.1,0.1,0.1) → ix=8, iy=8, iz=2
    np.testing.assert_array_equal(coords[0], [2, 8, 8])


def test_np_voxelizer_max_points_cap():
    pts = np.zeros((10, 4), dtype=np.float32)
    pts[:, 3] = np.arange(10)
    voxels, coords, nper = voxelize_np.points_to_voxel(pts, VOXEL, PC_RANGE, max_points=3, max_voxels=10)
    assert nper[0] == 3
    np.testing.assert_array_equal(voxels[0, :, 3], [0, 1, 2])


def test_np_voxelizer_max_voxels_cap():
    # 5 distinct voxels along x, cap at 3 — first-appearance wins
    pts = np.stack([np.arange(5) * 0.5 - 3.9, np.zeros(5), np.zeros(5)], axis=1).astype(np.float32)
    voxels, coords, nper = voxelize_np.points_to_voxel(pts, VOXEL, PC_RANGE, max_points=5, max_voxels=3)
    assert voxels.shape[0] == 3
    np.testing.assert_allclose(voxels[:, 0, 0], pts[:3, 0])


def test_device_voxelize_matches_np_mean():
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from efg_tpu.ops import voxelize as V

    pts = _rand_points(1500)
    n_pad = 2048
    padded = np.zeros((n_pad, pts.shape[1]), dtype=np.float32)
    padded[: len(pts)] = pts
    mask = np.zeros(n_pad, dtype=bool)
    mask[: len(pts)] = True

    out = V.voxelize(
        jnp.asarray(padded), jnp.asarray(mask), pc_range=PC_RANGE, voxel_size=VOXEL, max_voxels=4096
    )
    feats = V.voxel_mean(jnp.asarray(padded), out.point_slot, out.counts, 4096)

    # oracle: host voxelizer with unbounded max_points → same voxel means
    voxels, coords_np, nper = voxelize_np.points_to_voxel(pts, VOXEL, PC_RANGE, max_points=64, max_voxels=4096)
    means_np = voxels.sum(axis=1) / nper[:, None]

    nv = int(out.num_voxels)
    assert nv == len(coords_np)
    # device output is sorted by (z,y,x); sort oracle the same way
    key_np = (coords_np[:, 0].astype(np.int64) * 10**6 + coords_np[:, 1] * 10**3 + coords_np[:, 2])
    o = np.argsort(key_np)
    np.testing.assert_array_equal(np.asarray(out.coords)[:nv], coords_np[o])
    np.testing.assert_allclose(np.asarray(feats)[:nv], means_np[o], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.counts)[:nv], nper[o])
    # all padding slots invalid
    assert not np.asarray(out.valid)[nv:].any()


def test_device_voxelize_max_voxels_cap_and_vmap():
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from efg_tpu.ops import voxelize as V

    pts = _rand_points(500, seed=3)
    padded = np.zeros((512, 5), dtype=np.float32)
    padded[:500] = pts
    mask = np.ones(512, dtype=bool)
    mask[500:] = False
    batch = jnp.stack([jnp.asarray(padded)] * 2)
    bmask = jnp.stack([jnp.asarray(mask)] * 2)

    fn = jax.vmap(
        lambda p, m: V.voxelize(p, m, pc_range=PC_RANGE, voxel_size=VOXEL, max_voxels=16)
    )
    out = fn(batch, bmask)
    assert out.coords.shape == (2, 16, 3)
    assert (np.asarray(out.num_voxels) == 16).all()
    # dropped points got slot -1, kept slots within range
    assert (np.asarray(out.point_slot) < 16).all()


def test_voxel_max_empty_slots_zero():
    pytest.importorskip("jax")
    import jax.numpy as jnp

    from efg_tpu.ops import voxelize as V

    feats = jnp.array([[1.0, -2.0], [3.0, -4.0]])
    slot = jnp.array([0, 0])
    out = V.voxel_max(feats, slot, max_voxels=4)
    np.testing.assert_allclose(np.asarray(out[0]), [3.0, -2.0])
    np.testing.assert_allclose(np.asarray(out[1:]), 0.0)
