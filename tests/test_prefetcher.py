"""DevicePrefetcher: ordering, exhaustion, and mesh sharding."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from efg_tpu.data.prefetcher import DevicePrefetcher


def _stream(n, bs=8):
    for i in range(n):
        yield {"x": np.full((bs, 4), i, np.float32), "meta": [f"b{i}"]}


def test_order_and_exhaustion():
    out = list(DevicePrefetcher(_stream(5), depth=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["x"], jax.Array)
        assert float(b["x"][0, 0]) == i


def test_empty_stream():
    assert list(DevicePrefetcher(iter([]), depth=2)) == []


def test_sharded_on_mesh():
    from efg_tpu.parallel.mesh import build_mesh

    mesh = build_mesh()
    ndev = mesh.shape["data"]
    pf = DevicePrefetcher(_stream(3, bs=2 * ndev), mesh=mesh, depth=2)
    b = next(pf)
    assert b["x"].sharding.is_fully_replicated == (ndev == 1)
    # leading dim split over the data axis
    shard_rows = {s.data.shape[0] for s in b["x"].addressable_shards}
    assert shard_rows == {2}
    assert sum(1 for _ in pf) == 2
