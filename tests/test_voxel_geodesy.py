import jax.numpy as jnp
import numpy as np

from liorf_tpu.core import geodesy
from liorf_tpu.core.pointcloud import make_cloud, round_up_pow2
from liorf_tpu.core.voxel import voxel_downsample


def test_voxel_downsample_basic(rng):
    # two clusters inside distinct voxels -> exactly two centroids
    a = rng.uniform(-0.2, 0.2, size=(50, 3)).astype(np.float32) + np.array([1.5, 1.5, 1.5])
    b = rng.uniform(-0.2, 0.2, size=(30, 3)).astype(np.float32) + np.array([5.5, 5.5, 5.5])
    pts = np.concatenate([a, b])
    cloud = make_cloud(pts, capacity=128)
    res = voxel_downsample(cloud, leaf_size=1.0)
    out_mask = np.asarray(res.cloud.mask)
    centroids = np.asarray(res.cloud.xyz)[out_mask]
    assert centroids.shape[0] == 2
    got = centroids[np.argsort(centroids[:, 0])]
    np.testing.assert_allclose(got[0], a.mean(axis=0), atol=1e-4)
    np.testing.assert_allclose(got[1], b.mean(axis=0), atol=1e-4)


def test_voxel_downsample_matches_grid_count(rng):
    pts = rng.uniform(-10, 10, size=(2000, 3)).astype(np.float32)
    cloud = make_cloud(pts, capacity=2048)
    res = voxel_downsample(cloud, leaf_size=2.0)
    n_out = int(np.asarray(res.cloud.mask).sum())
    expected = len(np.unique(np.floor(pts / 2.0).astype(np.int64), axis=0))
    assert n_out == expected


def test_voxel_respects_mask(rng):
    pts = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    mask = np.zeros(100, dtype=bool)
    mask[:10] = True
    cloud = make_cloud(pts, mask=mask, capacity=128)
    res = voxel_downsample(cloud, leaf_size=0.01)
    assert int(np.asarray(res.cloud.mask).sum()) == 10


def test_voxel_rep_idx(rng):
    pts = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [3.0, 3.0, 3.0]], np.float32)
    cloud = make_cloud(pts, capacity=8)
    res = voxel_downsample(cloud, leaf_size=1.0)
    mask = np.asarray(res.cloud.mask)
    reps = np.asarray(res.rep_idx)[mask]
    assert set(reps.tolist()) == {0, 2}


def test_geodesy_enu_small_offsets():
    # 1 arc-second of latitude ~ 30.9 m of northing at the equator
    datum = (0.0, 0.0, 0.0)
    enu = geodesy.lla_to_enu(1.0 / 3600.0, 0.0, 0.0, *datum)
    enu = np.asarray(enu)
    assert abs(enu[1] - 30.9) < 0.3
    assert abs(enu[0]) < 1e-3

    # pure altitude change -> up
    enu2 = np.asarray(geodesy.lla_to_enu(0.0, 0.0, 100.0, *datum))
    np.testing.assert_allclose(enu2, [0.0, 0.0, 100.0], atol=1e-2)


def test_geodesy_east():
    datum = (45.0, 10.0, 200.0)
    # 1 arc-second of longitude at 45N ~ 30.9 * cos(45) ~ 21.9 m east
    enu = np.asarray(geodesy.lla_to_enu(45.0, 10.0 + 1.0 / 3600.0, 200.0, *datum))
    assert abs(enu[0] - 21.9) < 0.3
    assert abs(enu[1]) < 0.05


def test_local_cartesian_stateful():
    lc = geodesy.LocalCartesian()
    first = np.asarray(lc.forward(48.0, 11.0, 500.0))
    np.testing.assert_allclose(first, [0.0, 0.0, 0.0], atol=1e-6)
    second = np.asarray(lc.forward(48.0, 11.0, 510.0))
    np.testing.assert_allclose(second, [0.0, 0.0, 10.0], atol=1e-2)


def test_round_up_pow2():
    assert round_up_pow2(1) == 256
    assert round_up_pow2(256) == 256
    assert round_up_pow2(257) == 512
    assert round_up_pow2(100000) == 131072
