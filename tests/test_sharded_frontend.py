"""dist/sharded_frontend.py on the virtual 8-device mesh: point-sharded
registration and keyframe-sharded ScanContext search must agree with the
single-device kernels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from liorf_tpu.dist.sharded import make_mesh
from liorf_tpu.dist.sharded_frontend import detect_loop_sharded, scan_to_map_sharded
from liorf_tpu.ops import knn, scancontext
from liorf_tpu.ops.scan_match import ScanMatchParams, scan_to_map


def _plane_world(rng, n_per=2048):
    pts = []
    for axis, offset in [(2, 0.0), (0, -8.0), (0, 8.0), (1, -8.0), (1, 8.0)]:
        p = rng.uniform(-8, 8, size=(n_per, 3))
        p[:, axis] = offset
        pts.append(p)
    return np.concatenate(pts).astype(np.float32)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    map_xyz = jnp.asarray(_plane_world(rng))
    grid = knn.build_grid(
        map_xyz, jnp.ones(map_xyz.shape[0], bool), jnp.zeros(3, jnp.float32), 1.0
    )
    scan = jnp.asarray(_plane_world(rng, 512))
    mask = jnp.ones(scan.shape[0], bool)
    init = jnp.asarray([0.02, -0.01, 0.03, 0.15, -0.1, 0.05], jnp.float32)
    return grid, scan, mask, init


@pytest.mark.parametrize("n_dev", [1, 8])
def test_scan_to_map_sharded_matches(setup, n_dev):
    grid, scan, mask, init = setup
    mesh = make_mesh(n_dev)
    params = ScanMatchParams(max_iters=10)
    ref = scan_to_map(scan, mask, grid, init, params)
    out = scan_to_map_sharded(scan, mask, grid, init, mesh, params)
    np.testing.assert_allclose(
        np.asarray(out.pose), np.asarray(ref.pose), atol=5e-4
    )
    assert int(out.num_matched) == int(ref.num_matched)
    # registration actually solved the offset
    np.testing.assert_allclose(np.asarray(out.pose), np.zeros(6), atol=5e-3)


def test_scan_to_map_sharded_pads_ragged(setup):
    grid, scan, mask, init = setup
    mesh = make_mesh(8)
    ragged = scan[:-3], mask[:-3]
    out = scan_to_map_sharded(ragged[0], ragged[1], grid, init, mesh)
    assert np.isfinite(np.asarray(out.pose)).all()


def _sc_database(rng, count, C):
    descs = np.zeros((C, 20, 60), np.float32)
    descs[:count] = rng.uniform(0, 5, size=(count, 20, 60)).astype(np.float32)
    keys = np.stack([np.asarray(scancontext.ring_key(jnp.asarray(d))) for d in descs])
    return jnp.asarray(descs), jnp.asarray(keys)


def test_detect_loop_sharded_finds_global_best():
    rng = np.random.default_rng(1)
    C, count = 64, 60
    descs, keys = _sc_database(rng, count, C)
    # plant the query as a shifted copy of entry 7 (well outside the
    # exclude-recent window measured from count=60)
    target = np.asarray(descs[7])
    shift = 13
    qdesc = jnp.asarray(np.roll(target, shift, axis=1))
    qkey = scancontext.ring_key(qdesc)
    mesh = make_mesh(8)

    ref = scancontext.detect_loop(descs, keys, jnp.asarray(count), qdesc, qkey)
    out = detect_loop_sharded(descs, keys, jnp.asarray(count), qdesc, qkey, mesh)
    assert int(ref.index) == 7
    assert int(out.index) == 7
    # union of per-shard candidates is a superset of the global top-k
    assert float(out.distance) <= float(ref.distance) + 1e-5
    assert abs(float(out.yaw) - float(ref.yaw)) < 1e-6


def test_detect_loop_sharded_rejects_when_no_match():
    rng = np.random.default_rng(2)
    C, count = 64, 60
    # database columns live in rings 5-15; the query only in ring 0 —
    # column cosine similarity is 0, SC distance 1 for every candidate
    descs = np.zeros((C, 20, 60), np.float32)
    for i in range(count):
        descs[i, 5 + i % 10] = rng.uniform(1, 5, size=60)
    keys = np.stack(
        [np.asarray(scancontext.ring_key(jnp.asarray(d))) for d in descs]
    )
    descs, keys = jnp.asarray(descs), jnp.asarray(keys)
    qd = np.zeros((20, 60), np.float32)
    qd[0] = rng.uniform(1, 5, size=60)
    qdesc = jnp.asarray(qd)
    qkey = scancontext.ring_key(qdesc)
    mesh = make_mesh(8)
    out = detect_loop_sharded(descs, keys, jnp.asarray(count), qdesc, qkey, mesh)
    assert int(out.index) == -1
