"""Local-map assembly: keyframe density filter + radius/recency selection
(extractNearby, mapOptmization.cpp:975-1058)."""

import jax.numpy as jnp
import numpy as np

from liorf_tpu.mapping.keyframes import assemble_local_map


def _assemble(poses, times, count, center, now, **kw):
    K = poses.shape[0]
    C = 32
    # one distinctive point per keyframe at the keyframe position (sensor
    # frame origin) so grid membership reveals which keyframes were fused
    clouds = np.zeros((K, C, 3), np.float32)
    masks = np.zeros((K, C), bool)
    masks[:, 0] = True
    args = dict(radius=50.0, recent_seconds=10.0, near_cap=64,
                map_cap=4096, leaf=0.05, cell_size=1.0, density=2.0)
    args.update(kw)
    return assemble_local_map(
        jnp.asarray(poses), jnp.asarray(clouds), jnp.asarray(masks),
        jnp.asarray(times), jnp.asarray(count, jnp.int32),
        jnp.asarray(center), jnp.asarray(np.float32(now)), **args,
    )


def _grid_points(grid):
    xyz = np.asarray(grid.xyz)
    m = np.asarray(grid.mask)
    return xyz[m]


def test_density_filter_keeps_one_keyframe_per_cell():
    # 10 old keyframes piled inside one 2 m cell, 3 spread far apart
    K = 32
    poses = np.zeros((K, 6), np.float32)
    poses[:10, 3] = np.linspace(0.0, 0.9, 10)  # all in cell x=[0,2)
    poses[10, 3] = 10.0
    poses[11, 3] = 20.0
    poses[12, 3] = 30.0
    times = np.zeros(K, np.float32)  # all old (now=100 > 10 s recency)
    g = _assemble(poses, times, 13, np.zeros(3, np.float32), 100.0)
    pts = _grid_points(g)
    # one representative from the pile + the 3 spread keyframes = 4 points
    assert len(pts) == 4
    xs = np.sort(pts[:, 0])
    assert np.allclose(xs[1:], [10.0, 20.0, 30.0], atol=1e-3)
    assert 0.0 <= xs[0] <= 0.9


def test_recent_keyframes_bypass_density_and_radius():
    K = 16
    poses = np.zeros((K, 6), np.float32)
    poses[0, 3] = 0.0
    poses[1, 3] = 0.5   # same 2 m cell as kf0, but RECENT
    poses[2, 3] = 500.0  # outside 50 m radius, RECENT
    times = np.array([0.0, 99.0, 99.0] + [0.0] * (K - 3), np.float32)
    g = _assemble(poses, times, 3, np.zeros(3, np.float32), 100.0)
    pts = _grid_points(g)
    xs = np.sort(pts[:, 0])
    # kf1 bypasses the density merge; kf2 bypasses the radius gate.
    # NOTE: grid cells only cover +-512 cells around center, so place the
    # far keyframe within range of the grid extent.
    assert len(xs) == 3
    assert np.allclose(xs, [0.0, 0.5, 500.0], atol=1e-3)


def test_radius_gate_drops_far_old_keyframes():
    K = 8
    poses = np.zeros((K, 6), np.float32)
    poses[1, 3] = 200.0  # old + far -> dropped
    times = np.zeros(K, np.float32)
    g = _assemble(poses, times, 2, np.zeros(3, np.float32), 100.0)
    pts = _grid_points(g)
    assert len(pts) == 1 and abs(pts[0, 0]) < 1e-3
