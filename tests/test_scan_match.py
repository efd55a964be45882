import jax.numpy as jnp
import numpy as np

from liorf_tpu.core import se3
from liorf_tpu.ops import knn, plane_fit, scan_match
from liorf_tpu.ops.deskew import ImuRotationTimeline, deskew_scan, integrate_gyro, interp_rotation


# ---------------------------------------------------------------------------
# synthetic plane-rich world shared by registration tests
# ---------------------------------------------------------------------------

def make_world(rng, n_per_plane=800, margin=0.0):
    """Points on the walls/floor of a box — plenty of plane structure.

    `margin` shrinks each face so points stay away from box edges (where
    5-NN neighborhoods straddle two planes and bias the fit).
    """
    lo, hi = -10 + margin, 10 - margin
    pts = []
    for axis, offset in [(2, 0.0), (0, -10.0), (0, 10.0), (1, -10.0), (1, 10.0), (2, 6.0)]:
        p = rng.uniform(lo, hi, size=(n_per_plane, 3))
        p[:, axis] = offset
        pts.append(p)
    return np.concatenate(pts).astype(np.float32)


def test_plane_fit_recovers_plane(rng):
    normal = np.array([0.3, -0.5, 0.81])
    normal /= np.linalg.norm(normal)
    d_true = 1.7
    # sample neighbor sets on the plane n.p + d = 0
    basis = np.linalg.svd(normal[None, :])[2][1:]
    uv = rng.uniform(-1, 1, size=(64, 5, 2)).astype(np.float32)
    pts = (uv @ basis - d_true * normal).astype(np.float32)
    fit = plane_fit.fit_planes(jnp.asarray(pts), jnp.ones((64, 5), bool))
    assert np.asarray(fit.valid).all()
    n_got = np.asarray(fit.normal)
    sign = np.sign(n_got @ normal)[:, None]
    np.testing.assert_allclose(n_got * sign, np.tile(normal, (64, 1)), atol=1e-3)
    np.testing.assert_allclose(np.asarray(fit.d) * sign[:, 0], d_true, atol=5e-3)


def test_plane_fit_rejects_nonplanar(rng):
    pts = rng.uniform(-3, 3, size=(32, 5, 3)).astype(np.float32)
    fit = plane_fit.fit_planes(jnp.asarray(pts), jnp.ones((32, 5), bool))
    # random 3D blobs of 3m extent rarely form 0.2m-thick planes
    assert np.asarray(fit.valid).sum() < 4


def test_scan_match_recovers_pose(rng):
    world = make_world(rng)
    true_pose = jnp.asarray([0.02, -0.015, 0.05, 0.3, -0.2, 0.1], dtype=jnp.float32)

    # scan = interior world points seen from the true pose (sensor frame);
    # edge bands excluded so every 5-NN neighborhood is single-plane
    scan_world = make_world(rng, margin=1.5)
    sensor_pts = se3.pose_apply(se3.pose_inverse(true_pose), jnp.asarray(scan_world))
    keep = np.asarray(jnp.linalg.norm(sensor_pts, axis=-1)) < 25.0
    kept = np.asarray(sensor_pts)[keep]
    scan = kept[rng.choice(len(kept), size=2048, replace=False)]
    n = scan.shape[0]

    grid = knn.build_grid(
        jnp.asarray(world), jnp.ones(world.shape[0], bool), jnp.zeros(3, jnp.float32), 1.0
    )
    res = scan_match.scan_to_map(
        jnp.asarray(scan),
        jnp.ones(n, bool),
        grid,
        jnp.zeros(6, jnp.float32),
    )
    got = np.asarray(res.pose)
    np.testing.assert_allclose(got[:3], np.asarray(true_pose)[:3], atol=2e-3)
    np.testing.assert_allclose(got[3:], np.asarray(true_pose)[3:], atol=2e-2)
    assert bool(res.converged)


def test_scan_match_detects_degenerate(rng):
    # single plane -> 3 unconstrained DoF -> degeneracy flag
    p = rng.uniform(-10, 10, size=(2000, 3)).astype(np.float32)
    p[:, 2] = 0.0
    grid = knn.build_grid(jnp.asarray(p), jnp.ones(2000, bool), jnp.zeros(3, jnp.float32), 1.0)
    scan = p[:500] + np.array([0.0, 0.0, 0.05], np.float32)
    res = scan_match.scan_to_map(
        jnp.asarray(scan), jnp.ones(500, bool), grid, jnp.zeros(6, jnp.float32)
    )
    assert bool(res.degenerate)


def test_scan_match_too_few_points(rng):
    world = make_world(rng)
    grid = knn.build_grid(
        jnp.asarray(world), jnp.ones(world.shape[0], bool), jnp.zeros(3, jnp.float32), 1.0
    )
    scan = world[:10]
    init = jnp.asarray([0, 0, 0, 1.0, 2.0, 3.0], dtype=jnp.float32)
    res = scan_match.scan_to_map(jnp.asarray(scan), jnp.ones(10, bool), grid, init)
    np.testing.assert_allclose(np.asarray(res.pose), np.asarray(init), atol=1e-6)
    assert not bool(res.converged)


# ---------------------------------------------------------------------------
# deskew
# ---------------------------------------------------------------------------

def test_integrate_gyro_constant_rate():
    k = 16
    times = jnp.asarray(np.linspace(0.0, 0.15, k).astype(np.float32))
    gyro = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (k, 1))
    tl = integrate_gyro(times, gyro, jnp.ones(k, bool))
    np.testing.assert_allclose(np.asarray(tl.angles)[-1, 2], 0.15, atol=1e-5)
    # interpolation midway
    mid = interp_rotation(tl, jnp.asarray([0.075], jnp.float32))
    np.testing.assert_allclose(np.asarray(mid)[0, 2], 0.075, atol=1e-5)


def test_deskew_pure_yaw(rng):
    # sensor spinning at constant yaw rate; a static world point sampled at
    # time t appears rotated by -yaw(t) in the sensor frame. Deskew must map
    # it back to its scan-start position.
    k = 32
    rate = 0.5  # rad/s
    times = np.linspace(-0.01, 0.11, k).astype(np.float32)
    gyro = np.tile(np.array([[0.0, 0.0, rate]], np.float32), (k, 1))
    tl = integrate_gyro(jnp.asarray(times), jnp.asarray(gyro), jnp.ones(k, bool))

    world_pts = rng.uniform(-10, 10, size=(256, 3)).astype(np.float32)
    rel_t = rng.uniform(0, 0.1, size=(256,)).astype(np.float32)
    t0 = 0.0
    # yaw at scan start (gyro integration began at times[0] = -0.01)
    def yaw_at(t):
        return rate * (t - times[0])

    obs = np.stack(
        [
            np.asarray(
                se3.euler_to_rot(jnp.asarray([0.0, 0.0, -(yaw_at(t0 + rt) )], jnp.float32))
            ) @ p
            for p, rt in zip(world_pts, rel_t)
        ]
    ).astype(np.float32)
    out = deskew_scan(
        jnp.asarray(obs), jnp.asarray(rel_t), jnp.ones(256, bool),
        jnp.asarray(t0, jnp.float32), tl,
    )
    # expected: points as seen at scan start = rotated by -yaw(t0)
    expected = np.stack(
        [
            np.asarray(se3.euler_to_rot(jnp.asarray([0.0, 0.0, -yaw_at(t0)], jnp.float32))) @ p
            for p in world_pts
        ]
    )
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-3)
