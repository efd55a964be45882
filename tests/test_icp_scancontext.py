import jax.numpy as jnp
import numpy as np

from liorf_tpu.core import se3
from liorf_tpu.ops import scancontext
from liorf_tpu.ops.icp import ICPParams, icp_point2point


def make_structured_cloud(rng, n=1500):
    """Box walls + scattered posts — enough structure for stable ICP."""
    pts = []
    for axis, offset in [(2, 0.0), (0, -8.0), (1, 8.0)]:
        p = rng.uniform(-8, 8, size=(n // 3, 3))
        p[:, axis] = offset
        pts.append(p)
    return np.concatenate(pts).astype(np.float32)


def test_icp_recovers_transform(rng):
    target = make_structured_cloud(rng)
    true_pose = jnp.asarray([0.01, -0.02, 0.06, 0.4, -0.3, 0.15], dtype=jnp.float32)
    # source = target seen from true_pose^-1 so that aligning source->target
    # recovers true_pose
    source = np.asarray(se3.pose_apply(se3.pose_inverse(true_pose), jnp.asarray(target)))
    n = target.shape[0]
    res = icp_point2point(
        jnp.asarray(source), jnp.ones(n, bool),
        jnp.asarray(target), jnp.ones(n, bool),
        jnp.zeros(6, jnp.float32),
        ICPParams(max_iters=40, max_corr_dist=5.0),
    )
    got = np.asarray(res.pose)
    np.testing.assert_allclose(got, np.asarray(true_pose), atol=5e-3)
    assert float(res.fitness) < 0.01


def test_icp_fitness_high_for_mismatch(rng):
    a = rng.uniform(-5, 5, size=(512, 3)).astype(np.float32)
    b = rng.uniform(45, 55, size=(512, 3)).astype(np.float32)
    res = icp_point2point(
        jnp.asarray(a), jnp.ones(512, bool),
        jnp.asarray(b), jnp.ones(512, bool),
        jnp.zeros(6, jnp.float32),
        ICPParams(max_iters=5, max_corr_dist=5.0),
    )
    # no correspondences within range -> not converged or terrible fitness
    assert (not bool(res.converged)) or float(res.fitness) > 1.0


# ---------------------------------------------------------------------------
# ScanContext
# ---------------------------------------------------------------------------

def ring_cloud(rng, seed_offset=0.0, n=4096):
    """A cloud with azimuthal structure (distinct per-sector heights)."""
    theta = rng.uniform(0, 2 * np.pi, size=n)
    r = rng.uniform(2, 70, size=n)
    z = np.sin(3 * theta + seed_offset) * 2.0 + np.cos(r * 0.2) * 0.5
    pts = np.stack([r * np.cos(theta), r * np.sin(theta), z], axis=1)
    return pts.astype(np.float32)


def test_descriptor_shape_and_height():
    pts = jnp.asarray([[10.0, 0.0, 1.0], [10.0, 0.0, 3.0]], dtype=jnp.float32)
    desc = scancontext.make_descriptor(pts, jnp.ones(2, bool))
    assert desc.shape == (20, 60)
    # max-height rule: the higher point (z + LIDAR_HEIGHT = 5.0) wins
    assert np.isclose(float(desc.max()), 5.0)
    assert float((np.asarray(desc) != 0).sum()) == 1


def test_descriptor_rotation_shifts_columns(rng):
    pts = ring_cloud(rng)
    desc = np.asarray(scancontext.make_descriptor(jnp.asarray(pts), jnp.ones(len(pts), bool)))
    # rotate cloud by exactly 2 sectors (12 deg)
    ang = np.deg2rad(12.0)
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    desc_rot = np.asarray(
        scancontext.make_descriptor(jnp.asarray(pts @ R.T), jnp.ones(len(pts), bool))
    )
    np.testing.assert_allclose(desc_rot, np.roll(desc, 2, axis=1), atol=1e-4)


def test_detect_loop_finds_rotated_revisit(rng):
    C = 64
    descs = np.zeros((C, 20, 60), np.float32)
    keys = np.zeros((C, 20), np.float32)
    clouds = [ring_cloud(rng, seed_offset=i * 0.7) for i in range(40)]
    for i, c in enumerate(clouds):
        d = np.asarray(scancontext.make_descriptor(jnp.asarray(c), jnp.ones(len(c), bool)))
        descs[i] = d
        keys[i] = d.mean(axis=1)

    # query: revisit of keyframe 3, rotated by 30 deg (5 sectors)
    ang = np.deg2rad(30.0)
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    qcloud = clouds[3] @ R.T
    qd = np.asarray(
        scancontext.make_descriptor(jnp.asarray(qcloud), jnp.ones(len(qcloud), bool))
    )
    det = scancontext.detect_loop(
        jnp.asarray(descs), jnp.asarray(keys), jnp.asarray(40, jnp.int32),
        jnp.asarray(qd), jnp.asarray(qd.mean(axis=1)),
    )
    assert int(det.index) == 3
    assert float(det.distance) < 0.1


def test_detect_loop_excludes_recent(rng):
    C = 64
    descs = np.zeros((C, 20, 60), np.float32)
    keys = np.zeros((C, 20), np.float32)
    clouds = [ring_cloud(rng, seed_offset=i * 0.9) for i in range(35)]
    for i, c in enumerate(clouds):
        d = np.asarray(scancontext.make_descriptor(jnp.asarray(c), jnp.ones(len(c), bool)))
        descs[i] = d
        keys[i] = d.mean(axis=1)
    # query identical to keyframe 34 (too recent: within the exclude window)
    qd = descs[34]
    det = scancontext.detect_loop(
        jnp.asarray(descs), jnp.asarray(keys), jnp.asarray(35, jnp.int32),
        jnp.asarray(qd), jnp.asarray(qd.mean(axis=1)),
    )
    assert int(det.index) != 34
