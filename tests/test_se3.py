import jax.numpy as jnp
import numpy as np
import pytest

from liorf_tpu.core import se3


def random_rpy(rng, n=64, scale=np.pi * 0.9):
    rpy = rng.uniform(-scale, scale, size=(n, 3)).astype(np.float32)
    rpy[:, 1] *= 0.45  # keep pitch away from the gimbal singularity
    return jnp.asarray(rpy)


def test_euler_roundtrip(rng):
    rpy = random_rpy(rng)
    R = se3.euler_to_rot(rpy)
    back = se3.rot_to_euler(R)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rpy), atol=1e-5)


def test_euler_matches_rz_ry_rx(rng):
    rpy = np.asarray(random_rpy(rng, 8))
    for v in rpy:
        r, p, y = v
        Rx = np.array(
            [[1, 0, 0], [0, np.cos(r), -np.sin(r)], [0, np.sin(r), np.cos(r)]]
        )
        Ry = np.array(
            [[np.cos(p), 0, np.sin(p)], [0, 1, 0], [-np.sin(p), 0, np.cos(p)]]
        )
        Rz = np.array(
            [[np.cos(y), -np.sin(y), 0], [np.sin(y), np.cos(y), 0], [0, 0, 1]]
        )
        expected = Rz @ Ry @ Rx
        got = np.asarray(se3.euler_to_rot(jnp.asarray(v)))
        np.testing.assert_allclose(got, expected, atol=1e-5)


def test_quat_roundtrip(rng):
    rpy = random_rpy(rng)
    R = se3.euler_to_rot(rpy)
    q = se3.rot_to_quat(R)
    R2 = se3.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_quat_mul_matches_rot_compose(rng):
    a = random_rpy(rng, 16)
    b = random_rpy(rng, 16)
    Ra, Rb = se3.euler_to_rot(a), se3.euler_to_rot(b)
    qa, qb = se3.rot_to_quat(Ra), se3.rot_to_quat(Rb)
    np.testing.assert_allclose(
        np.asarray(se3.quat_to_rot(se3.quat_mul(qa, qb))),
        np.asarray(Ra @ Rb),
        atol=1e-5,
    )


def test_so3_exp_log_roundtrip(rng):
    w = jnp.asarray(
        rng.uniform(-1, 1, size=(128, 3)).astype(np.float32)
    ) * jnp.asarray([2.5, 0.01, 1e-7]).reshape(3, 1).T[None, 0]
    # include tiny, moderate and large angles
    scales = jnp.asarray(rng.uniform(0, 3.0, size=(128, 1)).astype(np.float32))
    w = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-12) * scales
    R = se3.so3_exp(w)
    w2 = se3.so3_log(R)
    R2 = se3.so3_exp(w2)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=2e-4)


def test_so3_log_near_pi():
    axis = np.array([0.6, -0.64, 0.48])
    axis /= np.linalg.norm(axis)
    for theta in [np.pi - 1e-4, np.pi - 1e-2, 3.13]:
        w = jnp.asarray((axis * theta).astype(np.float32))
        R = se3.so3_exp(w)
        w2 = se3.so3_log(R)
        R2 = se3.so3_exp(w2)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-3)


def test_left_jacobian_inverse(rng):
    w = jnp.asarray(rng.uniform(-1.5, 1.5, size=(32, 3)).astype(np.float32))
    J = se3.so3_left_jacobian(w)
    Jinv = se3.so3_left_jacobian_inv(w)
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (32, 3, 3))
    np.testing.assert_allclose(np.asarray(J @ Jinv), eye, atol=1e-4)


def test_left_jacobian_first_order(rng):
    w = jnp.asarray([0.3, -0.5, 0.7], dtype=jnp.float32)
    dw = jnp.asarray([1e-4, -2e-4, 1.5e-4], dtype=jnp.float32)
    lhs = se3.so3_exp(w + dw)
    rhs = se3.so3_exp((se3.so3_left_jacobian(w) @ dw[:, None])[:, 0]) @ se3.so3_exp(w)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)


def test_pose_compose_inverse(rng):
    a = jnp.concatenate([random_rpy(rng, 8), jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))], axis=-1)
    b = jnp.concatenate([random_rpy(rng, 8), jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))], axis=-1)
    ab = se3.pose_compose(a, b)
    b2 = se3.pose_compose(se3.pose_inverse(a), ab)
    Tb = se3.pose_to_matrix(b)
    Tb2 = se3.pose_to_matrix(b2)
    np.testing.assert_allclose(np.asarray(Tb2), np.asarray(Tb), atol=1e-4)


def test_pose_between_matches_matrix(rng):
    a = jnp.asarray([0.1, -0.2, 0.9, 1.0, 2.0, -0.5], dtype=jnp.float32)
    b = jnp.asarray([-0.3, 0.15, -1.2, -2.0, 0.5, 1.5], dtype=jnp.float32)
    d = se3.pose_between(a, b)
    Ta = np.asarray(se3.pose_to_matrix(a))
    Tb = np.asarray(se3.pose_to_matrix(b))
    Td = np.asarray(se3.pose_to_matrix(d))
    np.testing.assert_allclose(Ta @ Td, Tb, atol=1e-5)


def test_se3_retract_local_roundtrip(rng):
    rpy = random_rpy(rng, 8)
    R = se3.euler_to_rot(rpy)
    t = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    xi = jnp.asarray(rng.uniform(-0.5, 0.5, size=(8, 6)).astype(np.float32))
    R2, t2 = se3.se3_retract(R, t, xi)
    xi2 = se3.se3_local(R, t, R2, t2)
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)


def test_slerp_endpoints(rng):
    a = random_rpy(rng, 4)
    b = random_rpy(rng, 4)
    r0 = se3.euler_slerp(a, b, 0.0)
    r1 = se3.euler_slerp(a, b, 1.0)
    np.testing.assert_allclose(
        np.asarray(se3.euler_to_rot(r0)), np.asarray(se3.euler_to_rot(a)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(se3.euler_to_rot(r1)), np.asarray(se3.euler_to_rot(b)), atol=1e-5
    )


def test_pose_apply(rng):
    pose = jnp.asarray([0.2, 0.1, -0.4, 1.0, -2.0, 0.5], dtype=jnp.float32)
    pts = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    out = se3.pose_apply(pose, pts)
    T = np.asarray(se3.pose_to_matrix(pose))
    expected = np.asarray(pts) @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
