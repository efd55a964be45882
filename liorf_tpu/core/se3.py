"""SO(3)/SE(3) geometry for the TPU-native LiDAR-inertial SLAM engine.

Conventions (chosen to be interoperable with the reference liorf system):

* Euler angles are intrinsic roll(x)-pitch(y)-yaw(z), composed as
  ``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)`` — the ``pcl::getTransformation``
  convention used throughout the reference
  (``/root/reference/src/mapOptmization.cpp:1503-1560``,
  ``src/imageProjection.cpp:536-565``).
* Quaternions are ``(w, x, y, z)``.
* A "pose" in vector form is ``[roll, pitch, yaw, x, y, z]`` (rpyxyz), the
  layout of the reference's ``transformTobeMapped``
  (``src/mapOptmization.cpp:1271-1277``).
* Batched: every function accepts arbitrary leading batch dimensions.

All math is pure jax.numpy and differentiable; dtype follows the inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


# ---------------------------------------------------------------------------
# Elementary rotations / Euler conversions
# ---------------------------------------------------------------------------

def euler_to_rot(rpy: jax.Array) -> jax.Array:
    """[..., 3] (roll, pitch, yaw) -> [..., 3, 3] with R = Rz @ Ry @ Rx."""
    roll, pitch, yaw = rpy[..., 0], rpy[..., 1], rpy[..., 2]
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    # Closed form of Rz(yaw) Ry(pitch) Rx(roll).
    r00 = cy * cp
    r01 = cy * sp * sr - sy * cr
    r02 = cy * sp * cr + sy * sr
    r10 = sy * cp
    r11 = sy * sp * sr + cy * cr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_to_euler(R: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 3] (roll, pitch, yaw); inverse of euler_to_rot.

    Uses the numerically safe atan2 extraction; at the pitch = +-pi/2 gimbal
    singularity roll is set to 0 and yaw absorbs the remaining rotation.
    """
    sp = -R[..., 2, 0]
    sp = jnp.clip(sp, -1.0, 1.0)
    pitch = jnp.arcsin(sp)
    cp = jnp.sqrt(jnp.maximum(1.0 - sp * sp, 0.0))
    safe = cp > 1e-6
    roll = jnp.where(
        safe,
        jnp.arctan2(R[..., 2, 1], R[..., 2, 2]),
        jnp.zeros_like(sp),
    )
    yaw = jnp.where(
        safe,
        jnp.arctan2(R[..., 1, 0], R[..., 0, 0]),
        jnp.arctan2(-R[..., 0, 1], R[..., 1, 1]),
    )
    return jnp.stack([roll, pitch, yaw], axis=-1)


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_to_rot(q: jax.Array) -> jax.Array:
    """[..., 4] (w,x,y,z) -> [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 4] (w,x,y,z), w >= 0. Shepperd's method, branchless."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best per element.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) / 2
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0), (m10 - m01) / (4 * qw0)],
        axis=-1,
    )
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) / 2
    q1 = jnp.stack(
        [(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1), (m02 + m20) / (4 * qx1)],
        axis=-1,
    )
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) / 2
    q2 = jnp.stack(
        [(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2, (m12 + m21) / (4 * qy2)],
        axis=-1,
    )
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) / 2
    q3 = jnp.stack(
        [(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3), (m12 + m21) / (4 * qz3), qz3],
        axis=-1,
    )

    cond0 = tr > 0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(
        cond0[..., None],
        q0,
        jnp.where(cond1[..., None], q1, jnp.where(cond2[..., None], q2, q3)),
    )
    # canonical sign: w >= 0
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of (w,x,y,z) quaternions."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_slerp(a: jax.Array, b: jax.Array, t) -> jax.Array:
    """Spherical interpolation from a to b by fraction t in [0, 1]."""
    dot = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(dot < 0, -b, b)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(dot)
    sin_theta = jnp.sin(theta)
    small = sin_theta < 1e-6
    w_a = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_theta))
    w_b = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_theta))
    q = w_a * a + w_b * b
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def euler_slerp(rpy_a: jax.Array, rpy_b: jax.Array, t) -> jax.Array:
    """Slerp between two euler attitudes, returning euler angles.

    Mirrors the reference's IMU attitude blending (tf slerp on RPY
    quaternions, ``src/mapOptmization.cpp:1323-1346``).
    """
    qa = rot_to_quat(euler_to_rot(rpy_a))
    qb = rot_to_quat(euler_to_rot(rpy_b))
    return rot_to_euler(quat_to_rot(quat_slerp(qa, qb, t)))


# ---------------------------------------------------------------------------
# so(3) exp/log
# ---------------------------------------------------------------------------

def hat(w: jax.Array) -> jax.Array:
    """[..., 3] -> [..., 3, 3] skew-symmetric."""
    zero = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zero, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jax.Array) -> jax.Array:
    """[..., 3, 3] skew -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues: [..., 3] rotation vector -> [..., 3, 3]."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta < 1e-5
    st = jnp.where(small, 1.0, theta)
    # sin(t)/t and (1-cos t)/t^2 with Taylor fallbacks
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(st) / st)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(st)) / (st * st))
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * (W @ W)


def so3_log(R: jax.Array) -> jax.Array:
    """[..., 3, 3] -> [..., 3] rotation vector. Accurate up to theta <= pi.

    theta is recovered from atan2(||skew||, (tr-1)/2), which stays
    well-conditioned near pi (unlike arccos of the trace). Near pi the axis
    is rebuilt from the symmetric part with argmax-based sign recovery.
    """
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    w_skew = vee(R - jnp.swapaxes(R, -1, -2)) / 2.0  # = sin(theta) * axis
    # AD-safe norm: the sqrt argument is bounded away from 0 on the branch
    # where it is actually used (double-where), so jacfwd stays finite at
    # the identity rotation.
    s2 = jnp.sum(w_skew * w_skew, axis=-1)
    small_s = s2 < 1e-12
    sin_theta = jnp.where(small_s, 0.0, jnp.sqrt(jnp.where(small_s, 1.0, s2)))
    theta = jnp.arctan2(sin_theta, cos_theta)

    small = theta < 1e-5
    near_pi = theta > jnp.pi - 1e-2
    safe_sin = jnp.where(sin_theta < _EPS, 1.0, sin_theta)
    # For tiny angles theta ~= sin(theta), so theta^2 ~= s2 and the Taylor
    # scale 1 + theta^2/6 is expressed in s2 (differentiable everywhere).
    scale = jnp.where(small, 1.0 + s2 / 6.0, theta / safe_sin)
    w_generic = w_skew * scale[..., None]

    # Near pi: M = (R + R^T)/2 - cos_theta I  ==  (1 - cos_theta) * a a^T.
    B = (R + jnp.swapaxes(R, -1, -2)) / 2.0
    eye = jnp.eye(3, dtype=R.dtype)
    M = B - cos_theta[..., None, None] * eye
    diag = jnp.stack([M[..., 0, 0], M[..., 1, 1], M[..., 2, 2]], axis=-1)
    axis2 = diag / jnp.maximum(1.0 - cos_theta[..., None], _EPS)
    pos = axis2 > 1e-12
    axis_abs = jnp.where(pos, jnp.sqrt(jnp.where(pos, axis2, 1.0)), 0.0)
    # Signs: let r = argmax |a_i| (via diag of M). sign(M[r, i]) = sign(a_r a_i)
    # and sign(a_r) = sign(w_skew[r]) (sin > 0 for theta in (0, pi)), so
    # sign(a_i) = sign(M[r, i]) * sign(w_skew[r]).
    r = jnp.argmax(diag, axis=-1)
    row_r = jnp.take_along_axis(M, r[..., None, None].repeat(3, axis=-1), axis=-2)[
        ..., 0, :
    ]
    skew_r = jnp.take_along_axis(w_skew, r[..., None], axis=-1)[..., 0]
    sign_r = jnp.where(skew_r >= 0, 1.0, -1.0)
    signs = jnp.where(row_r >= 0, 1.0, -1.0) * sign_r[..., None]
    axis = axis_abs * signs
    a2 = jnp.sum(axis * axis, axis=-1, keepdims=True)
    a_pos = a2 > 1e-12
    axis = axis / jnp.where(a_pos, jnp.sqrt(jnp.where(a_pos, a2, 1.0)), 1.0)
    w_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian J_l of SO(3): so3_exp(w + dw) ~= so3_exp(J_l dw) so3_exp(w)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta < 1e-5
    st = jnp.where(small, 1.0, theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(st)) / (st * st))
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (st - jnp.sin(st)) / (st ** 3))
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * (W @ W)


def so3_left_jacobian_inv(w: jax.Array) -> jax.Array:
    """Inverse left Jacobian of SO(3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta < 1e-5
    st = jnp.where(small, 1.0, theta)
    half = st / 2.0
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 / (st * st)) - (jnp.cos(half) / (2.0 * st * jnp.sin(half))),
    )
    W = hat(w)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * (W @ W)


# ---------------------------------------------------------------------------
# SE(3) as (R, t) pairs and rpyxyz pose vectors
# ---------------------------------------------------------------------------

def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) o (Rb,tb): first apply b, then a."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def se3_apply(R, t, pts):
    """Transform [..., N, 3] points by (R [...,3,3], t [...,3])."""
    return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def pose_to_matrix(pose: jax.Array) -> jax.Array:
    """rpyxyz [..., 6] -> homogeneous [..., 4, 4]."""
    R = euler_to_rot(pose[..., :3])
    t = pose[..., 3:]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=pose.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_pose(T: jax.Array) -> jax.Array:
    """homogeneous [..., 4, 4] -> rpyxyz [..., 6]."""
    rpy = rot_to_euler(T[..., :3, :3])
    return jnp.concatenate([rpy, T[..., :3, 3]], axis=-1)


def pose_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """rpyxyz composition: returns pose of (A @ B)."""
    Ra, ta = euler_to_rot(a[..., :3]), a[..., 3:]
    Rb, tb = euler_to_rot(b[..., :3]), b[..., 3:]
    R, t = se3_compose(Ra, ta, Rb, tb)
    return jnp.concatenate([rot_to_euler(R), t], axis=-1)


def pose_inverse(a: jax.Array) -> jax.Array:
    R, t = se3_inverse(euler_to_rot(a[..., :3]), a[..., 3:])
    return jnp.concatenate([rot_to_euler(R), t], axis=-1)


def pose_between(a: jax.Array, b: jax.Array) -> jax.Array:
    """Relative pose a^-1 b (gtsam ``Pose3::between`` semantics)."""
    return pose_compose(pose_inverse(a), b)


def pose_apply(pose: jax.Array, pts: jax.Array) -> jax.Array:
    """Transform points [..., N, 3] by rpyxyz pose [..., 6]."""
    return se3_apply(euler_to_rot(pose[..., :3]), pose[..., 3:], pts)


# --- SE(3) tangent-space (for the pose-graph solver) -----------------------
# Tangent layout: [omega (3), v (3)] — rotation first, translation second,
# right-multiplicative update: (R, t) <- (R exp(w), t + R v).


def se3_retract(R, t, xi):
    """Right-multiplicative retraction of tangent xi=[w,v] onto (R, t)."""
    w, v = xi[..., :3], xi[..., 3:]
    dR = so3_exp(w)
    return R @ dR, t + (R @ v[..., None])[..., 0]


def se3_local(Ra, ta, Rb, tb):
    """Inverse of retract: xi such that retract((Ra,ta), xi) == (Rb,tb)."""
    Rt = jnp.swapaxes(Ra, -1, -2)
    w = so3_log(Rt @ Rb)
    v = (Rt @ (tb - ta)[..., None])[..., 0]
    return jnp.concatenate([w, v], axis=-1)
