"""IMU-aided motion deskew of a LiDAR scan.

TPU-native equivalent of the reference front-end
(``/root/reference/src/imageProjection.cpp:331-565``): forward-Euler
integration of gyro rates over the scan window produces a rotation
timeline; every point is rotated into the scan-start frame by the linearly
interpolated rotation at its own timestamp. Positional deskew is
intentionally omitted, matching the reference (``findPosition`` body is
disabled, ``imageProjection.cpp:520-534``).

Everything is batched: the integration is a cumulative sum, the per-point
lookup is a vectorized ``searchsorted`` + lerp, and the rotation apply is a
single batched matmul. The reference treats the integrated gyro angles as
roll/pitch/yaw euler angles (R = Rz Ry Rx); we keep those semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3


class ImuRotationTimeline(NamedTuple):
    """Integrated gyro rotation samples over (a window around) one scan."""

    times: jax.Array  # [K] absolute seconds, padded with +inf
    angles: jax.Array  # [K, 3] integrated (rotX, rotY, rotZ)
    count: jax.Array  # [] int32 number of valid samples


def integrate_gyro(
    imu_times: jax.Array, imu_gyro: jax.Array, imu_mask: jax.Array
) -> ImuRotationTimeline:
    """Forward-Euler integrate angular rates into cumulative angles.

    imu_times: [K] seconds (sorted; invalid slots arbitrary).
    imu_gyro: [K, 3] rad/s in the lidar-aligned frame.
    imu_mask: [K] validity.

    Mirrors ``imuDeskewInfo`` (imageProjection.cpp:350-409): angle[0] = 0,
    angle[i] = angle[i-1] + gyro[i] * (t[i] - t[i-1]).
    """
    k = imu_times.shape[0]
    valid = imu_mask
    # dt[i] = t[i] - t[i-1], 0 for the first valid sample and invalid slots.
    dt = jnp.diff(imu_times, prepend=imu_times[:1])
    prev_valid = jnp.concatenate([jnp.zeros((1,), bool), valid[:-1]])
    dt = jnp.where(valid & prev_valid, dt, 0.0)
    increments = imu_gyro * dt[:, None]
    angles = jnp.cumsum(jnp.where(valid[:, None], increments, 0.0), axis=0)
    count = jnp.sum(valid.astype(jnp.int32))
    times = jnp.where(valid, imu_times, jnp.inf)
    return ImuRotationTimeline(times=times, angles=angles, count=count)


def interp_rotation(timeline: ImuRotationTimeline, t: jax.Array) -> jax.Array:
    """Linearly interpolate integrated angles at times t [N] -> [N, 3].

    Matches ``findRotation`` (imageProjection.cpp:493-518): clamp to the
    last sample when t is beyond the timeline, use the front sample when
    before it.
    """
    k = timeline.times.shape[0]
    hi = jnp.searchsorted(timeline.times, t, side="right")
    hi = jnp.clip(hi, 1, jnp.maximum(timeline.count, 1))
    lo = hi - 1
    # when hi exceeds the valid range, both ends clamp to the last sample
    last = jnp.maximum(timeline.count - 1, 0)
    hi = jnp.minimum(hi, last)
    t_lo = timeline.times[lo]
    t_hi = timeline.times[hi]
    denom = jnp.where(hi == lo, 1.0, t_hi - t_lo)
    ratio = jnp.clip((t - t_lo) / jnp.where(denom == 0, 1.0, denom), 0.0, 1.0)
    a_lo = timeline.angles[lo]
    a_hi = timeline.angles[hi]
    return a_lo + (a_hi - a_lo) * ratio[:, None]


def deskew_scan(
    xyz: jax.Array,
    rel_times: jax.Array,
    mask: jax.Array,
    scan_start_time: jax.Array,
    timeline: ImuRotationTimeline,
) -> jax.Array:
    """Rotate every point into the scan-start frame.

    xyz: [N, 3] raw sensor-frame points; rel_times: [N] seconds since scan
    start; returns deskewed [N, 3].

    Equivalent to ``deskewPoint`` (imageProjection.cpp:536-565) with the
    reference frame taken at the scan-start timestamp (the reference uses
    the first *processed* point, whose rel time is ~0 — same frame up to
    sub-sample interpolation).
    """
    t_abs = scan_start_time + rel_times
    angles = interp_rotation(timeline, t_abs)  # [N, 3] euler rpy
    angles0 = interp_rotation(timeline, scan_start_time[None])  # [1, 3]
    R_pt = se3.euler_to_rot(angles)  # [N, 3, 3]
    R0 = se3.euler_to_rot(angles0[0])  # [3, 3]
    # p_start = R0^T R_pt p
    rotated = jnp.einsum("nij,nj->ni", R_pt, xyz)
    out = rotated @ R0  # == R0^T applied to rows
    return jnp.where(mask[:, None], out, xyz)
