"""On-manifold IMU preintegration (Forster et al., TRO 2017).

From-scratch TPU-native replacement for GTSAM's
``PreintegratedImuMeasurements`` used by the reference
(``/root/reference/src/imuPreintegration.cpp:176-177,214-228,359-375``):
Delta-R/v/p accumulation, first-order bias Jacobians, and 9x9 covariance
propagation, all inside one ``lax.scan`` over a fixed-capacity masked
window of IMU samples.

Conventions: gravity acts in -z with magnitude ``imuGravity``
(``MakeSharedU``, imuPreintegration.cpp:213); acc/gyro samples are already
rotated into the lidar-aligned frame (``imuConverter``, utility.h:257-290).
Tangent ordering for the covariance: [dtheta, dv, dp].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3


class ImuParams(NamedTuple):
    acc_noise: float = 3.9939570888238808e-03  # continuous sigma [m/s^2/sqrt(Hz)]
    gyr_noise: float = 1.5636343949698187e-03  # [rad/s/sqrt(Hz)]
    acc_bias_rw: float = 6.4356659353532566e-05  # bias random walk sigma
    gyr_bias_rw: float = 3.5640318696367613e-05
    int_noise: float = 1e-4  # integration position noise (imuPreintegration.cpp:216)
    gravity: float = 9.80511


class Preintegrated(NamedTuple):
    dR: jax.Array  # [3, 3]
    dv: jax.Array  # [3]
    dp: jax.Array  # [3]
    dt: jax.Array  # [] total time
    # first-order bias Jacobians (linearized at bias_lin)
    dR_dbg: jax.Array  # [3, 3]
    dv_dba: jax.Array  # [3, 3]
    dv_dbg: jax.Array  # [3, 3]
    dp_dba: jax.Array  # [3, 3]
    dp_dbg: jax.Array  # [3, 3]
    cov: jax.Array  # [9, 9] on [dtheta, dv, dp]
    bias_acc_lin: jax.Array  # [3] linearization point
    bias_gyr_lin: jax.Array  # [3]


def _so3_right_jacobian(w: jax.Array) -> jax.Array:
    """Right Jacobian Jr(w) = Jl(-w)."""
    return se3.so3_left_jacobian(-w)


def preintegrate(
    acc: jax.Array,  # [K, 3]
    gyr: jax.Array,  # [K, 3]
    dts: jax.Array,  # [K] per-sample integration interval
    mask: jax.Array,  # [K]
    bias_acc: jax.Array,  # [3]
    bias_gyr: jax.Array,  # [3]
    params: ImuParams,
) -> Preintegrated:
    """Integrate a masked window of IMU samples into a Preintegrated NamedTuple."""
    dtype = acc.dtype
    eye = jnp.eye(3, dtype=dtype)
    zero3 = jnp.zeros((3, 3), dtype=dtype)

    sg2 = params.gyr_noise**2
    sa2 = params.acc_noise**2
    si2 = params.int_noise**2

    def step(carry, inp):
        a, w, dt, m = inp
        dR, dv, dp, T, dR_dbg, dv_dba, dv_dbg, dp_dba, dp_dbg, cov = carry
        a = a - bias_acc
        w = w - bias_gyr
        dt = jnp.where(m, dt, 0.0)

        dR_inc = se3.so3_exp(w * dt)
        Jr = _so3_right_jacobian(w * dt)
        a_hat = se3.hat(a)
        Ra = dR @ a  # acceleration rotated into the start frame

        # covariance propagation BEFORE state update (uses pre-update dR)
        A = jnp.zeros((9, 9), dtype=dtype)
        A = A.at[0:3, 0:3].set(dR_inc.T)
        A = A.at[3:6, 0:3].set(-(dR @ a_hat) * dt)
        A = A.at[3:6, 3:6].set(eye)
        A = A.at[6:9, 0:3].set(-0.5 * (dR @ a_hat) * dt * dt)
        A = A.at[6:9, 3:6].set(eye * dt)
        A = A.at[6:9, 6:9].set(eye)
        B = jnp.zeros((9, 6), dtype=dtype)
        B = B.at[0:3, 0:3].set(Jr * dt)
        B = B.at[3:6, 3:6].set(dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * dR * dt * dt)
        safe_dt = jnp.where(dt > 0, dt, 1.0)
        noise = jnp.concatenate(
            [jnp.full((3,), sg2 / safe_dt), jnp.full((3,), sa2 / safe_dt)]
        ).astype(dtype)
        cov_new = A @ cov @ A.T + (B * noise[None, :]) @ B.T
        cov_new = cov_new.at[6:9, 6:9].add(eye * si2 * safe_dt)

        # bias Jacobians (Forster eqs. around (70))
        dp_dba_new = dp_dba + dv_dba * dt - 0.5 * dR * dt * dt
        dp_dbg_new = dp_dbg + dv_dbg * dt - 0.5 * (dR @ a_hat) @ dR_dbg * dt * dt
        dv_dba_new = dv_dba - dR * dt
        dv_dbg_new = dv_dbg - (dR @ a_hat) @ dR_dbg * dt
        dR_dbg_new = dR_inc.T @ dR_dbg - Jr * dt

        # state update
        dp_new = dp + dv * dt + 0.5 * Ra * dt * dt
        dv_new = dv + Ra * dt
        dR_new = dR @ dR_inc

        new = (
            dR_new, dv_new, dp_new, T + dt,
            dR_dbg_new, dv_dba_new, dv_dbg_new, dp_dba_new, dp_dbg_new, cov_new,
        )
        old = (dR, dv, dp, T, dR_dbg, dv_dba, dv_dbg, dp_dba, dp_dbg, cov)
        out = jax.tree_util.tree_map(lambda n, o: jnp.where(m, n, o), new, old)
        return out, None

    init = (
        eye, jnp.zeros(3, dtype), jnp.zeros(3, dtype), jnp.zeros((), dtype),
        zero3, zero3, zero3, zero3, zero3, jnp.zeros((9, 9), dtype),
    )
    (dR, dv, dp, T, dR_dbg, dv_dba, dv_dbg, dp_dba, dp_dbg, cov), _ = jax.lax.scan(
        step, init, (acc, gyr, dts, mask)
    )
    return Preintegrated(
        dR=dR, dv=dv, dp=dp, dt=T,
        dR_dbg=dR_dbg, dv_dba=dv_dba, dv_dbg=dv_dbg, dp_dba=dp_dba, dp_dbg=dp_dbg,
        cov=cov, bias_acc_lin=bias_acc, bias_gyr_lin=bias_gyr,
    )


class NavState(NamedTuple):
    R: jax.Array  # [3, 3] body -> world
    p: jax.Array  # [3]
    v: jax.Array  # [3]


def bias_corrected_deltas(preint: Preintegrated, bias_acc, bias_gyr):
    """First-order bias-corrected (dR, dv, dp)."""
    dba = bias_acc - preint.bias_acc_lin
    dbg = bias_gyr - preint.bias_gyr_lin
    dR = preint.dR @ se3.so3_exp(preint.dR_dbg @ dbg)
    dv = preint.dv + preint.dv_dba @ dba + preint.dv_dbg @ dbg
    dp = preint.dp + preint.dp_dba @ dba + preint.dp_dbg @ dbg
    return dR, dv, dp


def predict(
    state: NavState, preint: Preintegrated, bias_acc, bias_gyr, params: ImuParams
) -> NavState:
    """Propagate a NavState through the preintegrated window
    (GTSAM ``PreintegratedImuMeasurements::predict`` semantics)."""
    g = jnp.asarray([0.0, 0.0, -params.gravity], dtype=state.p.dtype)
    dR, dv, dp = bias_corrected_deltas(preint, bias_acc, bias_gyr)
    T = preint.dt
    p = state.p + state.v * T + 0.5 * g * T * T + state.R @ dp
    v = state.v + g * T + state.R @ dv
    R = state.R @ dR
    return NavState(R=R, p=p, v=v)


def residual(
    state_i: NavState,
    state_j: NavState,
    bias_acc,
    bias_gyr,
    preint: Preintegrated,
    params: ImuParams,
) -> jax.Array:
    """15->9 IMU factor residual [r_theta, r_v, r_p] (Forster eq. 45)."""
    g = jnp.asarray([0.0, 0.0, -params.gravity], dtype=state_i.p.dtype)
    dR, dv, dp = bias_corrected_deltas(preint, bias_acc, bias_gyr)
    T = preint.dt
    Ri_T = state_i.R.T
    r_R = se3.so3_log(dR.T @ (Ri_T @ state_j.R))
    r_v = Ri_T @ (state_j.v - state_i.v - g * T) - dv
    r_p = Ri_T @ (state_j.p - state_i.p - state_i.v * T - 0.5 * g * T * T) - dp
    return jnp.concatenate([r_R, r_v, r_p])
