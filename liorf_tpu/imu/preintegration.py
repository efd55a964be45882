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
    """Integrate a masked window of IMU samples (log-depth parallel form).

    Preintegration is a monoid: two preintegrated segments A (earlier) and
    B (later) compose as

        dR = dR_A dR_B,  dv = dv_A + dR_A dv_B,
        dp = dp_A + dv_A T_B + dR_A dp_B,  T = T_A + T_B,

    with the first-order bias Jacobians and the covariance recursion
    (e' = A e + n) composing associatively alongside. That turns the
    K-step serial ``lax.scan`` into ``lax.associative_scan`` — log2(K)
    rounds of batched 3x3/9x9 matmuls, the natural TPU formulation (the
    sequential form ``preintegrate_sequential`` is kept as the test
    oracle). Masked samples are the monoid identity."""
    dtype = acc.dtype
    K = acc.shape[0]
    eye = jnp.eye(3, dtype=dtype)
    sg2 = params.gyr_noise**2
    sa2 = params.acc_noise**2
    si2 = params.int_noise**2

    a = acc - bias_acc
    w = gyr - bias_gyr
    dt = jnp.where(mask, dts, 0.0)
    wdt = w * dt[:, None]
    dR_inc = jax.vmap(se3.so3_exp)(wdt)  # [K, 3, 3]
    Jr = jax.vmap(_so3_right_jacobian)(wdt)

    # pass 1: accumulated rotation BEFORE each step (exclusive prefix)
    prods = jax.lax.associative_scan(lambda x, y: x @ y, dR_inc)
    pre_R = jnp.concatenate([eye[None], prods[:-1]], axis=0)  # [K, 3, 3]

    # --- per-step (leaf) segments, local frame ---
    dtc = dt[:, None]
    dv_l = a * dtc
    dp_l = 0.5 * a * dtc * dtc
    dR_dbg_l = -Jr * dtc[..., None]
    dv_dba_l = -eye[None] * dtc[..., None]
    dv_dbg_l = jnp.zeros((K, 3, 3), dtype)
    dp_dba_l = -0.5 * eye[None] * (dtc * dtc)[..., None]
    dp_dbg_l = jnp.zeros((K, 3, 3), dtype)

    # covariance leaves use the accumulated pre-step rotation (exactly the
    # sequential A_i/B_i); masked steps are (A=I, Q=0)
    Ra_hat = jnp.einsum("kij,kjl->kil", pre_R, jax.vmap(se3.hat)(a))  # [K,3,3]
    A = jnp.zeros((K, 9, 9), dtype)
    A = A.at[:, 0:3, 0:3].set(jnp.swapaxes(dR_inc, -1, -2))
    A = A.at[:, 3:6, 0:3].set(-Ra_hat * dtc[..., None])
    A = A.at[:, 3:6, 3:6].set(eye[None])
    A = A.at[:, 6:9, 0:3].set(-0.5 * Ra_hat * (dtc * dtc)[..., None])
    A = A.at[:, 6:9, 3:6].set(eye[None] * dtc[..., None])
    A = A.at[:, 6:9, 6:9].set(eye[None])
    B = jnp.zeros((K, 9, 6), dtype)
    B = B.at[:, 0:3, 0:3].set(Jr * dtc[..., None])
    B = B.at[:, 3:6, 3:6].set(pre_R * dtc[..., None])
    B = B.at[:, 6:9, 3:6].set(0.5 * pre_R * (dtc * dtc)[..., None])
    safe_dt = jnp.where(dt > 0, dt, 1.0)
    noise = jnp.concatenate(
        [
            jnp.broadcast_to((sg2 / safe_dt)[:, None], (K, 3)),
            jnp.broadcast_to((sa2 / safe_dt)[:, None], (K, 3)),
        ],
        axis=-1,
    ).astype(dtype)
    Q = jnp.einsum("kij,klj->kil", B * noise[:, None, :], B)
    Q = Q.at[:, 6:9, 6:9].add(eye[None] * (si2 * dt)[:, None, None])

    def compose(L, R):
        (dR_a, dv_a, dp_a, T_a, dRbg_a, dvba_a, dvbg_a, dpba_a, dpbg_a, A_a, Q_a) = L
        (dR_b, dv_b, dp_b, T_b, dRbg_b, dvba_b, dvbg_b, dpba_b, dpbg_b, A_b, Q_b) = R
        Tb = T_b[..., None]
        dR = dR_a @ dR_b
        dv = dv_a + jnp.einsum("...ij,...j->...i", dR_a, dv_b)
        dp = dp_a + dv_a * Tb + jnp.einsum("...ij,...j->...i", dR_a, dp_b)
        hat_dv_b = jax.vmap(se3.hat)(dv_b) if dv_b.ndim == 2 else se3.hat(dv_b)
        hat_dp_b = jax.vmap(se3.hat)(dp_b) if dp_b.ndim == 2 else se3.hat(dp_b)
        dRbg = jnp.swapaxes(dR_b, -1, -2) @ dRbg_a + dRbg_b
        dvba = dvba_a + dR_a @ dvba_b
        dvbg = dvbg_a + dR_a @ dvbg_b - dR_a @ hat_dv_b @ dRbg_a
        dpba = dpba_a + dvba_a * Tb[..., None] + dR_a @ dpba_b
        dpbg = dpbg_a + dvbg_a * Tb[..., None] + dR_a @ dpbg_b - dR_a @ hat_dp_b @ dRbg_a
        A_ = A_b @ A_a
        Q_ = A_b @ Q_a @ jnp.swapaxes(A_b, -1, -2) + Q_b
        return (dR, dv, dp, T_a + T_b, dRbg, dvba, dvbg, dpba, dpbg, A_, Q_)

    leaves = (
        dR_inc, dv_l, dp_l, dt,
        dR_dbg_l, dv_dba_l, dv_dbg_l, dp_dba_l, dp_dbg_l, A, Q,
    )
    acc_all = jax.lax.associative_scan(compose, leaves)
    (dR, dv, dp, T, dR_dbg, dv_dba, dv_dbg, dp_dba, dp_dbg, _, cov) = (
        jax.tree_util.tree_map(lambda x: x[-1], acc_all)
    )
    return Preintegrated(
        dR=dR, dv=dv, dp=dp, dt=T,
        dR_dbg=dR_dbg, dv_dba=dv_dba, dv_dbg=dv_dbg, dp_dba=dp_dba, dp_dbg=dp_dbg,
        cov=cov, bias_acc_lin=bias_acc, bias_gyr_lin=bias_gyr,
    )


def preintegrate_sequential(
    acc: jax.Array,  # [K, 3]
    gyr: jax.Array,  # [K, 3]
    dts: jax.Array,  # [K] per-sample integration interval
    mask: jax.Array,  # [K]
    bias_acc: jax.Array,  # [3]
    bias_gyr: jax.Array,  # [3]
    params: ImuParams,
) -> Preintegrated:
    """Sequential (lax.scan) preintegration — the direct transcription of
    the Forster recursions; kept as the oracle for the parallel form."""
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
        # si2 * dt (NOT safe_dt): a valid sample with dt == 0 (duplicate
        # IMU timestamps happen in real bags) integrates nothing and must
        # inject no noise — keeps exact parity with the parallel form
        cov_new = cov_new.at[6:9, 6:9].add(eye * si2 * dt)

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
