"""Tightly-coupled IMU/LiDAR fusion: a fixed-lag Gauss-Newton smoother.

Replaces the reference's second factor graph
(``/root/reference/src/imuPreintegration.cpp:156-507``): GTSAM ISAM2 over a
chain of (pose, velocity, bias) states with an ImuFactor + bias random-walk
BetweenFactor + lidar-pose PriorFactor per lidar correction, reset every 100
keys. Because every state carries a strong lidar prior, the chain's
information is local; we solve the same factors exactly over a lag-1 window
(previous state marginalized into a 15x15 Gaussian prior via Schur
complement) — one small dense GN per correction, fully jit'd. The reference's
divergence guard (velocity > 30 m/s or bias norm > 1.0 resets the filter,
``imuPreintegration.cpp:438-456``) is preserved as an in-graph flag.

State: (R, p, v, b_acc, b_gyr); tangent [dtheta, dp, dv, dba, dbg] with
R <- R exp(dtheta), p <- p + dp (world frame), linear elsewhere.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from .preintegration import ImuParams, NavState, Preintegrated, predict, residual

_HIGH = jax.lax.Precision.HIGHEST


class FusionParams(NamedTuple):
    imu: ImuParams = ImuParams()
    # sigmas of the lidar pose prior (rot rad x3, trans m x3), reference
    # correctionNoise / correctionNoise2 (imuPreintegration.cpp:222-224)
    correction_rot_sigma: float = 0.05
    correction_trans_sigma: float = 0.1
    degenerate_sigma: float = 1.0
    # initial prior sigmas (imuPreintegration.cpp:219-221)
    init_pose_sigma: float = 1e-2
    init_vel_sigma: float = 1e4
    init_bias_sigma: float = 1e-3
    gn_iters: int = 4
    max_velocity: float = 30.0
    max_bias: float = 1.0


class FusionState(NamedTuple):
    R: jax.Array  # [3, 3]
    p: jax.Array  # [3]
    v: jax.Array  # [3]
    ba: jax.Array  # [3]
    bg: jax.Array  # [3]


class FusionFilter(NamedTuple):
    mean: FusionState
    sqrt_info: jax.Array  # [15, 15] upper-triangular-ish whitening of the prior


def _retract(s: FusionState, xi: jax.Array) -> FusionState:
    return FusionState(
        R=s.R @ se3.so3_exp(xi[0:3]),
        p=s.p + xi[3:6],
        v=s.v + xi[6:9],
        ba=s.ba + xi[9:12],
        bg=s.bg + xi[12:15],
    )


def _local(a: FusionState, b: FusionState) -> jax.Array:
    """xi such that retract(a, xi) ~= b."""
    return jnp.concatenate(
        [se3.so3_log(a.R.T @ b.R), b.p - a.p, b.v - a.v, b.ba - a.ba, b.bg - a.bg]
    )


def init_filter(R0: jax.Array, p0: jax.Array, params: FusionParams) -> FusionFilter:
    """Initialize from the first lidar pose (imuPreintegration.cpp:274-316)."""
    mean = FusionState(
        R=R0, p=p0, v=jnp.zeros(3), ba=jnp.zeros(3), bg=jnp.zeros(3)
    )
    sig = jnp.concatenate(
        [
            jnp.full((6,), params.init_pose_sigma),
            jnp.full((3,), params.init_vel_sigma),
            jnp.full((6,), params.init_bias_sigma),
        ]
    )
    return FusionFilter(mean=mean, sqrt_info=jnp.diag(1.0 / sig))


class FusionStep(NamedTuple):
    filter: FusionFilter
    diverged: jax.Array  # [] bool — caller should re-init when set


@partial(jax.jit, static_argnames=("params",))
def fusion_step(
    filt: FusionFilter,
    preint: Preintegrated,
    lidar_R: jax.Array,
    lidar_p: jax.Array,
    degenerate: jax.Array,
    params: FusionParams = FusionParams(),
) -> FusionStep:
    """One lidar correction: GN over (state_i, state_j), then marginalize i."""
    dtype = filt.mean.p.dtype
    prior_mean = filt.mean
    prior_W = filt.sqrt_info

    # whitening for the IMU factor from the preintegrated covariance
    cov = preint.cov + jnp.eye(9, dtype=dtype) * 1e-10
    L = jnp.linalg.cholesky(cov)
    imu_W = jax.scipy.linalg.solve_triangular(L, jnp.eye(9, dtype=dtype), lower=True)

    # bias random-walk whitening: sigma * sqrt(dt) (imuPreintegration.cpp:372-373)
    sqdt = jnp.sqrt(jnp.maximum(preint.dt, 1e-6))
    rw = jnp.concatenate(
        [
            jnp.full((3,), params.imu.acc_bias_rw),
            jnp.full((3,), params.imu.gyr_bias_rw),
        ]
    ).astype(dtype)
    bias_W = 1.0 / (rw * sqdt)

    corr_sig = jnp.where(
        degenerate,
        jnp.full((6,), params.degenerate_sigma, dtype),
        jnp.concatenate(
            [
                jnp.full((3,), params.correction_rot_sigma),
                jnp.full((3,), params.correction_trans_sigma),
            ]
        ).astype(dtype),
    )
    corr_W = 1.0 / corr_sig

    # initial guess for state_j: IMU propagation from state_i
    guess_nav = predict(
        NavState(R=prior_mean.R, p=prior_mean.p, v=prior_mean.v),
        preint,
        prior_mean.ba,
        prior_mean.bg,
        params.imu,
    )
    state_j0 = FusionState(
        R=guess_nav.R, p=guess_nav.p, v=guess_nav.v, ba=prior_mean.ba, bg=prior_mean.bg
    )

    def residuals(xi, s_i, s_j):
        si = _retract(s_i, xi[0:15])
        sj = _retract(s_j, xi[15:30])
        r_prior = prior_W @ _local(prior_mean, si)
        r_imu = imu_W @ residual(
            NavState(R=si.R, p=si.p, v=si.v),
            NavState(R=sj.R, p=sj.p, v=sj.v),
            si.ba,
            si.bg,
            preint,
            params.imu,
        )
        r_bias = bias_W * jnp.concatenate([sj.ba - si.ba, sj.bg - si.bg])
        r_lidar = corr_W * jnp.concatenate(
            [se3.so3_log(lidar_R.T @ sj.R), sj.p - lidar_p]
        )
        return jnp.concatenate([r_prior, r_imu, r_bias, r_lidar])

    def gn_iter(carry, _):
        s_i, s_j = carry
        zero = jnp.zeros(30, dtype)
        J = jax.jacfwd(residuals)(zero, s_i, s_j)
        r = residuals(zero, s_i, s_j)
        # Column-scaled QR least squares: the normal equations span ~1e16 in
        # conditioning (free-velocity prior vs whitened IMU dp rows) which
        # f32 cannot solve; QR on the scaled Jacobian keeps kappa ~ sqrt of
        # that and converges in one Newton step.
        d = jnp.sqrt(jnp.maximum(jnp.sum(J * J, axis=0), 1e-16))
        Js = J / d[None, :]
        Q, R = jnp.linalg.qr(Js)
        y = jax.scipy.linalg.solve_triangular(
            R + jnp.eye(30, dtype=dtype) * 1e-7, -(Q.T @ r), lower=False
        )
        dx = y / d
        return (_retract(s_i, dx[0:15]), _retract(s_j, dx[15:30])), None

    (s_i, s_j), _ = jax.lax.scan(
        gn_iter, (prior_mean, state_j0), None, length=params.gn_iters
    )

    # Marginalize state_i: Schur complement of the final Hessian, in the
    # same Jacobi-scaled coordinates for f32 robustness.
    zero = jnp.zeros(30, dtype)
    J = jax.jacfwd(residuals)(zero, s_i, s_j)
    H = J.T @ J
    d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-12))
    Hs = H / (d[:, None] * d[None, :]) + jnp.eye(30, dtype=dtype) * 1e-7
    A = Hs[0:15, 0:15]
    B = Hs[0:15, 15:30]
    C = Hs[15:30, 15:30]
    S = C - B.T @ jnp.linalg.solve(A, B)
    S = 0.5 * (S + S.T) + jnp.eye(15, dtype=dtype) * 1e-7
    # unscale: H_marg = D_j^1/2 S D_j^1/2; sqrt info W = chol(S)^T D_j^1/2
    d_j = d[15:30]
    W_new = jnp.linalg.cholesky(S).T * d_j[None, :]

    diverged = (
        (jnp.linalg.norm(s_j.v) > params.max_velocity)
        | (jnp.linalg.norm(s_j.ba) > params.max_bias)
        | (jnp.linalg.norm(s_j.bg) > params.max_bias)
        | ~jnp.all(jnp.isfinite(W_new))
    )
    return FusionStep(filter=FusionFilter(mean=s_j, sqrt_info=W_new), diverged=diverged)


@jax.jit
def predict_poses(
    state: FusionState,
    acc: jax.Array,  # [K, 3]
    gyr: jax.Array,  # [K, 3]
    dts: jax.Array,  # [K]
    mask: jax.Array,  # [K]
    gravity: float = 9.80511,
) -> tuple[jax.Array, jax.Array]:
    """IMU-rate forward integration from `state` (bias-corrected).

    Returns (R [K, 3, 3], p [K, 3]) after each sample — the equivalent of
    the reference's ``odometry/imu_incremental`` stream
    (imuPreintegration.cpp:458-506).
    """
    g = jnp.asarray([0.0, 0.0, -gravity], dtype=state.p.dtype)

    def step(carry, inp):
        R, p, v = carry
        a, w, dt, m = inp
        dt = jnp.where(m, dt, 0.0)
        a_w = R @ (a - state.ba) + g
        p_new = p + v * dt + 0.5 * a_w * dt * dt
        v_new = v + a_w * dt
        R_new = R @ se3.so3_exp((w - state.bg) * dt)
        return (R_new, p_new, v_new), (R_new, p_new)

    _, (Rs, ps) = jax.lax.scan(step, (state.R, state.p, state.v), (acc, gyr, dts, mask))
    return Rs, ps


def predict_poses_parallel(
    state: FusionState,
    acc: jax.Array,  # [K, 3]
    gyr: jax.Array,  # [K, 3]
    dts: jax.Array,  # [K]
    mask: jax.Array,  # [K]
    gravity: float = 9.80511,
) -> tuple[jax.Array, jax.Array]:
    """``predict_poses`` in log-depth parallel form (the in-graph variant).

    The K-step serial recursion factors into (a) a cumulative product of
    per-sample rotation increments (``lax.associative_scan`` over 3x3
    matmuls) and (b) two cumulative sums for velocity/position once the
    world-frame accelerations are known — 2·log2(K) batched rounds instead
    of K sequential tiny steps, matching ``predict_poses`` bit-for-bit up
    to f32 reassociation. Used by the device-resident pipeline to record
    the IMU-rate odometry stream without stalling the frame program."""
    dt = jnp.where(mask, dts, 0.0)
    g = jnp.asarray([0.0, 0.0, -gravity], dtype=state.p.dtype)

    dR_inc = jax.vmap(se3.so3_exp)((gyr - state.bg) * dt[:, None])  # [K,3,3]
    prods = jax.lax.associative_scan(lambda x, y: x @ y, dR_inc)
    Rs = state.R @ prods  # [K, 3, 3] rotation AFTER each sample
    pre_R = jnp.concatenate([state.R[None], Rs[:-1]], axis=0)  # before each

    a_w = jnp.einsum("kij,kj->ki", pre_R, acc - state.ba) + g  # [K, 3]
    dv = a_w * dt[:, None]
    vs = state.v + jnp.cumsum(dv, axis=0)  # velocity AFTER each sample
    pre_v = jnp.concatenate([state.v[None], vs[:-1]], axis=0)
    dp = pre_v * dt[:, None] + 0.5 * a_w * dt[:, None] ** 2
    ps = state.p + jnp.cumsum(dp, axis=0)
    return Rs, ps
