import jax
import jax.numpy as jnp
import numpy as np

from liorf_tpu.core import se3
from liorf_tpu.imu import fusion, preintegration
from liorf_tpu.imu.preintegration import ImuParams, NavState


PARAMS = ImuParams()
G = jnp.asarray([0.0, 0.0, -PARAMS.gravity])


def simulate_imu(n, dt, traj_fn, rng=None, noise=0.0):
    """Generate perfect IMU measurements for a trajectory R(t), p(t).

    acc_meas = R^T (a_world - g_world); gyr_meas = body rates.
    Uses numeric differentiation at high precision.
    """
    ts = np.arange(n + 1) * dt
    Rs, ps = [], []
    for t in ts:
        R, p = traj_fn(t)
        Rs.append(R)
        ps.append(p)
    Rs, ps = np.stack(Rs), np.stack(ps)
    acc_w = np.gradient(np.gradient(ps, dt, axis=0), dt, axis=0)
    gyr, acc = [], []
    for i in range(n):
        dRot = Rs[i].T @ Rs[i + 1]
        w = np.asarray(se3.so3_log(jnp.asarray(dRot, jnp.float32))) / dt
        gyr.append(w)
        acc.append(Rs[i].T @ (acc_w[i] - np.array([0, 0, -PARAMS.gravity])))
    out_gyr, out_acc = np.stack(gyr), np.stack(acc)
    if noise and rng is not None:
        out_gyr = out_gyr + rng.normal(scale=noise, size=out_gyr.shape)
        out_acc = out_acc + rng.normal(scale=noise, size=out_acc.shape)
    return (
        jnp.asarray(out_acc, jnp.float32),
        jnp.asarray(out_gyr, jnp.float32),
        Rs,
        ps,
    )


def circle_traj(t):
    """Constant-speed circle with yaw following the tangent."""
    w = 0.5  # rad/s
    r = 4.0
    yaw = w * t
    R = np.asarray(se3.euler_to_rot(jnp.asarray([0.0, 0.0, yaw], jnp.float32)))
    p = np.array([r * np.sin(yaw), r * (1 - np.cos(yaw)), 0.0])
    return R, p


def test_preintegration_matches_direct_integration():
    n, dt = 64, 0.005
    acc, gyr, Rs, ps = simulate_imu(n, dt, circle_traj)
    dts = jnp.full((n,), dt, jnp.float32)
    pre = preintegration.preintegrate(
        acc, gyr, dts, jnp.ones(n, bool), jnp.zeros(3), jnp.zeros(3), PARAMS
    )
    # initial velocity of the circle trajectory
    v0 = (ps[1] - ps[0]) / dt
    state0 = NavState(
        R=jnp.asarray(Rs[0], jnp.float32),
        p=jnp.asarray(ps[0], jnp.float32),
        v=jnp.asarray(v0, jnp.float32),
    )
    out = preintegration.predict(state0, pre, jnp.zeros(3), jnp.zeros(3), PARAMS)
    np.testing.assert_allclose(np.asarray(out.p), ps[n], atol=2e-2)
    np.testing.assert_allclose(np.asarray(out.R), Rs[n], atol=1e-3)


def test_preintegration_mask():
    n = 32
    acc = jnp.tile(jnp.asarray([[0.0, 0.0, PARAMS.gravity]]), (n, 1))
    gyr = jnp.zeros((n, 3))
    dts = jnp.full((n,), 0.01)
    mask = jnp.arange(n) < 16
    pre = preintegration.preintegrate(
        acc, gyr, dts, mask, jnp.zeros(3), jnp.zeros(3), PARAMS
    )
    np.testing.assert_allclose(float(pre.dt), 0.16, atol=1e-6)


def test_residual_zero_on_truth():
    n, dt = 64, 0.005
    acc, gyr, Rs, ps = simulate_imu(n, dt, circle_traj)
    dts = jnp.full((n,), dt, jnp.float32)
    pre = preintegration.preintegrate(
        acc, gyr, dts, jnp.ones(n, bool), jnp.zeros(3), jnp.zeros(3), PARAMS
    )
    v0 = (ps[1] - ps[0]) / dt
    vn = (ps[n] - ps[n - 1]) / dt
    si = NavState(
        R=jnp.asarray(Rs[0], jnp.float32),
        p=jnp.asarray(ps[0], jnp.float32),
        v=jnp.asarray(v0, jnp.float32),
    )
    sj = NavState(
        R=jnp.asarray(Rs[n], jnp.float32),
        p=jnp.asarray(ps[n], jnp.float32),
        v=jnp.asarray(vn, jnp.float32),
    )
    r = preintegration.residual(si, sj, jnp.zeros(3), jnp.zeros(3), pre, PARAMS)
    assert np.abs(np.asarray(r)).max() < 5e-2


def test_bias_jacobian_first_order():
    n, dt = 32, 0.005
    acc, gyr, _, _ = simulate_imu(n, dt, circle_traj)
    dts = jnp.full((n,), dt, jnp.float32)
    db = jnp.asarray([0.01, -0.02, 0.015])
    pre0 = preintegration.preintegrate(
        acc, gyr, dts, jnp.ones(n, bool), jnp.zeros(3), jnp.zeros(3), PARAMS
    )
    pre1 = preintegration.preintegrate(
        acc, gyr, dts, jnp.ones(n, bool), db, db, PARAMS
    )
    # corrected deltas at bias db from pre0 should match pre1's raw deltas
    dR, dv, dp = preintegration.bias_corrected_deltas(pre0, db, db)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(pre1.dv), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dp), np.asarray(pre1.dp), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dR), np.asarray(pre1.dR), atol=2e-4)


def test_fusion_tracks_and_estimates_bias(rng):
    """Feed fusion a biased-gyro IMU stream + perfect lidar poses; it should
    track the trajectory and recover the bias."""
    fp = fusion.FusionParams()
    n_steps, imu_per_step, dt = 60, 20, 0.005
    true_bg = np.array([0.004, -0.002, 0.005], np.float32)

    total = n_steps * imu_per_step
    acc, gyr, Rs, ps = simulate_imu(total, dt, circle_traj, rng=rng, noise=1e-4)
    gyr_meas = gyr + jnp.asarray(true_bg)

    filt = fusion.init_filter(
        jnp.asarray(Rs[0], jnp.float32), jnp.asarray(ps[0], jnp.float32), fp
    )
    dts = jnp.full((imu_per_step,), dt, jnp.float32)
    for k in range(n_steps):
        s = slice(k * imu_per_step, (k + 1) * imu_per_step)
        pre = preintegration.preintegrate(
            acc[s], gyr_meas[s], dts, jnp.ones(imu_per_step, bool),
            filt.mean.ba, filt.mean.bg, fp.imu,
        )
        step = fusion.fusion_step(
            filt, pre,
            jnp.asarray(Rs[(k + 1) * imu_per_step], jnp.float32),
            jnp.asarray(ps[(k + 1) * imu_per_step], jnp.float32),
            jnp.asarray(False),
            fp,
        )
        assert not bool(step.diverged), f"diverged at step {k}"
        filt = step.filter

    end = n_steps * imu_per_step
    np.testing.assert_allclose(np.asarray(filt.mean.p), ps[end], atol=0.1)
    v_true = (ps[end] - ps[end - 1]) / dt
    np.testing.assert_allclose(np.asarray(filt.mean.v), v_true, atol=0.2)
    # Gyro-bias convergence is slow by construction (the tight 1e-3 prior —
    # reference priorBiasNoise — dominates the weak per-step observability);
    # assert the estimate moves in the right direction with real magnitude.
    bg = np.asarray(filt.mean.bg)
    frac = float(bg @ true_bg / (true_bg @ true_bg))
    assert 0.1 < frac < 1.5, f"bias fraction {frac}, bg={bg}"
    cos = float(bg @ true_bg / (np.linalg.norm(bg) * np.linalg.norm(true_bg) + 1e-12))
    assert cos > 0.7, f"bias direction cos {cos}"


def test_fusion_divergence_flag(rng):
    fp = fusion.FusionParams()
    filt = fusion.init_filter(jnp.eye(3), jnp.zeros(3), fp)
    n = 16
    # absurd accelerations -> runaway velocity against a e lidar prior far away
    acc = jnp.full((n, 3), 500.0)
    gyr = jnp.zeros((n, 3))
    dts = jnp.full((n,), 0.05)
    pre = preintegration.preintegrate(
        acc, gyr, dts, jnp.ones(n, bool), filt.mean.ba, filt.mean.bg, fp.imu
    )
    step = fusion.fusion_step(
        filt, pre, jnp.eye(3), jnp.zeros(3) + 1000.0, jnp.asarray(False), fp
    )
    assert bool(step.diverged)


def test_predict_poses_gravity_cancel():
    st = fusion.FusionState(
        R=jnp.eye(3), p=jnp.zeros(3), v=jnp.asarray([1.0, 0.0, 0.0]),
        ba=jnp.zeros(3), bg=jnp.zeros(3),
    )
    n = 10
    acc = jnp.tile(jnp.asarray([[0.0, 0.0, PARAMS.gravity]]), (n, 1))
    gyr = jnp.zeros((n, 3))
    dts = jnp.full((n,), 0.01)
    Rs, ps = fusion.predict_poses(st, acc, gyr, dts, jnp.ones(n, bool))
    np.testing.assert_allclose(np.asarray(ps)[-1], [0.1, 0.0, 0.0], atol=1e-5)


def test_parallel_preintegration_matches_sequential(rng):
    """The associative-scan preintegration must reproduce the sequential
    Forster recursion (deltas, bias Jacobians, covariance) on masked
    windows of every shape."""
    for K, n_valid in [(64, 64), (64, 37), (64, 1), (8, 5), (1, 1)]:
        acc = rng.normal(0.0, 0.5, (K, 3)).astype(np.float32) + np.array(
            [0.1, -0.2, 9.8], np.float32
        )
        gyr = rng.normal(0.0, 0.3, (K, 3)).astype(np.float32)
        dts = rng.uniform(0.002, 0.01, K).astype(np.float32)
        dts[0] = 0.0  # valid dt=0 sample (duplicate IMU timestamps in bags)
        mask = np.arange(K) < n_valid
        ba = np.array([0.02, -0.01, 0.03], np.float32)
        bg = np.array([-0.004, 0.002, 0.001], np.float32)
        p = ImuParams()
        par = preintegration.preintegrate(acc, gyr, dts, mask, ba, bg, p)
        seq = preintegration.preintegrate_sequential(acc, gyr, dts, mask, ba, bg, p)
        for name in par._fields:
            a, b = getattr(par, name), getattr(seq, name)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6,
                err_msg=f"{name} mismatch at K={K} n={n_valid}",
            )


def test_parallel_predict_poses_matches_sequential(rng):
    """predict_poses_parallel (associative-scan form used by the resident
    pipeline's IMU-rate ring) must reproduce the sequential integrator on
    masked windows, including a biased state and nonzero velocity."""
    for K, n_valid in [(64, 64), (64, 23), (16, 1), (4, 0)]:
        st = fusion.FusionState(
            R=jnp.asarray(
                np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
            ),
            p=jnp.asarray(rng.normal(size=3).astype(np.float32)),
            v=jnp.asarray(rng.normal(size=3).astype(np.float32)),
            ba=jnp.asarray([0.02, -0.01, 0.03], jnp.float32),
            bg=jnp.asarray([-0.004, 0.002, 0.001], jnp.float32),
        )
        acc = rng.normal(0.0, 0.5, (K, 3)).astype(np.float32) + np.array(
            [0.1, -0.2, 9.8], np.float32
        )
        gyr = rng.normal(0.0, 0.3, (K, 3)).astype(np.float32)
        dts = rng.uniform(0.002, 0.01, K).astype(np.float32)
        mask = np.arange(K) < n_valid
        Rs_s, ps_s = fusion.predict_poses(st, acc, gyr, dts, mask)
        Rs_p, ps_p = fusion.predict_poses_parallel(st, acc, gyr, dts, mask)
        np.testing.assert_allclose(
            np.asarray(Rs_p), np.asarray(Rs_s), rtol=1e-5, atol=1e-5,
            err_msg=f"R mismatch at K={K} n={n_valid}",
        )
        np.testing.assert_allclose(
            np.asarray(ps_p), np.asarray(ps_s), rtol=1e-4, atol=1e-5,
            err_msg=f"p mismatch at K={K} n={n_valid}",
        )
