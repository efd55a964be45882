import numpy as np

from liorf_tpu.eval import metrics


def test_umeyama_recovers_transform(rng):
    src = rng.normal(size=(100, 3))
    ang = 0.7
    R_true = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
    )
    t_true = np.array([5.0, -2.0, 1.0])
    dst = src @ R_true.T + t_true
    R, t, s = metrics.umeyama_alignment(src, dst)
    np.testing.assert_allclose(R, R_true, atol=1e-8)
    np.testing.assert_allclose(t, t_true, atol=1e-8)
    assert s == 1.0


def test_ate_zero_after_alignment(rng):
    traj = np.cumsum(rng.normal(size=(200, 3)), axis=0)
    rotated = traj @ np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]]).T + 7.0
    assert metrics.ate_rmse(rotated, traj) < 1e-8
    assert metrics.ate_rmse(rotated, traj, align=False) > 1.0


def test_rpe_detects_scale_drift(rng):
    gt = np.cumsum(np.tile([1.0, 0, 0], (100, 1)), axis=0)
    est = gt * 1.1
    assert metrics.rpe_rmse(est, gt, delta=10) > 0.5
    assert metrics.rpe_rmse(gt, gt, delta=10) == 0.0


def _yaw_quat(deg):
    a = np.radians(deg) / 2
    return np.array([np.cos(a), 0.0, 0.0, np.sin(a)])


def test_rpe_se3_golden_direction_change():
    """Hand-computable golden pair (evo trans_part semantics): equal step
    LENGTHS in different DIRECTIONS must score ||Δest−Δgt||, not zero (the
    step-length-difference metric VERDICT r2 flagged scored this 0)."""
    gt = np.array([[0.0, 0, 0], [1.0, 0, 0]])
    est = np.array([[0.0, 0, 0], [0.0, 1, 0]])
    iq = np.tile([1.0, 0, 0, 0], (2, 1))
    t_rmse, r_rmse = metrics.rpe_se3(est, iq, gt, iq, delta=1)
    np.testing.assert_allclose(t_rmse, np.sqrt(2.0), atol=1e-12)
    np.testing.assert_allclose(r_rmse, 0.0, atol=1e-9)


def test_rpe_se3_golden_rotation_only():
    """Same world positions, but the estimate's frame-local step hides a
    90 deg relative yaw error: E = Q_rel^-1 P_rel = (yaw -90, t=0)."""
    gt_xyz = np.array([[0.0, 0, 0], [1.0, 0, 0]])
    gt_q = np.stack([_yaw_quat(0), _yaw_quat(90)])
    est_xyz = np.array([[0.0, 0, 0], [0.0, 1, 0]])
    est_q = np.stack([_yaw_quat(90), _yaw_quat(90)])
    t_rmse, r_rmse = metrics.rpe_se3(est_xyz, est_q, gt_xyz, gt_q, delta=1)
    np.testing.assert_allclose(t_rmse, 0.0, atol=1e-9)
    np.testing.assert_allclose(r_rmse, 90.0, atol=1e-9)


def test_rpe_se3_matches_matrix_reference(rng):
    """rpe_se3's vectorized form == the literal evo definition computed
    with explicit 4x4 matrices pair by pair."""
    from liorf_tpu.core.se3np import quat_wxyz_to_rot, rot_to_quat_wxyz

    n, delta = 40, 5
    def random_traj():
        xyz = np.cumsum(rng.normal(size=(n, 3)), axis=0)
        axes = rng.normal(size=(n, 3))
        Rs = []
        for a in axes:
            a = a / np.linalg.norm(a) * rng.uniform(0, 0.6)
            th = np.linalg.norm(a)
            K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
            Rs.append(
                np.eye(3)
                + (np.sin(th) / th if th > 1e-9 else 1.0) * K
                + ((1 - np.cos(th)) / th**2 if th > 1e-9 else 0.5) * K @ K
            )
        return xyz, np.asarray(Rs)

    est_xyz, est_R = random_traj()
    gt_xyz, gt_R = random_traj()

    def T(R, t):
        M = np.eye(4)
        M[:3, :3], M[:3, 3] = R, t
        return M

    terrs, rerrs = [], []
    for i in range(n - delta):
        P = np.linalg.inv(T(est_R[i], est_xyz[i])) @ T(est_R[i + delta], est_xyz[i + delta])
        Q = np.linalg.inv(T(gt_R[i], gt_xyz[i])) @ T(gt_R[i + delta], gt_xyz[i + delta])
        E = np.linalg.inv(Q) @ P
        terrs.append(np.linalg.norm(E[:3, 3]))
        ang = np.degrees(
            np.arccos(np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1))
        )
        rerrs.append(ang)
    t_ref = np.sqrt(np.mean(np.square(terrs)))
    r_ref = np.sqrt(np.mean(np.square(rerrs)))
    t_got, r_got = metrics.rpe_se3(
        est_xyz, rot_to_quat_wxyz(est_R), gt_xyz, rot_to_quat_wxyz(gt_R), delta
    )
    np.testing.assert_allclose(t_got, t_ref, rtol=1e-9)
    np.testing.assert_allclose(r_got, r_ref, rtol=1e-9)
    # and the quat->rot helper inverts rot->quat
    np.testing.assert_allclose(
        quat_wxyz_to_rot(rot_to_quat_wxyz(est_R)), est_R, atol=1e-12
    )


def test_ate_rot_rmse_golden():
    xyz = np.cumsum(np.tile([1.0, 0, 0], (10, 1)), axis=0)
    gt_q = np.tile([1.0, 0, 0, 0], (10, 1))
    est_q = np.tile(_yaw_quat(10.0), (10, 1))
    got = metrics.ate_rot_rmse_deg(xyz, est_q, xyz, gt_q, align=False)
    np.testing.assert_allclose(got, 10.0, atol=1e-9)


def test_associate_timestamps():
    t_est = np.array([0.00, 0.10, 0.20, 0.35])
    t_gt = np.array([0.01, 0.11, 0.19, 0.50])
    ia, ib = metrics.associate(t_est, t_gt, max_diff=0.02)
    np.testing.assert_array_equal(ia, [0, 1, 2])
    np.testing.assert_array_equal(ib, [0, 1, 2])
    # uniqueness: two est stamps competing for one gt stamp -> closer wins
    ia, ib = metrics.associate(
        np.array([0.0, 0.011]), np.array([0.01]), max_diff=0.02
    )
    np.testing.assert_array_equal(ia, [1])
    np.testing.assert_array_equal(ib, [0])


def test_tum_roundtrip(tmp_path, rng):
    times = np.arange(10) * 0.1
    xyz = rng.normal(size=(10, 3))
    quat = np.tile([1.0, 0, 0, 0], (10, 1))
    p = str(tmp_path / "traj.txt")
    metrics.save_tum(p, times, xyz, quat)
    t2, x2, q2 = metrics.load_tum(p)
    np.testing.assert_allclose(t2, times, atol=1e-6)
    np.testing.assert_allclose(x2, xyz, atol=1e-6)
    np.testing.assert_allclose(q2, quat, atol=1e-6)
