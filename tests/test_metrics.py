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
