"""Trajectory evaluation: ATE / RPE with Umeyama alignment, TUM-format I/O.

The reference validates with the external `evo` toolchain on TUM-format
trajectories (``/root/reference/README.md`` demo plots, ``demo/*_ape.png``);
this module makes those metrics built-in so benchmark tables are
reproducible without ROS. Conventions follow evo: ATE = RMSE of translation
after SE(3) (or Sim(3)-without-scale) alignment; RPE = RMSE of relative pose
deltas over a fixed frame step.
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """Least-squares rigid alignment src -> dst: returns (R, t, s).

    src/dst: [N, 3]. Umeyama (1991); scale fixed at 1 unless with_scale.
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs**2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


def ate_rmse(est_xyz: np.ndarray, gt_xyz: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error (RMSE of translation), evo-style."""
    assert est_xyz.shape == gt_xyz.shape
    if align:
        R, t, s = umeyama_alignment(est_xyz, gt_xyz)
        est_xyz = est_xyz @ (s * R).T + t
    d = est_xyz - gt_xyz
    return float(np.sqrt((d**2).sum(axis=1).mean()))


def rpe_rmse(
    est_xyz: np.ndarray, gt_xyz: np.ndarray, delta: int = 10
) -> float:
    """Relative pose error over a frame delta (translation part)."""
    n = len(est_xyz) - delta
    if n <= 0:
        return 0.0
    d_est = est_xyz[delta:] - est_xyz[:-delta]
    d_gt = gt_xyz[delta:] - gt_xyz[:-delta]
    err = np.linalg.norm(d_est, axis=1) - np.linalg.norm(d_gt, axis=1)
    return float(np.sqrt((err**2).mean()))


def save_tum(path: str, times: np.ndarray, xyz: np.ndarray, quat_wxyz: np.ndarray):
    """Write a TUM trajectory file: `t x y z qx qy qz qw` per line."""
    with open(path, "w") as f:
        for t, p, q in zip(times, xyz, quat_wxyz):
            f.write(
                f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n"
            )


def load_tum(path: str):
    """Read a TUM trajectory file -> (times [N], xyz [N,3], quat_wxyz [N,4])."""
    data = np.loadtxt(path).reshape(-1, 8)
    times = data[:, 0]
    xyz = data[:, 1:4]
    q_xyzw = data[:, 4:8]
    quat_wxyz = np.concatenate([q_xyzw[:, 3:4], q_xyzw[:, 0:3]], axis=1)
    return times, xyz, quat_wxyz
