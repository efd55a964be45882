"""9-axis IMU path + IMU-rate odometry output."""

import numpy as np
import pytest

from liorf_tpu.pipeline import LiorfPipeline, SlamConfig
from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset
from liorf_tpu.sensors.types import ImuSample
from liorf_tpu.core import se3np


def nine_axis_config():
    from test_e2e_synthetic import small_config

    cfg = small_config()
    cfg.imuType = 1
    cfg.imuRPYWeight = 0.01
    cfg.useImuHeadingInitialization = False
    return cfg


def attach_quats(samples, syn):
    """Synthesize 9-axis attitude from ground truth."""
    out = []
    for s in samples:
        R, _ = syn.pose_at(round(max(s.stamp, 0.0), 6))
        out.append(
            ImuSample(
                stamp=s.stamp, acc=s.acc, gyr=s.gyr,
                quat_wxyz=se3np.rot_to_quat_wxyz(R),
            )
        )
    return out


@pytest.mark.slow
def test_nine_axis_pipeline_runs():
    syn = SyntheticDataset(SyntheticConfig(n_frames=10, n_rings=16, points_per_ring=180))
    pipe = LiorfPipeline(nine_axis_config())
    imu = attach_quats(syn.imu_stream(), syn)
    ii = 0
    for f in range(10):
        scan = syn.scan(f)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        r = pipe.process_scan(scan)
        assert np.isfinite(r.pose).all()
    _, gt = syn.ground_truth()
    from liorf_tpu.eval.metrics import ate_rmse

    _, poses = pipe.trajectory_arrays()
    assert ate_rmse(poses[:, 3:6], gt[: len(poses)]) < 0.3


@pytest.mark.slow
def test_imu_rate_odometry_output():
    syn = SyntheticDataset(SyntheticConfig(n_frames=6, n_rings=16, points_per_ring=180))
    from test_e2e_synthetic import small_config

    pipe = LiorfPipeline(small_config())
    imu = syn.imu_stream()
    ii = 0
    for f in range(6):
        scan = syn.scan(f)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.12:
            pipe.push_imu(imu[ii])
            ii += 1
        pipe.process_scan(scan)

    times, poses = pipe.imu_rate_poses(horizon=0.12)
    assert len(times) >= 5  # ~100 Hz stream over 0.1+ s
    assert np.isfinite(poses).all()
    # the high-rate poses continue from the last corrected pose
    assert np.linalg.norm(poses[0, 3:] - pipe.last_pose[3:]) < 0.3
    # and they advance with the true velocity (~4 m/s -> ~0.04 m per sample)
    step = np.linalg.norm(np.diff(poses[:, 3:6], axis=0), axis=1).mean()
    assert 0.02 < step < 0.08
