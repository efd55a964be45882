"""Host IMU-queue pruning (slam.py:_prune_imu_queue).

The per-frame ``_imu_window`` selection is a Python scan over the whole
queue; without pruning a long session pays ~10k comparisons per frame
once the 5000-sample cap fills (the host is the pipeline's critical
path). Pruning must be invisible to the math: window selection, attitude
lookup, and end-to-end trajectories are identical with and without it.
"""

import numpy as np

from liorf_tpu.pipeline import LiorfPipeline, ResidentPipeline, SlamConfig
from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset
from liorf_tpu.sensors.types import ImuSample


def _bare(cfg):
    p = LiorfPipeline.__new__(LiorfPipeline)
    p.cfg = cfg
    p.imu_queue = []
    p._time_base_val = 0.0
    return p


def test_prune_preserves_window_selection():
    cfg = SlamConfig()
    p = _bare(cfg)
    for i in range(3000):
        p.imu_queue.append(
            ImuSample(i * 0.01, np.full(3, i % 7, float), np.zeros(3), None)
        )
    t_now = 29.99
    before = p._imu_window(t_now - 0.1, t_now, 64)
    p._prune_imu_queue(t_now - 1.0)
    after = p._imu_window(t_now - 0.1, t_now, 64)
    assert len(p.imu_queue) < 150  # ~1 s of 100 Hz samples retained
    assert before[5] == after[5] > 0
    for a, b in zip(before[:5], after[:5]):
        np.testing.assert_array_equal(a, b)


def test_prune_keeps_attitude_lookback():
    cfg = SlamConfig(imuType=1)
    p = _bare(cfg)
    p._ext_rot = np.eye(3)
    p._ext_rpy_quat = np.array([1.0, 0.0, 0.0, 0.0])
    q = np.array([1.0, 0.0, 0.0, 0.0])
    for i in range(200):
        p.imu_queue.append(ImuSample(i * 0.01, np.zeros(3), np.zeros(3), q))
    t_now = 1.99
    rpy_before, ok_before = p._attitude_at(t_now)
    p._prune_imu_queue(t_now - 1.0)
    rpy_after, ok_after = p._attitude_at(t_now)
    assert ok_before and ok_after
    np.testing.assert_allclose(rpy_before, rpy_after)


def test_prune_noop_on_short_queue():
    p = _bare(SlamConfig())
    p.imu_queue = [ImuSample(5.0, np.zeros(3), np.zeros(3), None)]
    p._prune_imu_queue(4.0)
    assert len(p.imu_queue) == 1
    p._prune_imu_queue(6.0)
    assert len(p.imu_queue) == 0


def test_trajectory_unchanged_by_pruning():
    """End-to-end: the resident pipeline's trajectory is bit-identical
    with pruning active vs disabled (pruning only removes samples no
    window can select). 25 frames x 0.1 s so the prune cut (t0 - 1 s)
    actually fires — at 8 frames it never goes positive and the test
    would be vacuous."""
    n = 25
    syn = SyntheticDataset(
        SyntheticConfig(n_frames=n, n_rings=16, points_per_ring=360)
    )
    # freeze the streams: imu_stream()/scan() draw fresh RNG noise per
    # call, so each run must see the SAME realization
    scans = [syn.scan(f) for f in range(n)]
    imu = syn.imu_stream()
    cfg = SlamConfig(
        scan_capacity=4096, map_capacity=32768, kf_cloud_capacity=2048,
        near_kf_capacity=16, imu_window=64, point_filter_num=1,
        downsampleRate=1, mappingSurfLeafSize=0.4,
        surroundingKeyframeMapLeafSize=0.4, loopClosureEnableFlag=False,
        kf_capacity=64, traj_capacity=128, gps_capacity=16,
    )

    def run(disable):
        pipe = ResidentPipeline(cfg)
        if disable:
            pipe._prune_imu_queue = lambda before: None
        ii = 0
        for f in range(n):
            scan = scans[f]
            while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
                pipe.push_imu(imu[ii])
                ii += 1
            pipe.process_scan(scan)
        _, poses = pipe.trajectory_arrays()
        return poses, len(pipe.imu_queue)

    poses_off, qlen_off = run(disable=True)
    poses_on, qlen_on = run(disable=False)
    assert qlen_on < qlen_off, "pruning never fired — test is vacuous"
    np.testing.assert_array_equal(poses_off, poses_on)
