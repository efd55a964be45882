"""Fault injection: the pipeline must survive malformed/degenerate input.

The reference has NO fault injection anywhere (SURVEY §5.3); its strategy
is hard process exits on malformed clouds (imageProjection.cpp:286-309)
plus roslaunch respawn. The TPU pipeline cannot afford either — a NaN that
reaches the device poisons every downstream state forever (there is no
process to respawn mid-stream). These tests inject the faults the
reference dies on (and some it never considered) and assert the pipeline
degrades gracefully: finite poses, bounded drift, automatic recovery.
"""

import numpy as np
import pytest

from liorf_tpu.pipeline import ResidentPipeline, SlamConfig
from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset
from liorf_tpu.sensors.types import ImuSample, LidarScan


@pytest.fixture(scope="module")
def syn():
    return SyntheticDataset(
        SyntheticConfig(n_frames=10, n_rings=16, points_per_ring=360)
    )


@pytest.fixture
def cfg():
    return SlamConfig(
        scan_capacity=4096,
        map_capacity=32768,
        kf_cloud_capacity=2048,
        near_kf_capacity=16,
        imu_window=64,
        point_filter_num=1,
        downsampleRate=1,
        mappingSurfLeafSize=0.4,
        surroundingKeyframeMapLeafSize=0.4,
        loopClosureEnableFlag=False,
        kf_capacity=64,
        traj_capacity=128,
        gps_capacity=16,
    )


def _run(pipe, syn, n_frames, mutate_scan=None, mutate_imu=None):
    imu = syn.imu_stream()
    ii = 0
    for f in range(n_frames):
        scan = syn.scan(f)
        if mutate_scan is not None:
            scan = mutate_scan(f, scan)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            s = imu[ii]
            if mutate_imu is not None:
                s = mutate_imu(ii, s)
            if s is not None:
                pipe.push_imu(s)
            ii += 1
        if scan is not None:
            pipe.process_scan(scan)
    return pipe


def _assert_finite_and_tracks(pipe, syn, atol=2.0):
    _, poses = pipe.trajectory_arrays()
    assert np.isfinite(poses).all(), "non-finite pose escaped the pipeline"
    _, gt = syn.ground_truth()
    rel = poses[:, 3:6] - poses[0, 3:6]
    gt_rel = gt[: len(poses)] - gt[0]
    err = np.linalg.norm(rel - gt_rel, axis=1)
    assert err.max() < atol, f"trajectory diverged: max err {err.max():.2f} m"


def test_nan_imu_samples(syn, cfg):
    """NaN acc/gyr samples (sensor glitch / serialization bug) must not
    poison preintegration — the reference would integrate them straight
    into GTSAM and die much later, far from the cause."""

    def bad_imu(i, s):
        if i % 7 == 3:
            return ImuSample(s.stamp, np.full(3, np.nan), s.gyr, s.quat_wxyz)
        if i % 11 == 5:
            return ImuSample(s.stamp, s.acc, np.full(3, np.inf), s.quat_wxyz)
        return s

    pipe = _run(ResidentPipeline(cfg), syn, 10, mutate_imu=bad_imu)
    _assert_finite_and_tracks(pipe, syn)


def test_nan_points_in_scan(syn, cfg):
    """Non-finite points (the reference hard-exits on non-dense clouds,
    imageProjection.cpp:286-293) are masked out, not fatal."""

    def bad_scan(f, scan):
        if f % 2 == 1:
            xyz = scan.xyz.copy()
            xyz[:: 5] = np.nan
            xyz[1:: 97] = np.inf
            return LidarScan(
                stamp=scan.stamp, xyz=xyz, intensity=scan.intensity,
                ring=scan.ring, rel_time=scan.rel_time,
            )
        return scan

    pipe = _run(ResidentPipeline(cfg), syn, 10, mutate_scan=bad_scan)
    _assert_finite_and_tracks(pipe, syn)


def test_empty_scan(syn, cfg):
    """A scan with zero surviving points (sensor blackout) must coast on
    the IMU prediction instead of corrupting the map (the reference's
    surf-count gate, mapOptmization.cpp:1300)."""

    def empty(f, scan):
        if f == 4:
            return LidarScan(
                stamp=scan.stamp,
                xyz=np.zeros((0, 3), np.float32),
                intensity=np.zeros(0, np.float32),
                ring=np.zeros(0, np.int32),
                rel_time=np.zeros(0, np.float32),
            )
        return scan

    pipe = _run(ResidentPipeline(cfg), syn, 10, mutate_scan=empty)
    _assert_finite_and_tracks(pipe, syn)


def test_imu_dropout(syn, cfg):
    """Total IMU loss for a stretch (cable glitch): deskew and the initial
    guess degrade to identity but registration keeps tracking."""

    def drop(i, s):
        return None if 100 <= i < 300 else s

    pipe = _run(ResidentPipeline(cfg), syn, 10, mutate_imu=drop)
    _assert_finite_and_tracks(pipe, syn)


def test_duplicate_and_stale_scan(syn, cfg):
    """A repeated scan (transport retry) and an out-of-order stale scan
    must not corrupt state; the mapping throttle drops non-advancing
    stamps (mapOptmization.cpp:254-255 semantics)."""
    pipe = ResidentPipeline(cfg)
    imu = syn.imu_stream()
    ii = 0
    scans = [syn.scan(f) for f in range(8)]
    for f, scan in enumerate(scans):
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        pipe.process_scan(scan)
        if f == 3:
            pipe.process_scan(scan)  # exact duplicate
        if f == 5:
            pipe.process_scan(scans[2])  # stale out-of-order replay
    _assert_finite_and_tracks(pipe, syn)


def test_imu_spike(syn, cfg):
    """A huge (finite) acc/gyro spike: the fusion divergence guard
    (imuPreintegration.cpp:438-456 thresholds) must reset and recover
    rather than carry a 1e4 m/s velocity forever."""

    def spike(i, s):
        if i == 150:
            return ImuSample(
                s.stamp, np.array([2.0e4, 0.0, 9.81]), np.array([0.0, 0.0, 500.0]),
                s.quat_wxyz,
            )
        return s

    pipe = _run(ResidentPipeline(cfg), syn, 10, mutate_imu=spike)
    _, poses = pipe.trajectory_arrays()
    assert np.isfinite(poses).all()
    # recovery: the last frames' incremental motion is sane again
    steps = np.linalg.norm(np.diff(poses[-3:, 3:6], axis=0), axis=1)
    assert (steps < 5.0).all(), f"no recovery after spike: steps {steps}"


def test_nan_quaternion_9axis(syn, cfg):
    """A finite-acc/gyr sample with a NaN 9-axis attitude must not reach
    the device roll/pitch slerp (NaN survives normalization)."""
    from dataclasses import replace

    cfg9 = replace(cfg, imuType=1)
    ident = np.array([1.0, 0.0, 0.0, 0.0])

    def bad_quat(i, s):
        q = np.full(4, np.nan) if i % 5 == 2 else ident
        return ImuSample(s.stamp, s.acc, s.gyr, q)

    pipe = _run(ResidentPipeline(cfg9), syn, 10, mutate_imu=bad_quat)
    _assert_finite_and_tracks(pipe, syn)


def test_nan_gps_fix(syn, cfg):
    """NaN lat/lon or covariance passes every threshold comparison
    (NaN > thresh is False), so corrupt fixes must be dropped at
    ingestion before they reach the pose graph."""
    from liorf_tpu.sensors.types import GpsFix

    pipe = ResidentPipeline(cfg)
    imu = syn.imu_stream()
    ii = 0
    for f in range(10):
        scan = syn.scan(f)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        pipe.push_gps(GpsFix(scan.stamp, np.nan, np.nan, np.nan))
        pipe.push_gps(
            GpsFix(scan.stamp, 47.0, 8.0, 400.0, cov_xyz=np.full(3, np.nan))
        )
        pipe.process_scan(scan)
    _assert_finite_and_tracks(pipe, syn)
