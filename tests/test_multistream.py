"""Batched multi-session pipeline: N streams through one vmapped program
must reproduce each stream's single-session trajectory."""

import numpy as np
import pytest

from liorf_tpu.pipeline import ResidentPipeline, SlamConfig
from liorf_tpu.pipeline.multistream import MultiStreamPipeline
from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset

N_FRAMES = 8


def _cfg():
    return SlamConfig(
        scan_capacity=4096,
        raw_capacity=8192,
        map_capacity=32768,
        kf_cloud_capacity=2048,
        near_kf_capacity=16,
        imu_window=64,
        point_filter_num=1,
        downsampleRate=1,
        mappingSurfLeafSize=0.4,
        surroundingKeyframeMapLeafSize=0.4,
        loopClosureEnableFlag=True,
        kf_capacity=64,
        traj_capacity=64,
        gps_capacity=16,
        loop_capacity=16,
    )


def _datasets():
    # two genuinely different worlds/trajectories (different seeds + rates)
    return [
        SyntheticDataset(
            SyntheticConfig(n_frames=N_FRAMES, n_rings=16, points_per_ring=360,
                            seed=0)
        ),
        SyntheticDataset(
            SyntheticConfig(n_frames=N_FRAMES, n_rings=16, points_per_ring=360,
                            seed=7, yaw_rate=0.4, speed=3.0)
        ),
    ]


def _run_single(syn):
    pipe = ResidentPipeline(_cfg())
    imu = syn.imu_stream()
    ii = 0
    for f in range(N_FRAMES):
        scan = syn.scan(f)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        pipe.process_scan(scan)
    pipe.block()
    return pipe.trajectory_arrays()[1]


def test_multistream_matches_single_stream():
    syns = _datasets()
    singles = [_run_single(s) for s in syns]

    mp = MultiStreamPipeline(_cfg(), n_streams=2)
    imus = [s.imu_stream() for s in syns]
    iis = [0, 0]
    for f in range(N_FRAMES):
        scans = [s.scan(f) for s in syns]
        for lane in range(2):
            while (
                iis[lane] < len(imus[lane])
                and imus[lane][iis[lane]].stamp <= scans[lane].end_time + 0.02
            ):
                mp.push_imu(lane, imus[lane][iis[lane]])
                iis[lane] += 1
        mp.step(scans)
    mp.finish()

    for lane in range(2):
        poses = mp.stream(lane).trajectory_arrays()[1]
        assert poses.shape == singles[lane].shape
        # same traced computation; vmap only changes reduction layouts ->
        # cm-scale parity (see tests/test_dist.py for the same bound)
        np.testing.assert_allclose(
            poses[:, 3:6], singles[lane][:, 3:6], atol=6e-2
        )


def test_multistream_overflow_refused():
    """Batched mode cannot grow rings: it must refuse loudly BEFORE a ring
    overflows, naming the capacity to raise."""
    syn = _datasets()[0]
    cfg = _cfg()
    cfg.traj_capacity = 4  # absurdly small: trip the bound check
    mp = MultiStreamPipeline(cfg, n_streams=1)
    imu = syn.imu_stream()
    ii = 0
    with pytest.raises(RuntimeError, match="raise the"):
        for f in range(N_FRAMES):
            scan = syn.scan(f)
            while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
                mp.push_imu(0, imu[ii])
                ii += 1
            mp.step([scan])
