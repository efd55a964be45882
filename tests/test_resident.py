"""Device-resident pipeline: parity with the classic host-orchestrated one.

The resident pipeline keeps all SLAM state on device and never pulls until
the end; its trajectory must match the classic pipeline (same math, same
parameters) on the synthetic sequence.
"""

import numpy as np
import pytest

from liorf_tpu.pipeline import LiorfPipeline, ResidentPipeline, SlamConfig
from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset


_STREAMS: dict = {}


def _run(pipe_cls, syn, cfg, n_frames):
    # freeze the sensor streams per dataset: imu_stream()/scan() draw
    # fresh RNG noise on every call, so without caching, two pipelines
    # "run on syn" see different noise realizations and their parity is
    # only as tight as the noise allows (nondeterministic run-to-run)
    key = id(syn)
    if key not in _STREAMS or len(_STREAMS[key][0]) < n_frames:
        _STREAMS[key] = (
            [syn.scan(f) for f in range(n_frames)], syn.imu_stream()
        )
    scans, imu = _STREAMS[key]
    pipe = pipe_cls(cfg)
    ii = 0
    for f in range(n_frames):
        scan = scans[f]
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        pipe.process_scan(scan)
    return pipe


@pytest.fixture(scope="module")
def small_cfg():
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


@pytest.fixture(scope="module")
def syn():
    return SyntheticDataset(SyntheticConfig(n_frames=10, n_rings=16, points_per_ring=360))


def test_resident_runs_and_tracks(syn, small_cfg):
    n = 10
    pipe = _run(ResidentPipeline, syn, small_cfg, n)
    times, poses = pipe.trajectory_arrays()
    assert len(times) == n
    assert np.isfinite(poses).all()
    _, gt = syn.ground_truth()
    # odometry frame starts at the origin; align the first pose to gt
    rel_est = poses[:, 3:6] - poses[0, 3:6]
    rel_gt = gt[:n] - gt[0]
    err = np.linalg.norm(rel_est - rel_gt, axis=1)
    assert err.max() < 1.0, f"trajectory diverged: max err {err.max():.3f} m"


def test_resident_matches_classic(syn, small_cfg):
    n = 8
    rp = _run(ResidentPipeline, syn, small_cfg, n)
    cp = _run(LiorfPipeline, syn, small_cfg, n)
    _, rposes = rp.trajectory_arrays()
    _, cposes = cp.trajectory_arrays()
    # same math modulo solve scheduling details -> small tolerance
    d = np.linalg.norm(rposes[:, 3:6] - cposes[:, 3:6], axis=1)
    assert d.max() < 0.15, f"resident vs classic diverged: {d}"


def test_resident_keyframes_and_sync_store(syn, small_cfg):
    n = 8
    rp = _run(ResidentPipeline, syn, small_cfg, n)
    rp.sync_store()
    assert rp.store.count >= 1
    assert np.isfinite(rp.store.poses[: rp.store.count]).all()
    # clouds pulled: at least the first keyframe has valid points
    assert rp.store.cloud_masks[0].sum() > 100


def test_resident_loop_closure():
    """A tight circular trajectory revisits itself: the in-graph RS/SC loop
    detection + ICP verification must add at least one loop factor."""
    import jax.numpy as jnp

    syn = SyntheticDataset(
        SyntheticConfig(
            n_frames=48, n_rings=16, points_per_ring=360, speed=3.0, yaw_rate=1.5
        )
    )
    cfg = SlamConfig(
        scan_capacity=4096,
        map_capacity=32768,
        kf_cloud_capacity=2048,
        near_kf_capacity=16,
        imu_window=64,
        point_filter_num=1,
        downsampleRate=1,
        mappingSurfLeafSize=0.4,
        surroundingKeyframeMapLeafSize=0.4,
        loopClosureEnableFlag=True,
        loopClosureFrequency=2.0,
        historyKeyframeSearchTimeDiff=2.0,
        historyKeyframeSearchNum=5,
        kf_capacity=64,
        traj_capacity=128,
        gps_capacity=16,
        loop_capacity=16,
    )
    pipe = _run(ResidentPipeline, syn, cfg, 48)
    n_loops = int(np.asarray(pipe.state.l_count))
    times, poses = pipe.trajectory_arrays()
    assert np.isfinite(poses).all()
    assert n_loops >= 1, "no loop factor was added on a self-revisiting circle"


def test_resident_external_loop_candidate():
    """External loop candidates (loopInfoHandler parity,
    mapOptmization.cpp:530-541 + detectLoopClosureExternal :767-819):
    with RS/SC cadence effectively disabled, a pushed (t_cur, t_pre)
    stamp pair alone must produce a verified loop factor."""
    syn = SyntheticDataset(
        SyntheticConfig(
            n_frames=48, n_rings=16, points_per_ring=360, speed=3.0, yaw_rate=1.5
        )
    )
    cfg = SlamConfig(
        scan_capacity=4096,
        map_capacity=32768,
        kf_cloud_capacity=2048,
        near_kf_capacity=16,
        imu_window=64,
        point_filter_num=1,
        downsampleRate=1,
        mappingSurfLeafSize=0.4,
        surroundingKeyframeMapLeafSize=0.4,
        loopClosureEnableFlag=True,
        loopClosureFrequency=0.1,  # cadence fires at frame 100 — never here
        historyKeyframeSearchTimeDiff=2.0,
        historyKeyframeSearchNum=5,
        kf_capacity=64,
        traj_capacity=128,
        gps_capacity=16,
        loop_capacity=16,
    )
    pipe = ResidentPipeline(cfg)
    imu = syn.imu_stream()
    scans = [syn.scan(f) for f in range(48)]
    ii = 0
    for f, scan in enumerate(scans):
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        if f == 44:  # revisit point on the circle; the loop partner is early
            pipe.push_loop_candidate(scans[43].stamp, scans[2].stamp)
        pipe.process_scan(scan)
    n_loops = int(np.asarray(pipe.state.l_count))
    _, poses = pipe.trajectory_arrays()
    assert np.isfinite(poses).all()
    assert n_loops >= 1, "external loop candidate did not produce a factor"
    # a too-close stamp pair must be consumed and dropped (time-gap gate)
    pipe._ext_pending = None  # clear the resend window of the first pair
    pipe.push_loop_candidate(scans[44].stamp, scans[44].stamp + 0.5)
    assert pipe._ext_loop_candidate(0.0)[0] is False
    assert len(pipe.loop_info_queue) == 0


def test_resident_checkpoint_resume(syn, small_cfg, tmp_path):
    """Bit-exact resume: run 10 frames straight vs 6 + checkpoint + 4.

    imu_stream() draws fresh sensor noise per call, so one shared stream
    drives all three runs."""
    from liorf_tpu.mapping.export import load_checkpoint, save_checkpoint

    n = 10
    imu = syn.imu_stream()

    def drive(pipe, lo, hi):
        ii = 0
        for f in range(hi):
            scan = syn.scan(f)
            while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
                if f >= lo:
                    pipe.push_imu(imu[ii])
                ii += 1
            if f >= lo:
                pipe.process_scan(scan)
        return pipe

    full = drive(ResidentPipeline(small_cfg), 0, n)
    t_full, p_full = full.trajectory_arrays()

    half = drive(ResidentPipeline(small_cfg), 0, 6)
    ckpt = str(tmp_path / "resident.pkl")
    save_checkpoint(half, ckpt)

    resumed = ResidentPipeline(small_cfg)
    load_checkpoint(resumed, ckpt)
    drive(resumed, 6, n)
    t_res, p_res = resumed.trajectory_arrays()
    assert len(t_res) == n
    np.testing.assert_allclose(t_res, t_full, atol=1e-9)
    np.testing.assert_allclose(p_res, p_full, atol=1e-5)


def test_resident_ring_growth():
    """Sessions longer than the preallocated rings must grow them in place:
    run with tiny capacities past the keyframe/trajectory limits, assert
    the rings doubled and tracking stayed continuous."""
    syn = SyntheticDataset(
        SyntheticConfig(n_frames=24, n_rings=16, points_per_ring=360)
    )
    cfg = SlamConfig(
        scan_capacity=4096, map_capacity=32768, kf_cloud_capacity=2048,
        near_kf_capacity=16, imu_window=64, point_filter_num=1,
        downsampleRate=1, mappingSurfLeafSize=0.4,
        surroundingKeyframeMapLeafSize=0.4, loopClosureEnableFlag=False,
        kf_capacity=8, traj_capacity=16, gps_capacity=8, loop_capacity=8,
    )
    pipe = _run(ResidentPipeline, syn, cfg, 24)
    assert pipe.state.traj.shape[0] > 16  # trajectory ring grew
    times, poses = pipe.trajectory_arrays()
    assert len(poses) == 24  # nothing dropped or overwritten
    assert np.isfinite(poses).all()
    n_kf = int(np.asarray(pipe.state.kf_count))
    assert pipe.state.kf_poses.shape[0] >= n_kf + 2
    # monotone forward motion preserved across the growth recompiles
    assert poses[-1, 3] > poses[0, 3]


def test_growth_precompile_warms_cache():
    """The async growth precompile must kick in before a ring fills and
    seed the jit cache with the post-growth shapes, so the actual growth
    dispatches without an inline compile."""
    from liorf_tpu.pipeline.resident import resident_step_packed

    syn = SyntheticDataset(
        SyntheticConfig(n_frames=20, n_rings=16, points_per_ring=360)
    )
    cfg = SlamConfig(
        scan_capacity=4096, map_capacity=32768, kf_cloud_capacity=2048,
        near_kf_capacity=16, imu_window=64, point_filter_num=1,
        downsampleRate=1, mappingSurfLeafSize=0.4,
        surroundingKeyframeMapLeafSize=0.4, loopClosureEnableFlag=False,
        kf_capacity=64, traj_capacity=16, gps_capacity=8, loop_capacity=8,
    )
    pipe = ResidentPipeline(cfg)
    imu = syn.imu_stream()
    ii = 0
    grown_cache_hit = False
    for f in range(20):
        scan = syn.scan(f)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        # just before the trajectory ring grows (at frame_idx >= T-2=14),
        # the precompile (predicted at frame_idx >= 12) must have fired
        # and finished: the grown-shape executable is already cached
        if pipe.frame_idx == 14:
            assert pipe._precompiled_keys, "precompile never predicted growth"
            t = pipe._precompile_thread
            assert t is not None
            t.join(timeout=300)
            assert not t.is_alive(), "precompile thread hung"
            size_before = resident_step_packed._cache_size()
            pipe.process_scan(scan)  # this frame grows the trajectory ring
            assert pipe.state.traj.shape[0] > 16
            grown_cache_hit = (
                resident_step_packed._cache_size() == size_before
            )
            continue
        pipe.process_scan(scan)
    assert grown_cache_hit, "growth retraced despite the precompile"
    _, poses = pipe.trajectory_arrays()
    assert len(poses) == 20 and np.isfinite(poses).all()


def test_resident_imu_rate_trajectory(syn, small_cfg):
    """The in-graph IMU-rate odometry ring (TransformFusion parity): one
    pose per IMU sample between scans, stamped, finite, and consistent
    with the scan-rate trajectory (each scan's pose should be close to the
    IMU-rate poses recorded just before/after it)."""
    n = 10
    pipe = _run(ResidentPipeline, syn, small_cfg, n)
    it, ip = pipe.imu_rate_trajectory()
    st_times, st_poses = pipe.trajectory_arrays()
    # ~100 Hz IMU over (n-1) 10 Hz frames -> roughly 10 samples per frame
    assert len(it) >= 5 * (n - 2), f"too few IMU-rate poses: {len(it)}"
    assert np.isfinite(ip).all()
    assert (np.diff(it) >= 0).all(), "IMU-rate stamps must be non-decreasing"
    # stamps span the scan window
    assert it[0] >= st_times[0] - 0.2 and it[-1] <= st_times[-1] + 0.2
    # each interior scan pose has an IMU-rate pose within 50 ms and 0.5 m
    for k in range(2, n - 1):
        j = np.argmin(np.abs(it - st_times[k]))
        assert abs(it[j] - st_times[k]) < 0.05
        d = np.linalg.norm(ip[j, 3:6] - st_poses[k, 3:6])
        assert d < 0.5, f"IMU-rate pose {d:.3f} m from scan pose at frame {k}"


def test_resident_ring_growth_pull_free():
    """pull_free_growth must grow rings from the host-side bounds WITHOUT
    any mid-run device->host count pull (a single pull permanently
    degrades the tunneled session), and produce the same trajectory as
    the exact-pull growth path."""
    syn = SyntheticDataset(
        SyntheticConfig(n_frames=24, n_rings=16, points_per_ring=360)
    )

    def cfg(pull_free):
        return SlamConfig(
            scan_capacity=4096, map_capacity=32768, kf_cloud_capacity=2048,
            near_kf_capacity=16, imu_window=64, point_filter_num=1,
            downsampleRate=1, mappingSurfLeafSize=0.4,
            surroundingKeyframeMapLeafSize=0.4, loopClosureEnableFlag=False,
            kf_capacity=8, traj_capacity=16, gps_capacity=8, loop_capacity=8,
            pull_free_growth=pull_free,
        )

    pipe_exact = _run(ResidentPipeline, syn, cfg(False), 24)
    pipe_free = _run(ResidentPipeline, syn, cfg(True), 24)
    assert pipe_free.growth_events >= 1
    # pessimistic bounds grow the kf ring at least as large as exact
    assert (
        pipe_free.state.kf_poses.shape[0]
        >= pipe_exact.state.kf_poses.shape[0]
    )
    _, poses_e = pipe_exact.trajectory_arrays()
    _, poses_f = pipe_free.trajectory_arrays()
    assert len(poses_f) == len(poses_e) == 24
    # growths fire at different frames -> different retrace points ->
    # different compiled programs; f32 reduction-order noise can flip
    # near-tie NN correspondences, so parity is cm-scale (same tolerance
    # as the sharded-vs-single parity test in tests/test_dist.py)
    np.testing.assert_allclose(poses_f, poses_e, atol=6e-2)
