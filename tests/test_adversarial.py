"""Adversarial accuracy suite (VERDICT r2 missing #2 / next #3).

Real KITTI/MulRan bags do not exist in this environment, so the synthetic
world is made HARD instead of easy:

* a feature-poor corridor whose geometry is rank-deficient along the
  travel axis — the eigenvalue degeneracy projection
  (mapOptmization.cpp:1242-1271 semantics, ops/scan_match.py) MUST trip
  and the pipeline must survive it;
* an aggressive-rotation sequence where gyro deskew is load-bearing —
  deskew-on must beat deskew-off (imageProjection deskewPoint,
  imageProjection.cpp:536-565).

The 500+ frame ring-growth endurance run lives in bench.py (BENCH_LONG,
recorded in the round's BENCH json); its CPU-scale twin is
tests/test_resident.py's growth tests.
"""

import numpy as np

from liorf_tpu.eval.metrics import ate_rmse
from liorf_tpu.pipeline import ResidentPipeline, SlamConfig
from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset


def _run(syn, cfg, n_frames):
    pipe = ResidentPipeline(cfg)
    imu = syn.imu_stream()
    ii = 0
    for f in range(n_frames):
        scan = syn.scan(f)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        pipe.process_scan(scan)
    pipe.block()
    traj = np.asarray(pipe.state.traj)[: int(np.asarray(pipe.state.traj_count))]
    return traj


def _base_cfg(**kw) -> SlamConfig:
    # bench-density operating point: the reference's eigenvalue-100
    # degeneracy threshold (mapOptmization.cpp:1244) is an ABSOLUTE
    # constant tuned for real scan densities — at toy densities (~1k
    # matches) even feature-rich scenes sit near it, so these tests run
    # at the full 32x900 density where the city control stays clean
    cfg = SlamConfig(
        scan_capacity=16384,
        raw_capacity=32768,
        map_capacity=131072,
        kf_cloud_capacity=8192,
        near_kf_capacity=32,
        imu_window=64,
        point_filter_num=1,
        downsampleRate=1,
        mappingSurfLeafSize=0.3,
        surroundingKeyframeMapLeafSize=0.3,
        loopClosureEnableFlag=False,
        kf_capacity=64,
        traj_capacity=128,
        gps_capacity=16,
        loop_capacity=16,
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_corridor_trips_degeneracy_and_survives():
    """Straight feature-poor corridor: every surface normal is orthogonal
    to x, so J^T J is rank-deficient along the travel axis. The
    registration must (a) flag degeneracy on (essentially) every frame,
    (b) project the update off the degenerate direction instead of
    producing garbage — lateral/vertical tracking stays tight and the
    whole run stays finite."""
    n = 24
    syn = SyntheticDataset(
        SyntheticConfig(
            n_frames=n, n_rings=32, points_per_ring=900,
            world="corridor", yaw_rate=0.0, speed=4.0,
        )
    )
    _, gt = syn.ground_truth()
    traj = _run(syn, _base_cfg(), n)

    assert np.isfinite(traj).all(), "corridor run produced non-finite state"
    degen = traj[1:, 7] > 0.5  # frame 0 is the bootstrap (no registration)
    assert degen.mean() > 0.8, (
        f"degeneracy projection tripped on only {degen.mean():.0%} of frames"
    )
    # lateral (y) and vertical (z) stay observable and tight; x is carried
    # by the IMU across the projected direction — allow drift there.
    # (the estimate starts at the origin; gt starts at sensor height —
    # compare displacement from start)
    d_est = traj[:, 3:6] - traj[0, 3:6]
    d_gt = gt[: len(traj)] - gt[0]
    err_yz = np.abs(d_est[:, 1:3] - d_gt[:, 1:3])
    assert err_yz.max() < 0.5, f"lateral/vertical error {err_yz.max():.3f} m"
    err_x = np.abs(d_est[:, 0] - d_gt[:, 0])
    assert err_x.max() < 10.0, f"x drift unbounded: {err_x.max():.1f} m"


def test_city_does_not_trip_degeneracy():
    """Control for the corridor test: the feature-rich city world must NOT
    flag degeneracy — otherwise the corridor assertion is vacuous."""
    n = 12
    syn = SyntheticDataset(
        SyntheticConfig(n_frames=n, n_rings=32, points_per_ring=900)
    )
    traj = _run(syn, _base_cfg(), n)
    assert (traj[1:, 7] > 0.5).mean() < 0.2


def test_deskew_required_under_aggressive_rotation():
    """~100 deg/s yaw: during one 0.1 s sweep the sensor rotates ~10 deg,
    smearing the raw cloud. With gyro deskew the trajectory must be
    substantially better than without it."""
    n = 32
    syn = SyntheticDataset(
        SyntheticConfig(
            n_frames=n, n_rings=32, points_per_ring=900,
            speed=3.0, yaw_rate=1.8,
        )
    )
    _, gt = syn.ground_truth()

    traj_on = _run(syn, _base_cfg(deskewEnabled=True), n)
    traj_off = _run(syn, _base_cfg(deskewEnabled=False), n)

    ate_on = ate_rmse(traj_on[:, 3:6], gt[: len(traj_on)])
    ate_off = ate_rmse(traj_off[:, 3:6], gt[: len(traj_off)])
    assert np.isfinite(ate_on)
    # deskew-on must clearly beat deskew-off on this sequence
    # deterministic (fixed seed, both runs share the data): measured
    # on=0.047 off=0.064 at this rate. Note rotation-only deskew (reference
    # parity: findPosition disabled) stops helping beyond ~2.5 rad/s where
    # the uncorrected translation smear dominates — that regime is outside
    # the reference's envelope too.
    assert ate_on < ate_off * 0.85, (
        f"deskew did not help: on={ate_on:.3f} off={ate_off:.3f}"
    )
    assert ate_on < 0.15, f"deskewed ATE too large: {ate_on:.3f} m"


class _TwoCorridorDataset(SyntheticDataset):
    """Self-similar world: two parallel corridors (identical walls/ground,
    different clutter) joined by a U-turn. On the return leg the nearest
    old keyframe is the OTHER corridor 10 m away in y — inside the 15 m RS
    loop-search radius — so the loop searcher keeps proposing a
    geometrically WRONG candidate whose walls/ground nevertheless align at
    low ICP fitness (fitness is an outlier-diluted mean). The false-loop
    failure mode the reference's acceptance chain
    (mapOptmization.cpp:571-585) is blind to; VERDICT r3 next #6."""

    def __init__(self, cfg, leg=12.0, radius=5.0):
        self.leg = leg
        self.radius = radius
        super().__init__(cfg)
        self.surfaces = self._two_corridor_surfaces()

    def _two_corridor_surfaces(self):
        L, r = self.leg, self.radius
        up = np.array([0.0, 0, 1])
        x_dir = np.array([1.0, 0, 0])
        y_dir = np.array([0.0, 1, 0])
        cx = L / 2
        ex = L / 2 + 6.0
        s = [
            # shared ground
            (np.zeros(3), up, 200.0, 200.0, x_dir, y_dir),
        ]
        # two identical corridors: walls at y = off +- 3.5, height 3
        for off in (0.0, 2 * r):
            for ys in (-3.5, 3.5):
                s.append((np.array([cx, off + ys, 1.5]),
                          np.array([0.0, -np.sign(ys) or 1.0, 0]),
                          ex, 1.5, x_dir, up))
        # clutter (x-facing buttresses) at DIFFERENT stations per corridor:
        # constrains x inside each corridor and makes the cross-corridor
        # match geometrically wrong in detail, not just in world position
        for off, stations in ((0.0, (2.0, 6.0, 10.0)), (2 * r, (4.0, 8.0))):
            for sx in stations:
                for nx in (-1.0, 1.0):
                    s.append((np.array([sx, off - 2.8, 1.5]),
                              np.array([nx, 0, 0]),
                              0.7, 1.5, y_dir, up))
        return s

    def pose_at(self, t: float):
        if t in self._gt_cache:
            return self._gt_cache[t]
        v = self.cfg.speed
        L, r = self.leg, self.radius
        T1 = L / v
        w = v / r
        t_turn = np.pi / w
        if t < T1:
            yaw, x, y = 0.0, v * t, 0.0
        elif t < T1 + t_turn:
            a = w * (t - T1)
            yaw = a
            x = L + r * np.sin(a)
            y = r - r * np.cos(a)
        else:
            yaw = np.pi
            x = L - v * (t - T1 - t_turn)
            y = 2 * r
        cy, sy = np.cos(yaw), np.sin(yaw)
        R = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1.0]])
        p = np.array([x, y, 1.8])
        self._gt_cache[t] = (R, p)
        return R, p


def _two_corridor_cfg(**kw) -> SlamConfig:
    cfg = SlamConfig(
        scan_capacity=4096,
        raw_capacity=8192,
        map_capacity=32768,
        kf_cloud_capacity=2048,
        near_kf_capacity=16,
        imu_window=64,
        point_filter_num=1,
        downsampleRate=1,
        mappingSurfLeafSize=0.3,
        surroundingKeyframeMapLeafSize=0.3,
        loopClosureEnableFlag=True,
        loopClosureFrequency=5.0,
        # the return leg runs ~4-6 s after the outbound leg passed the same
        # x; 3.5 s excludes same-corridor/turn candidates, keeps cross ones
        historyKeyframeSearchTimeDiff=3.5,
        historyKeyframeSearchNum=5,
        kf_capacity=64,
        traj_capacity=128,
        gps_capacity=16,
        loop_capacity=16,
    )
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def test_false_loop_rejected_in_self_similar_world():
    """The acceptance chain must reject the cross-corridor candidate: the
    implied 10 m correction is far outside any plausible odometric drift
    over the ~30-keyframe path between the two legs (drift-budget gate),
    and the clutter mismatch caps the inlier fraction. The gates-off
    control below proves the candidate REACHES ICP and would be accepted
    under the reference's fitness-only chain — without it this test would
    be vacuous."""
    n = 66
    syn = _TwoCorridorDataset(
        SyntheticConfig(n_frames=n, n_rings=16, points_per_ring=360,
                        speed=6.0, yaw_rate=0.0),
        leg=12.0, radius=4.5,
    )

    pipe = ResidentPipeline(_two_corridor_cfg())
    imu = syn.imu_stream()
    ii = 0
    for f in range(n):
        scan = syn.scan(f)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        pipe.process_scan(scan)
    pipe.block()
    assert int(np.asarray(pipe.state.l_count)) == 0, (
        "a wrong cross-corridor loop factor was accepted"
    )
    traj = np.asarray(pipe.state.traj)[: int(np.asarray(pipe.state.traj_count))]
    assert np.isfinite(traj[:, :6]).all()


def test_false_loop_accepted_without_gates_control():
    """Non-vacuity control: with the inlier-fraction and drift-budget
    gates disabled (reference-parity fitness-only acceptance), the same
    course DOES land a wrong loop factor — proving the candidates are
    proposed, survive ICP, and pass the fitness threshold."""
    n = 66
    syn = _TwoCorridorDataset(
        SyntheticConfig(n_frames=n, n_rings=16, points_per_ring=360,
                        speed=6.0, yaw_rate=0.0),
        leg=12.0, radius=4.5,
    )
    cfg = _two_corridor_cfg(
        loopMinInlierFrac=0.0, loopCorrectionFloor=1.0e9
    )
    pipe = ResidentPipeline(cfg)
    imu = syn.imu_stream()
    ii = 0
    for f in range(n):
        scan = syn.scan(f)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        pipe.process_scan(scan)
    pipe.block()
    assert int(np.asarray(pipe.state.l_count)) >= 1, (
        "control failed: no candidate even passed the fitness-only chain "
        "(the rejection test above would be vacuous)"
    )
