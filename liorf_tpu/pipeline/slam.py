"""The online SLAM pipeline: the reference's three ROS nodes fused into one
host-orchestrated sequence of jit'd device stages.

Per-frame flow (cf. SURVEY call stacks 3.1-3.4):

1. front-end (``imageProjection``): range/ring/stride filtering, gyro
   integration + per-point deskew, scan voxel downsample — one jit call;
2. initial guess (``updateInitialGuess``): IMU preintegration from the
   fusion filter state (replacing the odometry/imu_incremental chain);
3. scan-to-map registration (``scan2MapOptimization``) against the local
   map grid + ``transformUpdate`` (IMU roll/pitch slerp, tolerance clamps);
4. IMU fusion correction (``IMUPreintegration::odometryHandler``):
   fixed-lag GN with the new lidar pose, divergence guard + reinit;
5. keyframe/back-end (``saveKeyFramesAndFactor``): keyframe gating, odom /
   GPS / loop factors, pose-graph solve (trailing window each keyframe,
   full relaxation when loops or GPS land), ``correctPoses`` rewrite, local
   map grid rebuild;
6. loop detection (the 1 Hz loop thread) every ``loop_every_frames``.

Host code only moves metadata and slices queues; all per-point math runs
in jit'd XLA programs over fixed-capacity arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..core.geodesy import LocalCartesian
from ..core.pointcloud import PAD_COORD
from ..core.voxel import voxel_downsample_xyz
from ..graph import pose_graph as pg
from ..imu import fusion as imu_fusion
from ..imu import preintegration as preint
from ..loops.detector import LoopDetector, LoopFactor
from ..mapping.keyframes import KeyframeStore, assemble_local_map
from ..ops import scancontext
from ..ops.deskew import deskew_scan, integrate_gyro
from ..ops.scan_match import ScanMatchParams, scan_to_map
from ..sensors.types import GpsFix, ImuSample, LidarScan
from .config import SlamConfig


@partial(jax.jit, static_argnames=("leaf", "out_cap"))
def _frontend_step(
    xyz, rel_times, mask, scan_start, imu_times, imu_gyro, imu_mask, leaf, out_cap
):
    """Deskew + voxel downsample, one device roundtrip."""
    tl = integrate_gyro(imu_times, imu_gyro, imu_mask)
    deskewed = deskew_scan(xyz, rel_times, mask, scan_start, tl)
    ds_xyz, ds_mask = voxel_downsample_xyz(deskewed, mask, leaf, out_cap)
    return deskewed, ds_xyz, ds_mask


@jax.jit
def _sc_descriptor(xyz, mask):
    desc = scancontext.make_descriptor(xyz, mask)
    return desc, scancontext.ring_key(desc)


@dataclass
class FrameResult:
    stamp: float
    pose: np.ndarray  # [6] rpyxyz
    degenerate: bool
    is_keyframe: bool
    num_matched: int


class LiorfPipeline:
    """Streaming API: push IMU/GPS, process scans, read trajectory/map."""

    def __init__(self, cfg: SlamConfig = SlamConfig()):
        self.cfg = cfg
        self.store = KeyframeStore(
            cloud_capacity=cfg.kf_cloud_capacity, initial_kf_capacity=256
        )
        self.loop_detector = LoopDetector(cfg)
        self.gps_conv = LocalCartesian()

        self.imu_queue: list[ImuSample] = []
        self.gps_queue: list[GpsFix] = []
        self.pending_loops: list[LoopFactor] = []

        # graph factor lists (host side; device graph built per solve)
        self.edges: list[dict] = []
        self.gps_factors: list[dict] = []

        self.filter: imu_fusion.FusionFilter | None = None
        self.fusion_params = imu_fusion.FusionParams(
            imu=preint.ImuParams(
                acc_noise=cfg.imuAccNoise,
                gyr_noise=cfg.imuGyrNoise,
                acc_bias_rw=cfg.imuAccBiasN,
                gyr_bias_rw=cfg.imuGyrBiasN,
                gravity=cfg.imuGravity,
            )
        )
        self.match_params = ScanMatchParams()
        self.grid = None
        self.last_pose = np.zeros(6, np.float32)
        self.last_scan_stamp: float | None = None
        self.trajectory: list[FrameResult] = []
        self.frame_idx = 0
        # loop thread runs at loopClosureFrequency Hz vs ~10 Hz scans
        self.loop_every_frames = max(1, int(round(10.0 / max(cfg.loopClosureFrequency, 0.1))))
        self.last_gps_xyz = None
        self._ext_rot = cfg.ext_rot
        self._R_imu2lidar = None  # lazy

    # ------------------------------------------------------------------
    # input streams
    # ------------------------------------------------------------------
    def push_imu(self, s: ImuSample):
        """imuConverter (utility.h:257-290): rotate acc/gyr into the lidar
        frame with extrinsicRot."""
        acc = self._ext_rot @ np.asarray(s.acc, np.float64)
        gyr = self._ext_rot @ np.asarray(s.gyr, np.float64)
        self.imu_queue.append(ImuSample(s.stamp, acc, gyr, s.quat_wxyz))
        if len(self.imu_queue) > 5000:
            self.imu_queue = self.imu_queue[-5000:]

    def push_gps(self, fix: GpsFix):
        """gpsHandler (mapOptmization.cpp:277-299): LLA -> local ENU."""
        if fix.status != 0:
            return
        enu = self.gps_conv.forward(fix.lat, fix.lon, fix.alt)
        self.gps_queue.append((fix.stamp, np.asarray(enu, np.float64), fix.cov_xyz))

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------
    def _imu_window(self, t0: float, t1: float):
        """Slice the IMU queue into fixed-size arrays covering [t0, t1].

        Times are rebased by the pipeline's time base in float64 *before*
        float32 conversion (absolute unix stamps would lose millisecond
        precision in f32)."""
        base = self._time_base(t0)
        cap = self.cfg.imu_window
        sel = [s for s in self.imu_queue if t0 <= s.stamp <= t1]
        n = min(len(sel), cap)
        times = np.full(cap, np.inf)
        acc = np.zeros((cap, 3), np.float32)
        gyr = np.zeros((cap, 3), np.float32)
        mask = np.zeros(cap, bool)
        for i, s in enumerate(sel[:cap]):
            times[i] = s.stamp - base
            acc[i] = s.acc
            gyr[i] = s.gyr
            mask[i] = True
        # per-sample dt for preintegration
        dts = np.zeros(cap, np.float32)
        if n:
            dts[0] = min(1.0 / self.cfg.imuRate, max(times[0] - (t0 - base), 0.0) + 1e-4)
            if n > 1:
                dts[1:n] = np.diff(times[:n])
        return (
            jnp.asarray(times, jnp.float32),
            jnp.asarray(acc),
            jnp.asarray(gyr),
            jnp.asarray(dts),
            jnp.asarray(mask),
            n,
        )

    def _preintegrate(self, t0: float, t1: float):
        _, acc, gyr, dts, mask, n = self._imu_window(t0, t1)
        ba = self.filter.mean.ba if self.filter is not None else jnp.zeros(3)
        bg = self.filter.mean.bg if self.filter is not None else jnp.zeros(3)
        return preint.preintegrate(
            acc, gyr, dts, mask, ba, bg, self.fusion_params.imu
        ), n

    def _pose_to_Rp(self, pose: np.ndarray):
        R = np.asarray(se3.euler_to_rot(jnp.asarray(pose[:3], jnp.float32)))
        return R, pose[3:6].astype(np.float32)

    # ------------------------------------------------------------------
    # the per-frame step
    # ------------------------------------------------------------------
    def process_scan(self, scan: LidarScan) -> FrameResult:
        cfg = self.cfg
        t0 = scan.stamp
        t1 = scan.end_time

        # --- 1. filtering + deskew + downsample (projectPointCloud) ---
        rng = np.linalg.norm(scan.xyz, axis=1)
        keep = (rng >= cfg.lidarMinRange) & (rng <= cfg.lidarMaxRange)
        if cfg.downsampleRate > 1:
            keep &= (scan.ring % cfg.downsampleRate) == 0
        if cfg.point_filter_num > 1:
            keep &= (np.arange(len(scan.xyz)) % cfg.point_filter_num) == 0
        pts = scan.xyz[keep]
        rel = scan.rel_time[keep]
        cap = cfg.scan_capacity
        n = min(len(pts), cap)
        xyz = np.full((cap, 3), PAD_COORD, np.float32)
        rts = np.zeros(cap, np.float32)
        msk = np.zeros(cap, bool)
        xyz[:n] = pts[:n]
        rts[:n] = rel[:n]
        msk[:n] = True

        base = self._time_base(t0)
        imu_t, imu_acc, imu_gyr, _, imu_m, n_imu = self._imu_window(t0 - 0.01, t1 + 0.01)
        deskewed, ds_xyz, ds_mask = _frontend_step(
            jnp.asarray(xyz),
            jnp.asarray(rts),
            jnp.asarray(msk),
            jnp.asarray(np.float32(t0 - base)),
            imu_t,
            imu_gyr,
            imu_m,
            cfg.mappingSurfLeafSize,
            cap,
        )

        # --- 2. initial guess ---
        if self.last_scan_stamp is not None and self.filter is not None:
            pre_guess, _ = self._preintegrate(self.last_scan_stamp, t0)
            nav = preint.predict(
                preint.NavState(
                    R=self.filter.mean.R, p=self.filter.mean.p, v=self.filter.mean.v
                ),
                pre_guess,
                self.filter.mean.ba,
                self.filter.mean.bg,
                self.fusion_params.imu,
            )
            guess = np.concatenate(
                [np.asarray(se3.rot_to_euler(nav.R)), np.asarray(nav.p)]
            ).astype(np.float32)
        else:
            guess = self.last_pose.copy()

        # --- 3. scan-to-map ---
        degenerate = False
        matched = guess
        num_matched = 0
        if self.grid is not None:
            res = scan_to_map(
                ds_xyz, ds_mask, self.grid, jnp.asarray(guess), self.match_params
            )
            matched = np.array(res.pose)  # writable copy
            degenerate = bool(res.degenerate)
            num_matched = int(res.num_matched)
            # transformUpdate clamps (mapOptmization.cpp:1347-1351)
            matched[0] = np.clip(matched[0], -cfg.rotation_tollerance, cfg.rotation_tollerance)
            matched[1] = np.clip(matched[1], -cfg.rotation_tollerance, cfg.rotation_tollerance)
            matched[5] = np.clip(matched[5], -cfg.z_tollerance, cfg.z_tollerance)

        # --- 4. IMU fusion correction ---
        R_l, p_l = self._pose_to_Rp(matched)
        if self.filter is None:
            self.filter = imu_fusion.init_filter(
                jnp.asarray(R_l), jnp.asarray(p_l), self.fusion_params
            )
        elif self.last_scan_stamp is not None and n_imu > 0:
            pre_f, _ = self._preintegrate(self.last_scan_stamp, t0)
            step = imu_fusion.fusion_step(
                self.filter,
                pre_f,
                jnp.asarray(R_l),
                jnp.asarray(p_l),
                jnp.asarray(degenerate),
                self.fusion_params,
            )
            if bool(step.diverged):
                self.filter = imu_fusion.init_filter(
                    jnp.asarray(R_l), jnp.asarray(p_l), self.fusion_params
                )
            else:
                self.filter = step.filter

        # --- 5. keyframe + back-end ---
        is_kf = self._should_add_keyframe(matched)
        if is_kf:
            self._add_keyframe(matched, t0, deskewed, jnp.asarray(msk), ds_xyz, ds_mask)

        self.last_pose = matched
        self.last_scan_stamp = t0
        result = FrameResult(
            stamp=t0,
            pose=matched.copy(),
            degenerate=degenerate,
            is_keyframe=is_kf,
            num_matched=num_matched,
        )
        self.trajectory.append(result)
        self.frame_idx += 1

        # --- 6. loop detection cadence (1 Hz thread equivalent) ---
        if (
            cfg.loopClosureEnableFlag
            and self.frame_idx % self.loop_every_frames == 0
            and self.store.count > 2
        ):
            self.pending_loops.extend(self.loop_detector.run(self.store, t0))
        return result

    # ------------------------------------------------------------------
    _time_base_val: float | None = None

    def _time_base(self, t: float) -> float:
        """Stable offset subtracted from absolute times before float32
        device math (keeps timestamps well-conditioned)."""
        if self._time_base_val is None:
            self._time_base_val = float(np.floor(t))
        return self._time_base_val

    def _should_add_keyframe(self, pose: np.ndarray) -> bool:
        """saveFrame (mapOptmization.cpp:1365-1384)."""
        if self.store.count == 0:
            return True
        prev = self.store.poses[self.store.count - 1]
        rel = np.asarray(
            se3.pose_between(jnp.asarray(prev, jnp.float32), jnp.asarray(pose, jnp.float32))
        )
        ang = np.abs(rel[:3])
        dist = np.linalg.norm(rel[3:])
        c = self.cfg
        return bool(
            (ang > c.surroundingkeyframeAddingAngleThreshold).any()
            or dist > c.surroundingkeyframeAddingDistThreshold
        )

    def _add_keyframe(self, pose, stamp, deskewed, scan_mask, ds_xyz, ds_mask):
        cfg = self.cfg
        # SC descriptor on the full deskewed cloud (SINGLE_SCAN_FULL,
        # mapOptmization.cpp:1587-1595)
        desc, key = _sc_descriptor(deskewed, scan_mask)
        new_idx = self.store.append(
            pose, stamp, np.asarray(ds_xyz), np.asarray(ds_mask), np.asarray(desc), np.asarray(key)
        )

        loop_or_gps = False
        # odom factor (addOdomFactor, :1386-1400)
        if new_idx > 0:
            prev_pose = self.store.poses[new_idx - 1]
            rel = np.asarray(
                se3.pose_between(
                    jnp.asarray(prev_pose, jnp.float32), jnp.asarray(pose, jnp.float32)
                )
            )
            self.edges.append(
                dict(
                    i=new_idx - 1,
                    j=new_idx,
                    rel=rel,
                    sigma=np.asarray([1e-3] * 3 + [1e-2] * 3, np.float32),
                    cauchy=0.0,
                )
            )

        # GPS factor (addGPSFactor, :1402-1480)
        loop_or_gps |= self._maybe_add_gps_factor(new_idx, stamp, pose)

        # loop factors (addLoopFactor, :1482-1501)
        if self.pending_loops:
            for f in self.pending_loops:
                self.edges.append(
                    dict(
                        i=f.idx_from,
                        j=f.idx_to,
                        rel=f.rel_pose,
                        sigma=f.sigma,
                        cauchy=f.cauchy,
                    )
                )
            self.pending_loops.clear()
            loop_or_gps = True

        # solve
        if new_idx > 0:
            self._solve_graph(full=loop_or_gps)
            pose[:] = self.store.poses[new_idx]

        # rebuild local map around the (possibly corrected) pose
        self._rebuild_grid(pose, stamp)

    def _maybe_add_gps_factor(self, new_idx, stamp, pose) -> bool:
        """addGPSFactor gating: time alignment +-0.2 s, covariance gate,
        elevation override, >=5 m spacing. (The reference's pose-covariance
        gate needs graph marginals; approximated by the spacing rule.)"""
        cfg = self.cfg
        added = False
        while self.gps_queue:
            ts, enu, cov = self.gps_queue[0]
            if ts < stamp - 0.2:
                self.gps_queue.pop(0)
                continue
            if ts > stamp + 0.2:
                break
            self.gps_queue.pop(0)
            if cov[0] > cfg.gpsCovThreshold or cov[1] > cfg.gpsCovThreshold:
                continue
            gx, gy, gz = float(enu[0]), float(enu[1]), float(enu[2])
            nz = float(cov[2])
            if not cfg.useGpsElevation:
                gz = float(pose[5])
                nz = 0.01
            if abs(gx) < 1e-6 and abs(gy) < 1e-6:
                continue
            cur = np.array([gx, gy, gz])
            if self.last_gps_xyz is not None and np.linalg.norm(cur - self.last_gps_xyz) < 5.0:
                continue
            self.last_gps_xyz = cur
            sig = np.sqrt(np.maximum([cov[0], cov[1], nz], 1.0)).astype(np.float32)
            self.gps_factors.append(dict(i=new_idx, t=cur.astype(np.float32), sigma=sig))
            added = True
            break
        return added

    def _solve_graph(self, full: bool):
        k = self.store.count
        K = 1 << max(8, int(np.ceil(np.log2(max(k, 2)))))
        E = 1 << max(8, int(np.ceil(np.log2(max(len(self.edges), 2)))))
        G = 1 << max(4, int(np.ceil(np.log2(max(len(self.gps_factors), 2)))))
        g = pg.empty_graph(K, E, G)

        poses = self.store.poses[:k]
        Rs = np.stack([np.asarray(se3.euler_to_rot(jnp.asarray(p[:3]))) for p in poses])
        Rs_full = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
        Rs_full[:k] = Rs
        ts_full = np.zeros((K, 3), np.float32)
        ts_full[:k] = poses[:, 3:6]

        e = self.edges
        e_i = np.zeros(E, np.int32)
        e_j = np.zeros(E, np.int32)
        e_Rm = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
        e_tm = np.zeros((E, 3), np.float32)
        e_si = np.ones((E, 6), np.float32)
        e_c = np.zeros(E, np.float32)
        e_m = np.zeros(E, bool)
        for idx, ed in enumerate(e):
            e_i[idx] = ed["i"]
            e_j[idx] = ed["j"]
            e_Rm[idx] = np.asarray(se3.euler_to_rot(jnp.asarray(ed["rel"][:3], jnp.float32)))
            e_tm[idx] = ed["rel"][3:6]
            e_si[idx] = 1.0 / ed["sigma"]
            e_c[idx] = ed["cauchy"]
            e_m[idx] = True

        g_i = np.zeros(G, np.int32)
        g_t = np.zeros((G, 3), np.float32)
        g_si = np.ones((G, 3), np.float32)
        g_m = np.zeros(G, bool)
        for idx, gf in enumerate(self.gps_factors):
            g_i[idx] = gf["i"]
            g_t[idx] = gf["t"]
            g_si[idx] = 1.0 / gf["sigma"]
            g_m[idx] = True

        g = g._replace(
            Rs=jnp.asarray(Rs_full),
            ts=jnp.asarray(ts_full),
            node_mask=jnp.asarray(np.arange(K) < k),
            e_i=jnp.asarray(e_i),
            e_j=jnp.asarray(e_j),
            e_Rm=jnp.asarray(e_Rm),
            e_tm=jnp.asarray(e_tm),
            e_sqrt_info=jnp.asarray(e_si),
            e_cauchy=jnp.asarray(e_c),
            e_mask=jnp.asarray(e_m),
            g_i=jnp.asarray(g_i),
            g_t=jnp.asarray(g_t),
            g_sqrt_info=jnp.asarray(g_si),
            g_mask=jnp.asarray(g_m),
            prior_R=jnp.asarray(Rs[0]),
            prior_t=jnp.asarray(poses[0, 3:6]),
        )
        free_from = 0 if full else max(0, k - self.cfg.graph_window)
        params = (
            pg.SolveParams(gn_iters=6, pcg_iters=96)
            if full
            else pg.SolveParams(gn_iters=3, pcg_iters=32)
        )
        solved = pg.solve(g, free_from=jnp.asarray(free_from, jnp.int32), params=params)
        rpy = np.asarray(se3.rot_to_euler(solved.Rs[:k]))
        new_poses = np.concatenate([rpy, np.asarray(solved.ts[:k])], axis=1)
        self.store.update_poses(new_poses.astype(np.float32))

    def _rebuild_grid(self, pose, stamp):
        cfg = self.cfg
        dev = self.store.device_arrays()
        self.grid = assemble_local_map(
            dev["poses"],
            dev["clouds"],
            dev["cloud_masks"],
            jnp.asarray(self.store.times - self._time_base(stamp), jnp.float32),
            jnp.asarray(self.store.count, jnp.int32),
            jnp.asarray(pose[3:6], jnp.float32),
            jnp.asarray(stamp - self._time_base(stamp), jnp.float32),
            radius=cfg.surroundingKeyframeSearchRadius,
            recent_seconds=10.0,
            near_cap=cfg.near_kf_capacity,
            map_cap=cfg.map_capacity,
            leaf=cfg.surroundingKeyframeMapLeafSize,
            cell_size=cfg.grid_cell_size,
        )

    # ------------------------------------------------------------------
    # outputs
    # ------------------------------------------------------------------
    def trajectory_arrays(self):
        times = np.array([f.stamp for f in self.trajectory])
        poses = np.stack([f.pose for f in self.trajectory])
        return times, poses

    def keyframe_trajectory(self):
        return self.store.times[: self.store.count], self.store.poses[: self.store.count]

    def save_tum(self, path: str):
        from ..eval.metrics import save_tum

        times, poses = self.trajectory_arrays()
        quats = np.asarray(se3.rot_to_quat(se3.euler_to_rot(jnp.asarray(poses[:, :3]))))
        save_tum(path, times, poses[:, 3:6], quats)
