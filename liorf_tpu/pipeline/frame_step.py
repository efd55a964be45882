"""The fused per-frame device program.

One jit call covers the entire per-scan hot path — deskew, scan voxel
downsample, IMU preintegration, initial-guess prediction, scan-to-map GN
registration, fixed-lag fusion (with in-graph divergence reinit), keyframe
gating, and the ScanContext descriptor — so a frame costs a single host ->
device dispatch plus one small result pull. This is what makes the 10 Hz
serial SLAM chain fast on an accelerator: intra-scan parallelism inside one
XLA program, not many small ops (SURVEY §7 "sequential latency").
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import se3
from ..core.voxel import voxel_downsample_xyz
from ..imu import fusion as imu_fusion
from ..imu import preintegration as preint
from ..ops import scancontext
from ..ops.deskew import deskew_scan, integrate_gyro
from ..ops.knn import SpatialHashGrid
from ..ops.scan_match import ScanMatchParams, scan_to_map


class FrameParams(NamedTuple):
    leaf: float
    scan_cap: int
    match: ScanMatchParams
    fusion: imu_fusion.FusionParams
    z_tol: float
    rot_tol: float
    kf_dist: float
    kf_angle: float
    imu_rpy_weight: float = 0.0  # 9-axis roll/pitch slerp (imuRPYWeight)
    # gyro-interpolated motion compensation (imageProjection deskewPoint,
    # imageProjection.cpp:536-565). Static: False compiles the deskew out —
    # exists so the deskew-stressor tests can prove deskew-on beats
    # deskew-off on aggressive-rotation sequences
    deskew: bool = True


class FrameOutputs(NamedTuple):
    pose: jax.Array  # [6]
    degenerate: jax.Array
    converged: jax.Array
    num_matched: jax.Array
    is_kf: jax.Array
    filter: imu_fusion.FusionFilter
    diverged: jax.Array
    ds_xyz: jax.Array
    ds_mask: jax.Array
    sc_desc: jax.Array
    sc_key: jax.Array
    deskewed: jax.Array
    # Packed buffers so the host needs exactly ONE small pull per frame
    # (summary) plus ONE per keyframe (kf_payload): device->host pulls cost
    # a full tunnel roundtrip each (~30 ms), so per-frame scalars must
    # travel together.
    summary: jax.Array  # [12] f32: pose(6), degenerate, converged, is_kf, num_matched, diverged, pad
    kf_payload: jax.Array  # [scan_cap*4 + 20*60 + 20] f32: ds_xyz, ds_mask, sc_desc, sc_key


def _pack_summary(pose, degenerate, converged, is_kf, num_matched, diverged):
    return jnp.concatenate(
        [
            pose.astype(jnp.float32),
            jnp.stack(
                [
                    degenerate.astype(jnp.float32),
                    converged.astype(jnp.float32),
                    is_kf.astype(jnp.float32),
                    num_matched.astype(jnp.float32),
                    diverged.astype(jnp.float32),
                    jnp.float32(0.0),
                ]
            ),
        ]
    )


def _pack_kf_payload(ds_xyz, ds_mask, desc, key):
    return jnp.concatenate(
        [
            ds_xyz.astype(jnp.float32).ravel(),
            ds_mask.astype(jnp.float32),
            desc.astype(jnp.float32).ravel(),
            key.astype(jnp.float32),
        ]
    )


def unpack_summary(s):
    """Host-side: one pulled [12] f32 vector -> python scalars."""
    import numpy as np

    s = np.asarray(s)
    return dict(
        pose=s[:6].astype(np.float32),
        degenerate=bool(s[6]),
        converged=bool(s[7]),
        is_kf=bool(s[8]),
        num_matched=int(s[9]),
        diverged=bool(s[10]),
    )


def unpack_kf_payload(p, scan_cap: int):
    """Host-side: one pulled flat f32 buffer -> (ds_xyz, ds_mask, desc, key)."""
    import numpy as np

    p = np.asarray(p)
    o = 0
    ds_xyz = p[o : o + scan_cap * 3].reshape(scan_cap, 3)
    o += scan_cap * 3
    ds_mask = p[o : o + scan_cap] > 0.5
    o += scan_cap
    desc = p[o : o + 20 * 60].reshape(20, 60)
    o += 20 * 60
    key = p[o : o + 20]
    return ds_xyz, ds_mask, desc, key


class FrameCore(NamedTuple):
    """Shared per-frame computation results (see frame_core)."""

    pose: jax.Array  # [6] post-slerp/clamp registered pose
    degenerate: jax.Array
    converged: jax.Array
    num_matched: jax.Array
    is_kf: jax.Array
    filter: imu_fusion.FusionFilter  # post-correction (divergence-reinit'd)
    diverged: jax.Array
    deskewed: jax.Array  # [cap, 3]
    ds_xyz: jax.Array
    ds_mask: jax.Array


def frame_core(
    xyz, rel_t, mask, scan_start,
    dk_times, dk_gyr, dk_mask,
    fu_acc, fu_gyr, fu_dts, fu_mask,
    grid: SpatialHashGrid,
    filt: imu_fusion.FusionFilter,
    last_kf_pose: jax.Array,
    params: FrameParams,
    imu_rpy: jax.Array | None = None,
    imu_rpy_ok: jax.Array | None = None,
) -> FrameCore:
    """SINGLE source of truth for the per-frame policy chain shared by the
    classic (frame_step) and device-resident (resident.resident_step)
    pipelines: deskew -> voxel downsample -> IMU preintegration guess ->
    scan-to-map GN -> 9-axis attitude slerp + z/rot clamps
    (transformUpdate, mapOptmization.cpp:1323-1353) -> fusion correction
    with divergence reinit -> keyframe gate (saveFrame, :1365-1384).
    Traced inside each caller's jit program."""
    # --- front-end: deskew + downsample (imageProjection) ---
    if params.deskew:
        tl = integrate_gyro(dk_times, dk_gyr, dk_mask)
        deskewed = deskew_scan(xyz, rel_t, mask, scan_start, tl)
    else:
        deskewed = xyz
    ds_xyz, ds_mask = voxel_downsample_xyz(deskewed, mask, params.leaf, params.scan_cap)

    # --- initial guess: IMU preintegration from the filter state ---
    pre = preint.preintegrate(
        fu_acc, fu_gyr, fu_dts, fu_mask, filt.mean.ba, filt.mean.bg,
        params.fusion.imu,
    )
    nav = preint.predict(
        preint.NavState(R=filt.mean.R, p=filt.mean.p, v=filt.mean.v),
        pre, filt.mean.ba, filt.mean.bg, params.fusion.imu,
    )
    guess = jnp.concatenate([se3.rot_to_euler(nav.R), nav.p])

    # --- scan-to-map GN (mapOptmization.scan2MapOptimization) ---
    res = scan_to_map(ds_xyz, ds_mask, grid, guess, params.match)
    pose = res.pose
    # transformUpdate 9-axis attitude blending (mapOptmization.cpp:1323-1346)
    if imu_rpy is not None and params.imu_rpy_weight > 0:
        w = params.imu_rpy_weight
        roll_s = se3.euler_slerp(
            jnp.array([pose[0], 0.0, 0.0]), jnp.array([imu_rpy[0], 0.0, 0.0]), w
        )[0]
        pitch_s = se3.euler_slerp(
            jnp.array([0.0, pose[1], 0.0]), jnp.array([0.0, imu_rpy[1], 0.0]), w
        )[1]
        use = imu_rpy_ok & (jnp.abs(imu_rpy[1]) < 1.4)
        pose = pose.at[0].set(jnp.where(use, roll_s, pose[0]))
        pose = pose.at[1].set(jnp.where(use, pitch_s, pose[1]))
    pose = pose.at[0].set(jnp.clip(pose[0], -params.rot_tol, params.rot_tol))
    pose = pose.at[1].set(jnp.clip(pose[1], -params.rot_tol, params.rot_tol))
    pose = pose.at[5].set(jnp.clip(pose[5], -params.z_tol, params.z_tol))

    # --- fusion correction with in-graph divergence reinit ---
    R_l = se3.euler_to_rot(pose[:3])
    p_l = pose[3:]
    step = imu_fusion.fusion_step(
        filt, pre, R_l, p_l, res.degenerate, params.fusion
    )
    fresh = imu_fusion.init_filter(R_l, p_l, params.fusion)
    new_filt = jax.tree_util.tree_map(
        lambda a, b: jnp.where(step.diverged, a, b), fresh, step.filter
    )

    # --- keyframe gating (saveFrame) ---
    rel = se3.pose_between(last_kf_pose, pose)
    is_kf = (jnp.abs(rel[:3]) > params.kf_angle).any() | (
        jnp.linalg.norm(rel[3:]) > params.kf_dist
    )

    return FrameCore(
        pose=pose,
        degenerate=res.degenerate,
        converged=res.converged,
        num_matched=res.num_matched,
        is_kf=is_kf,
        filter=new_filt,
        diverged=step.diverged,
        deskewed=deskewed,
        ds_xyz=ds_xyz,
        ds_mask=ds_mask,
    )


@partial(jax.jit, static_argnames=("params",))
def frame_step(
    # scan
    xyz: jax.Array,  # [cap, 3]
    rel_t: jax.Array,  # [cap]
    mask: jax.Array,  # [cap]
    scan_start: jax.Array,  # [] rebased seconds
    # deskew IMU window (covers the sweep)
    dk_times: jax.Array,
    dk_gyr: jax.Array,
    dk_mask: jax.Array,
    # fusion IMU window (previous scan -> this scan)
    fu_acc: jax.Array,
    fu_gyr: jax.Array,
    fu_dts: jax.Array,
    fu_mask: jax.Array,
    # state
    grid: SpatialHashGrid,
    filt: imu_fusion.FusionFilter,
    last_kf_pose: jax.Array,  # [6]
    params: FrameParams,
    imu_rpy: jax.Array | None = None,  # [3] 9-axis attitude at scan start
    imu_rpy_ok: jax.Array | None = None,  # [] bool
) -> FrameOutputs:
    core = frame_core(
        xyz, rel_t, mask, scan_start, dk_times, dk_gyr, dk_mask,
        fu_acc, fu_gyr, fu_dts, fu_mask, grid, filt, last_kf_pose,
        params, imu_rpy, imu_rpy_ok,
    )

    # --- ScanContext descriptor on the deskewed full cloud ---
    desc = scancontext.make_descriptor(core.deskewed, mask)
    key = scancontext.ring_key(desc)

    return FrameOutputs(
        pose=core.pose,
        degenerate=core.degenerate,
        converged=core.converged,
        num_matched=core.num_matched,
        is_kf=core.is_kf,
        filter=core.filter,
        diverged=core.diverged,
        ds_xyz=core.ds_xyz,
        ds_mask=core.ds_mask,
        sc_desc=desc,
        sc_key=key,
        deskewed=core.deskewed,
        summary=_pack_summary(
            core.pose, core.degenerate, core.converged, core.is_kf,
            core.num_matched, core.diverged,
        ),
        kf_payload=_pack_kf_payload(core.ds_xyz, core.ds_mask, desc, key),
    )


@partial(jax.jit, static_argnames=("params",))
def bootstrap_step(
    xyz, rel_t, mask, scan_start, dk_times, dk_gyr, dk_mask,
    init_pose: jax.Array, params: FrameParams
):
    """First frame: deskew + downsample + descriptor + filter init."""
    if params.deskew:
        tl = integrate_gyro(dk_times, dk_gyr, dk_mask)
        deskewed = deskew_scan(xyz, rel_t, mask, scan_start, tl)
    else:
        deskewed = xyz
    ds_xyz, ds_mask = voxel_downsample_xyz(deskewed, mask, params.leaf, params.scan_cap)
    desc = scancontext.make_descriptor(deskewed, mask)
    key = scancontext.ring_key(desc)
    filt = imu_fusion.init_filter(
        se3.euler_to_rot(init_pose[:3]), init_pose[3:], params.fusion
    )
    return ds_xyz, ds_mask, desc, key, filt, deskewed, _pack_kf_payload(
        ds_xyz, ds_mask, desc, key
    )
