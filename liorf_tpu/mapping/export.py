"""Map export + SLAM-state checkpointing.

``save_map`` mirrors the reference's save_map service
(``/root/reference/src/mapOptmization.cpp:379-432``, ``srv/save_map.srv``):
writes trajectory.pcd, transformations.pcd, SurfMap.pcd and GlobalMap.pcd
(optionally voxel-downsampled to a requested resolution).

``save_checkpoint``/``load_checkpoint`` add what the reference lacks
(SURVEY §5.4): a full mid-run snapshot — keyframe store, factor lists,
fusion filter, loop registry — so a SLAM session can resume.
"""

from __future__ import annotations

import os
import pickle

import jax.numpy as jnp
import numpy as np

from ..core import se3, se3np
from ..core.pointcloud import make_cloud
from ..core.voxel import voxel_downsample
from ..utils.pcdio import save_pcd

# Defaults for ResidentState fields added AFTER a checkpoint was written
# (resident-v2 stores the state as a field dict precisely so new fields
# can be filled here instead of breaking unpickling). Keyed by field name;
# each default takes the pipeline config.
_RESIDENT_FIELD_DEFAULTS = {
    "imu_traj": lambda cfg: np.zeros((cfg.imu_rate_capacity, 8), np.float32),
    "imu_count": lambda cfg: np.asarray(0, np.int32),
    "pending_loop": lambda cfg: np.asarray(False),
}


def global_map_points(store, max_points_per_kf: int | None = None) -> np.ndarray:
    """All keyframe clouds fused in the world frame -> [N, 4] xyzi."""
    pts = []
    for k in range(store.count):
        mask = store.cloud_masks[k]
        cloud = store.clouds[k][mask]
        if max_points_per_kf:
            cloud = cloud[:max_points_per_kf]
        pose = store.poses[k]
        # host-side euler->rot: avoids a device roundtrip per keyframe
        R = se3np.euler_to_rot(pose[:3]).astype(np.float32)
        world = cloud @ R.T + pose[3:6]
        inten = np.full(len(world), float(k), np.float32)
        pts.append(np.concatenate([world, inten[:, None]], axis=1))
    if not pts:
        return np.zeros((0, 4), np.float32)
    return np.concatenate(pts).astype(np.float32)


def save_map(pipeline, directory: str, resolution: float = 0.0) -> bool:
    """Write trajectory/transformations/SurfMap/GlobalMap PCDs."""
    os.makedirs(directory, exist_ok=True)
    store = pipeline.store
    k = store.count
    poses = store.poses[:k]
    times = store.times[:k]

    save_pcd(
        os.path.join(directory, "trajectory.pcd"),
        dict(
            x=poses[:, 3], y=poses[:, 4], z=poses[:, 5],
            intensity=np.arange(k, dtype=np.float32),
        ),
    )
    save_pcd(
        os.path.join(directory, "transformations.pcd"),
        dict(
            x=poses[:, 3], y=poses[:, 4], z=poses[:, 5],
            intensity=np.arange(k, dtype=np.float32),
            roll=poses[:, 0], pitch=poses[:, 1], yaw=poses[:, 2],
            time=(times - (times[0] if k else 0.0)).astype(np.float32),
        ),
    )

    cloud = global_map_points(store)
    if resolution > 0 and len(cloud):
        cap = 1 << int(np.ceil(np.log2(max(len(cloud), 2))))
        pc = make_cloud(cloud[:, :3], intensity=cloud[:, 3], capacity=cap)
        ds = voxel_downsample(pc, resolution)
        m = np.asarray(ds.cloud.mask)
        cloud = np.concatenate(
            [np.asarray(ds.cloud.xyz)[m], np.asarray(ds.cloud.intensity)[m][:, None]],
            axis=1,
        )
    for name in ("SurfMap.pcd", "GlobalMap.pcd"):
        save_pcd(
            os.path.join(directory, name),
            dict(x=cloud[:, 0], y=cloud[:, 1], z=cloud[:, 2], intensity=cloud[:, 3]),
        )
    return True


def save_checkpoint(pipeline, path: str):
    """Snapshot the full SLAM state for resume.

    Two formats: the device-resident pipeline is snapshotted exactly (its
    whole ResidentState pytree — keyframe/factor/trajectory rings, fusion
    filter, grid — pulled once), so resume is bit-exact; the classic host
    pipeline keeps its host-structured format.
    """
    if getattr(pipeline, "state", None) is not None:  # ResidentPipeline
        import jax

        state_np = jax.tree_util.tree_map(np.asarray, pipeline.state)
        # v2: the state is stored as a {field: value} dict rather than a
        # pickled ResidentState NamedTuple, so checkpoints survive fields
        # being ADDED to ResidentState later (missing fields are filled
        # with defaults on load instead of failing inside pickle with an
        # opaque constructor TypeError).
        payload = dict(
            format="resident-v2",
            state=dict(state_np._asdict()),
            stamps=list(getattr(pipeline, "_stamps", [])),
            time_base=pipeline._time_base_val,
            frame_idx=pipeline.frame_idx,
            last_scan_stamp=pipeline.last_scan_stamp,
            imu_queue=pipeline.imu_queue[-1024:],
            gps_queue=list(pipeline.gps_queue),
            gps_datum=pipeline.gps_conv._datum,
        )
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        return

    store = pipeline.store
    state = dict(
        count=store.count,
        poses=store.poses[: store.count],
        times=store.times[: store.count],
        clouds=store.clouds[: store.count],
        cloud_masks=store.cloud_masks[: store.count],
        sc_descs=store.sc_descs[: store.count],
        sc_keys=store.sc_keys[: store.count],
        edges=pipeline.edges,
        gps_factors=pipeline.gps_factors,
        pose_cov=np.asarray(pipeline.pose_cov),
        last_gps_xyz=pipeline.last_gps_xyz,
        loop_index=pipeline.loop_detector.loop_index_container,
        last_pose=pipeline.last_pose,
        last_scan_stamp=pipeline.last_scan_stamp,
        frame_idx=pipeline.frame_idx,
        trajectory=[(f.stamp, f.pose) for f in pipeline.trajectory],
        filter=None
        if pipeline.filter is None
        else dict(
            mean=[np.asarray(x) for x in pipeline.filter.mean],
            sqrt_info=np.asarray(pipeline.filter.sqrt_info),
        ),
        time_base=pipeline._time_base_val,
    )
    with open(path, "wb") as f:
        pickle.dump(state, f)


def load_checkpoint(pipeline, path: str):
    """Restore a snapshot into a freshly constructed pipeline."""
    from ..imu.fusion import FusionFilter, FusionState
    from ..pipeline.slam import FrameResult

    try:
        with open(path, "rb") as f:
            state = pickle.load(f)
    except TypeError as e:
        # resident-v1 checkpoints pickled the ResidentState NamedTuple
        # directly; if the tuple layout changed since the checkpoint was
        # written, unpickling raises an opaque constructor TypeError here.
        raise ValueError(
            f"checkpoint {path!r} was written by an older liorf_tpu version "
            "whose ResidentState layout no longer matches (resident-v1 "
            "pickled the state tuple directly). Re-create the checkpoint "
            "with this version, or load it with the version that wrote it."
        ) from e

    if isinstance(state, dict) and state.get("format") in (
        "resident-v1", "resident-v2",
    ):
        import jax

        from ..pipeline.resident import ResidentState

        if not hasattr(pipeline, "sync"):  # ResidentPipeline only
            raise ValueError(
                f"{state['format']} checkpoint requires a ResidentPipeline "
                "(make_pipeline(cfg))"
            )
        saved = state["state"]
        if isinstance(saved, dict):  # v2 field-dict layout
            extra = set(saved) - set(ResidentState._fields)
            missing = set(ResidentState._fields) - set(saved)
            unfillable = missing - set(_RESIDENT_FIELD_DEFAULTS)
            if unfillable:
                raise ValueError(
                    f"checkpoint {path!r} lacks ResidentState fields "
                    f"{sorted(unfillable)} with no known default — it was "
                    "written by an incompatible liorf_tpu version."
                )
            fields = {k: v for k, v in saved.items() if k not in extra}
            for name in missing:
                fields[name] = _RESIDENT_FIELD_DEFAULTS[name](pipeline.cfg)
            restored = ResidentState(**fields)
        else:  # v1: the NamedTuple itself (layout already validated by load)
            restored = saved
        traj = np.asarray(restored.traj)
        if traj.shape[1] == 10:
            # pre-r3 ring without the (slot, kf-pose-then) re-anchoring
            # columns: anchor every frame on keyframe 0, whose prior keeps
            # it fixed — the correction evaluates to the identity
            anchor = np.asarray(restored.kf_poses)[0].astype(np.float32)
            pad = np.concatenate(
                [
                    np.zeros((traj.shape[0], 1), np.float32),
                    np.tile(anchor, (traj.shape[0], 1)),
                ],
                axis=1,
            )
            restored = restored._replace(
                traj=np.concatenate([traj.astype(np.float32), pad], axis=1)
            )
        pipeline.state = jax.tree_util.tree_map(jnp.asarray, restored)
        # seed the host-side ring-count bounds from the snapshot so growth
        # checks stay exact after resume (invariant owned by ResidentPipeline)
        pipeline.seed_ring_bounds(restored, int(state["frame_idx"]))
        pipeline._stamps = list(state["stamps"])
        pipeline._time_base_val = state["time_base"]
        pipeline.frame_idx = state["frame_idx"]
        pipeline.last_scan_stamp = state["last_scan_stamp"]
        pipeline.imu_queue = list(state["imu_queue"])
        pipeline.gps_queue = list(state["gps_queue"])
        if state["gps_datum"] is not None:
            pipeline.gps_conv._datum = state["gps_datum"]
        pipeline._synced = False
        return pipeline
    store = pipeline.store
    n = state["count"]
    while store.kf_cap < n:
        store._grow()
    store.count = n
    store.poses[:n] = state["poses"]
    store.times[:n] = state["times"]
    store.clouds[:n] = state["clouds"]
    store.cloud_masks[:n] = state["cloud_masks"]
    store.sc_descs[:n] = state["sc_descs"]
    store.sc_keys[:n] = state["sc_keys"]
    store.invalidate_device()
    pipeline.edges = state["edges"]
    pipeline.gps_factors = state["gps_factors"]
    if "pose_cov" in state:
        pipeline.pose_cov = np.asarray(state["pose_cov"], np.float64)
        pipeline.last_gps_xyz = state["last_gps_xyz"]
    pipeline.loop_detector.loop_index_container = state["loop_index"]
    pipeline.last_pose = state["last_pose"]
    pipeline.last_scan_stamp = state["last_scan_stamp"]
    pipeline.frame_idx = state["frame_idx"]
    pipeline.trajectory = [
        FrameResult(stamp=t, pose=p, degenerate=False, is_keyframe=False, num_matched=0)
        for t, p in state["trajectory"]
    ]
    if state["filter"] is not None:
        mean = FusionState(*[jnp.asarray(x) for x in state["filter"]["mean"]])
        pipeline.filter = FusionFilter(
            mean=mean, sqrt_info=jnp.asarray(state["filter"]["sqrt_info"])
        )
    pipeline._time_base_val = state["time_base"]
    if n and pipeline.last_scan_stamp is not None:
        pipeline._rebuild_grid(pipeline.last_pose, pipeline.last_scan_stamp)
    return pipeline
