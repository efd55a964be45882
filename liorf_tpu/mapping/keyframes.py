"""Keyframe store and local-map assembly.

Host-shell + device-core replacement for the reference back-end's keyframe
state (``cloudKeyPoses3D/6D``, ``surfCloudKeyFrames``, transformed-cloud
cache; ``/root/reference/src/mapOptmization.cpp:975-1058``). Keyframe
clouds live in fixed-capacity device arrays; the fused local map is
recomputed on device (transform + concat + voxel filter) — recompute is
cheap on TPU, replacing the reference's host-side cache with 1000-entry
eviction (``:1042-1043``).

Capacity doubling happens host-side (numpy pad + re-upload), bounding the
number of distinct jit specializations via power-of-two bucketing.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..core.pointcloud import PAD_COORD
from ..core.voxel import voxel_downsample_xyz
from ..ops import knn


@partial(jax.jit, static_argnames=("cap",))
def subsample_to_cap(xyz: jax.Array, mask: jax.Array, cap: int):
    """Reduce a (valid-prefix) masked cloud to `cap` slots WITHOUT spatial
    bias: the voxel filter emits points in cell-sort order, so a plain
    prefix `[:cap]` would systematically drop one side of the scan when it
    overflows. Instead take an even stride over the n valid points (a fair
    spatial subsample given the sort interleaves cells). jit-traceable."""
    n = jnp.sum(mask.astype(jnp.int32))
    ar = jnp.arange(cap, dtype=jnp.int32)
    idx = jnp.where(n > cap, (ar * n) // cap, ar)
    return xyz[idx], mask[idx]


def subsample_to_cap_np(xyz, mask, cap: int):
    """NumPy twin of :func:`subsample_to_cap` for the host keyframe store."""
    import numpy as _np

    n = int(_np.sum(mask))
    ar = _np.arange(cap)
    idx = _np.where(n > cap, (ar * n) // cap, ar)
    idx = _np.minimum(idx, len(mask) - 1)
    return xyz[idx], mask[idx]


@jax.jit
def _set_row(arr: jax.Array, i, row: jax.Array) -> jax.Array:
    return arr.at[i].set(row)


class KeyframeStore:
    """Append-only store of keyframe poses, clouds, times, SC descriptors."""

    def __init__(self, cloud_capacity: int = 8192, initial_kf_capacity: int = 256):
        self.cloud_cap = cloud_capacity
        self.kf_cap = initial_kf_capacity
        self.count = 0
        k, c = self.kf_cap, self.cloud_cap
        self.poses = np.zeros((k, 6), np.float32)  # rpyxyz (optimized)
        self.times = np.zeros((k,), np.float64)
        self.clouds = np.full((k, c, 3), PAD_COORD, np.float32)  # sensor frame
        self.cloud_masks = np.zeros((k, c), bool)
        self.sc_descs = np.zeros((k, 20, 60), np.float32)
        self.sc_keys = np.zeros((k, 20), np.float32)
        self._dev = None

    def _grow(self):
        self.kf_cap *= 2
        for name in ("poses", "times", "clouds", "cloud_masks", "sc_descs", "sc_keys"):
            arr = getattr(self, name)
            pad_shape = (self.kf_cap - arr.shape[0],) + arr.shape[1:]
            fill = PAD_COORD if name == "clouds" else 0
            pad = np.full(pad_shape, fill, arr.dtype) if name == "clouds" else np.zeros(
                pad_shape, arr.dtype
            )
            setattr(self, name, np.concatenate([arr, pad]))

    def append(self, pose_rpyxyz, time, cloud_xyz, cloud_mask, sc_desc, sc_key) -> int:
        if self.count == self.kf_cap:
            self._grow()
            self._dev = None  # capacity changed: device mirror rebuilt lazily
        i = self.count
        self.poses[i] = np.asarray(pose_rpyxyz, np.float32)
        self.times[i] = time
        cloud_xyz = np.asarray(cloud_xyz, np.float32)
        cloud_mask = np.asarray(cloud_mask, bool)
        if len(cloud_xyz) >= self.cloud_cap:
            cloud_xyz, cloud_mask = subsample_to_cap_np(
                cloud_xyz, cloud_mask, self.cloud_cap
            )
        n = min(len(cloud_xyz), self.cloud_cap)
        self.clouds[i, :n] = cloud_xyz[:n]
        self.clouds[i, n:] = PAD_COORD
        self.cloud_masks[i, :n] = cloud_mask[:n]
        self.cloud_masks[i, n:] = False
        self.sc_descs[i] = np.asarray(sc_desc, np.float32)
        self.sc_keys[i] = np.asarray(sc_key, np.float32)
        self.count += 1
        # incremental device update: only the new row crosses the wire
        if self._dev is not None:
            d = self._dev
            d["clouds"] = _set_row(d["clouds"], i, jnp.asarray(self.clouds[i]))
            d["cloud_masks"] = _set_row(
                d["cloud_masks"], i, jnp.asarray(self.cloud_masks[i])
            )
            d["sc_descs"] = _set_row(d["sc_descs"], i, jnp.asarray(self.sc_descs[i]))
            d["sc_keys"] = _set_row(d["sc_keys"], i, jnp.asarray(self.sc_keys[i]))
            d["poses"] = jnp.asarray(self.poses)  # small [K, 6]
        return i

    def update_poses(self, poses_rpyxyz: np.ndarray):
        """Rewrite all keyframe poses after graph relaxation (correctPoses,
        mapOptmization.cpp:1611-1642)."""
        self.poses[: self.count] = poses_rpyxyz[: self.count]
        if self._dev is not None:
            self._dev["poses"] = jnp.asarray(self.poses)

    def device_arrays(self):
        """Device mirror of the store (incrementally maintained)."""
        if self._dev is None:
            self._dev = {
                "poses": jnp.asarray(self.poses),
                "clouds": jnp.asarray(self.clouds),
                "cloud_masks": jnp.asarray(self.cloud_masks),
                "sc_descs": jnp.asarray(self.sc_descs),
                "sc_keys": jnp.asarray(self.sc_keys),
            }
        return self._dev

    def invalidate_device(self):
        self._dev = None

    def positions(self) -> np.ndarray:
        return self.poses[: self.count, 3:6]


@partial(jax.jit, static_argnames=("near_cap", "map_cap", "leaf", "cell_size"))
def assemble_local_map(
    kf_poses: jax.Array,  # [K, 6] rpyxyz
    kf_clouds: jax.Array,  # [K, C, 3]
    kf_cloud_masks: jax.Array,  # [K, C]
    kf_times: jax.Array,  # [K]
    kf_count: jax.Array,  # [] int32
    center: jax.Array,  # [3] current position
    now: jax.Array,  # [] current time (same clock as kf_times)
    radius: float,
    recent_seconds: float,
    near_cap: int,
    map_cap: int,
    leaf: float,
    cell_size: float,
    density: float = 2.0,
) -> knn.SpatialHashGrid:
    """Select nearby keyframes, fuse their world-frame clouds, voxel-filter,
    and build the correspondence grid.

    Mirrors ``extractNearby``/``extractCloud`` (mapOptmization.cpp:975-1058):
    radius search over keyframe positions, *density-filtered* to one
    keyframe per ``density``-sized position voxel (the reference's
    ``surroundingKeyframeDensity`` downsample of the selected poses,
    :991-997 — without it a slow revisit fills the whole keyframe budget
    with redundant views), plus all keyframes from the last
    `recent_seconds` (appended after the density filter, :999-1007), fused
    and downsampled at `leaf`.
    """
    K = kf_poses.shape[0]
    idx = jnp.arange(K, dtype=jnp.int32)
    valid = idx < kf_count
    pos = kf_poses[:, 3:6]
    d2 = jnp.sum((pos - center) ** 2, axis=-1)
    near_r = valid & (d2 <= radius * radius)
    recent = valid & ((now - kf_times) < recent_seconds)

    # density filter: keep the keyframe closest to the current position per
    # density cell (exact two-key cell identity: x | packed yz, 15 bits/axis)
    sentinel = jnp.int32(2**31 - 1)
    cell = jnp.floor(pos / density).astype(jnp.int32) + (1 << 14)
    cell = jnp.clip(cell, 0, (1 << 15) - 1)
    kx = jnp.where(near_r, cell[:, 0], sentinel)
    kyz = jnp.where(near_r, (cell[:, 1] << 15) | cell[:, 2], sentinel)
    order = jnp.lexsort((d2, kyz, kx))  # group by cell, ties by distance
    kx_s, kyz_s = kx[order], kyz[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), (kx_s[1:] != kx_s[:-1]) | (kyz_s[1:] != kyz_s[:-1])]
    )
    rep = jnp.zeros((K,), bool).at[order].set(first & near_r[order])
    near = rep | recent

    # take up to near_cap selected keyframes, preferring the closest
    order_key = jnp.where(near, d2, jnp.inf)
    sel = jnp.argsort(order_key)[:near_cap]  # [near_cap]
    sel_ok = jnp.isfinite(order_key[sel])

    poses_sel = kf_poses[sel]
    clouds_sel = kf_clouds[sel]  # [near_cap, C, 3]
    masks_sel = kf_cloud_masks[sel] & sel_ok[:, None]

    Rw = se3.euler_to_rot(poses_sel[:, :3])  # [near_cap, 3, 3]
    tw = poses_sel[:, 3:6]
    world = jnp.einsum("kij,kcj->kci", Rw, clouds_sel) + tw[:, None, :]
    world = jnp.where(masks_sel[..., None], world, PAD_COORD)

    flat_xyz = world.reshape(-1, 3)
    flat_mask = masks_sel.reshape(-1)
    ds_xyz, ds_mask = voxel_downsample_xyz(flat_xyz, flat_mask, leaf, map_cap)
    return knn.build_grid(ds_xyz, ds_mask, center, cell_size)
