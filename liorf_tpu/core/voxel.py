"""Deterministic fixed-capacity voxel-grid downsampling.

TPU-native replacement for PCL ``VoxelGrid`` (used throughout the reference:
scan downsample ``mapOptmization.cpp:1061-1067``, local map ``:1036-1038``,
ICP clouds ``:839-843``). Instead of a hash map, points are lex-sorted by
quantized cell coordinate; segment boundaries give one output slot per
occupied voxel. Fully batched, static shapes, no host round-trip.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .pointcloud import PAD_COORD, PointCloud


class VoxelResult(NamedTuple):
    cloud: PointCloud
    rep_idx: jax.Array  # [out_capacity] index into the input of one representative point per voxel (min input index)


def voxel_downsample(
    cloud: PointCloud,
    leaf_size: float,
    out_capacity: int | None = None,
) -> VoxelResult:
    """Centroid voxel filter. Output has `out_capacity` slots (default: input
    capacity); voxels beyond capacity are dropped deterministically in cell
    sort order."""
    n = cloud.capacity
    if out_capacity is None:
        out_capacity = n
    inv_leaf = 1.0 / leaf_size

    # Quantized cell coords; padded points land in a far-away cell.
    xyz = jnp.where(cloud.mask[:, None], cloud.xyz, PAD_COORD)
    cell = jnp.floor(xyz * inv_leaf).astype(jnp.int32)

    # Lex-sort points by (z, y, x, valid) so identical cells are contiguous
    # and invalid points sort to the back.
    order = jnp.lexsort((cell[:, 0], cell[:, 1], cell[:, 2], ~cloud.mask))
    cell_s = cell[order]
    xyz_s = cloud.xyz[order]
    inten_s = cloud.intensity[order]
    mask_s = cloud.mask[order]

    same_as_prev = jnp.all(cell_s[1:] == cell_s[:-1], axis=-1) & mask_s[1:] & mask_s[:-1]
    new_seg = jnp.concatenate([jnp.array([True]), ~same_as_prev])
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1  # [n]

    # Scatter-accumulate into fixed-size output. Invalid points are routed to
    # a dump slot (out_capacity) which is sliced off.
    tgt = jnp.where(mask_s & (seg_id < out_capacity), seg_id, out_capacity)
    sums = jnp.zeros((out_capacity + 1, 3), dtype=jnp.float32).at[tgt].add(xyz_s)
    isum = jnp.zeros((out_capacity + 1,), dtype=jnp.float32).at[tgt].add(inten_s)
    cnt = jnp.zeros((out_capacity + 1,), dtype=jnp.float32).at[tgt].add(1.0)
    # representative = smallest original index in the voxel
    rep = jnp.full((out_capacity + 1,), n, dtype=jnp.int32).at[tgt].min(order)

    cnt_v = cnt[:-1]
    valid = cnt_v > 0
    denom = jnp.where(valid, cnt_v, 1.0)
    centroids = sums[:-1] / denom[:, None]
    centroids = jnp.where(valid[:, None], centroids, PAD_COORD)
    intensity = isum[:-1] / denom
    out = PointCloud(xyz=centroids, intensity=intensity, mask=valid)
    return VoxelResult(cloud=out, rep_idx=jnp.where(valid, rep[:-1], n))


def voxel_downsample_xyz(
    xyz: jax.Array, mask: jax.Array, leaf_size: float, out_capacity: int | None = None
):
    """Convenience wrapper over raw arrays; returns (xyz, mask)."""
    pc = PointCloud(xyz=xyz, intensity=jnp.zeros(xyz.shape[0], jnp.float32), mask=mask)
    res = voxel_downsample(pc, leaf_size, out_capacity)
    return res.cloud.xyz, res.cloud.mask


def voxel_downsample_np(xyz, leaf_size: float):
    """Host-side (numpy) centroid voxel filter for host-resident clouds.

    Used where the data already lives on the host (e.g. loop-closure submap
    prep from the keyframe store) — a device roundtrip per call would cost
    more than the filter itself on a tunneled TPU.
    """
    import numpy as np

    xyz = np.asarray(xyz, np.float32)
    if len(xyz) == 0:
        return xyz
    cell = np.floor(xyz / leaf_size).astype(np.int64)
    # pack 21 bits per axis around a 2^20 offset
    key = (
        ((cell[:, 0] + (1 << 20)) << 42)
        | ((cell[:, 1] + (1 << 20)) << 21)
        | (cell[:, 2] + (1 << 20))
    )
    uniq, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
    sums = np.zeros((len(uniq), 3), np.float64)
    np.add.at(sums, inv, xyz)
    return (sums / cnt[:, None]).astype(np.float32)
