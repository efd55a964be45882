"""Fixed-capacity masked point cloud containers.

XLA requires static shapes; point clouds are stored padded to a fixed
capacity with a validity mask. Invalid slots hold a large sentinel
coordinate so that distance-based ops naturally ignore them.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Sentinel coordinate for padded points: far away from any real geometry so
# that nearest-neighbor queries never select padding.
PAD_COORD = 1.0e7


class PointCloud(NamedTuple):
    """A padded point cloud: xyz [N, 3], intensity [N], mask [N] (bool)."""

    xyz: jax.Array
    intensity: jax.Array
    mask: jax.Array

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jax.Array:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)


def make_cloud(xyz, intensity=None, mask=None, capacity: int | None = None) -> PointCloud:
    """Build a PointCloud, padding/truncating to `capacity` if given."""
    xyz = jnp.asarray(xyz, dtype=jnp.float32)
    n = xyz.shape[0]
    if intensity is None:
        intensity = jnp.zeros((n,), dtype=jnp.float32)
    else:
        intensity = jnp.asarray(intensity, dtype=jnp.float32)
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)
    else:
        mask = jnp.asarray(mask, dtype=bool)
    if capacity is not None and capacity != n:
        if n > capacity:
            xyz, intensity, mask = xyz[:capacity], intensity[:capacity], mask[:capacity]
        else:
            pad = capacity - n
            xyz = jnp.concatenate(
                [xyz, jnp.full((pad, 3), PAD_COORD, dtype=xyz.dtype)], axis=0
            )
            intensity = jnp.concatenate([intensity, jnp.zeros((pad,), dtype=intensity.dtype)])
            mask = jnp.concatenate([mask, jnp.zeros((pad,), dtype=bool)])
    xyz = jnp.where(mask[:, None], xyz, PAD_COORD)
    return PointCloud(xyz=xyz, intensity=intensity, mask=mask)


def apply_mask(cloud: PointCloud, extra_mask: jax.Array) -> PointCloud:
    """AND an extra mask in; masked-out slots get the PAD sentinel coord."""
    mask = cloud.mask & extra_mask
    xyz = jnp.where(mask[:, None], cloud.xyz, PAD_COORD)
    return PointCloud(xyz=xyz, intensity=cloud.intensity, mask=mask)


def compact(cloud: PointCloud) -> PointCloud:
    """Stable-partition valid points to the front (same capacity).

    Useful before tiled kernels so valid work is contiguous.
    """
    n = cloud.capacity
    order = jnp.argsort(~cloud.mask, stable=True)  # valid (False) first
    xyz = cloud.xyz[order]
    intensity = cloud.intensity[order]
    mask = cloud.mask[order]
    xyz = jnp.where(mask[:, None], xyz, PAD_COORD)
    return PointCloud(xyz=xyz, intensity=intensity, mask=mask)


def to_numpy(cloud: PointCloud) -> np.ndarray:
    """Extract the valid points as a dense [n, 4] numpy array (xyzi)."""
    mask = np.asarray(cloud.mask)
    xyz = np.asarray(cloud.xyz)[mask]
    inten = np.asarray(cloud.intensity)[mask]
    return np.concatenate([xyz, inten[:, None]], axis=1)


def round_up_pow2(n: int, minimum: int = 256) -> int:
    """Smallest power of two >= max(n, minimum) — capacity bucketing to
    bound the number of distinct jit specializations."""
    c = minimum
    while c < n:
        c *= 2
    return c
