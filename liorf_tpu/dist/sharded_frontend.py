"""Multi-chip front-end: point-sharded registration + keyframe-sharded
ScanContext search.

These are the remaining distribution axes from the reference's inventory
(SURVEY §2.3/§5.7):

* **Registration data parallelism** — the reference parallelizes the
  per-point correspondence search with OpenMP on 2-4 cores
  (``/root/reference/src/mapOptmization.cpp:1078``,
  ``utility.h:233``). Here the scan's points are sharded in blocks over a
  device mesh axis; every device searches its block against a replicated
  local-map grid, and the 6x6 Gauss-Newton normal equations are
  ``psum``-reduced so all devices step the pose identically. One
  collective of 36+6 floats per GN iteration — wire volume independent
  of scan size.

* **ScanContext database sharding** — the reference prefilters loop
  candidates with a nanoflann kd-tree over ring keys
  (``Scancontext.cpp:270-295``). The TPU version is already a matmul
  over the whole database; here the database (descriptors + ring keys)
  is sharded over keyframes, each device ranks its own shard and
  verifies its local top-k with the shift-aligned cosine distance, and
  the global best is picked from an ``all_gather`` of per-shard winners
  (3 scalars per device). The union of per-shard top-k is a superset of
  the global top-k, so the sharded search is at least as thorough as
  the single-device one.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import scancontext as sc
from ..ops.knn import SpatialHashGrid
from ..ops.scan_match import ScanMatchParams, ScanMatchResult, scan_to_map_impl


# ---------------------------------------------------------------------------
# point-sharded scan-to-map registration
# ---------------------------------------------------------------------------
def scan_to_map_sharded(
    scan_xyz: jax.Array,
    scan_mask: jax.Array,
    grid: SpatialHashGrid,
    init_pose: jax.Array,
    mesh: Mesh,
    params: ScanMatchParams = ScanMatchParams(),
    axis: str = "graph",
) -> ScanMatchResult:
    """scan_to_map with scan points sharded over ``mesh[axis]``.

    The scan length must divide the mesh axis size (pad with mask=False).
    Returns the same (replicated) ScanMatchResult as the single-device
    solver; results match it bit-for-bit up to reduction order.
    """
    n = mesh.shape[axis]
    N = scan_xyz.shape[0]
    if N % n:
        pad = n - N % n
        scan_xyz = jnp.pad(scan_xyz, ((0, pad), (0, 0)))
        scan_mask = jnp.pad(scan_mask, (0, pad))

    shard, repl = P(axis), P()
    grid_spec = jax.tree_util.tree_map(lambda _: repl, grid)
    fn = jax.jit(
        jax.shard_map(
            partial(scan_to_map_impl, params=params, axis_name=axis),
            mesh=mesh,
            in_specs=(shard, shard, grid_spec, repl),
            out_specs=repl,
            check_vma=False,
        )
    )
    return fn(scan_xyz, scan_mask, grid, init_pose)


# ---------------------------------------------------------------------------
# keyframe-sharded ScanContext loop search
# ---------------------------------------------------------------------------
def _detect_local(descs, keys, count, qdesc, qkey, *, axis, num_candidates,
                  exclude_recent, dist_thresh):
    """Per-shard detectLoopClosureID + cross-shard winner reduction.

    The per-shard search is ``ops.scancontext.rank_candidates`` — the same
    core as the single-device ``detect_loop`` — applied to this shard's
    database slice with globally-indexed searchability."""
    Cl = keys.shape[0]
    base = jax.lax.axis_index(axis) * Cl
    gidx = base + jnp.arange(Cl, dtype=jnp.int32)
    searchable = gidx < (count - exclude_recent)

    best, local_idx, best_shift = sc.rank_candidates(
        descs, keys, searchable, qdesc, qkey, num_candidates
    )
    local = jnp.stack(
        [
            best,
            gidx[local_idx].astype(jnp.float32),
            best_shift.astype(jnp.float32),
        ]
    )
    allb = jax.lax.all_gather(local, axis)  # [n, 3]
    w = jnp.argmin(allb[:, 0])
    dist = allb[w, 0]
    found = dist < dist_thresh
    index = jnp.where(found, allb[w, 1].astype(jnp.int32), -1)
    yaw = jnp.deg2rad(allb[w, 2] * sc.SECTOR_ANGLE)
    return sc.SCDetection(index=index, distance=dist, yaw=yaw)


def detect_loop_sharded(
    descriptors: jax.Array,  # [C, 20, 60]
    ring_keys: jax.Array,  # [C, 20]
    count: jax.Array,  # [] i32
    query_desc: jax.Array,
    query_key: jax.Array,
    mesh: Mesh,
    num_candidates: int = sc.NUM_CANDIDATES,
    exclude_recent: int = sc.NUM_EXCLUDE_RECENT,
    dist_thresh: float = sc.SC_DIST_THRES,
    axis: str = "graph",
) -> sc.SCDetection:
    """detect_loop with the descriptor database sharded over keyframes.

    The database length must divide the mesh axis size (the keyframe rings
    are power-of-two capacity, so any power-of-two mesh divides them).
    """
    shard, repl = P(axis), P()
    fn = jax.jit(
        jax.shard_map(
            partial(
                _detect_local,
                axis=axis,
                num_candidates=num_candidates,
                exclude_recent=exclude_recent,
                dist_thresh=dist_thresh,
            ),
            mesh=mesh,
            in_specs=(shard, shard, repl, repl, repl),
            out_specs=repl,
            check_vma=False,
        )
    )
    return fn(descriptors, ring_keys, count, query_desc, query_key)
