"""ScanContext global place recognition as pure batched array ops.

Re-design of the reference's ScanContext
(``/root/reference/include/Scancontext.{h,cpp}``): the 20x60 polar max-height
descriptor is one scatter-max; ring-key candidate search is a brute-force
batched L2 top-k over the whole database (a [C, 20] matmul — no kd-tree
needed on TPU, replacing nanoflann); the shift-aligned cosine distance is
evaluated for *all* 60 column shifts at once (the reference prunes to ~10%
of shifts via the sector key, ``Scancontext.cpp:116-148`` — evaluating all
shifts is both cheaper on the MXU and strictly more thorough).

Constants follow the reference (``Scancontext.h:80-99``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

NUM_RING = 20
NUM_SECTOR = 60
MAX_RADIUS = 80.0
LIDAR_HEIGHT = 2.0
NUM_EXCLUDE_RECENT = 30
NUM_CANDIDATES = 3
SC_DIST_THRES = 0.3
SECTOR_ANGLE = 360.0 / NUM_SECTOR


@jax.jit
def make_descriptor(xyz: jax.Array, mask: jax.Array) -> jax.Array:
    """[N, 3] + mask -> [20, 60] polar max-height descriptor.

    Matches ``makeScancontext`` (Scancontext.cpp:151-195): z is offset by the
    lidar height, bins take the max z, empty bins are 0.
    """
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2] + LIDAR_HEIGHT
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.rad2deg(jnp.arctan2(y, x))
    theta = jnp.where(theta < 0, theta + 360.0, theta)

    ring = jnp.clip(jnp.ceil(r / MAX_RADIUS * NUM_RING), 1, NUM_RING).astype(jnp.int32) - 1
    sector = jnp.clip(jnp.ceil(theta / 360.0 * NUM_SECTOR), 1, NUM_SECTOR).astype(jnp.int32) - 1

    ok = mask & (r <= MAX_RADIUS)
    flat = jnp.where(ok, ring * NUM_SECTOR + sector, NUM_RING * NUM_SECTOR)
    desc = jnp.full((NUM_RING * NUM_SECTOR + 1,), -jnp.inf, dtype=jnp.float32)
    desc = desc.at[flat].max(jnp.where(ok, z, -jnp.inf))
    desc = desc[:-1].reshape(NUM_RING, NUM_SECTOR)
    return jnp.where(jnp.isfinite(desc), desc, 0.0)


def ring_key(desc: jax.Array) -> jax.Array:
    """Rotation-invariant key: row-wise mean ([..., 20, 60] -> [..., 20])."""
    return jnp.mean(desc, axis=-1)


def _shifted_cosine_distances(query: jax.Array, cands: jax.Array) -> jax.Array:
    """Column-shift-aligned SC distance.

    query [20, 60], cands [B, 20, 60] -> [B, 60] distance for each shift.
    distance(s) = 1 - mean over sector pairs (both non-empty) of the
    column cosine similarity, with candidate columns rotated by s.
    """
    def norm_cols(d):
        n = jnp.linalg.norm(d, axis=-2, keepdims=True)
        nonzero = n[..., 0, :] > 0
        return d / jnp.where(n > 0, n, 1.0), nonzero

    qn, q_nonzero = norm_cols(query)  # [20, 60], [60]
    cn, c_nonzero = norm_cols(cands)  # [B, 20, 60], [B, 60]

    # shift index matrix: shifted candidate col j = original col (j - s) % 60
    j = jnp.arange(NUM_SECTOR)
    s = jnp.arange(NUM_SECTOR)
    src = (j[None, :] - s[:, None]) % NUM_SECTOR  # [60 shifts, 60 cols]

    cn_sh = cn[:, :, src]  # [B, 20, 60, 60] — (batch, ring, shift, col)
    cz_sh = c_nonzero[:, src]  # [B, 60, 60]

    sims = jnp.einsum("rj,brsj->bsj", qn, cn_sh)  # [B, 60, 60]
    both = q_nonzero[None, None, :] & cz_sh
    n_eff = jnp.maximum(jnp.sum(both, axis=-1), 1)
    sim = jnp.sum(jnp.where(both, sims, 0.0), axis=-1) / n_eff
    return 1.0 - sim  # [B, 60]


class SCDetection(NamedTuple):
    index: jax.Array  # [] int32 matched keyframe, -1 if none
    distance: jax.Array  # [] best SC distance
    yaw: jax.Array  # [] rad yaw offset implied by the best shift


def rank_candidates(
    descriptors: jax.Array,  # [C, 20, 60] database slice (padded)
    ring_keys: jax.Array,  # [C, 20]
    searchable: jax.Array,  # [C] bool — which entries may be matched
    query_desc: jax.Array,  # [20, 60]
    query_key: jax.Array,  # [20]
    num_candidates: int,
):
    """Core of detectLoopClosureID over one database slice: ring-key k-NN
    prefilter, then shift-aligned SC distance over the survivors
    (Scancontext.cpp:253-344). Returns (best_dist, best_local_index,
    best_shift) — dist is +inf when nothing is searchable. Shared by the
    single-device ``detect_loop`` and the keyframe-sharded search in
    ``dist/sharded_frontend.py`` so the gating semantics cannot diverge."""
    d2 = jnp.sum((ring_keys - query_key[None, :]) ** 2, axis=-1)
    d2 = jnp.where(searchable, d2, jnp.inf)
    k = min(num_candidates, ring_keys.shape[0])
    _, cand_idx = jax.lax.top_k(-d2, k)
    cand_ok = jnp.isfinite(d2[cand_idx])

    dists = _shifted_cosine_distances(query_desc, descriptors[cand_idx])  # [k, 60]
    best_shift = jnp.argmin(dists, axis=-1)
    best_dist = jnp.where(cand_ok, jnp.min(dists, axis=-1), jnp.inf)

    b = jnp.argmin(best_dist)
    return best_dist[b], cand_idx[b], best_shift[b]


@partial(jax.jit, static_argnames=("num_candidates",))
def detect_loop(
    descriptors: jax.Array,  # [C, 20, 60] database (padded)
    ring_keys: jax.Array,  # [C, 20]
    count: jax.Array,  # [] int32 number of valid entries
    query_desc: jax.Array,  # [20, 60]
    query_key: jax.Array,  # [20]
    num_candidates: int = NUM_CANDIDATES,
    exclude_recent: int = NUM_EXCLUDE_RECENT,
    dist_thresh: float = SC_DIST_THRES,
) -> SCDetection:
    """Find the best loop candidate for the query descriptor.

    Matches ``detectLoopClosureID`` (Scancontext.cpp:253-344): ring-key
    k-NN prefilter excluding the most recent `exclude_recent` keyframes,
    then shift-aligned SC distance, accepted under `dist_thresh`.
    """
    C = descriptors.shape[0]
    idxs = jnp.arange(C, dtype=jnp.int32)
    searchable = idxs < (count - exclude_recent)

    dist, best_idx, best_shift = rank_candidates(
        descriptors, ring_keys, searchable, query_desc, query_key, num_candidates
    )
    found = dist < dist_thresh
    index = jnp.where(found, best_idx, -1)
    yaw = jnp.deg2rad(best_shift.astype(jnp.float32) * SECTOR_ANGLE)
    return SCDetection(index=index, distance=dist, yaw=yaw)
