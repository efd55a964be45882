"""Batched plane fitting for point-to-plane residuals.

Replaces the per-point Eigen ``colPivHouseholderQr`` 5-point plane fit of the
reference (``/root/reference/src/mapOptmization.cpp:1089-1122``) with one
closed-form batched least-squares solve across every scan point at once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PlaneFit(NamedTuple):
    normal: jax.Array  # [N, 3] unit plane normal
    d: jax.Array  # [N] plane offset: n.p + d = 0 for points on the plane
    valid: jax.Array  # [N] fit validity


def fit_planes(
    neighbors: jax.Array,
    neighbor_mask: jax.Array,
    max_resid: float = 0.2,
) -> PlaneFit:
    """Fit a plane through each point's k neighbors by solving A x = -1.

    neighbors: [N, k, 3]; neighbor_mask: [N, k]. A fit is valid when all k
    neighbors lie within `max_resid` of the plane (reference threshold 0.2 m,
    mapOptmization.cpp:1114-1122) and the normal-equation solve is
    well-conditioned.
    """
    dtype = neighbors.dtype
    w = neighbor_mask.astype(dtype)  # [N, k]
    cnt = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)  # [N, 1]
    centroid = jnp.sum(neighbors * w[..., None], axis=-2) / cnt  # [N, 3]
    centered = (neighbors - centroid[..., None, :]) * w[..., None]

    # Scatter-matrix eigendecomposition: the normal is the eigenvector of
    # the smallest eigenvalue. Unlike the reference's A x = -1 solve
    # (mapOptmization.cpp:1089-1104) this stays finite for degenerate
    # (collinear) neighborhoods, which are rejected via lambda_mid below.
    S = jnp.einsum("nki,nkj->nij", centered, centered) / cnt[..., None]
    lam, V = jnp.linalg.eigh(S)  # ascending eigenvalues
    normal = V[..., :, 0]  # [N, 3]
    d = -jnp.einsum("ni,ni->n", normal, centroid)

    resid = jnp.abs(jnp.einsum("nki,ni->nk", neighbors, normal) + d[..., None])
    ok_resid = jnp.all(jnp.where(neighbor_mask, resid, 0.0) <= max_resid, axis=-1)
    have_all = jnp.all(neighbor_mask, axis=-1)
    # collinear neighborhoods have no defined plane: require real in-plane
    # spread in the second principal direction (~> 5 cm RMS)
    planar = lam[..., 1] > 2.5e-3
    return PlaneFit(normal=normal, d=d, valid=ok_resid & have_all & planar)
