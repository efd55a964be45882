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
    w = neighbor_mask.astype(dtype)[..., None]  # [N, k, 1]
    A = neighbors * w
    b = -w[..., 0]  # [N, k]

    # Normal equations: (A^T A) x = A^T b, batched 3x3.
    AtA = jnp.einsum("nki,nkj->nij", A, A)
    Atb = jnp.einsum("nki,nk->ni", A, b)
    # Tikhonov epsilon keeps the solve finite for degenerate neighborhoods;
    # those are rejected by the residual check below anyway.
    eye = jnp.eye(3, dtype=dtype) * 1e-8
    x = jnp.linalg.solve(AtA + eye, Atb[..., None])[..., 0]  # [N, 3]

    norm = jnp.linalg.norm(x, axis=-1)
    ok_norm = norm > 1e-6
    inv = 1.0 / jnp.where(ok_norm, norm, 1.0)
    normal = x * inv[..., None]
    d = inv  # plane: n.p + d = 0 (from x.p = -1)

    resid = jnp.abs(jnp.einsum("nki,ni->nk", neighbors, normal) + d[..., None])
    ok_resid = jnp.all(jnp.where(neighbor_mask, resid, 0.0) <= max_resid, axis=-1)
    have_all = jnp.all(neighbor_mask, axis=-1)
    return PlaneFit(normal=normal, d=d, valid=ok_norm & ok_resid & have_all)
