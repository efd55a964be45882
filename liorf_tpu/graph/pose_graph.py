"""Keyframe pose-graph optimization: batched Gauss-Newton with PCG.

TPU-native replacement for GTSAM's ISAM2 in the reference back-end
(``/root/reference/src/mapOptmization.cpp:68-73,1386-1533``). The graph holds
SE(3) keyframe poses with three factor families, mirroring the reference:

* prior on the first pose (``addOdomFactor``, :1390-1394);
* between factors — the odometry chain and loop closures (:1396-1400,
  :1482-1501), loops optionally with a Cauchy robust kernel
  (:711-719);
* GPS unary position factors (``addGPSFactor``, :1470-1474).

Instead of incremental Bayes-tree updates, the solver runs batched
Gauss-Newton: residuals/Jacobians for every factor are built with vmapped
forward-mode autodiff, the normal equations are solved by preconditioned
conjugate gradients with a block-Jacobi preconditioner, and all
gather/scatter is over fixed-capacity masked arrays — the natural TPU
formulation, and the unit that `dist/` shards across device meshes. A
trailing-window mode (freeze all but the last W nodes) provides the cheap
per-keyframe incremental step; full solves run when loops/GPS land, exactly
like the reference's 5x ``isam->update()`` burst (:1521-1531).

Tangent convention: [omega, v] with right-multiplicative retraction
(R <- R exp(w), t <- t + R v) from ``core.se3``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3

_HIGH = jax.lax.Precision.HIGHEST


class PoseGraph(NamedTuple):
    # nodes
    Rs: jax.Array  # [K, 3, 3]
    ts: jax.Array  # [K, 3]
    node_mask: jax.Array  # [K]
    # between factors (odometry + loops)
    e_i: jax.Array  # [E] int32
    e_j: jax.Array  # [E] int32
    e_Rm: jax.Array  # [E, 3, 3] measured relative rotation (i -> j)
    e_tm: jax.Array  # [E, 3] measured relative translation (in i's frame)
    e_sqrt_info: jax.Array  # [E, 6] diagonal sqrt information [rot, trans]
    e_cauchy: jax.Array  # [E] Cauchy scale c (<=0 disables the robust kernel)
    e_mask: jax.Array  # [E]
    # GPS unary factors
    g_i: jax.Array  # [G] int32
    g_t: jax.Array  # [G, 3] measured position
    g_sqrt_info: jax.Array  # [G, 3]
    g_mask: jax.Array  # [G]
    # prior on one node
    prior_i: jax.Array  # [] int32
    prior_R: jax.Array  # [3, 3]
    prior_t: jax.Array  # [3]
    prior_sqrt_info: jax.Array  # [6]


def empty_graph(num_nodes: int, num_edges: int, num_gps: int) -> PoseGraph:
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (num_nodes, 3, 3))
    return PoseGraph(
        Rs=eye,
        ts=jnp.zeros((num_nodes, 3), jnp.float32),
        node_mask=jnp.zeros((num_nodes,), bool),
        e_i=jnp.zeros((num_edges,), jnp.int32),
        e_j=jnp.zeros((num_edges,), jnp.int32),
        e_Rm=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (num_edges, 3, 3)),
        e_tm=jnp.zeros((num_edges, 3), jnp.float32),
        e_sqrt_info=jnp.ones((num_edges, 6), jnp.float32),
        e_cauchy=jnp.zeros((num_edges,), jnp.float32),
        e_mask=jnp.zeros((num_edges,), bool),
        g_i=jnp.zeros((num_gps,), jnp.int32),
        g_t=jnp.zeros((num_gps, 3), jnp.float32),
        g_sqrt_info=jnp.ones((num_gps, 3), jnp.float32),
        g_mask=jnp.zeros((num_gps,), bool),
        prior_i=jnp.asarray(0, jnp.int32),
        prior_R=jnp.eye(3, dtype=jnp.float32),
        prior_t=jnp.zeros((3,), jnp.float32),
        prior_sqrt_info=jnp.asarray(
            # reference prior variances (1e-2, 1e-2, pi^2) rot, 1e8 trans
            # (mapOptmization.cpp:1390) -> sqrt information = 1/sigma
            [10.0, 10.0, 1.0 / jnp.pi, 1e-4, 1e-4, 1e-4],
            jnp.float32,
        ),
    )


# ---------------------------------------------------------------------------
# factor residuals (per-factor, vmapped; Jacobians via forward-mode autodiff)
# ---------------------------------------------------------------------------

def _between_residual(xi_i, xi_j, Ri, ti, Rj, tj, Rm, tm):
    """Whitening-free between residual on the tangent perturbation."""
    Ri2, ti2 = se3.se3_retract(Ri, ti, xi_i)
    Rj2, tj2 = se3.se3_retract(Rj, tj, xi_j)
    r_R = se3.so3_log(Rm.T @ (Ri2.T @ Rj2))
    r_t = Ri2.T @ (tj2 - ti2) - tm
    return jnp.concatenate([r_R, r_t])


def _gps_residual(xi_i, Ri, ti, target):
    _, ti2 = se3.se3_retract(Ri, ti, xi_i)
    return ti2 - target


def _prior_residual(xi_i, Ri, ti, R0, t0):
    Ri2, ti2 = se3.se3_retract(Ri, ti, xi_i)
    return jnp.concatenate([se3.so3_log(R0.T @ Ri2), ti2 - t0])


# NumPy, NOT jnp: a module-level jax array closed over by jit'd code is
# hoisted into an executable parameter, which the axon TPU tunnel runs on a
# ~30 ms slow path (and the slowdown sticks for the process). A numpy
# constant folds into the HLO as a literal and stays on the fast path.
_zero6 = np.zeros(6, np.float32)

_between_rJ = jax.vmap(
    lambda Ri, ti, Rj, tj, Rm, tm: (
        _between_residual(_zero6, _zero6, Ri, ti, Rj, tj, Rm, tm),
        jax.jacfwd(_between_residual, argnums=(0, 1))(
            _zero6, _zero6, Ri, ti, Rj, tj, Rm, tm
        ),
    )
)

_gps_rJ = jax.vmap(
    lambda Ri, ti, tgt: (
        _gps_residual(_zero6, Ri, ti, tgt),
        jax.jacfwd(_gps_residual)(_zero6, Ri, ti, tgt),
    )
)


def _linearize(graph: PoseGraph):
    """Build whitened residuals + Jacobian blocks for every factor."""
    # between
    Ri = graph.Rs[graph.e_i]
    ti = graph.ts[graph.e_i]
    Rj = graph.Rs[graph.e_j]
    tj = graph.ts[graph.e_j]
    r_e, (Ji, Jj) = _between_rJ(Ri, ti, Rj, tj, graph.e_Rm, graph.e_tm)
    r_e = r_e * graph.e_sqrt_info
    Ji = Ji * graph.e_sqrt_info[:, :, None]
    Jj = Jj * graph.e_sqrt_info[:, :, None]
    # robust Cauchy via IRLS: weight = 1 / (1 + ||r||^2 / c^2)
    rn2 = jnp.sum(r_e * r_e, axis=-1)
    c2 = graph.e_cauchy * graph.e_cauchy
    w_rob = jnp.where(graph.e_cauchy > 0, 1.0 / (1.0 + rn2 / jnp.maximum(c2, 1e-12)), 1.0)
    w = jnp.sqrt(w_rob) * graph.e_mask.astype(r_e.dtype)
    r_e = r_e * w[:, None]
    Ji = Ji * w[:, None, None]
    Jj = Jj * w[:, None, None]

    # gps
    r_g, Jg = _gps_rJ(graph.Rs[graph.g_i], graph.ts[graph.g_i], graph.g_t)
    wg = graph.g_mask.astype(r_g.dtype)
    r_g = r_g * graph.g_sqrt_info * wg[:, None]
    Jg = Jg * graph.g_sqrt_info[:, :, None] * wg[:, None, None]

    # prior
    Rp = graph.Rs[graph.prior_i]
    tp = graph.ts[graph.prior_i]
    r_p = _prior_residual(_zero6, Rp, tp, graph.prior_R, graph.prior_t)
    Jp = jax.jacfwd(_prior_residual)(_zero6, Rp, tp, graph.prior_R, graph.prior_t)
    r_p = r_p * graph.prior_sqrt_info
    Jp = Jp * graph.prior_sqrt_info[:, None]

    return (r_e, Ji, Jj), (r_g, Jg), (r_p, Jp)


def _build_normal_terms(graph: PoseGraph, free_mask):
    """Linearize and return (rhs [K,6], matvec fn, block-diag [K,6,6])."""
    K = graph.Rs.shape[0]
    (r_e, Ji, Jj), (r_g, Jg), (r_p, Jp) = _linearize(graph)
    fm = free_mask.astype(r_e.dtype)

    # mask Jacobian columns of frozen nodes (treat them as constants)
    Ji = Ji * fm[graph.e_i][:, None, None]
    Jj = Jj * fm[graph.e_j][:, None, None]
    Jg = Jg * fm[graph.g_i][:, None, None]
    Jp = Jp * fm[graph.prior_i]

    # rhs = -J^T r scattered per node
    rhs = jnp.zeros((K, 6), r_e.dtype)
    rhs = rhs.at[graph.e_i].add(-jnp.einsum("eri,er->ei", Ji, r_e, precision=_HIGH))
    rhs = rhs.at[graph.e_j].add(-jnp.einsum("eri,er->ei", Jj, r_e, precision=_HIGH))
    rhs = rhs.at[graph.g_i].add(-jnp.einsum("gri,gr->gi", Jg, r_g, precision=_HIGH))
    rhs = rhs.at[graph.prior_i].add(-(Jp.T @ r_p))

    # block-diagonal of H for the Jacobi preconditioner
    diag = jnp.zeros((K, 6, 6), r_e.dtype)
    diag = diag.at[graph.e_i].add(jnp.einsum("eri,erj->eij", Ji, Ji, precision=_HIGH))
    diag = diag.at[graph.e_j].add(jnp.einsum("eri,erj->eij", Jj, Jj, precision=_HIGH))
    diag = diag.at[graph.g_i].add(jnp.einsum("gri,grj->gij", Jg, Jg, precision=_HIGH))
    diag = diag.at[graph.prior_i].add(Jp.T @ Jp)

    def matvec(x):  # x: [K, 6]
        yi = jnp.einsum("eri,ei->er", Ji, x[graph.e_i], precision=_HIGH)
        yj = jnp.einsum("eri,ei->er", Jj, x[graph.e_j], precision=_HIGH)
        y_e = yi + yj
        y_g = jnp.einsum("gri,gi->gr", Jg, x[graph.g_i], precision=_HIGH)
        y_p = Jp @ x[graph.prior_i]
        out = jnp.zeros_like(x)
        out = out.at[graph.e_i].add(jnp.einsum("eri,er->ei", Ji, y_e, precision=_HIGH))
        out = out.at[graph.e_j].add(jnp.einsum("eri,er->ei", Jj, y_e, precision=_HIGH))
        out = out.at[graph.g_i].add(jnp.einsum("gri,gr->gi", Jg, y_g, precision=_HIGH))
        out = out.at[graph.prior_i].add(Jp.T @ y_p)
        return out

    return rhs, matvec, diag


def _pcg(matvec, rhs, precond_blocks, iters: int, damping: float):
    """Block-Jacobi preconditioned CG for (H + damping I) x = rhs."""
    K = rhs.shape[0]
    eye = jnp.eye(6, dtype=rhs.dtype)
    blocks = precond_blocks + eye[None] * (damping + 1e-6)
    Minv = jnp.linalg.inv(blocks)  # [K, 6, 6]

    def apply_M(r):
        return jnp.einsum("kij,kj->ki", Minv, r, precision=_HIGH)

    def A(x):
        return matvec(x) + damping * x

    x0 = jnp.zeros_like(rhs)
    r0 = rhs
    z0 = apply_M(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)

    def body(carry, _):
        x, r, p, rz = carry
        Ap = A(p)
        denom = jnp.vdot(p, Ap)
        alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_M(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
        p = z + beta * p
        return (x, r, p, rz_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x0, r0, p0, rz0), None, length=iters)
    return x


class SolveParams(NamedTuple):
    gn_iters: int = 6
    pcg_iters: int = 64
    damping: float = 1e-4
    # distributed solvers only: >0 enables the communication-avoiding
    # inner-outer scheme — per-shard local CG solves (zero collectives)
    # as the preconditioner of a flexible outer PCG, cutting the global
    # collective count ~5x (see dist/shard_map_solver.py)
    inner_iters: int = 0


@partial(jax.jit, static_argnames=("params",))
def solve(
    graph: PoseGraph,
    free_from: jax.Array | int = 0,
    params: SolveParams = SolveParams(),
) -> PoseGraph:
    """Optimize node poses; nodes with index < free_from stay frozen.

    ``free_from=0`` is a full batch relaxation (the loop/GPS path);
    ``free_from=count-W`` gives the cheap trailing-window incremental step.
    """
    K = graph.Rs.shape[0]
    idx = jnp.arange(K, dtype=jnp.int32)
    free_mask = graph.node_mask & (idx >= free_from)

    def gn_step(g: PoseGraph, _):
        rhs, matvec, diag = _build_normal_terms(g, free_mask)
        dx = _pcg(matvec, rhs, diag, params.pcg_iters, params.damping)
        dx = dx * free_mask[:, None].astype(dx.dtype)
        Rs, ts = jax.vmap(se3.se3_retract)(g.Rs, g.ts, dx)
        return g._replace(Rs=Rs, ts=ts), None

    graph, _ = jax.lax.scan(gn_step, graph, None, length=params.gn_iters)
    return graph


def graph_error(graph: PoseGraph) -> jax.Array:
    """Total whitened squared error (for tests/diagnostics)."""
    (r_e, _, _), (r_g, _), (r_p, _) = _linearize(graph)
    return jnp.sum(r_e * r_e) + jnp.sum(r_g * r_g) + jnp.sum(r_p * r_p)
