"""Explicit-collective distributed pose-graph solver (shard_map + psum).

The GSPMD path (``dist.sharded``) lets XLA infer collectives from sharding
annotations. This module is the communication-explicit twin: factors are
sharded by edge blocks across the ``graph`` mesh axis with ``shard_map``,
and every cross-shard reduction is a hand-placed ``psum`` — the layout the
reference's single-machine iSAM2 backend can never express
(``/root/reference/src/mapOptmization.cpp:1521-1531``; SURVEY §5.7/§5.8).

Design (communication-avoiding PCG):

* node state x [K, 6] is small (6 floats per keyframe) and replicated;
* each shard owns a contiguous block of between/GPS factors and computes
  its local J^T J x and J^T r contributions into a full-K accumulator;
* ONE ``psum`` per matvec merges the accumulators; PCG dot products ride
  the same replicated arrays so they need no extra collectives.

Per PCG iteration the wire cost is exactly one all-reduce of [K, 6]
floats over ICI — independent of factor count, which is what scales.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import se3
from ..graph import pose_graph as pg
from ..graph.pose_graph import SolveParams, _linearize

_HIGH = jax.lax.Precision.HIGHEST


def _pad_to_multiple(graph: pg.PoseGraph, n: int) -> pg.PoseGraph:
    """Pad factor arrays so each leading dim divides the shard count.

    Padding slots carry e_mask/g_mask = False, so they contribute zero.
    """

    def pad(x, target):
        extra = target - x.shape[0]
        if extra == 0:
            return x
        pad_width = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width)

    def pad_rot(x, target):
        extra = target - x.shape[0]
        if extra == 0:
            return x
        eye = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), (extra, 3, 3))
        return jnp.concatenate([x, eye], axis=0)

    E = graph.e_i.shape[0]
    G = graph.g_i.shape[0]
    Ep = -(-E // n) * n
    Gp = -(-G // n) * n
    return graph._replace(
        e_i=pad(graph.e_i, Ep), e_j=pad(graph.e_j, Ep),
        e_Rm=pad_rot(graph.e_Rm, Ep), e_tm=pad(graph.e_tm, Ep),
        e_sqrt_info=pad(graph.e_sqrt_info, Ep),
        e_cauchy=pad(graph.e_cauchy, Ep), e_mask=pad(graph.e_mask, Ep),
        g_i=pad(graph.g_i, Gp), g_t=pad(graph.g_t, Gp),
        g_sqrt_info=pad(graph.g_sqrt_info, Gp), g_mask=pad(graph.g_mask, Gp),
    )


def _local_terms(graph: pg.PoseGraph, free_mask):
    """Per-shard linearization of the LOCAL factor block.

    Returns (rhs_contrib [K,6], diag_contrib [K,6,6], matvec_contrib fn);
    contributions must be psum'd across the mesh axis by the caller.
    """
    K = graph.Rs.shape[0]
    (r_e, Ji, Jj), (r_g, Jg), (r_p, Jp) = _linearize(graph)
    fm = free_mask.astype(r_e.dtype)
    Ji = Ji * fm[graph.e_i][:, None, None]
    Jj = Jj * fm[graph.e_j][:, None, None]
    Jg = Jg * fm[graph.g_i][:, None, None]
    Jp = Jp * fm[graph.prior_i]

    rhs = jnp.zeros((K, 6), r_e.dtype)
    rhs = rhs.at[graph.e_i].add(-jnp.einsum("eri,er->ei", Ji, r_e, precision=_HIGH))
    rhs = rhs.at[graph.e_j].add(-jnp.einsum("eri,er->ei", Jj, r_e, precision=_HIGH))
    rhs = rhs.at[graph.g_i].add(-jnp.einsum("gri,gr->gi", Jg, r_g, precision=_HIGH))

    diag = jnp.zeros((K, 6, 6), r_e.dtype)
    diag = diag.at[graph.e_i].add(jnp.einsum("eri,erj->eij", Ji, Ji, precision=_HIGH))
    diag = diag.at[graph.e_j].add(jnp.einsum("eri,erj->eij", Jj, Jj, precision=_HIGH))
    diag = diag.at[graph.g_i].add(jnp.einsum("gri,grj->gij", Jg, Jg, precision=_HIGH))

    def matvec(x):
        yi = jnp.einsum("eri,ei->er", Ji, x[graph.e_i], precision=_HIGH)
        yj = jnp.einsum("eri,ei->er", Jj, x[graph.e_j], precision=_HIGH)
        y_e = yi + yj
        y_g = jnp.einsum("gri,gi->gr", Jg, x[graph.g_i], precision=_HIGH)
        out = jnp.zeros_like(x)
        out = out.at[graph.e_i].add(jnp.einsum("eri,er->ei", Ji, y_e, precision=_HIGH))
        out = out.at[graph.e_j].add(jnp.einsum("eri,er->ei", Jj, y_e, precision=_HIGH))
        out = out.at[graph.g_i].add(jnp.einsum("gri,gr->gi", Jg, y_g, precision=_HIGH))
        return out

    return rhs, diag, matvec, (r_p, Jp)


def _shard_body(graph: pg.PoseGraph, free_from, params: SolveParams, axis: str):
    """Runs inside shard_map: full nodes, local factor block per device."""
    K = graph.Rs.shape[0]
    idx = jnp.arange(K, dtype=jnp.int32)
    first = jax.lax.axis_index(axis) == 0

    def gn_step(g: pg.PoseGraph, _):
        free_mask = g.node_mask & (idx >= free_from)
        rhs_l, diag_l, matvec_l, (r_p, Jp) = _local_terms(g, free_mask)
        # the prior lives on every shard's replicated node state; count it once
        w1 = first.astype(rhs_l.dtype)
        rhs_l = rhs_l.at[g.prior_i].add(-(Jp.T @ r_p) * w1)
        diag_l = diag_l.at[g.prior_i].add((Jp.T @ Jp) * w1)

        # ONE collective for the normal-equation terms
        rhs = jax.lax.psum(rhs_l, axis)
        diag = jax.lax.psum(diag_l, axis)

        eye = jnp.eye(6, dtype=rhs.dtype)
        blocks = diag + eye[None] * (params.damping + 1e-6)
        Minv = jnp.linalg.inv(blocks)
        apply_M = lambda r: jnp.einsum("kij,kj->ki", Minv, r, precision=_HIGH)

        def A(x):
            # ONE psum per matvec: local factor contributions -> all-reduce
            local = matvec_l(x).at[g.prior_i].add((Jp.T @ (Jp @ x[g.prior_i])) * w1)
            return jax.lax.psum(local, axis) + params.damping * x

        x0 = jnp.zeros_like(rhs)
        z0 = apply_M(rhs)
        rz0 = jnp.vdot(rhs, z0)

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
            return (x + 0.0, r, z + beta * p, rz_new), None

        (dx, _, _, _), _ = jax.lax.scan(
            body, (x0, rhs, z0, rz0), None, length=params.pcg_iters
        )
        dx = dx * free_mask[:, None].astype(dx.dtype)
        Rs, ts = jax.vmap(se3.se3_retract)(g.Rs, g.ts, dx)
        return g._replace(Rs=Rs, ts=ts), None

    graph, _ = jax.lax.scan(gn_step, graph, None, length=params.gn_iters)
    return graph


def solve_shard_map(
    graph: pg.PoseGraph,
    mesh: Mesh,
    free_from=0,
    params: SolveParams = SolveParams(),
    axis: str = "graph",
) -> pg.PoseGraph:
    """Distributed GN/PCG with explicit psum collectives.

    Same semantics as ``pose_graph.solve``; factors are sharded by blocks
    along ``axis``, node state is replicated (6 floats per keyframe — tiny
    next to factor Jacobians, which is where the memory/compute grows).
    """
    n = mesh.shape[axis]
    padded = _pad_to_multiple(graph, n)

    shard = P(axis)
    repl = P()
    in_specs = pg.PoseGraph(
        Rs=repl, ts=repl, node_mask=repl,
        e_i=shard, e_j=shard, e_Rm=shard, e_tm=shard,
        e_sqrt_info=shard, e_cauchy=shard, e_mask=shard,
        g_i=shard, g_t=shard, g_sqrt_info=shard, g_mask=shard,
        prior_i=repl, prior_R=repl, prior_t=repl, prior_sqrt_info=repl,
    )
    out_specs = jax.tree_util.tree_map(lambda _: repl, in_specs)
    out_specs = out_specs._replace(
        e_i=shard, e_j=shard, e_Rm=shard, e_tm=shard,
        e_sqrt_info=shard, e_cauchy=shard, e_mask=shard,
        g_i=shard, g_t=shard, g_sqrt_info=shard, g_mask=shard,
    )

    fn = jax.jit(
        jax.shard_map(
            partial(_shard_body, params=params, axis=axis),
            mesh=mesh,
            in_specs=(in_specs, repl),
            out_specs=out_specs,
            check_vma=False,
        )
    )
    solved = fn(padded, jnp.asarray(free_from, jnp.int32))
    # un-pad factor arrays back to the caller's capacities
    E = graph.e_i.shape[0]
    G = graph.g_i.shape[0]
    return solved._replace(
        e_i=solved.e_i[:E], e_j=solved.e_j[:E], e_Rm=solved.e_Rm[:E],
        e_tm=solved.e_tm[:E], e_sqrt_info=solved.e_sqrt_info[:E],
        e_cauchy=solved.e_cauchy[:E], e_mask=solved.e_mask[:E],
        g_i=solved.g_i[:G], g_t=solved.g_t[:G],
        g_sqrt_info=solved.g_sqrt_info[:G], g_mask=solved.g_mask[:G],
    )
