"""Explicit-collective distributed pose-graph solver (shard_map + psum).

The GSPMD path (``dist.sharded``) lets XLA infer collectives from sharding
annotations. This module is the communication-explicit twin, the layout the
reference's single-machine iSAM2 backend can never express
(``/root/reference/src/mapOptmization.cpp:1521-1531``; SURVEY §5.7/§5.8):

* **nodes** (keyframe poses, PCG vectors, block preconditioner) are sharded
  in contiguous blocks along the ``graph`` mesh axis — per-device node work
  is O(K/n);
* **factors** (between/GPS) are sharded in blocks along the same axis —
  per-device linearization work is O(E/n);
* each PCG matvec costs exactly one ``all_gather`` of the [K, 6] search
  direction plus one ``psum_scatter`` of the factor contributions — wire
  volume independent of the factor count, which is what grows.

This is weak-scaling by construction: fixed keyframes+factors per device
keeps per-device compute constant while the trajectory grows with the mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import se3
from ..graph import pose_graph as pg
from ..graph.pose_graph import SolveParams

_HIGH = jax.lax.Precision.HIGHEST


def _pad_graph(graph: pg.PoseGraph, n: int) -> tuple[pg.PoseGraph, int]:
    """Pad node and factor arrays so every leading dim divides the shard
    count. Pad slots carry mask=False (factors) / node_mask=False (nodes);
    padded nodes sit at the end so factor indices stay valid."""

    def pad(x, target):
        extra = target - x.shape[0]
        if extra == 0:
            return x
        return jnp.pad(x, [(0, extra)] + [(0, 0)] * (x.ndim - 1))

    def pad_rot(x, target):
        extra = target - x.shape[0]
        if extra == 0:
            return x
        eye = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), (extra, 3, 3))
        return jnp.concatenate([x, eye], axis=0)

    K, E, G = graph.Rs.shape[0], graph.e_i.shape[0], graph.g_i.shape[0]
    Kp, Ep, Gp = (-(-d // n) * n for d in (K, E, G))
    return graph._replace(
        Rs=pad_rot(graph.Rs, Kp), ts=pad(graph.ts, Kp),
        node_mask=pad(graph.node_mask, Kp),
        e_i=pad(graph.e_i, Ep), e_j=pad(graph.e_j, Ep),
        e_Rm=pad_rot(graph.e_Rm, Ep), e_tm=pad(graph.e_tm, Ep),
        e_sqrt_info=pad(graph.e_sqrt_info, Ep),
        e_cauchy=pad(graph.e_cauchy, Ep), e_mask=pad(graph.e_mask, Ep),
        g_i=pad(graph.g_i, Gp), g_t=pad(graph.g_t, Gp),
        g_sqrt_info=pad(graph.g_sqrt_info, Gp), g_mask=pad(graph.g_mask, Gp),
    ), Kp


def _local_factor_terms(graph: pg.PoseGraph, Rs_g, ts_g, free_w):
    """Linearize the LOCAL factor block against gathered poses.

    Returns rhs/diag contribution builders over the FULL node range [K, ...]
    (to be psum_scatter'ed) and the local matvec contribution fn."""
    K = Rs_g.shape[0]
    g = graph._replace(Rs=Rs_g, ts=ts_g)
    (r_e, Ji, Jj), (r_g, Jg), _ = pg._linearize(g)
    Ji = Ji * free_w[g.e_i][:, None, None]
    Jj = Jj * free_w[g.e_j][:, None, None]
    Jg = Jg * free_w[g.g_i][:, None, None]

    rhs = jnp.zeros((K, 6), r_e.dtype)
    rhs = rhs.at[g.e_i].add(-jnp.einsum("eri,er->ei", Ji, r_e, precision=_HIGH))
    rhs = rhs.at[g.e_j].add(-jnp.einsum("eri,er->ei", Jj, r_e, precision=_HIGH))
    rhs = rhs.at[g.g_i].add(-jnp.einsum("gri,gr->gi", Jg, r_g, precision=_HIGH))

    diag = jnp.zeros((K, 6, 6), r_e.dtype)
    diag = diag.at[g.e_i].add(jnp.einsum("eri,erj->eij", Ji, Ji, precision=_HIGH))
    diag = diag.at[g.e_j].add(jnp.einsum("eri,erj->eij", Jj, Jj, precision=_HIGH))
    diag = diag.at[g.g_i].add(jnp.einsum("gri,grj->gij", Jg, Jg, precision=_HIGH))

    def matvec(xg):  # xg: [K, 6] gathered
        yi = jnp.einsum("eri,ei->er", Ji, xg[g.e_i], precision=_HIGH)
        yj = jnp.einsum("eri,ei->er", Jj, xg[g.e_j], precision=_HIGH)
        y_e = yi + yj
        y_g = jnp.einsum("gri,gi->gr", Jg, xg[g.g_i], precision=_HIGH)
        out = jnp.zeros_like(xg)
        out = out.at[g.e_i].add(jnp.einsum("eri,er->ei", Ji, y_e, precision=_HIGH))
        out = out.at[g.e_j].add(jnp.einsum("eri,er->ei", Jj, y_e, precision=_HIGH))
        out = out.at[g.g_i].add(jnp.einsum("gri,gr->gi", Jg, y_g, precision=_HIGH))
        return out

    return rhs, diag, matvec, (Ji, Jj, Jg)


def _local_matvec(graph: pg.PoseGraph, Ji, Jj, Jg, Kl, offset):
    """Shard-LOCAL normal-equation operator (additive-Schwarz block).

    Restricts this shard's factor block to the locally-owned node range
    [offset, offset+Kl): couplings to out-of-shard nodes are clipped
    (standard Schwarz truncation — each clipped JᵀJ term stays PSD, and
    the outer damping keeps the local operator SPD). Applying it needs
    ZERO collectives, which is the whole point: it serves as the inner
    solve of the communication-avoiding inner-outer PCG.

    Also returns the operator's own [Kl, 6, 6] block-diagonal so the
    caller can complete it to the TRUE global block diagonal: the clipped
    operator alone leaves each shard's gauge directions (absolute
    rotation, anchored globally only by the prior and cross-shard
    couplings) nearly unconstrained, and an inner CG solve then amplifies
    those near-null components catastrophically."""
    li = graph.e_i - offset
    lj = graph.e_j - offset
    lg = graph.g_i - offset
    wi = ((li >= 0) & (li < Kl)).astype(Ji.dtype)
    wj = ((lj >= 0) & (lj < Kl)).astype(Jj.dtype)
    wg = ((lg >= 0) & (lg < Kl)).astype(Jg.dtype)
    li = jnp.clip(li, 0, Kl - 1)
    lj = jnp.clip(lj, 0, Kl - 1)
    lg = jnp.clip(lg, 0, Kl - 1)

    def matvec(x_l):  # x_l: [Kl, 6] local
        yi = jnp.einsum("eri,ei->er", Ji, x_l[li], precision=_HIGH) * wi[:, None]
        yj = jnp.einsum("eri,ei->er", Jj, x_l[lj], precision=_HIGH) * wj[:, None]
        y_e = yi + yj
        y_g = jnp.einsum("gri,gi->gr", Jg, x_l[lg], precision=_HIGH) * wg[:, None]
        out = jnp.zeros_like(x_l)
        out = out.at[li].add(
            jnp.einsum("eri,er->ei", Ji, y_e, precision=_HIGH) * wi[:, None]
        )
        out = out.at[lj].add(
            jnp.einsum("eri,er->ei", Jj, y_e, precision=_HIGH) * wj[:, None]
        )
        out = out.at[lg].add(
            jnp.einsum("gri,gr->gi", Jg, y_g, precision=_HIGH) * wg[:, None]
        )
        return out

    diag_own = jnp.zeros((Kl, 6, 6), Ji.dtype)
    diag_own = diag_own.at[li].add(
        jnp.einsum("eri,erj->eij", Ji, Ji, precision=_HIGH) * wi[:, None, None]
    )
    diag_own = diag_own.at[lj].add(
        jnp.einsum("eri,erj->eij", Jj, Jj, precision=_HIGH) * wj[:, None, None]
    )
    diag_own = diag_own.at[lg].add(
        jnp.einsum("gri,grj->gij", Jg, Jg, precision=_HIGH) * wg[:, None, None]
    )
    return matvec, diag_own


def _prior_terms(graph: pg.PoseGraph, Rs_g, ts_g, free_w, first):
    """Prior contributions over [K, ...]; only the first shard counts it."""
    K = Rs_g.shape[0]
    Rp, tp = Rs_g[graph.prior_i], ts_g[graph.prior_i]
    zero6 = np.zeros(6, np.float32)
    r_p = pg._prior_residual(zero6, Rp, tp, graph.prior_R, graph.prior_t)
    Jp = jax.jacfwd(pg._prior_residual)(zero6, Rp, tp, graph.prior_R, graph.prior_t)
    r_p = r_p * graph.prior_sqrt_info
    Jp = Jp * graph.prior_sqrt_info[:, None] * free_w[graph.prior_i]
    w1 = first.astype(r_p.dtype)
    rhs = jnp.zeros((K, 6), r_p.dtype).at[graph.prior_i].add(-(Jp.T @ r_p) * w1)
    diag = jnp.zeros((K, 6, 6), r_p.dtype).at[graph.prior_i].add((Jp.T @ Jp) * w1)

    def matvec(xg):
        y = (Jp.T @ (Jp @ xg[graph.prior_i])) * w1
        return jnp.zeros_like(xg).at[graph.prior_i].add(y)

    return rhs, diag, matvec


def _shard_body(graph: pg.PoseGraph, free_from, params: SolveParams, axis: str):
    """shard_map body: local node block [Kl,...] + local factor block."""
    n = jax.lax.axis_size(axis)
    first = jax.lax.axis_index(axis) == 0
    Kl = graph.Rs.shape[0]
    K = Kl * n

    gather = partial(jax.lax.all_gather, axis_name=axis, tiled=True)
    scatter = partial(jax.lax.psum_scatter, axis_name=axis, tiled=True)

    node_mask_g = gather(graph.node_mask)  # [K] (static across GN steps)
    free_w_g = (
        node_mask_g & (jnp.arange(K, dtype=jnp.int32) >= free_from)
    ).astype(jnp.float32)
    free_local = free_w_g.reshape(n, Kl)[jax.lax.axis_index(axis)]

    def gn_step(carry, _):
        Rs_l, ts_l = carry  # local node block
        Rs_g, ts_g = gather(Rs_l), gather(ts_l)
        rhs_f, diag_f, mv_f, jacs = _local_factor_terms(
            graph, Rs_g, ts_g, free_w_g
        )
        rhs_p, diag_p, mv_p = _prior_terms(graph, Rs_g, ts_g, free_w_g, first)

        # one reduce-scatter each: full-range contributions -> local block
        rhs_l = scatter(rhs_f + rhs_p, scatter_dimension=0)  # [Kl, 6]
        diag_l = scatter(diag_f + diag_p, scatter_dimension=0)  # [Kl, 6, 6]

        eye = jnp.eye(6, dtype=rhs_l.dtype)
        Minv_l = jnp.linalg.inv(diag_l + eye[None] * (params.damping + 1e-6))
        apply_bj = lambda r: jnp.einsum("kij,kj->ki", Minv_l, r, precision=_HIGH)

        def A(x_l):
            # all_gather the direction, local factor matvec, reduce-scatter
            xg = gather(x_l)
            y = mv_f(xg) + mv_p(xg)
            return scatter(y, scatter_dimension=0) + params.damping * x_l

        def dot(a, b):
            return jax.lax.psum(jnp.vdot(a, b), axis)

        if params.inner_iters > 0:
            # ---- communication-avoiding inner-outer PCG ----
            # Preconditioner = inner CG on the shard-LOCAL (Schwarz-clipped)
            # normal equations: zero collectives per inner iteration, so the
            # global collective count is set by the (few) outer iterations.
            offset = jax.lax.axis_index(axis) * Kl
            mv_loc, diag_own = _local_matvec(graph, *jacs, Kl, offset)
            # complete the clipped operator's block diagonal to the true
            # global one (diag_l includes every shard's factors + prior):
            # the PSD correction anchors boundary nodes and each shard's
            # gauge directions, keeping the inner system well-conditioned
            diag_corr = diag_l - diag_own

            def A_loc(x_l):
                return (
                    mv_loc(x_l)
                    + jnp.einsum("kij,kj->ki", diag_corr, x_l, precision=_HIGH)
                    + params.damping * x_l
                )

            def apply_M(r):
                def ibody(c, _):
                    x, rr, p_, rz = c
                    Ap = A_loc(p_)
                    denom = jnp.vdot(p_, Ap)
                    alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
                    x = x + alpha * p_
                    rr = rr - alpha * Ap
                    z = apply_bj(rr)
                    rz_new = jnp.vdot(rr, z)
                    beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
                    return (x, rr, z + beta * p_, rz_new), None

                z0 = apply_bj(r)
                (x, _, _, _), _ = jax.lax.scan(
                    ibody,
                    (jnp.zeros_like(r), r, z0, jnp.vdot(r, z0)),
                    None,
                    length=params.inner_iters,
                )
                return x

            # flexible (Polak-Ribiere) outer CG: the inner solve is only
            # approximately linear, so beta uses z'(r_new - r_old)
            def body(c, _):
                x, r, p_, rz = c
                Ap = A(p_)
                denom = dot(p_, Ap)
                alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
                x = x + alpha * p_
                r_new = r - alpha * Ap
                z_new = apply_M(r_new)
                # one fused reduction for both scalars
                pair = jax.lax.psum(
                    jnp.stack([jnp.vdot(r_new, z_new), jnp.vdot(r, z_new)]),
                    axis,
                )
                rz_new = pair[0]
                beta = jnp.where(jnp.abs(rz) > 1e-20, (pair[0] - pair[1]) / rz, 0.0)
                return (x, r_new, z_new + beta * p_, rz_new), None

            z0 = apply_M(rhs_l)
            rz0 = dot(rhs_l, z0)
            # with inner solves, pcg_iters counts OUTER iterations (each
            # outer step costs 4 collectives + inner_iters local matvecs)
            n_outer = params.pcg_iters
            (dx_l, _, _, _), _ = jax.lax.scan(
                body,
                (jnp.zeros_like(rhs_l), rhs_l, z0, rz0),
                None,
                length=n_outer,
            )
        else:
            # ---- standard block-Jacobi PCG ----
            def body(c, _):
                x, r, p_, rz = c
                Ap = A(p_)
                denom = dot(p_, Ap)
                alpha = jnp.where(jnp.abs(denom) > 1e-20, rz / denom, 0.0)
                x = x + alpha * p_
                r = r - alpha * Ap
                z = apply_bj(r)
                rz_new = dot(r, z)
                beta = jnp.where(jnp.abs(rz) > 1e-20, rz_new / rz, 0.0)
                return (x, r, z + beta * p_, rz_new), None

            z0 = apply_bj(rhs_l)
            rz0 = dot(rhs_l, z0)
            (dx_l, _, _, _), _ = jax.lax.scan(
                body, (jnp.zeros_like(rhs_l), rhs_l, z0, rz0), None,
                length=params.pcg_iters,
            )

        dx_l = dx_l * free_local[:, None]
        Rs_new, ts_new = jax.vmap(se3.se3_retract)(Rs_l, ts_l, dx_l)
        return (Rs_new, ts_new), None

    (Rs_l, ts_l), _ = jax.lax.scan(
        gn_step, (graph.Rs, graph.ts), None, length=params.gn_iters
    )
    # return gathered (replicated) poses so the caller sees the full graph
    return gather(Rs_l), gather(ts_l)


def solve_shard_map(
    graph: pg.PoseGraph,
    mesh: Mesh,
    free_from=0,
    params: SolveParams = SolveParams(),
    axis: str = "graph",
) -> pg.PoseGraph:
    """Distributed GN/PCG with explicit collectives; same semantics as
    ``pose_graph.solve``."""
    n = mesh.shape[axis]
    padded, Kp = _pad_graph(graph, n)

    shard, repl = P(axis), P()
    in_specs = pg.PoseGraph(
        Rs=shard, ts=shard, node_mask=shard,
        e_i=shard, e_j=shard, e_Rm=shard, e_tm=shard,
        e_sqrt_info=shard, e_cauchy=shard, e_mask=shard,
        g_i=shard, g_t=shard, g_sqrt_info=shard, g_mask=shard,
        prior_i=repl, prior_R=repl, prior_t=repl, prior_sqrt_info=repl,
    )

    fn = jax.jit(
        jax.shard_map(
            partial(_shard_body, params=params, axis=axis),
            mesh=mesh,
            in_specs=(in_specs, repl),
            out_specs=(repl, repl),
            check_vma=False,
        )
    )
    Rs, ts = fn(padded, jnp.asarray(free_from, jnp.int32))
    K = graph.Rs.shape[0]
    return graph._replace(Rs=Rs[:K], ts=ts[:K])
