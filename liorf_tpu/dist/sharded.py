"""Distributed pose-graph optimization over a device mesh.

The scaling axis of a SLAM engine is trajectory/map growth (SURVEY §5.7):
keyframe nodes and factor edges are sharded across devices along a
``graph`` mesh axis and the batched GN/PCG solver from
``graph.pose_graph`` is compiled under GSPMD, which turns the per-factor
gather/scatter into cross-shard collectives and `psum`s the PCG dot
products. This replaces the reference's single-machine iSAM2 with a
multi-chip solve — the analogue of data/sequence parallelism for the
pose graph.

Two entry points:

* ``make_mesh(n)`` — a 1D ``graph`` mesh over the first n devices;
* ``solve_sharded(graph, mesh, ...)`` — shard the PoseGraph pytree over
  the mesh and run the solver; identical semantics to ``pose_graph.solve``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph import pose_graph as pg


def make_mesh(n_devices: int | None = None, axis: str = "graph") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def graph_shardings(mesh: Mesh, axis: str = "graph") -> pg.PoseGraph:
    """PartitionSpecs for every PoseGraph field: nodes and factors sharded
    along their leading axis, prior replicated."""
    s = lambda *spec: NamedSharding(mesh, P(*spec))
    return pg.PoseGraph(
        Rs=s(axis), ts=s(axis), node_mask=s(axis),
        e_i=s(axis), e_j=s(axis), e_Rm=s(axis), e_tm=s(axis),
        e_sqrt_info=s(axis), e_cauchy=s(axis), e_mask=s(axis),
        g_i=s(axis), g_t=s(axis), g_sqrt_info=s(axis), g_mask=s(axis),
        prior_i=s(), prior_R=s(), prior_t=s(), prior_sqrt_info=s(),
    )


def shard_graph(graph: pg.PoseGraph, mesh: Mesh, axis: str = "graph") -> pg.PoseGraph:
    shardings = graph_shardings(mesh, axis)
    return jax.tree_util.tree_map(jax.device_put, graph, shardings)


@partial(jax.jit, static_argnames=("params",))
def _solve(graph, free_from, params):
    return pg.solve(graph, free_from=free_from, params=params)


def solve_sharded(
    graph: pg.PoseGraph,
    mesh: Mesh,
    free_from=0,
    params: pg.SolveParams = pg.SolveParams(),
    axis: str = "graph",
) -> pg.PoseGraph:
    """Shard the graph over the mesh and solve under GSPMD."""
    gs = shard_graph(graph, mesh, axis)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else _null():
        out = _solve(gs, jnp.asarray(free_from, jnp.int32), params)
    return out


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
