"""Multi-host distributed runtime for the pose-graph backend.

The reference is a single-machine system: its backend (GTSAM iSAM2,
``/root/reference/src/mapOptmization.cpp:1521-1531``) cannot outgrow one
host, and its only transport is ROS TCPROS pub/sub on localhost
(SURVEY §5.8). This module is the TPU-native scaling path the new
framework adds on top: the keyframe-block-sharded GN/PCG solver
(``dist/shard_map_solver.py``) executed over a **multi-process** device
mesh — N hosts, each contributing its local TPU chips, federated by
``jax.distributed`` with collectives riding ICI within a slice and DCN
across slices.

Design:

* ``init_multihost`` wraps ``jax.distributed.initialize`` (coordinator
  gRPC rendezvous). On TPU pods the topology is auto-detected; for
  emulation/testing each process forces the CPU platform (the axon PJRT
  plugin force-overrides ``JAX_PLATFORMS`` at interpreter startup, so the
  override must go through ``jax.config``).
* ``global_graph_mesh`` builds a 1-D ``Mesh`` over ALL global devices on
  the ``graph`` axis — keyframe blocks shard across hosts in contiguous
  runs, so the odometry chain's factor locality maps onto ICI-adjacent
  devices and only loop/GPS factors cross host boundaries.
* ``solve_multihost`` pads the graph, lifts every (host-replicated) leaf
  into a global ``jax.Array`` via ``make_array_from_callback`` (each
  process materializes only its addressable shards), and runs the same
  ``shard_map`` body as the single-process solver — one ``all_gather``
  of the search direction plus one ``psum_scatter`` of factor
  contributions per PCG matvec, wire volume independent of factor count.

Run one worker per host:

    python -m liorf_tpu.dist.multihost --coordinator HOST:PORT \
        --num-processes N --process-id I [--platform cpu] [--demo]

``scripts/launch_multihost.py`` spawns N local workers to emulate an
N-host deployment (used by tests/test_multihost.py).
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np

from ..graph import pose_graph as pg
from ..graph.pose_graph import SolveParams


def init_multihost(
    coordinator: str,
    num_processes: int,
    process_id: int,
    platform: str | None = None,
    num_local_cpu_devices: int | None = None,
):
    """Join the multi-host runtime. Call once, before any jax computation.

    ``platform``/``num_local_cpu_devices`` are for emulation (CPU
    collectives via gloo); on a real TPU pod leave both None — the plugin
    discovers the slice topology and ICI wiring itself.
    """
    import jax

    if num_local_cpu_devices is not None:
        jax.config.update("jax_num_cpu_devices", int(num_local_cpu_devices))
    if platform is not None:
        # the axon TPU plugin force-overrides JAX_PLATFORMS at interpreter
        # startup; jax.config wins over the env var
        jax.config.update("jax_platforms", platform)
        if platform == "cpu":
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax


def global_graph_mesh(axis: str = "graph"):
    """1-D mesh over all global devices (keyframe-block axis)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def _to_global(x, mesh, spec):
    """Lift a host-replicated numpy/jax array into a global jax.Array."""
    import jax
    from jax.sharding import NamedSharding

    x = np.asarray(x)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


import functools


@functools.lru_cache(maxsize=32)
def _make_solver(mesh, params: SolveParams, axis: str):
    """Cached jitted shard_map solver (compile once per mesh/params)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from .shard_map_solver import _shard_body

    shard, repl = P(axis), P()
    specs = pg.PoseGraph(
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
            in_specs=(specs, repl),
            out_specs=(repl, repl),
            check_vma=False,
        )
    )
    return fn, specs


def solve_multihost(
    graph: pg.PoseGraph,
    mesh=None,
    free_from: int = 0,
    params: SolveParams = SolveParams(),
    axis: str = "graph",
) -> pg.PoseGraph:
    """Distributed GN/PCG across a (possibly multi-process) mesh.

    Every process must call this collectively with the SAME
    (host-replicated) graph. Returns the solved graph, replicated on all
    hosts. Semantics match ``pose_graph.solve``.
    """
    from .shard_map_solver import _pad_graph

    if mesh is None:
        mesh = global_graph_mesh(axis)
    n = mesh.shape[axis]
    padded, _ = _pad_graph(graph, n)

    fn, specs = _make_solver(mesh, params, axis)
    repl = specs.prior_R
    gl = pg.PoseGraph(
        *(_to_global(x, mesh, s) for x, s in zip(padded, specs))
    )
    Rs, ts = fn(gl, _to_global(np.asarray(free_from, np.int32), mesh, repl))
    K = graph.Rs.shape[0]
    # outputs are fully replicated -> safe to materialize on every host
    return graph._replace(Rs=np.asarray(Rs)[:K], ts=np.asarray(ts)[:K])


# ---------------------------------------------------------------------------
# demo / emulation worker


def demo_graph(K: int, E: int, G: int, noise: float = 0.15, seed: int = 0):
    """Deterministic noisy-circle pose graph (odometry chain + closing loop
    edge + sparse GPS ties) — every process builds the identical graph."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    n = K - 4
    yaw = 2 * np.pi * np.arange(n) / n
    r = 10.0 + 0.02 * n
    gt = np.stack([r * np.cos(yaw), r * np.sin(yaw), 0.1 * np.sin(3 * yaw)], 1)
    gt = gt.astype(np.float32)
    ts = gt + rng.normal(scale=noise, size=gt.shape).astype(np.float32)

    graph = pg.empty_graph(K, E, G)
    e_i = np.arange(E, dtype=np.int32) % (n - 1)
    e_j = e_i + 1
    e_tm = gt[e_j] - gt[e_i]
    e_mask = np.zeros(E, bool)
    e_mask[: n - 1] = True
    e_i[n - 1], e_j[n - 1], e_mask[n - 1] = n - 1, 0, True
    e_tm[n - 1] = gt[0] - gt[n - 1]

    g_idx = np.unique(np.linspace(0, n - 1, G, dtype=np.int32))
    g_mask = np.zeros(G, bool)
    g_mask[: len(g_idx)] = True
    g_idx = np.pad(g_idx, (0, G - len(g_idx)))
    ts_full = np.zeros((K, 3), np.float32)
    ts_full[:n] = ts
    return graph._replace(
        Rs=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3)),
        ts=jnp.asarray(ts_full),
        node_mask=jnp.asarray(np.arange(K) < n),
        e_i=jnp.asarray(e_i),
        e_j=jnp.asarray(e_j),
        e_tm=jnp.asarray(e_tm),
        e_mask=jnp.asarray(e_mask),
        g_i=jnp.asarray(g_idx),
        g_t=jnp.asarray(gt[g_idx]),
        g_mask=jnp.asarray(g_mask),
        prior_t=jnp.asarray(gt[0]),
    ), gt, n


def _demo_main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--coordinator", default="127.0.0.1:12655")
    p.add_argument("--num-processes", type=int, default=1)
    p.add_argument("--process-id", type=int, default=0)
    p.add_argument("--platform", default=None)
    p.add_argument("--local-devices", type=int, default=None)
    p.add_argument("--nodes-per-device", type=int, default=64)
    p.add_argument("--edges-per-node", type=int, default=2)
    p.add_argument("--gn-iters", type=int, default=4)
    p.add_argument("--pcg-iters", type=int, default=48)
    p.add_argument("--inner-iters", type=int, default=0)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args(argv)

    jax = init_multihost(
        args.coordinator, args.num_processes, args.process_id,
        platform=args.platform, num_local_cpu_devices=args.local_devices,
    )
    mesh = global_graph_mesh()
    n_dev = len(jax.devices())

    # weak scaling: problem size grows with the mesh
    K = args.nodes_per_device * n_dev
    graph, gt, n = demo_graph(K, K * args.edges_per_node, max(8, K // 8))
    params = SolveParams(
        gn_iters=args.gn_iters, pcg_iters=args.pcg_iters,
        inner_iters=args.inner_iters,
    )

    out = solve_multihost(graph, mesh, free_from=0, params=params)  # compile+warm
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        out = solve_multihost(graph, mesh, free_from=0, params=params)
    dt = (time.perf_counter() - t0) / args.repeats

    err = float(
        np.linalg.norm(np.asarray(out.ts[:n]) - gt[:n], axis=1).mean()
    )
    init_err = float(
        np.linalg.norm(np.asarray(graph.ts[:n]) - gt[:n], axis=1).mean()
    )
    # parity vs the single-device solver (local compute, same graph)
    ref = pg.solve(graph, free_from=0, params=params)
    parity = float(
        np.abs(np.asarray(out.ts[:n]) - np.asarray(ref.ts[:n])).max()
    )
    if args.process_id == 0:
        print(
            json.dumps(
                {
                    "num_processes": args.num_processes,
                    "global_devices": n_dev,
                    "nodes": int(K),
                    "solve_s": round(dt, 4),
                    "err_vs_gt_m": round(err, 4),
                    "init_err_m": round(init_err, 4),
                    "parity_max_abs_m": round(parity, 6),
                }
            ),
            flush=True,
        )
    if args.num_processes > 1:
        jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(_demo_main())
