"""Weak-scaling benchmark of the distributed pose-graph solver.

Problem size grows with the device count (fixed keyframes/factors per
device); efficiency = t(1 device) / t(N devices) — 1.0 is perfect weak
scaling. Runs on the virtual CPU mesh by default
(``--xla_force_host_platform_device_count``), where collectives are
intra-host memcpys: the number validates the *algorithm's* communication
structure (one [K,6] all-reduce per PCG matvec, independent of factor
count) rather than ICI wire time.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

KF_PER_DEV = 2048  # keyframes per device (a long MulRan-scale session shard)
EDGES_PER_KF = 2  # odometry chain + sparse loops


def make_graph(n_dev, rng):
    import jax.numpy as jnp

    from liorf_tpu.graph import pose_graph as pg

    K = KF_PER_DEV * n_dev
    E = EDGES_PER_KF * K
    G = max(64 * n_dev, 64)
    n = K - 2
    yaw = 2 * np.pi * np.arange(n) / n
    r = 200.0 * n_dev
    gt = np.stack([r * np.cos(yaw), r * np.sin(yaw), 0.5 * np.sin(7 * yaw)], 1)
    gt = gt.astype(np.float32)
    ts = gt + rng.normal(scale=0.3, size=gt.shape).astype(np.float32)

    e_i = np.arange(E, dtype=np.int32) % (n - 1)
    e_j = e_i + 1
    e_mask = np.zeros(E, bool)
    e_mask[: n - 1] = True
    # sparse loop edges: every 97th keyframe ties back 500 keyframes
    loops = np.arange(500, n, 97, dtype=np.int32)
    for li, j in enumerate(loops):
        s = n - 1 + li
        if s >= E:
            break
        e_i[s], e_j[s], e_mask[s] = j - 500, j, True
    e_tm = gt[np.minimum(e_j, n - 1)] - gt[np.minimum(e_i, n - 1)]

    g_idx = np.linspace(0, n - 1, G, dtype=np.int32)
    ts_full = np.zeros((K, 3), np.float32)
    ts_full[:n] = ts
    graph = pg.empty_graph(K, E, G)
    return graph._replace(
        ts=jnp.asarray(ts_full),
        node_mask=jnp.asarray(np.arange(K) < n),
        e_i=jnp.asarray(e_i),
        e_j=jnp.asarray(e_j),
        e_tm=jnp.asarray(e_tm),
        e_mask=jnp.asarray(e_mask),
        g_i=jnp.asarray(g_idx),
        g_t=jnp.asarray(gt[g_idx]),
        g_mask=jnp.asarray(np.ones(G, bool)),
        prior_t=jnp.asarray(gt[0]),
    )


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") and "axon" not in os.environ["JAX_PLATFORMS"]:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_default_matmul_precision", "highest")

    from liorf_tpu.dist.shard_map_solver import solve_shard_map
    from liorf_tpu.dist.sharded import make_mesh
    from liorf_tpu.graph import pose_graph as pg

    n_avail = len(jax.devices())
    params = pg.SolveParams(gn_iters=3, pcg_iters=48)
    rng = np.random.default_rng(0)

    results = {}
    sizes = [n for n in (1, 2, 4, 8) if n <= n_avail]
    for n_dev in sizes:
        graph = make_graph(n_dev, rng)
        mesh = make_mesh(n_dev)
        out = solve_shard_map(graph, mesh, free_from=0, params=params)
        jax.block_until_ready(out.ts)  # compile + warm
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = solve_shard_map(graph, mesh, free_from=0, params=params)
            jax.block_until_ready(out.ts)
        dt = (time.perf_counter() - t0) / reps
        results[n_dev] = dt
        print(
            f"devices={n_dev}  K={KF_PER_DEV * n_dev}  solve={dt*1000:.1f} ms",
            file=sys.stderr, flush=True,
        )

    t1 = results[sizes[0]]
    eff = {n: round(t1 / results[n], 3) for n in sizes}
    print(
        json.dumps(
            {
                "metric": "weak_scaling_efficiency",
                "value": eff[sizes[-1]],
                "unit": f"t(1)/t({sizes[-1]}) at {KF_PER_DEV} kf/device",
                "vs_baseline": round(eff[sizes[-1]] / 0.70, 3),
                "efficiency_by_devices": eff,
                "solve_ms_by_devices": {n: round(1000 * t, 1) for n, t in results.items()},
                "backend": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
