"""Explicit-collective (shard_map + psum) pose-graph solver: parity with
the single-device solver on the virtual 8-device CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from liorf_tpu.dist.shard_map_solver import solve_shard_map
from liorf_tpu.dist.sharded import make_mesh
from liorf_tpu.graph import pose_graph as pg


def _circle_graph(K=48, E=64, G=16, noise=0.15, seed=0):
    """Noisy circle with odometry chain, one loop edge, and a few GPS ties."""
    rng = np.random.default_rng(seed)
    n = K - 4
    yaw = 2 * np.pi * np.arange(n) / n
    gt = np.stack([10 * np.cos(yaw), 10 * np.sin(yaw), 0.1 * np.sin(3 * yaw)], 1)
    gt = gt.astype(np.float32)
    ts = gt + rng.normal(scale=noise, size=gt.shape).astype(np.float32)

    graph = pg.empty_graph(K, E, G)
    e_i = np.arange(E, dtype=np.int32) % (n - 1)
    e_j = e_i + 1
    e_tm = gt[e_j] - gt[e_i]
    e_mask = np.zeros(E, bool)
    e_mask[: n - 1] = True
    # one loop edge closing the circle
    e_i[n - 1], e_j[n - 1], e_mask[n - 1] = n - 1, 0, True
    e_tm[n - 1] = gt[0] - gt[n - 1]

    g_idx = np.linspace(0, n - 1, G, dtype=np.int32)
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
        g_mask=jnp.asarray(np.arange(G) < G),
        prior_t=jnp.asarray(gt[0]),
    ), gt, n


@pytest.mark.parametrize("n_dev", [1, 8])
def test_shard_map_matches_single_device(n_dev):
    graph, gt, n = _circle_graph()
    params = pg.SolveParams(gn_iters=4, pcg_iters=48)
    ref = pg.solve(graph, free_from=0, params=params)
    mesh = make_mesh(n_dev)
    out = solve_shard_map(graph, mesh, free_from=0, params=params)
    np.testing.assert_allclose(
        np.asarray(out.ts[:n]), np.asarray(ref.ts[:n]), atol=2e-3
    )
    # and it actually solves: error vs ground truth shrinks
    err = np.linalg.norm(np.asarray(out.ts[:n]) - gt[:n], axis=1).mean()
    init_err = np.linalg.norm(np.asarray(graph.ts[:n]) - gt[:n], axis=1).mean()
    assert err < 0.5 * init_err


def test_inner_outer_matches_single_device():
    """Communication-avoiding inner-outer PCG (per-shard Schwarz inner
    solves + flexible outer CG) matches the 48-iteration plain solve with
    only 12 outer iterations — i.e. 4x fewer global collective rounds,
    the regime the multihost bench and docs advertise."""
    graph, gt, n = _circle_graph()
    params = pg.SolveParams(gn_iters=4, pcg_iters=12, inner_iters=8)
    ref = pg.solve(graph, free_from=0, params=pg.SolveParams(gn_iters=4, pcg_iters=48))
    mesh = make_mesh(8)
    out = solve_shard_map(graph, mesh, free_from=0, params=params)
    np.testing.assert_allclose(
        np.asarray(out.ts[:n]), np.asarray(ref.ts[:n]), atol=5e-3
    )
    err = np.linalg.norm(np.asarray(out.ts[:n]) - gt[:n], axis=1).mean()
    init_err = np.linalg.norm(np.asarray(graph.ts[:n]) - gt[:n], axis=1).mean()
    assert err < 0.5 * init_err


def test_shard_map_trailing_window():
    graph, gt, n = _circle_graph()
    params = pg.SolveParams(gn_iters=2, pcg_iters=32)
    mesh = make_mesh(8)
    free_from = n - 8
    ref = pg.solve(graph, free_from=free_from, params=params)
    out = solve_shard_map(graph, mesh, free_from=free_from, params=params)
    # frozen nodes untouched
    np.testing.assert_allclose(
        np.asarray(out.ts[:free_from]), np.asarray(graph.ts[:free_from])
    )
    np.testing.assert_allclose(
        np.asarray(out.ts[:n]), np.asarray(ref.ts[:n]), atol=2e-3
    )
