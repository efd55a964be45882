import jax.numpy as jnp
import numpy as np

from liorf_tpu.core import se3
from liorf_tpu.graph import pose_graph as pg


def build_chain_graph(poses_true, odom_noise_rot, odom_noise_trans, rng,
                      num_nodes=64, num_edges=128, num_gps=16,
                      loops=(), gps=()):
    """Chain graph with noisy odometry; optional loop edges and GPS."""
    n = len(poses_true)
    g = pg.empty_graph(num_nodes, num_edges, num_gps)
    Rs = np.stack([np.asarray(se3.euler_to_rot(jnp.asarray(p[:3]))) for p in poses_true])
    ts = np.stack([p[3:] for p in poses_true])

    # initial values: integrate noisy odometry
    e_i, e_j, e_Rm, e_tm, e_si, e_c, e_m = [], [], [], [], [], [], []
    Rs_init = [Rs[0]]
    ts_init = [ts[0]]
    for k in range(1, n):
        dR = Rs[k - 1].T @ Rs[k]
        dt = Rs[k - 1].T @ (ts[k] - ts[k - 1])
        # noise
        w = rng.normal(scale=odom_noise_rot, size=3).astype(np.float32)
        v = rng.normal(scale=odom_noise_trans, size=3).astype(np.float32)
        dR_n = dR @ np.asarray(se3.so3_exp(jnp.asarray(w)))
        dt_n = dt + v
        e_i.append(k - 1); e_j.append(k)
        e_Rm.append(dR_n); e_tm.append(dt_n)
        e_si.append([1e3] * 3 + [1e2] * 3)
        e_c.append(0.0); e_m.append(True)
        Rs_init.append(Rs_init[-1] @ dR_n)
        ts_init.append(ts_init[-1] + Rs_init[-1] @ dt_n * 0 + Rs_init[-2] @ dt_n if False else ts_init[-1] + Rs_init[-2] @ dt_n)
    # fix the translation integration (use pre-step rotation)
    Rs_init = [Rs[0]]
    ts_init = [ts[0]]
    for k in range(1, n):
        Rs_init.append(Rs_init[-1] @ e_Rm[k - 1])
        ts_init.append(ts_init[-1] + Rs_init[-2] @ e_tm[k - 1])

    for loop in loops:
        i, j, rel_R, rel_t, sig = loop[:5]
        cauchy = loop[5] if len(loop) > 5 else 0.0
        e_i.append(i); e_j.append(j)
        e_Rm.append(rel_R); e_tm.append(rel_t)
        e_si.append([1.0 / sig] * 6)
        e_c.append(cauchy); e_m.append(True)

    E = len(e_i)
    g = g._replace(
        Rs=jnp.asarray(np.stack(Rs_init + [np.eye(3)] * (num_nodes - n)), jnp.float32),
        ts=jnp.asarray(np.stack(ts_init + [np.zeros(3)] * (num_nodes - n)), jnp.float32),
        node_mask=jnp.asarray(np.arange(num_nodes) < n),
        e_i=jnp.asarray(np.pad(e_i, (0, num_edges - E)), jnp.int32),
        e_j=jnp.asarray(np.pad(e_j, (0, num_edges - E)), jnp.int32),
        e_Rm=jnp.asarray(
            np.concatenate([np.stack(e_Rm), np.tile(np.eye(3), (num_edges - E, 1, 1))]),
            jnp.float32,
        ),
        e_tm=jnp.asarray(np.concatenate([np.stack(e_tm), np.zeros((num_edges - E, 3))]), jnp.float32),
        e_sqrt_info=jnp.asarray(
            np.concatenate([np.asarray(e_si, np.float32), np.ones((num_edges - E, 6), np.float32)]),
        ),
        e_cauchy=jnp.asarray(np.pad(np.asarray(e_c, np.float32), (0, num_edges - E))),
        e_mask=jnp.asarray(np.pad(np.asarray(e_m), (0, num_edges - E))),
        prior_R=jnp.asarray(Rs[0], jnp.float32),
        prior_t=jnp.asarray(ts[0], jnp.float32),
    )
    gi, gt, gs, gm = [], [], [], []
    for (i, pos, sig) in gps:
        gi.append(i); gt.append(pos); gs.append([1.0 / sig] * 3); gm.append(True)
    G = len(gi)
    if G:
        g = g._replace(
            g_i=jnp.asarray(np.pad(gi, (0, num_gps - G)), jnp.int32),
            g_t=jnp.asarray(np.concatenate([np.asarray(gt, np.float32), np.zeros((num_gps - G, 3), np.float32)])),
            g_sqrt_info=jnp.asarray(np.concatenate([np.asarray(gs, np.float32), np.ones((num_gps - G, 3), np.float32)])),
            g_mask=jnp.asarray(np.pad(gm, (0, num_gps - G))),
        )
    return g, Rs, ts


def circle_poses(n, radius=10.0):
    poses = []
    for k in range(n):
        yaw = 2 * np.pi * k / n
        poses.append(
            np.array(
                [0, 0, yaw, radius * np.cos(yaw), radius * np.sin(yaw), 0.0],
                np.float32,
            )
        )
    return poses


def test_chain_without_noise_stays_put(rng):
    poses = circle_poses(20)
    g, Rs, ts = build_chain_graph(poses, 0.0, 0.0, rng)
    solved = pg.solve(g)
    np.testing.assert_allclose(np.asarray(solved.ts)[:20], ts, atol=1e-3)


def test_loop_closure_corrects_drift(rng):
    n = 40
    poses = circle_poses(n)
    g, Rs, ts = build_chain_graph(poses, 0.01, 0.05, rng)
    drift_before = np.linalg.norm(np.asarray(g.ts)[n - 1] - ts[n - 1])

    # loop edge: last node back to node 0 with the TRUE relative pose
    rel_R = Rs[n - 1].T @ Rs[0]
    rel_t = Rs[n - 1].T @ (ts[0] - ts[n - 1])
    loops = [(n - 1, 0, rel_R, rel_t, 0.05)]
    g2, _, _ = build_chain_graph(poses, 0.01, 0.05, np.random.default_rng(0), loops=loops)
    solved = pg.solve(g2)
    # the global yaw is gauge-free (reference prior has yaw variance pi^2,
    # mapOptmization.cpp:1390) -> compare aligned trajectories, like evo ATE
    from liorf_tpu.eval.metrics import ate_rmse

    ate_before = ate_rmse(np.asarray(g2.ts)[:n], ts)
    ate_after = ate_rmse(np.asarray(solved.ts)[:n], ts)
    assert drift_before > 0.3  # sanity: odom alone drifted
    assert ate_after < ate_before * 0.5, (ate_before, ate_after)
    assert float(pg.graph_error(solved)) < float(pg.graph_error(g2))


def test_gps_anchors_absolute_position(rng):
    n = 30
    poses = circle_poses(n)
    gps = [(i, poses[i][3:] + 0, 1.0) for i in range(0, n, 5)]
    g, Rs, ts = build_chain_graph(poses, 0.01, 0.08, rng, gps=gps)
    solved = pg.solve(g)
    err = np.linalg.norm(np.asarray(solved.ts)[:n] - ts, axis=1)
    err_before = np.linalg.norm(np.asarray(g.ts)[:n] - ts, axis=1)
    assert err.mean() < err_before.mean()
    assert err.max() < 1.5


def test_windowed_solve_freezes_old_nodes(rng):
    n = 20
    poses = circle_poses(n)
    g, Rs, ts = build_chain_graph(poses, 0.02, 0.1, rng)
    ts_before = np.asarray(g.ts).copy()
    solved = pg.solve(g, free_from=15)
    ts_after = np.asarray(solved.ts)
    np.testing.assert_allclose(ts_after[:15], ts_before[:15], atol=1e-6)


def test_robust_kernel_downweights_bad_loop(rng):
    n = 40
    poses = circle_poses(n)
    # a WRONG loop edge (20m off) with robust Cauchy vs without
    rel_R = np.eye(3, dtype=np.float32)
    rel_t = np.array([20.0, 0, 0], np.float32)
    loops = [(n - 1, 0, rel_R, rel_t, 0.5, 1.0)]  # Cauchy(1), var 0.5 (SC loop)
    g, Rs, ts = build_chain_graph(poses, 0.002, 0.01, rng, loops=loops)
    solved = pg.solve(g)
    err = np.linalg.norm(np.asarray(solved.ts)[:n] - ts, axis=1)
    # the robust kernel must keep the wrong loop from tearing the trajectory
    assert err.max() < 2.0
