"""Distributed pose-graph solve on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from liorf_tpu.dist import sharded
from liorf_tpu.graph import pose_graph as pg


@pytest.fixture
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return sharded.make_mesh(8)


def _circle_graph(K=64, n=48, noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    import jax.numpy as jnp

    graph = pg.empty_graph(K, K, 8)
    yaw = 2 * np.pi * np.arange(n) / n
    ts = np.stack([10 * np.cos(yaw), 10 * np.sin(yaw), np.zeros(n)], 1).astype(np.float32)
    ts_noisy = ts + rng.normal(scale=noise, size=ts.shape).astype(np.float32)
    ts_noisy[0] = ts[0]
    e_i = np.arange(K, dtype=np.int32) % (n - 1)
    e_j = e_i + 1
    e_tm = ts[e_j] - ts[e_i]
    graph = graph._replace(
        ts=jnp.asarray(np.concatenate([ts_noisy, np.zeros((K - n, 3), np.float32)])),
        node_mask=jnp.asarray(np.arange(K) < n),
        e_i=jnp.asarray(e_i),
        e_j=jnp.asarray(e_j),
        e_tm=jnp.asarray(e_tm),
        e_sqrt_info=jnp.ones((K, 6)) * 10.0,
        e_mask=jnp.asarray(np.arange(K) < n - 1),
        prior_t=jnp.asarray(ts[0]),
    )
    return graph, ts, n


def test_sharded_solve_matches_single_device(mesh8):
    graph, ts, n = _circle_graph()
    params = pg.SolveParams(gn_iters=4, pcg_iters=48)
    single = pg.solve(graph, params=params)
    multi = sharded.solve_sharded(graph, mesh8, params=params)
    np.testing.assert_allclose(
        np.asarray(multi.ts)[:n], np.asarray(single.ts)[:n], atol=5e-3
    )


def test_sharded_solve_reduces_error(mesh8):
    graph, ts, n = _circle_graph(noise=0.2)
    solved = sharded.solve_sharded(graph, mesh8, params=pg.SolveParams(gn_iters=4, pcg_iters=48))
    err_before = np.abs(np.asarray(graph.ts)[:n] - ts).max()
    # with prior + exact odometry the solution should be near-exact
    err_after = np.abs(np.asarray(solved.ts)[:n] - ts).max()
    assert err_after < err_before * 0.3


def test_dryrun_multichip_entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_resident_pipeline_trajectory_parity(mesh8):
    """The integrated multi-frame resident pipeline, point-sharded over the
    8-device mesh, must produce the same trajectory as the single-device
    pipeline — same program, same numerics path, GSPMD only changes WHERE
    the per-point work runs (VERDICT r2 next #7)."""
    from liorf_tpu.dist.resident_sharded import ShardedResidentPipeline
    from liorf_tpu.pipeline import ResidentPipeline, SlamConfig
    from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset

    n = 10
    syn = SyntheticDataset(
        SyntheticConfig(n_frames=n, n_rings=16, points_per_ring=360)
    )

    def run(make_pipe):
        pipe = make_pipe()
        imu = syn.imu_stream()
        ii = 0
        for f in range(n):
            scan = syn.scan(f)
            while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
                pipe.push_imu(imu[ii])
                ii += 1
            pipe.process_scan(scan)
        pipe.block()
        cnt = int(np.asarray(pipe.state.traj_count))
        return np.asarray(pipe.state.traj)[:cnt]

    def cfg():
        return SlamConfig(
            scan_capacity=4096,
            raw_capacity=8192,
            map_capacity=32768,
            kf_cloud_capacity=2048,
            near_kf_capacity=16,
            imu_window=64,
            point_filter_num=1,
            downsampleRate=1,
            mappingSurfLeafSize=0.4,
            surroundingKeyframeMapLeafSize=0.4,
            loopClosureEnableFlag=True,
            kf_capacity=64,
            traj_capacity=64,
            gps_capacity=16,
            loop_capacity=16,
        )

    traj_single = run(lambda: ResidentPipeline(cfg()))
    traj_sharded = run(lambda: ShardedResidentPipeline(cfg(), mesh8))

    assert traj_single.shape == traj_sharded.shape
    # same program, but reduction placement changes f32 rounding, which
    # can flip near-tie NN correspondences -> discrete bifurcations grow
    # to a few cm over 10 frames; parity here means the same trajectory
    # up to that re-registration noise
    np.testing.assert_allclose(
        traj_sharded[:, 3:6], traj_single[:, 3:6], atol=6e-2
    )
    np.testing.assert_allclose(
        traj_sharded[:, :3], traj_single[:, :3], atol=2e-2
    )
    assert (traj_sharded[:, 6] == traj_single[:, 6]).mean() >= 0.8


def test_sharded_resident_pipeline_growth(mesh8):
    """Ring growth on the SHARDED resident pipeline: the grown state must
    keep its GSPMD placements, the donated re-jit must retrace cleanly for
    the new shapes, and the stream must continue (ADVICE r3: the sharded
    pipeline has its own executable — growth/precompile must target it)."""
    from liorf_tpu.dist.resident_sharded import ShardedResidentPipeline
    from liorf_tpu.pipeline import SlamConfig
    from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset

    n = 12
    syn = SyntheticDataset(
        SyntheticConfig(n_frames=n, n_rings=8, points_per_ring=180)
    )
    cfg = SlamConfig(
        scan_capacity=1024, raw_capacity=2048, map_capacity=8192,
        kf_cloud_capacity=512, near_kf_capacity=8, imu_window=32,
        point_filter_num=1, downsampleRate=1,
        mappingSurfLeafSize=0.4, surroundingKeyframeMapLeafSize=0.4,
        loopClosureEnableFlag=False,
        kf_capacity=8, traj_capacity=8,  # 12 frames -> both must grow
        gps_capacity=8, loop_capacity=8, pull_free_growth=True,
    )
    pipe = ShardedResidentPipeline(cfg, mesh8)
    imu = syn.imu_stream()
    ii = 0
    for f in range(n):
        scan = syn.scan(f)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        pipe.process_scan(scan)
    pipe.finish()
    assert pipe.growth_events >= 1
    cnt = int(np.asarray(pipe.state.traj_count))
    assert cnt == n
    traj = np.asarray(pipe.state.traj)[:cnt]
    assert np.isfinite(traj[:, :6]).all()
