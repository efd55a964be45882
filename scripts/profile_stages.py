"""Per-stage TPU timing: isolates tunnel latency vs program runtime."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") and "axon" not in os.environ["JAX_PLATFORMS"]:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_default_matmul_precision", "highest")
    plat = "cpu" if os.environ.get("JAX_PLATFORMS") == "cpu" else "axon"
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache", plat)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp

    print("backend:", jax.devices()[0], flush=True)

    def timeit(name, fn, *args, n=5, **kw):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, **kw)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:32s} {dt*1000:9.2f} ms", flush=True)
        return out

    # 0. dispatch latency
    x = jnp.zeros(8)
    f_id = jax.jit(lambda v: v + 1)
    timeit("dispatch(add)", f_id, x, n=20)

    rng = np.random.default_rng(0)

    # 1. knn grid build + query at bench scale
    from liorf_tpu.ops import knn

    map_pts = jnp.asarray(rng.uniform(-80, 80, (131072, 3)).astype(np.float32))
    queries = jnp.asarray(rng.uniform(-50, 50, (16384, 3)).astype(np.float32))
    build = jax.jit(lambda m: knn.build_grid(m, jnp.ones(m.shape[0], bool), jnp.zeros(3), 1.0))
    grid = timeit("grid build (131k)", build, map_pts)
    q = jax.jit(lambda g, qq: knn.knn_grid(g, qq, jnp.ones(qq.shape[0], bool), 5, 16))
    timeit("knn query (16k x 27x16)", q, grid, queries)

    # 2. voxel downsample at scan scale
    from liorf_tpu.core.voxel import voxel_downsample_xyz

    scan = jnp.asarray(rng.uniform(-50, 50, (16384, 3)).astype(np.float32))
    vd = jax.jit(lambda s: voxel_downsample_xyz(s, jnp.ones(s.shape[0], bool), 0.3, 16384))
    timeit("voxel downsample (16k)", vd, scan)

    vd2 = jax.jit(
        lambda s: voxel_downsample_xyz(s, jnp.ones(s.shape[0], bool), 0.3, 131072)
    )
    big = jnp.asarray(rng.uniform(-80, 80, (64 * 4096, 3)).astype(np.float32))
    timeit("voxel downsample (262k map)", vd2, big)

    # 3. full scan_to_map
    from liorf_tpu.ops.scan_match import ScanMatchParams, scan_to_map

    timeit(
        "scan_to_map (16k scan)",
        scan_to_map, queries, jnp.ones(16384, bool), grid,
        jnp.zeros(6, jnp.float32), ScanMatchParams(),
        n=3,
    )

    # 4. preintegration + fusion
    from liorf_tpu.imu import fusion, preintegration

    fp = fusion.FusionParams()
    acc = jnp.asarray(rng.normal(0, 1, (64, 3)).astype(np.float32))
    gyr = jnp.asarray(rng.normal(0, 0.1, (64, 3)).astype(np.float32))
    dts = jnp.full((64,), 0.002)
    # NB: dts must be an ARG, not a closure capture — captured jax arrays
    # put the axon tunnel on a sticky ~30ms-per-exec slow path.
    pre_fn = jax.jit(
        lambda a, g, d: preintegration.preintegrate(
            a, g, d, jnp.ones(64, bool), jnp.zeros(3), jnp.zeros(3), fp.imu
        )
    )
    pre = timeit("preintegrate (64)", pre_fn, acc, gyr, dts)
    filt = fusion.init_filter(jnp.eye(3), jnp.zeros(3), fp)
    timeit(
        "fusion_step", fusion.fusion_step, filt, pre, jnp.eye(3),
        jnp.zeros(3), jnp.asarray(False), fp,
    )

    # 5. local map assembly
    from liorf_tpu.mapping.keyframes import assemble_local_map

    K, C = 256, 8192
    kf_poses = jnp.asarray(rng.normal(0, 20, (K, 6)).astype(np.float32))
    kf_clouds = jnp.asarray(rng.uniform(-50, 50, (K, C, 3)).astype(np.float32))
    kf_masks = jnp.ones((K, C), bool)
    timeit(
        "assemble_local_map (32x8k)",
        assemble_local_map,
        kf_poses, kf_clouds, kf_masks,
        jnp.zeros(K), jnp.asarray(40, jnp.int32), jnp.zeros(3), jnp.asarray(0.0),
        radius=50.0, recent_seconds=10.0, near_cap=32, map_cap=131072,
        leaf=0.3, cell_size=1.0, n=3,
    )

    # 6. pose graph solve
    from liorf_tpu.graph import pose_graph as pg

    g = pg.empty_graph(256, 256, 16)
    g = g._replace(node_mask=jnp.asarray(np.arange(256) < 100),
                   e_i=jnp.asarray(np.arange(256, dtype=np.int32) % 99),
                   e_j=jnp.asarray(np.arange(256, dtype=np.int32) % 99 + 1),
                   e_mask=jnp.asarray(np.arange(256) < 99))
    timeit(
        "pose graph solve (100 nodes, window)",
        pg.solve, g, jnp.asarray(84, jnp.int32), pg.SolveParams(gn_iters=3, pcg_iters=32),
        n=3,
    )
    timeit(
        "pose graph solve (100 nodes, full)",
        pg.solve, g, jnp.asarray(0, jnp.int32), pg.SolveParams(gn_iters=6, pcg_iters=96),
        n=3,
    )


if __name__ == "__main__":
    main()
