"""Clean hot-path timing: scan_to_map at fixed GN iteration counts and
build_grid, with device-resident inputs (no host pulls, no closed-over
constants). The difference between iteration counts gives the true
per-iteration device cost of the registration kernel."""

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
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache", plat
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp

    from liorf_tpu.ops import knn
    from liorf_tpu.ops.scan_match import ScanMatchParams, scan_to_map

    print("backend:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    def timeit(name, fn_j, *args, n=20):
        out = fn_j(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn_j(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        ts = np.asarray(ts) * 1000
        print(f"{name:44s} med {np.median(ts):8.3f} ms  min {ts.min():8.3f} ms",
              flush=True)
        return out

    # plane-rich map (5 walls), like a real local map after voxelization
    M, N = 131072, 16384
    planes = []
    for axis, off in [(2, 0.0), (0, -30.0), (0, 30.0), (1, -30.0), (1, 30.0)]:
        p = rng.uniform(-30, 30, size=(M // 5, 3))
        p[:, axis] = off + rng.normal(scale=0.02, size=M // 5)
        planes.append(p)
    map_np = np.concatenate(planes).astype(np.float32)
    if len(map_np) < M:  # pad to the full capacity with repeats
        map_np = np.concatenate([map_np, map_np[: M - len(map_np)]])
    map_xyz = jnp.asarray(map_np)
    mask_m = jnp.ones(M, bool)
    origin = jnp.zeros(3, jnp.float32)

    build = jax.jit(lambda m, mk, o: knn.build_grid(m, mk, o, 1.0))
    grid = timeit("build_grid 131k", build, map_xyz, mask_m, origin)
    grid = jax.block_until_ready(grid)

    scan = jnp.asarray(map_np[:: M // N][:N])
    smask = jnp.ones(scan.shape[0], bool)
    init = jnp.asarray([0.01, -0.005, 0.02, 0.1, -0.05, 0.02], jnp.float32)

    for iters in (1, 2, 4, 8):
        p = ScanMatchParams(max_iters=iters, conv_rot_deg=0.0, conv_trans_cm=0.0)
        f = jax.jit(lambda s, sm, g, i, p=p: scan_to_map(s, sm, g, i, p).pose)
        timeit(f"scan_to_map iters={iters}", f, scan, smask, grid, init)


if __name__ == "__main__":
    main()
