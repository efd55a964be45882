"""Decompose build_grid / knn_grid cost on TPU: find the slow stage."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") and "axon" not in os.environ["JAX_PLATFORMS"]:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    plat = "cpu" if os.environ.get("JAX_PLATFORMS") == "cpu" else "axon"
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache", plat
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp

    from liorf_tpu.ops import knn

    print("backend:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    def timeit(name, fn_j, *args, n=10):
        out = fn_j(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn_j(*args)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:52s} {dt*1000:9.3f} ms", flush=True)
        return out

    map_pts = jnp.asarray(rng.uniform(-80, 80, (131072, 3)).astype(np.float32))
    queries = jnp.asarray(rng.uniform(-50, 50, (16384, 3)).astype(np.float32))
    mask_m = jnp.ones(map_pts.shape[0], bool)
    mask_q = jnp.ones(queries.shape[0], bool)
    origin = jnp.zeros(3)

    # 1. build_grid exactly as profile_stages does (mask/origin as constants)
    build_const = jax.jit(
        lambda m: knn.build_grid(m, jnp.ones(m.shape[0], bool), jnp.zeros(3), 1.0)
    )
    grid = timeit("build_grid (const mask/origin)", build_const, map_pts)

    # 2. build_grid with all args passed in
    build_args = jax.jit(lambda m, mk, o: knn.build_grid(m, mk, o, 1.0))
    timeit("build_grid (args)", build_args, map_pts, mask_m, origin)

    # 3. decomposed build: keys, argsort, 3 gathers
    def keys_only(m, mk, o):
        cell, in_range = knn._cell_coords(m, o, 1.0)
        return knn._pack_cells(cell, in_range & mk)
    timeit("  build: pack keys", jax.jit(keys_only), map_pts, mask_m, origin)

    def keys_sort(m, mk, o):
        k = keys_only(m, mk, o)
        return jnp.argsort(k)
    timeit("  build: keys+argsort", jax.jit(keys_sort), map_pts, mask_m, origin)

    def full_build(m, mk, o):
        k = keys_only(m, mk, o)
        order = jnp.argsort(k)
        return m[order], k[order], (mk)[order]
    timeit("  build: keys+argsort+gathers", jax.jit(full_build), map_pts, mask_m, origin)

    # 4. knn_grid as profile_stages calls it
    q_j = jax.jit(lambda g, qq: knn.knn_grid(g, qq, jnp.ones(qq.shape[0], bool), 5, 16))
    timeit("knn_grid (27x16)", q_j, grid, queries)

    # 5. decomposed query
    def q_keys(g, qq):
        cell, in_range = knn._cell_coords(qq, g.origin, g.cell_size)
        return knn._pack_cells(cell, in_range)
    timeit("  q: keys", jax.jit(q_keys), grid, queries)

    def q_search(g, qq):
        base = q_keys(g, qq)
        nbr = base[:, None] + jnp.asarray(knn._NEIGHBOR_OFFSETS, dtype=jnp.int32)
        return jnp.searchsorted(g.keys, nbr, side="left"), jnp.searchsorted(
            g.keys, nbr, side="right"
        )
    timeit("  q: keys+searchsorted x2", jax.jit(q_search), grid, queries)

    def q_cand(g, qq):
        starts, ends = q_search(g, qq)
        counts = jnp.minimum(ends - starts, 16)
        offs = jnp.arange(16, dtype=jnp.int32)
        cand = starts[..., None] + offs
        cand_valid = offs < counts[..., None]
        cand = jnp.where(cand_valid, cand, 0)
        return cand.reshape(qq.shape[0], -1), cand_valid.reshape(qq.shape[0], -1)
    timeit("  q: ... +cand idx", jax.jit(q_cand), grid, queries)

    def q_gather(g, qq):
        cand, cand_valid = q_cand(g, qq)
        return g.xyz[cand]
    timeit("  q: ... +gather xyz", jax.jit(q_gather), grid, queries)

    def q_d2(g, qq):
        cand, cand_valid = q_cand(g, qq)
        cxyz = g.xyz[cand]
        diff = cxyz - qq[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)
        return jnp.where(cand_valid, d2, jnp.inf)
    timeit("  q: ... +d2", jax.jit(q_d2), grid, queries)

    def q_full(g, qq):
        d2 = q_d2(g, qq)
        cand, _ = q_cand(g, qq)
        vals, pos = jax.lax.top_k(-d2, 5)
        idx = jnp.take_along_axis(cand, pos, axis=1)
        return -vals, idx
    timeit("  q: ... +top_k (full)", jax.jit(q_full), grid, queries)


if __name__ == "__main__":
    main()
