"""TPU primitive-op cost model: which XLA ops are slow on this chip?

Informs the kNN / voxel / preintegration redesign. Run:
    python scripts/microbench_ops.py            # TPU (axon)
    JAX_PLATFORMS=cpu python scripts/microbench_ops.py
"""

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

    print("backend:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    def timeit(name, fn, *args, n=10):
        fn_j = jax.jit(fn)
        out = fn_j(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn_j(*args)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:44s} {dt*1000:9.3f} ms", flush=True)
        return out

    M = 131072
    N = 16384
    keys = jnp.asarray(rng.integers(0, 2**30, M).astype(np.int32))
    vals = jnp.asarray(rng.uniform(-80, 80, (M, 3)).astype(np.float32))
    skeys = jnp.sort(keys)

    # sorts
    timeit("sort int32 131k", jnp.sort, keys)
    timeit("argsort int32 131k", jnp.argsort, keys)
    timeit("sort_key_val 131k x (3 f32)", lambda k, v: jax.lax.sort(
        (k, v[:, 0], v[:, 1], v[:, 2]), num_keys=1), keys, vals)

    # searchsorted
    q27 = jnp.asarray(rng.integers(0, 2**30, (N, 27)).astype(np.int32))
    timeit("searchsorted [16k,27] in 131k", lambda s, q: jnp.searchsorted(s, q), skeys, q27)

    # gathers
    idx_rows = jnp.asarray(rng.integers(0, M, (N, 432)).astype(np.int32))
    timeit("row-gather [16k,432] rows from [131k,3]", lambda v, i: v[i], vals, idx_rows)
    idx_flat = idx_rows.reshape(-1)
    timeit("row-gather flat [7.1M] from [131k,3]", lambda v, i: v[i], vals, idx_flat)
    # gather from a padded [131k, 8] layout (lane-aligned rows)
    vals8 = jnp.pad(vals, ((0, 0), (0, 5)))
    timeit("row-gather [16k,432] from [131k,8]", lambda v, i: v[i], vals8, idx_rows)
    # gather each coord separately from [3, 131k] (transposed, along lanes)
    valsT = vals.T
    timeit("lane-gather [16k,432]x3 from [3,131k]", lambda v, i: v[:, i], valsT, idx_rows)
    # block gather: 442k dynamic slices of [16,3]
    starts = jnp.asarray(rng.integers(0, M - 16, (N * 27,)).astype(np.int32))
    timeit(
        "block-gather 442k x [16,3] (vmap dyn_slice)",
        lambda v, s: jax.vmap(
            lambda st: jax.lax.dynamic_slice(v, (st, 0), (16, 3))
        )(s),
        vals, starts,
    )
    starts2 = jnp.asarray(rng.integers(0, M - 16, (4096 * 27,)).astype(np.int32))
    timeit(
        "block-gather 110k x [16,3] (vmap dyn_slice)",
        lambda v, s: jax.vmap(
            lambda st: jax.lax.dynamic_slice(v, (st, 0), (16, 3))
        )(s),
        vals, starts2,
    )
    # small-table gather (dense cell table)
    table = jnp.asarray(rng.integers(0, M, 4_100_000).astype(np.int32))
    timeit("table-gather [16k,27] from 4.1M", lambda t, i: t[i], table,
           jnp.asarray(rng.integers(0, 4_000_000, (N, 27)).astype(np.int32)))

    # top_k
    d2 = jnp.asarray(rng.uniform(0, 10, (N, 432)).astype(np.float32))
    timeit("top_k k=5 over [16k,432]", lambda d: jax.lax.top_k(-d, 5), d2)
    d2b = jnp.asarray(rng.uniform(0, 10, (N, 128)).astype(np.float32))
    timeit("top_k k=5 over [16k,128]", lambda d: jax.lax.top_k(-d, 5), d2b)
    # min-5 via 5 iterative masked argmin passes
    def min5(d):
        outs = []
        for _ in range(5):
            i = jnp.argmin(d, axis=1)
            outs.append(i)
            d = d.at[jnp.arange(d.shape[0]), i].set(jnp.inf)
        return jnp.stack(outs, 1)
    timeit("5x masked argmin over [16k,432]", min5, d2)

    # scatter
    sidx = jnp.asarray(rng.permutation(M)[:M].astype(np.int32))
    timeit("scatter 131k int32 -> 4.1M table",
           lambda t, i, v: t.at[i].set(v), table,
           jnp.asarray(rng.integers(0, 4_000_000, M).astype(np.int32)),
           jnp.arange(M, dtype=jnp.int32))
    timeit("scatter-add 16k f32 -> 131k",
           lambda t, i, v: t.at[i].add(v),
           jnp.zeros(M), jnp.asarray(rng.integers(0, M, N).astype(np.int32)),
           jnp.ones(N))
    # segment ops
    seg = jnp.sort(jnp.asarray(rng.integers(0, 60000, M).astype(np.int32)))
    timeit("segment_sum 131k->64k (sorted ids)",
           lambda v, s: jax.ops.segment_sum(v, s, num_segments=65536), vals, seg)

    # cumsum / scans
    timeit("cumsum 4.1M int32", jnp.cumsum, table)
    acc = jnp.asarray(rng.normal(0, 1, (64, 3)).astype(np.float32))

    def seq_scan(a):
        def body(c, x):
            R = c
            th = jnp.linalg.norm(x) + 1e-9
            K = jnp.array([[0, -x[2], x[1]], [x[2], 0, -x[0]], [-x[1], x[0], 0]]) / th
            dR = jnp.eye(3) + jnp.sin(th) * K + (1 - jnp.cos(th)) * (K @ K)
            return R @ dR, R
        return jax.lax.scan(body, jnp.eye(3), a)
    timeit("lax.scan 64 x (3x3 matmul chain)", seq_scan, acc)

    def assoc_scan(a):
        th = jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-9
        k = a / th
        K = jnp.zeros((64, 3, 3))
        K = K.at[:, 0, 1].set(-k[:, 2]).at[:, 0, 2].set(k[:, 1])
        K = K.at[:, 1, 0].set(k[:, 2]).at[:, 1, 2].set(-k[:, 0])
        K = K.at[:, 2, 0].set(-k[:, 1]).at[:, 2, 1].set(k[:, 0])
        th = th[..., None]
        dR = jnp.eye(3)[None] + jnp.sin(th) * K + (1 - jnp.cos(th)) * (K @ K)
        return jax.lax.associative_scan(lambda x, y: jnp.einsum("nij,njk->nik", x, y), dR)
    timeit("assoc_scan 64 x (3x3 matmul)", assoc_scan, acc)

    # while_loop overhead
    def wl(x):
        def cond(c):
            return c[1] < 30
        def body(c):
            return (c[0] * 1.0001 + 1.0, c[1] + 1)
        return jax.lax.while_loop(cond, body, (x, 0))
    timeit("while_loop 30 iters tiny body", wl, jnp.zeros(128))

    # eigh / solve 6x6
    A = jnp.asarray(rng.normal(0, 1, (6, 6)).astype(np.float32))
    A = A @ A.T + 6 * jnp.eye(6)
    timeit("eigh 6x6", jnp.linalg.eigh, A)
    timeit("solve 6x6", lambda a: jnp.linalg.solve(a, jnp.ones(6)), A)

    # unique-adjacent (for dedup): sorted keys -> first-occurrence flags + cumsum
    timeit("dedup flags+cumsum 131k",
           lambda k: jnp.cumsum((k != jnp.roll(k, 1)).astype(jnp.int32)), skeys)


if __name__ == "__main__":
    main()
