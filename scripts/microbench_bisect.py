"""Bisect the mysterious fixed ~32ms cost in cell-key programs on axon TPU."""

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
        print(f"{name:52s} {dt*1000:9.3f} ms", flush=True)
        return out

    m = jnp.asarray(rng.uniform(-80, 80, (131072, 3)).astype(np.float32))
    o = jnp.zeros(3)

    timeit("sub+div", lambda x: (x - o) / 1.0, m)
    timeit("floor", jnp.floor, m)
    timeit("floor+cast int32", lambda x: jnp.floor(x).astype(jnp.int32), m)
    timeit("cast int32 only", lambda x: x.astype(jnp.int32), m)
    cell = jnp.asarray(rng.integers(0, 1024, (131072, 3)).astype(np.int32))
    timeit("shifts+or on [M,3] int32",
           lambda c: (c[:, 0] << 20) | (c[:, 1] << 10) | c[:, 2], cell)
    timeit("mul-based pack int32",
           lambda c: c[:, 0] * 1048576 + c[:, 1] * 1024 + c[:, 2], cell)
    timeit("compare+all", lambda c: jnp.all((c >= 0) & (c < 1024), axis=-1), cell)
    timeit("clip int32", lambda c: jnp.clip(c, 0, 1023), cell)
    key = jnp.asarray(rng.integers(0, 2**30, 131072).astype(np.int32))
    flag = jnp.asarray(rng.integers(0, 2, 131072).astype(bool))
    timeit("where int32 sentinel", lambda k, f: jnp.where(f, k, jnp.int32(2**31 - 1)),
           key, flag)

    # combos
    timeit("floor+cast+clip", lambda x: jnp.clip(jnp.floor(x).astype(jnp.int32) + 512, 0, 1023), m)

    def cc(x):
        rel = (x - o) / 1.0
        c = jnp.floor(rel).astype(jnp.int32) + 512
        in_range = jnp.all((c >= 0) & (c < 1024), axis=-1)
        return jnp.clip(c, 0, 1023), in_range
    timeit("_cell_coords clone", cc, m)

    def cc_pack(x):
        c, ir = cc(x)
        k = (c[..., 0] << 20) | (c[..., 1] << 10) | c[..., 2]
        return jnp.where(ir, k, jnp.int32(2**31 - 1))
    timeit("_cell_coords+pack clone", cc_pack, m)

    # is it the f32->int path on negative floats? test floor of negatives vs positives
    mp = jnp.abs(m)
    timeit("_cell_coords clone (positive xyz)", cc, mp)

    # float division by traced scalar?
    cs = jnp.asarray(1.0)
    timeit("sub+div by traced scalar", lambda x, s: (x - o) / s, m, cs)


if __name__ == "__main__":
    main()
