"""Sanity: mix 'fast in script A' and 'slow in script B' ops in ONE process."""

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

    keys = jnp.asarray(rng.integers(0, 2**30, 131072).astype(np.int32))
    m = jnp.asarray(rng.uniform(-80, 80, (131072, 3)).astype(np.float32))
    o = jnp.zeros(3)
    a = jnp.asarray(rng.normal(0, 1, (2048, 2048)).astype(np.float32))

    timeit("matmul 2048^3 (~17 GFLOP)", lambda x: x @ x, a)
    timeit("sort int32 131k (fast in A)", jnp.sort, keys)
    timeit("sub+div [131k,3] (slow in B)", lambda x: (x - o) / 1.0, m)
    timeit("sort int32 131k again", jnp.sort, keys)
    timeit("sub+div again", lambda x: (x - o) / 1.0, m)
    timeit("floor", jnp.floor, m)
    timeit("add 131k", lambda x: x + 1.0, m)
    timeit("dispatch tiny add", lambda x: x + 1.0, o)
    # time WITHOUT block (pure dispatch) to see if block is the cost
    f = jax.jit(lambda x: (x - o) / 1.0)
    out = f(m); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(m)
    t1 = time.perf_counter()
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    print(f"sub+div dispatch-only {1000*(t1-t0)/10:.3f} ms, drain {1000*(t2-t1):.3f} ms")
    # larger n to average
    timeit("sub+div n=50", lambda x: (x - o) / 1.0, m, n=50)


if __name__ == "__main__":
    main()
