"""Characterize the axon slow-mode trigger: constants? stickiness? size law?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

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

    def timeit(name, fn, *args, n=10, jit=True):
        fn_j = jax.jit(fn) if jit else fn
        out = fn_j(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn_j(*args)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:56s} {dt*1000:9.3f} ms", flush=True)
        return out

    tiny = jnp.zeros(8)
    m = jnp.asarray(rng.uniform(-80, 80, (131072, 3)).astype(np.float32))

    phase = os.environ.get("PHASE", "1")

    if phase == "1":
        # is it the captured array constant?
        timeit("tiny add (healthy baseline)", lambda x: x + 1.0, tiny)
        timeit("131k x+1.0 scalar const only", lambda x: x + 1.0, m)
        timeit("tiny add after", lambda x: x + 1.0, tiny)
    elif phase == "2":
        timeit("tiny add (healthy baseline)", lambda x: x + 1.0, tiny)
        o = jnp.zeros(3)
        timeit("131k x-o captured [3] const", lambda x: x - o, m)
        timeit("tiny add after", lambda x: x + 1.0, tiny)
    elif phase == "3":
        # pass o as arg instead of capture
        timeit("tiny add (healthy baseline)", lambda x: x + 1.0, tiny)
        o = jnp.zeros(3)
        timeit("131k x-o, o as ARG", lambda x, oo: x - oo, m, o)
        timeit("tiny add after", lambda x: x + 1.0, tiny)
    elif phase == "4":
        # size scaling of the elementwise program
        timeit("tiny add (healthy baseline)", lambda x: x + 1.0, tiny)
        for sz in (1024, 8192, 65536, 131072, 1048576):
            a = jnp.asarray(rng.uniform(-1, 1, (sz,)).astype(np.float32))
            timeit(f"x+1.0 on [{sz}]", lambda x: x + 1.0, a)
        timeit("tiny add after", lambda x: x + 1.0, tiny)
    elif phase == "5":
        # recovery over time?
        o = jnp.zeros(3)
        timeit("trigger: 131k x-o", lambda x: x - o, m)
        timeit("tiny add immediately", lambda x: x + 1.0, tiny)
        time.sleep(5)
        timeit("tiny add after 5s", lambda x: x + 1.0, tiny)
        time.sleep(20)
        timeit("tiny add after 25s", lambda x: x + 1.0, tiny)
    elif phase == "6":
        # does output-shape matter? reduce to scalar
        timeit("tiny add (healthy baseline)", lambda x: x + 1.0, tiny)
        timeit("sum(x+1) -> scalar", lambda x: jnp.sum(x + 1.0), m)
        timeit("tiny add after", lambda x: x + 1.0, tiny)
        timeit("x*2 -> [131k,3] out", lambda x: x * 2.0, m)
        timeit("tiny add after2", lambda x: x + 1.0, tiny)


if __name__ == "__main__":
    main()
