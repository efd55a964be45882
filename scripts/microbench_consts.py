"""Which closed-over constants poison axon executions?

Law so far: `lambda x: x - captured_jnp_zeros3` is catastrophically slow;
`lambda x, o: x - o` is fast. Distinguish np-vs-jnp captures, scalar-vs-array,
and trace-time literals.
"""

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

    def timeit(name, fn, *args, n=5):
        fn_j = jax.jit(fn)
        t0 = time.perf_counter()
        out = fn_j(*args)
        jax.block_until_ready(out)
        warm = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn_j(*args)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:56s} {dt*1000:9.3f} ms  (warm {warm*1000:7.1f} ms)", flush=True)
        return out

    m = jnp.asarray(rng.uniform(-80, 80, (131072, 3)).astype(np.float32))
    tiny = jnp.zeros(8)

    which = os.environ.get("WHICH", "np3")

    if which == "np3":
        o = np.zeros(3, np.float32)  # numpy capture -> trace-time literal
        timeit("capture np.zeros(3)", lambda x: x - o, m)
        timeit("tiny add after", lambda x: x + 1.0, tiny)
    elif which == "list":
        timeit("jnp.array([1.,2.,3.]) in trace", lambda x: x - jnp.array([1.0, 2.0, 3.0]), m)
        timeit("tiny add after", lambda x: x + 1.0, tiny)
    elif which == "jscalar":
        o = jnp.float32(3.0)  # jnp scalar capture
        timeit("capture jnp.float32 scalar", lambda x: x - o, m)
        timeit("tiny add after", lambda x: x + 1.0, tiny)
    elif which == "j3":
        o = jnp.zeros(3)
        timeit("capture jnp.zeros(3) [REPRO]", lambda x: x - o, m, n=3)
        timeit("tiny add after", lambda x: x + 1.0, tiny)
    elif which == "j128":
        o = jnp.zeros(128)
        timeit("capture jnp.zeros(128)", lambda x: x - o[:3], m, n=3)
        timeit("tiny add after", lambda x: x + 1.0, tiny)
    elif which == "offsets":
        offs = jnp.asarray([1, 2, 3], dtype=jnp.int32)  # device array at module scope
        timeit("capture jnp.asarray small int", lambda x: x[:27] + offs[0], m, n=3)
        timeit("tiny add after", lambda x: x + 1.0, tiny)
    elif which == "np_in_trace":
        npo = np.asarray([1, 2, 3], dtype=np.int32)
        timeit("np literal used in trace",
               lambda x: x[:3, 0] + jnp.asarray(npo).astype(jnp.float32), m)
        timeit("tiny add after", lambda x: x + 1.0, tiny)


if __name__ == "__main__":
    main()
