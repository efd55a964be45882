"""Idleness law: does host-side dead time flip the axon tunnel into the
sticky 30ms slow mode? Threshold? Recovery? Does a keepalive help?"""

import os
import sys
import threading
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

    tiny = jnp.zeros(8)
    probe_f = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(probe_f(tiny))

    def probe(label, n=10):
        t0 = time.perf_counter()
        for _ in range(n):
            jax.block_until_ready(probe_f(tiny))
        dt = (time.perf_counter() - t0) / n
        print(f"probe {label:36s} {dt*1000:8.3f} ms", flush=True)
        return dt

    mode = os.environ.get("MODE", "sleep")

    if mode == "sleep":
        probe("startup")
        for s in (0.1, 0.3, 0.5, 1.0, 2.0):
            time.sleep(s)
            probe(f"after sleep {s}s")
        # recovery attempt: hammer for 3 seconds
        t0 = time.perf_counter()
        cnt = 0
        while time.perf_counter() - t0 < 3.0:
            jax.block_until_ready(probe_f(tiny))
            cnt += 1
        print(f"hammered {cnt} execs in 3 s", flush=True)
        probe("after 3s hammer")
        time.sleep(0.05)
        probe("after 50ms gap")
    elif mode == "numpy":
        probe("startup")
        rng = np.random.default_rng(0)
        a = rng.normal(size=(2000, 2000))
        t0 = time.perf_counter()
        for _ in range(3):
            a = a @ a.T
            a /= np.linalg.norm(a)
        print(f"numpy busywork {time.perf_counter()-t0:.2f}s", flush=True)
        probe("after numpy busywork")
    elif mode == "keepalive":
        stop = threading.Event()

        def keeper():
            while not stop.is_set():
                probe_f(tiny)  # no block; just keep RPCs flowing
                stop.wait(0.02)

        th = threading.Thread(target=keeper, daemon=True)
        th.start()
        probe("startup (keepalive on)")
        for s in (0.5, 1.0, 2.0, 5.0):
            time.sleep(s)
            probe(f"after sleep {s}s (keepalive)")
        stop.set()
    elif mode == "bigprog":
        # does one long-running device program keep the link warm?
        a = jnp.zeros((4096, 4096))
        big = jax.jit(lambda x: ((x + 1.0) @ (x.T + 2.0)).sum())
        jax.block_until_ready(big(a))
        probe("startup")
        t0 = time.perf_counter()
        jax.block_until_ready(big(a))
        print(f"big program: {(time.perf_counter()-t0)*1000:.1f} ms", flush=True)
        probe("after big program")


if __name__ == "__main__":
    main()

# appended modes handled via MODE env in main() — quick variants here:
