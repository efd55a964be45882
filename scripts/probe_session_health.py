"""Correlate a tiny-dispatch health probe with real pipeline throughput in
the same process, to see if a degraded tunnel session is detectable at
startup (before any big program runs)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main() -> int:
    jax = bench._setup_jax()
    import jax.numpy as jnp

    tiny = jnp.zeros(8)
    f = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(f(tiny))
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        jax.block_until_ready(f(tiny))
        lats.append(time.perf_counter() - t0)
    a = np.asarray(lats) * 1e3
    print(f"tiny-dispatch ms: p50={np.percentile(a,50):.3f} "
          f"p90={np.percentile(a,90):.3f}", flush=True)

    # medium program + 256 KB transfer (the per-frame shape of the real
    # pipeline) — maybe degradation only shows with transfers
    buf = np.zeros(65536, np.float32)
    g = jax.jit(lambda x: (x * 2.0).sum())
    jax.block_until_ready(g(jnp.asarray(buf)))
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(g(jnp.asarray(buf)))
        lats.append(time.perf_counter() - t0)
    a = np.asarray(lats) * 1e3
    print(f"256KB-transfer ms: p50={np.percentile(a,50):.3f} "
          f"p90={np.percentile(a,90):.3f}", flush=True)

    from liorf_tpu.pipeline import ResidentPipeline, SlamConfig

    scans, imu, _ = bench._dataset(40, 32, 900)
    cfg = SlamConfig(
        scan_capacity=16384, raw_capacity=32768, map_capacity=131072,
        kf_cloud_capacity=8192, near_kf_capacity=32, imu_window=64,
        point_filter_num=1, downsampleRate=1, mappingSurfLeafSize=0.3,
        surroundingKeyframeMapLeafSize=0.3, loopClosureEnableFlag=True,
    )
    _, sps = bench._run_throughput(ResidentPipeline, cfg, scans[:24], imu, 6)
    print(f"primary mini: {sps:.0f}/s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
