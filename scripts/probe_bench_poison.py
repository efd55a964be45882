"""Bisect which bench.py section flips the tunnel into the ~30 ms
slow-dispatch mode that collapses the multistream section.

Health probe = latency of a tiny jitted add (healthy ~0.1-0.3 ms over the
tunnel, poisoned ~30 ms), measured after each bench section runs in this
same process.
"""

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
    probe_f = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(probe_f(tiny))

    def health(label):
        best = np.inf
        for _ in range(10):
            t0 = time.perf_counter()
            jax.block_until_ready(probe_f(tiny))
            best = min(best, time.perf_counter() - t0)
        print(f"HEALTH after {label:28s} {best*1e3:8.3f} ms", flush=True)

    health("startup")

    from liorf_tpu.pipeline import ResidentPipeline, SlamConfig

    scans, imu, _ = bench._dataset(40, 32, 900)
    scans = scans[:24]
    cfg = SlamConfig(
        scan_capacity=16384, raw_capacity=32768, map_capacity=131072,
        kf_cloud_capacity=8192, near_kf_capacity=32, imu_window=64,
        point_filter_num=1, downsampleRate=1, mappingSurfLeafSize=0.3,
        surroundingKeyframeMapLeafSize=0.3, loopClosureEnableFlag=True,
    )
    pipe, sps = bench._run_throughput(ResidentPipeline, cfg, scans, imu, 6)
    health(f"primary ({sps:.0f}/s)")

    if os.environ.get("POISON_DENSE", "1") == "1":
        dscans, dimu, _ = bench._dataset(20, 64, 1800)
        dcfg = SlamConfig(
            raw_capacity=131072, scan_capacity=32768, map_capacity=262144,
            kf_cloud_capacity=16384, near_kf_capacity=32, imu_window=64,
            point_filter_num=1, downsampleRate=1, mappingSurfLeafSize=0.4,
            surroundingKeyframeMapLeafSize=0.4, loopClosureEnableFlag=True,
        )
        dpipe, dsps = bench._run_throughput(ResidentPipeline, dcfg, dscans, dimu, 6)
        health(f"dense ({dsps:.0f}/s)")

    if os.environ.get("POISON_LATENCY", "1") == "1":
        lat_pipe = ResidentPipeline(cfg)
        ii = 0
        for f, scan in enumerate(scans):
            while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
                lat_pipe.push_imu(imu[ii])
                ii += 1
            lat_pipe.process_scan(scan)
            lat_pipe.block()
        health("latency rerun")

    if os.environ.get("POISON_SOLVER", "1") == "1":
        extras = {}
        os.environ.setdefault("BENCH_SOLVER_KS", "1024")
        bench._solver_envelope(extras)
        health(f"solver ({extras})")

    # the victim: multistream
    deadline = 3000.0
    os.environ.setdefault("BENCH_MULTI_FRAMES", "16")
    extras = {}
    bench._multistream_pass(extras, deadline)
    print("multistream:", extras, flush=True)
    health("multistream")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
