"""Host-side-only cost of the resident pipeline's process_scan.

Replaces resident_step_packed with a no-op (returns the state unchanged)
so the measured per-frame walltime is pure host work: IMU window packing,
native scan packing, buffer assembly, asarray transfer prep. On the real
TPU the device executes asynchronously, so this host time IS the
throughput ceiling of the streaming pass.
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(root, ".jax_cache", "cpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from liorf_tpu.pipeline import SlamConfig
    from liorf_tpu.pipeline import resident as res_mod
    from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset

    n_frames = int(os.environ.get("PROF_FRAMES", "80"))
    syn = SyntheticDataset(SyntheticConfig(n_frames=n_frames, n_rings=32, points_per_ring=900))
    scans = [syn.scan(f) for f in range(n_frames)]
    imu = syn.imu_stream()

    cfg = SlamConfig(
        scan_capacity=16384, raw_capacity=32768, map_capacity=131072,
        kf_cloud_capacity=8192, near_kf_capacity=32, imu_window=64,
        point_filter_num=1, downsampleRate=1, mappingSurfLeafSize=0.3,
        surroundingKeyframeMapLeafSize=0.3, loopClosureEnableFlag=True,
    )
    pipe = res_mod.ResidentPipeline(cfg)

    # no-op the device step AFTER the first real frame (bootstrap needs it)
    orig = res_mod.resident_step_packed

    def noop(state, buf, params, S, W):
        return state

    ii = 0
    # bootstrap with the real step
    for f in range(2):
        while ii < len(imu) and imu[ii].stamp <= scans[f].end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        pipe.process_scan(scans[f])
    res_mod.resident_step_packed = noop

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    for f in range(2, n_frames):
        scan = scans[f]
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        pipe.process_scan(scan)
    prof.disable()
    dt = time.perf_counter() - t0
    res_mod.resident_step_packed = orig
    n = n_frames - 2
    print(f"host-only: {n} frames in {dt:.3f}s -> {dt / n * 1e3:.3f} ms/frame "
          f"({n / dt:.0f} frames/s ceiling)")
    s = io.StringIO()
    ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    ps.print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
