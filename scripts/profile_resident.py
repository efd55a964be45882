"""Round-2 profiler: where does resident-pipeline frame time go?

Measures, with the bench config:
  - host pack+dispatch time per frame (async path, no block)
  - synchronized per-frame latency, split keyframe vs non-keyframe
    (keyframe flags pulled once at the end from the trajectory ring)
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
    jax.config.update("jax_default_matmul_precision", "highest")
    plat = "cpu" if os.environ.get("JAX_PLATFORMS") == "cpu" else "axon"
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache", plat
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from liorf_tpu.pipeline import ResidentPipeline, SlamConfig
    from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset

    print("backend:", jax.devices()[0], flush=True)

    n_frames = int(os.environ.get("BENCH_FRAMES", "80"))
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache", f"seq_f{n_frames}_r32_p900_v2.npz",
    )
    if os.path.exists(cache):
        data = np.load(cache, allow_pickle=True)
        scans = data["scans"].tolist()
        imu = data["imu"].tolist()
    else:
        syn = SyntheticDataset(
            SyntheticConfig(n_frames=n_frames, n_rings=32, points_per_ring=900)
        )
        scans = [syn.scan(f) for f in range(n_frames)]
        imu = syn.imu_stream()

    cfg = SlamConfig(
        scan_capacity=16384, raw_capacity=32768, map_capacity=131072,
        kf_cloud_capacity=8192, near_kf_capacity=32, imu_window=64,
        point_filter_num=1, downsampleRate=1, mappingSurfLeafSize=0.3,
        surroundingKeyframeMapLeafSize=0.3, loopClosureEnableFlag=True,
    )

    # pass 1: async — per-frame host cost
    import gc

    if os.environ.get("PROFILE_NOGC"):
        gc.collect()
        gc.disable()
        print("gc disabled for timed passes")
    pipe = ResidentPipeline(cfg)
    ii = 0
    host_ts = []
    for f, scan in enumerate(scans):
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        t0 = time.perf_counter()
        pipe.process_scan(scan)
        host_ts.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    pipe.block()
    drain = time.perf_counter() - t0
    host = np.asarray(host_ts[12:]) * 1e3
    print(f"async host ms/frame: p50={np.percentile(host,50):.3f} "
          f"p90={np.percentile(host,90):.3f} max={host.max():.3f} "
          f"mean={host.mean():.3f} drain_s={drain:.3f}")
    order = np.argsort(host)[::-1][:8]
    print("  slowest frames (idx from warmup, ms):",
          [(int(i) + 12, round(float(host[i]), 2)) for i in order])

    # pass 2: synchronized — per-frame latency
    pipe2 = ResidentPipeline(cfg)
    ii = 0
    lats = []
    for f, scan in enumerate(scans):
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe2.push_imu(imu[ii])
            ii += 1
        t0 = time.perf_counter()
        pipe2.process_scan(scan)
        pipe2.block()
        lats.append(time.perf_counter() - t0)
    lat = np.asarray(lats) * 1e3

    _, poses = pipe2.trajectory_arrays()
    is_kf = np.array([fr.is_keyframe for fr in pipe2.trajectory])
    lat_t = lat[12:]
    kf_t = is_kf[12:len(lat)]
    print(f"sync latency ms: all p50={np.percentile(lat_t,50):.3f} "
          f"mean={lat_t.mean():.3f}")
    if kf_t.any():
        print(f"  keyframe frames   (n={kf_t.sum()}): "
              f"p50={np.percentile(lat_t[kf_t],50):.3f} mean={lat_t[kf_t].mean():.3f} "
              f"max={lat_t[kf_t].max():.3f}")
    if (~kf_t).any():
        print(f"  non-keyframe      (n={(~kf_t).sum()}): "
              f"p50={np.percentile(lat_t[~kf_t],50):.3f} mean={lat_t[~kf_t].mean():.3f}")
    n_loopflag = sum(
        1 for f in range(12, len(lat))
        if f % pipe2.loop_every_frames == 0
    )
    loop_t = np.array([
        lat[f] for f in range(12, len(lat)) if f % pipe2.loop_every_frames == 0
    ])
    if len(loop_t):
        print(f"  loop-cadence frames (n={n_loopflag}): "
              f"p50={np.percentile(loop_t,50):.3f} mean={loop_t.mean():.3f}")


if __name__ == "__main__":
    main()
