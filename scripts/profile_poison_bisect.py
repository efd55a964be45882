"""Find which pipeline step poisons the process (30ms-floor slow mode).

Health probe = mean latency of a tiny jit add; healthy ~0.1ms, poisoned ~30ms.
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

    import jax.numpy as jnp

    print("backend:", jax.devices()[0], flush=True)

    tiny = jnp.zeros(8)
    probe_f = jax.jit(lambda x: x + 1.0)
    jax.block_until_ready(probe_f(tiny))

    def health(label):
        t0 = time.perf_counter()
        for _ in range(10):
            jax.block_until_ready(probe_f(tiny))
        dt = (time.perf_counter() - t0) / 10
        print(f"HEALTH after {label:40s} {dt*1000:8.3f} ms", flush=True)

    health("startup")

    from liorf_tpu.pipeline import LiorfPipeline, SlamConfig
    from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset

    syn = SyntheticDataset(SyntheticConfig(n_frames=8, n_rings=32, points_per_ring=900))
    cfg = SlamConfig(
        scan_capacity=16384, map_capacity=131072, kf_cloud_capacity=8192,
        near_kf_capacity=32, imu_window=64, point_filter_num=1, downsampleRate=1,
        mappingSurfLeafSize=0.3, surroundingKeyframeMapLeafSize=0.3,
        loopClosureEnableFlag=False,
    )
    pipe = LiorfPipeline(cfg)
    health("pipeline ctor")

    imu = syn.imu_stream()
    ii = 0

    # frame 0: bootstrap path, instrumented manually
    scan = syn.scan(0)
    while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
        pipe.push_imu(imu[ii])
        ii += 1

    import liorf_tpu.pipeline.slam as slam_mod
    from liorf_tpu.pipeline.frame_step import bootstrap_step

    # manually replicate process_scan for frame 0 with probes
    xyz, rts, msk = pipe._pack_scan(scan)
    health("_pack_scan")
    dk_t, _, dk_gyr, _, dk_m, _ = pipe._imu_window(
        scan.stamp - 0.01, scan.end_time + 0.01, cfg.imu_window
    )
    scan_start = np.float32(scan.stamp - pipe._time_base(scan.stamp))
    out = bootstrap_step(
        xyz, rts, msk, scan_start, dk_t, dk_gyr, dk_m,
        jnp.zeros(6), pipe.frame_params,
    )
    jax.block_until_ready(out[0])
    health("bootstrap_step")

    ds_xyz, ds_mask, desc, key, filt, deskewed = out
    pipe.filter = filt
    pipe.store.append(np.zeros(6, np.float32), scan.stamp, np.asarray(ds_xyz),
                      np.asarray(ds_mask), np.asarray(desc), np.asarray(key))
    health("store.append (pulls)")

    pipe._rebuild_grid(np.zeros(6, np.float32), scan.stamp)
    jax.block_until_ready(pipe.grid.xyz)
    health("_rebuild_grid")

    pipe.last_pose = np.zeros(6, np.float32)
    pipe.last_scan_stamp = scan.stamp
    pipe.frame_idx = 1

    # frame 1 via the normal path
    scan = syn.scan(1)
    while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
        pipe.push_imu(imu[ii])
        ii += 1
    t0 = time.perf_counter()
    pipe.process_scan(scan)
    print(f"frame 1 process_scan: {(time.perf_counter()-t0)*1000:.1f} ms", flush=True)
    health("frame 1 (frame_step path)")

    # frame 2
    scan = syn.scan(2)
    while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
        pipe.push_imu(imu[ii])
        ii += 1
    t0 = time.perf_counter()
    pipe.process_scan(scan)
    print(f"frame 2 process_scan: {(time.perf_counter()-t0)*1000:.1f} ms", flush=True)
    health("frame 2")


if __name__ == "__main__":
    main()
