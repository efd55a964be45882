"""Per-tick multistream timing, optionally after a primary-pass pipeline
has run in the same process (PROBE_PRIMARY=1) — isolates whether prior
resident programs slow the vmapped multistream program's ticks."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main() -> int:
    bench._setup_jax()
    from liorf_tpu.pipeline import ResidentPipeline, SlamConfig
    from liorf_tpu.pipeline.multistream import MultiStreamPipeline

    scans, imu, _ = bench._dataset(60, 16, 720)
    scans = scans[:24]

    if os.environ.get("PROBE_PRIMARY", "0") == "1":
        pscans, pimu, _ = bench._dataset(40, 32, 900)
        pcfg = SlamConfig(
            scan_capacity=16384, raw_capacity=32768, map_capacity=131072,
            kf_cloud_capacity=8192, near_kf_capacity=32, imu_window=64,
            point_filter_num=1, downsampleRate=1, mappingSurfLeafSize=0.3,
            surroundingKeyframeMapLeafSize=0.3, loopClosureEnableFlag=True,
        )
        _, psps = bench._run_throughput(ResidentPipeline, pcfg, pscans[:24], pimu, 6)
        print(f"primary first: {psps:.0f}/s", flush=True)

    cfg = SlamConfig(
        scan_capacity=8192, raw_capacity=16384, map_capacity=131072,
        kf_cloud_capacity=4096, near_kf_capacity=32, imu_window=64,
        point_filter_num=1, downsampleRate=1,
        mappingSurfLeafSize=0.3, surroundingKeyframeMapLeafSize=0.3,
        loopClosureEnableFlag=True,
        kf_capacity=64, traj_capacity=64, gps_capacity=16, loop_capacity=16,
    )
    n_streams = int(os.environ.get("PROBE_STREAMS", "4"))
    mp = MultiStreamPipeline(cfg, n_streams=n_streams)
    iis = [0] * n_streams
    host_t, tick_t = [], []
    for f, scan in enumerate(scans):
        for lane in range(n_streams):
            while (iis[lane] < len(imu)
                   and imu[iis[lane]].stamp <= scan.end_time + 0.02):
                mp.push_imu(lane, imu[iis[lane]])
                iis[lane] += 1
        t0 = time.perf_counter()
        mp.step([scan] * n_streams)
        t1 = time.perf_counter()
        if os.environ.get("PROBE_ASYNC", "0") != "1":
            mp.block()
        t2 = time.perf_counter()
        host_t.append(t1 - t0)
        tick_t.append(t2 - t0)
    if os.environ.get("PROBE_ASYNC", "0") == "1":
        t_end0 = time.perf_counter()
        mp.block()
        print(f"final block: {(time.perf_counter()-t_end0)*1e3:.1f} ms "
              f"over {len(scans)} ticks", flush=True)
    h = np.asarray(host_t[4:]) * 1e3
    a = np.asarray(tick_t[4:]) * 1e3
    print(
        f"N={n_streams} per-tick ms p50={np.percentile(a,50):.2f} "
        f"p90={np.percentile(a,90):.2f} (host-side p50={np.percentile(h,50):.2f})",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

# async-mode variant (PROBE_ASYNC=1): no per-tick block; block only at end
