"""Diagnose multistream per-tick cost on the real chip.

Times every tick of a MultiStreamPipeline (N configurable) and of a plain
single-stream ResidentPipeline on the same config/feed, in one fresh
process, to separate "the vmapped program is slow" from "bench process
state (pulls/compiles) degraded the tunnel".
"""

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

    n_frames = int(os.environ.get("PROBE_FRAMES", "36"))
    n_streams = int(os.environ.get("PROBE_STREAMS", "1"))
    scans, imu, _ = bench._dataset(60, 16, 720)
    scans = scans[:n_frames]
    cfg = SlamConfig(
        scan_capacity=8192, raw_capacity=16384, map_capacity=131072,
        kf_cloud_capacity=4096, near_kf_capacity=32, imu_window=64,
        point_filter_num=1, downsampleRate=1,
        mappingSurfLeafSize=0.3, surroundingKeyframeMapLeafSize=0.3,
        loopClosureEnableFlag=os.environ.get("PROBE_LOOPS", "1") == "1",
        kf_capacity=64, traj_capacity=64, gps_capacity=16, loop_capacity=16,
    )

    if os.environ.get("PROBE_SINGLE", "1") == "1":
        pipe = ResidentPipeline(cfg)
        ii = 0
        ts = []
        for f, scan in enumerate(scans):
            while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
                pipe.push_imu(imu[ii])
                ii += 1
            t0 = time.perf_counter()
            pipe.process_scan(scan)
            pipe.block()
            ts.append(time.perf_counter() - t0)
        pipe.finish()
        a = np.asarray(ts[4:]) * 1e3
        print(f"single-stream per-tick ms: p50={np.percentile(a,50):.2f} "
              f"p90={np.percentile(a,90):.2f} max={a.max():.2f}", flush=True)

    mp = MultiStreamPipeline(cfg, n_streams=n_streams)
    iis = [0] * n_streams
    ts = []
    for f, scan in enumerate(scans):
        for lane in range(n_streams):
            while (iis[lane] < len(imu)
                   and imu[iis[lane]].stamp <= scan.end_time + 0.02):
                mp.push_imu(lane, imu[iis[lane]])
                iis[lane] += 1
        t0 = time.perf_counter()
        mp.step([scan] * n_streams)
        mp.block()
        ts.append(time.perf_counter() - t0)
    a = np.asarray(ts[4:]) * 1e3
    print(f"multistream N={n_streams} per-tick ms: "
          f"p50={np.percentile(a,50):.2f} p90={np.percentile(a,90):.2f} "
          f"max={a.max():.2f} first5={[round(x,1) for x in (np.asarray(ts[:5])*1e3)]}",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
