"""Multi-session serving throughput: aggregate scans/s vs stream count.

One 10 Hz SLAM stream leaves the chip ~99% idle; this measures how many
independent sessions one chip serves by batching them through the vmapped
resident step (pipeline/multistream.py).

    python scripts/bench_multistream.py          # N in {1, 2, 4, 8}
    BENCH_STREAMS=16 python scripts/bench_multistream.py

Prints one JSON line per N: aggregate scans/s, per-stream scans/s, and
the scaling efficiency vs N=1.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main() -> int:
    jax = bench._setup_jax()
    from liorf_tpu.pipeline import SlamConfig
    from liorf_tpu.pipeline.multistream import MultiStreamPipeline

    n_frames, warm = 60, 12
    rings, ppr = 16, 720
    scans_all, imu_all, _ = bench._dataset(n_frames, rings, ppr)

    cfg = SlamConfig(
        scan_capacity=8192,
        raw_capacity=16384,
        map_capacity=131072,
        kf_cloud_capacity=4096,
        near_kf_capacity=32,
        imu_window=64,
        point_filter_num=1,
        downsampleRate=1,
        mappingSurfLeafSize=0.3,
        surroundingKeyframeMapLeafSize=0.3,
        loopClosureEnableFlag=True,
        kf_capacity=128,
        traj_capacity=128,
        gps_capacity=16,
        loop_capacity=16,
    )

    counts = [int(x) for x in os.environ.get("BENCH_STREAMS", "1,2,4,8").split(",")]
    base = None
    for n_streams in counts:
        mp = MultiStreamPipeline(cfg, n_streams=n_streams)
        iis = [0] * n_streams
        t0 = None
        for f in range(n_frames):
            scan = scans_all[f]
            for lane in range(n_streams):
                while (
                    iis[lane] < len(imu_all)
                    and imu_all[iis[lane]].stamp <= scan.end_time + 0.02
                ):
                    mp.push_imu(lane, imu_all[iis[lane]])
                    iis[lane] += 1
            if f == warm:
                t0 = time.perf_counter()
            mp.step([scan] * n_streams)
        mp.block()
        el = time.perf_counter() - t0
        agg = (n_frames - warm) * n_streams / el
        if base is None:
            base = agg
        print(
            json.dumps(
                {
                    "metric": "multistream_scans_per_sec",
                    "streams": n_streams,
                    "value": round(agg, 1),
                    "unit": "scans/s aggregate",
                    "per_stream": round(agg / n_streams, 1),
                    "scaling_efficiency": round(agg / (base * n_streams), 3),
                    "backend": str(jax.devices()[0]),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
