"""Multi-session serving throughput: aggregate scans/s vs stream count.

One 10 Hz SLAM stream leaves the chip ~99% idle; this measures how many
independent sessions one chip serves by batching them through the vmapped
resident step (pipeline/multistream.py).

    python scripts/bench_multistream.py          # N in {1, 2, 4, 8}
    BENCH_STREAMS=16 python scripts/bench_multistream.py

Prints one JSON line per N: aggregate scans/s, per-stream scans/s, and
the scaling efficiency vs N=1. Rates are the MEDIAN over 8-tick chunks
(the tunnel injects rare ~100 ms stalls that poison a whole-pass mean
several-fold — see bench.py:_multistream_pass and the r5 notes in
.claude/skills/verify/SKILL.md); scripts/probe_multistream_tick.py
decomposes one tick into host-pack/transfer/device components.
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
    chunk = 8
    base = None
    for n_streams in counts:
        mp = MultiStreamPipeline(cfg, n_streams=n_streams)
        iis = [0] * n_streams
        t_chunk = None
        rates = []
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
                mp.block()
                t_chunk = time.perf_counter()
            mp.step([scan] * n_streams)
            if f >= warm and (f - warm) % chunk == chunk - 1:
                mp.block()
                now = time.perf_counter()
                rates.append(chunk / (now - t_chunk))
                t_chunk = now
        mp.block()
        mp.finish()  # join any growth-precompile daemon (teardown abort)
        agg = float(np.median(rates)) * n_streams
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
