"""Dense-lidar benchmark: KITTI HDL-64-density scans (~113k pts) on one chip.

Exercises the raw_capacity/scan_capacity split: the raw pack buffer holds
the full filtered cloud (a smaller cap would PREFIX-truncate the scan to
its lowest rings and silently wreck registration), while the post-voxel
working set stays at 32k points.

    python scripts/bench_dense.py
Prints one JSON line like bench.py.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> int:
    jax = bench._setup_jax()
    from liorf_tpu.eval.metrics import ate_rmse
    from liorf_tpu.pipeline import ResidentPipeline, SlamConfig

    n_frames, warm = 60, 12
    scans, imu, gt = bench._dataset(n_frames, 64, 1800)
    cfg = SlamConfig(
        raw_capacity=131072,
        scan_capacity=32768,
        map_capacity=262144,
        kf_cloud_capacity=16384,
        near_kf_capacity=32,
        imu_window=64,
        point_filter_num=1,
        downsampleRate=1,
        mappingSurfLeafSize=0.4,
        surroundingKeyframeMapLeafSize=0.4,
        loopClosureEnableFlag=True,
    )
    pipe = ResidentPipeline(cfg)
    ii = 0
    t0 = None
    for f, scan in enumerate(scans):
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        if f == warm:
            t0 = time.perf_counter()
        pipe.process_scan(scan)
    pipe.block()
    el = time.perf_counter() - t0
    _, poses = pipe.trajectory_arrays()
    ate = ate_rmse(poses[:, 3:6], gt[: len(poses)])
    print(
        json.dumps(
            {
                "metric": "dense_scans_per_sec",
                "value": round((n_frames - warm) / el, 1),
                "unit": "scans/s",
                "vs_baseline": round((n_frames - warm) / el / 10.0, 2),
                "ate_rmse_m": round(float(ate), 4),
                "points_per_scan": int(np.mean([len(s.xyz) for s in scans])),
                "backend": str(jax.devices()[0]),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
