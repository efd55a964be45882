"""Per-config benchmark suite mirroring BASELINE.json's measurement configs.

The reference is benchmarked across five configurations (BASELINE.json:
odom-only, +GPS factors, +ScanContext loops, long-session mapping, and the
distributed keyframe-sharded solve). Real KITTI/M2DGR/MulRan bags are not
available in this environment, so each row runs the synthetic city sequence
under that configuration's *pipeline shape* (same factor types, cadences,
and capacities) and reports sustained scans/s + ATE.

Structure matters on the tunneled TPU: the FIRST device->host pull costs
30-400 s and permanently degrades later dispatches, so all configs run
their timed passes first (keeping each pipeline's device state alive) and
every trajectory pull happens at the end — one penalty for the whole
suite. The distributed row reuses the weak-scaling benchmark on the
virtual CPU mesh.

    python scripts/bench_suite.py
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = {
    # KITTI-05-style: 6-axis IMU, odometry-only back-end
    "odom_only": dict(frames=80, gps=False, loops=False),
    # KITTI-01-style: GPS unary factors fused into the graph
    "gps_fusion": dict(frames=80, gps=True, loops=False),
    # M2DGR-style: ScanContext + radius-search loop closure at 1 Hz
    "sc_loops": dict(frames=80, gps=False, loops=True),
    # MulRan-style long session: 200 frames, loops, full graph relaxations
    "long_session": dict(frames=200, gps=False, loops=True),
}
WARMUP = 12


def run_config(name, row_cfg, bench):
    from liorf_tpu.pipeline import ResidentPipeline, SlamConfig

    n_frames = row_cfg["frames"]
    scans, imu, gt = bench._dataset(n_frames, 32, 900)
    cfg = SlamConfig(
        scan_capacity=16384,
        raw_capacity=32768,
        map_capacity=131072,
        kf_cloud_capacity=8192,
        near_kf_capacity=32,
        imu_window=64,
        point_filter_num=1,
        downsampleRate=1,
        mappingSurfLeafSize=0.3,
        surroundingKeyframeMapLeafSize=0.3,
        loopClosureEnableFlag=row_cfg["loops"],
    )
    pipe = ResidentPipeline(cfg)

    gps_fixes = []
    if row_cfg["gps"]:
        from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset

        syn = SyntheticDataset(
            SyntheticConfig(n_frames=n_frames, n_rings=32, points_per_ring=900)
        )
        gps_fixes = syn.gps_stream()

    ii = gi = 0
    t_start = None
    for f, scan in enumerate(scans):
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        while gi < len(gps_fixes) and gps_fixes[gi].stamp <= scan.end_time:
            pipe.push_gps(gps_fixes[gi])
            gi += 1
        if f == WARMUP:
            pipe.block()
            t_start = time.perf_counter()
        pipe.process_scan(scan)
    pipe.block()
    sps = (n_frames - WARMUP) / (time.perf_counter() - t_start)
    return pipe, gt, sps


def main() -> int:
    import bench

    jax = bench._setup_jax()
    from liorf_tpu.eval.metrics import ate_rmse

    backend = str(jax.devices()[0])

    # phase A: timed passes, NO pulls (device states stay alive per config)
    ran = {}
    for name, row_cfg in CONFIGS.items():
        pipe, gt, sps = run_config(name, row_cfg, bench)
        ran[name] = (pipe, gt, sps)
        print(json.dumps({"config": name, "scans_per_sec": round(sps, 1)}),
              file=sys.stderr, flush=True)

    # phase B: pull every trajectory (one first-pull penalty for the suite)
    rows = []
    for name, (pipe, gt, sps) in ran.items():
        _, poses = pipe.trajectory_arrays()
        ate = ate_rmse(poses[:, 3:6], gt[: len(poses)])
        row = {
            "config": name,
            "scans_per_sec": round(sps, 1),
            "ate_rmse_m": round(float(ate), 4),
            "frames": CONFIGS[name]["frames"] - WARMUP,
            "gps_factors": CONFIGS[name]["gps"],
            "loop_closure": CONFIGS[name]["loops"],
            "backend": backend,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # distributed keyframe-sharded solve (urban_hongkong-style): weak
    # scaling on the virtual CPU mesh (validates the collective structure)
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(here, "bench_scaling.py")],
            capture_output=True, text=True, timeout=3600, env=env,
        )
        line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
        if line:
            d = json.loads(line[-1])
            row = {
                "config": "distributed_pose_graph",
                "weak_scaling_efficiency_8dev": d.get("value"),
                "backend": d.get("backend"),
            }
        else:
            row = {
                "config": "distributed_pose_graph",
                "error": f"exit {r.returncode}: {r.stderr[-400:]}",
            }
    except subprocess.TimeoutExpired:
        row = {"config": "distributed_pose_graph", "error": "timeout"}
    rows.append(row)
    print(json.dumps(row), flush=True)

    ok = [r for r in rows if "ate_rmse_m" in r]
    print(
        json.dumps(
            {
                "metric": "bench_suite",
                "value": round(min(r["scans_per_sec"] for r in ok), 1) if ok else 0,
                "unit": "scans/s (worst config)",
                "vs_baseline": round(
                    (min(r["scans_per_sec"] for r in ok) / 10.0) if ok else 0, 2
                ),
                "rows": rows,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
