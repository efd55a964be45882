"""Benchmark: end-to-end SLAM throughput on one chip.

Runs the full pipeline (deskew -> scan-to-map GN -> IMU fusion -> keyframe
pose graph) over a synthetic city sequence and reports sustained scans/sec
against the reference's real-time operating point (10 Hz lidar — LIO-SAM's
"up to 10x faster than real-time" claim is relative to the same 10 Hz,
/root/reference/README.md:170).

Output contract (driver-safe ordering):

  1. The PRIMARY JSON line — {"metric": "scans_per_sec", ...} — is printed
     IMMEDIATELY after the throughput pass, before any latency re-run and
     before the first device->host pull (which on the tunneled TPU costs
     30–400 s with high variance and permanently degrades later dispatches).
     Even if the driver's timeout fires during the extras below, this line
     is already on stdout.
  2. Best-effort extras (dense KITTI-density pass, per-frame latency, ATE)
     each run only while a wall-clock budget remains (BENCH_DEADLINE_S,
     default 900 s from process start) and are individually try/except'd.
  3. A final enriched JSON line repeats the same metric/value plus whatever
     extras completed, so a last-JSON-line parser sees the same number as a
     first-JSON-line parser.

Env knobs: BENCH_FRAMES/RINGS/PPR/WARMUP (primary pass shape),
BENCH_DENSE=0, BENCH_LATENCY=0 to skip extras, BENCH_DEADLINE_S budget.
"""

import json
import os
import sys
import time

import numpy as np

_T_PROC = time.perf_counter()


def _time_left(deadline: float) -> float:
    return deadline - (time.perf_counter() - _T_PROC)


def _setup_jax():
    import jax

    # honor an explicit JAX_PLATFORMS request — the environment's TPU plugin
    # force-overrides the env var at interpreter startup, so re-assert it
    if os.environ.get("JAX_PLATFORMS") and "axon" not in os.environ["JAX_PLATFORMS"]:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_default_matmul_precision", "highest")
    plat = "axon" if any("axon" in str(d).lower() or "tpu" in str(d).lower()
                         for d in _safe_devices(jax)) else "cpu"
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache", plat)
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return jax


def _safe_devices(jax):
    try:
        return jax.devices()
    except Exception:
        return []


def _dataset(n_frames: int, rings: int, ppr: int):
    """Generate (and cache) the synthetic sequence."""
    from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    key = f"seq_f{n_frames}_r{rings}_p{ppr}_v2.npz"
    path = os.path.join(cache_dir, key)
    cfg = SyntheticConfig(n_frames=n_frames, n_rings=rings, points_per_ring=ppr)
    syn = SyntheticDataset(cfg)
    if os.path.exists(path):
        data = np.load(path, allow_pickle=True)
        scans = data["scans"].tolist()
        imu = data["imu"].tolist()
        gt = data["gt"]
    else:
        scans = [syn.scan(f) for f in range(n_frames)]
        imu = syn.imu_stream()
        _, gt = syn.ground_truth()
        np.savez(
            path,
            scans=np.asarray(scans, dtype=object),
            imu=np.asarray(imu, dtype=object),
            gt=gt,
        )
    return scans, imu, gt


def _run_throughput(PipeCls, cfg, scans, imu, warmup, chunk=None):
    """Feed the full sequence, return (pipe, scans_per_sec[, chunk_rates]).

    No device pulls. With ``chunk`` set, also records per-chunk rates
    (one block per chunk — a sync point, so only use it for endurance
    passes where growth/compile stalls must be separable from the
    steady-state rate)."""
    pipe = PipeCls(cfg)
    ii = 0
    t_start = None
    t_chunk = None
    rates = []
    for f, scan in enumerate(scans):
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        if f == warmup:
            t_start = t_chunk = time.perf_counter()
        pipe.process_scan(scan)
        if chunk and f >= warmup and (f - warmup) % chunk == chunk - 1:
            pipe.block()
            now = time.perf_counter()
            rates.append(chunk / (now - t_chunk))
            t_chunk = now
    if t_start is None:
        raise ValueError(f"warmup {warmup} >= frame count {len(scans)}")
    # stop the clock at the device-work barrier, BEFORE joining any
    # in-flight growth-precompile thread: the join can take minutes of
    # compile time unrelated to steady-state throughput (ADVICE r3)
    pipe.block()
    elapsed = time.perf_counter() - t_start
    # finish(): drains the async queue AND joins any in-flight growth
    # precompile so its executable lands in the persistent cache (a
    # daemon-thread compile killed at process exit is compiled in vain,
    # and the next session pays it again)
    if hasattr(pipe, "finish"):
        pipe.finish()
    sps = (len(scans) - warmup) / elapsed
    if chunk:
        return pipe, sps, rates
    return pipe, sps


def main():
    n_frames = int(os.environ.get("BENCH_FRAMES", "80"))
    rings = int(os.environ.get("BENCH_RINGS", "32"))
    ppr = int(os.environ.get("BENCH_PPR", "900"))
    warmup = int(os.environ.get("BENCH_WARMUP", "12"))
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "900"))

    jax = _setup_jax()
    from liorf_tpu.pipeline import ResidentPipeline, SlamConfig

    scans, imu, gt = _dataset(n_frames, rings, ppr)

    cfg = SlamConfig(
        scan_capacity=16384,
        # full raw cloud capacity: 32x900=28.8k filtered points/scan must NOT
        # be prefix-truncated to scan_capacity (silent accuracy loss)
        raw_capacity=32768,
        map_capacity=131072,
        kf_cloud_capacity=8192,
        near_kf_capacity=32,
        imu_window=64,
        point_filter_num=1,
        downsampleRate=1,
        mappingSurfLeafSize=0.3,
        surroundingKeyframeMapLeafSize=0.3,
        # full pipeline: in-graph RS+ScanContext loop closure at 1 Hz cadence
        loopClosureEnableFlag=True,
    )
    # Device-resident pipeline: zero device->host pulls during the run (a
    # single pull permanently degrades the tunneled session to ~30ms/dispatch)
    pipe, sps = _run_throughput(ResidentPipeline, cfg, scans, imu, warmup)

    result = {
        "metric": "scans_per_sec",
        "value": round(sps, 3),
        "unit": "scans/s",
        "vs_baseline": round(sps / 10.0, 3),
        "frames": n_frames - warmup,
        "points_per_scan": int(np.mean([len(s.xyz) for s in scans])),
        "loop_closure": bool(cfg.loopClosureEnableFlag),
        "backend": str(jax.devices()[0]),
    }
    # PRIMARY line: on stdout before any latency pass or device->host pull.
    print(json.dumps(result), flush=True)

    extras = {}

    # --- best-effort: dense pass at KITTI HDL-64 density (64x1800 ~ 113k pts
    # raw; operating point /root/reference/config/kitti.yaml:26-29) ---------
    if os.environ.get("BENCH_DENSE", "1") == "1" and _time_left(deadline) > 240:
        try:
            dense_scans, dense_imu, _ = _dataset(60, 64, 1800)
            dense_cfg = SlamConfig(
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
            _, dense_sps = _run_throughput(
                ResidentPipeline, dense_cfg, dense_scans, dense_imu, 12)
            extras["dense_scans_per_sec"] = round(dense_sps, 3)
            extras["dense_points_per_scan"] = int(
                np.mean([len(s.xyz) for s in dense_scans]))
        except Exception as e:  # noqa: BLE001 — extras must never kill the bench
            extras["dense_error"] = repr(e)[:200]

    # --- best-effort: per-frame latency (synchronized re-run; the throughput
    # pass overlaps host packing with async device execution, so per-call
    # walltime there is not latency). MUST still precede the first pull. ----
    if os.environ.get("BENCH_LATENCY", "1") == "1" and _time_left(deadline) > 150:
        try:
            lat_pipe = ResidentPipeline(cfg)
            ii = 0
            lats = []
            for f, scan in enumerate(scans):
                while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
                    lat_pipe.push_imu(imu[ii])
                    ii += 1
                t0 = time.perf_counter()
                lat_pipe.process_scan(scan)
                lat_pipe.block()
                lats.append(time.perf_counter() - t0)
            lat = np.asarray(lats[warmup:]) * 1e3
            extras["latency_ms_p50"] = round(float(np.percentile(lat, 50)), 3)
            extras["latency_ms_p99"] = round(float(np.percentile(lat, 99)), 3)
        except Exception as e:  # noqa: BLE001
            extras["latency_error"] = repr(e)[:200]

    # --- best-effort: 512-frame endurance run that CROSSES device-ring
    # growth (capacities sized so the keyframe and trajectory rings must
    # double mid-run — exercises growth + precompile + post-growth retrace
    # end-to-end on the real chip; VERDICT r2 missing #2c). Runs AFTER the
    # latency pass: its optional ATE needs a device->host pull, which
    # permanently degrades later dispatch latency. ----------------------
    if os.environ.get("BENCH_LONG", "1") == "1" and _time_left(deadline) > 420:
        try:
            long_scans, long_imu, long_gt = _dataset(512, 16, 720)
            long_cfg = SlamConfig(
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
                kf_capacity=128,   # ~200 keyframes over the run -> growth
                traj_capacity=256,  # 512 frames -> 2 growths
                # over the tunnel, ONE mid-run count pull degrades every
                # later dispatch to ~0.5 s; grow on host bounds instead
                pull_free_growth=True,
            )
            long_pipe, long_sps, long_rates = _run_throughput(
                ResidentPipeline, long_cfg, long_scans, long_imu, 12, chunk=16)
            extras["long_frames"] = len(long_scans)
            # raw mean includes the growth-retrace compile stalls (large on
            # the tunneled TPU where compiles serialize with dispatch and
            # run for minutes when the persistent cache is cold); the
            # chunk-median is the steady-state rate between growths
            extras["long_scans_per_sec"] = round(long_sps, 3)
            extras["long_steady_scans_per_sec"] = round(
                float(np.median(long_rates)), 3) if long_rates else None
            extras["long_ring_growths"] = int(long_pipe.growth_events)
            if "cpu" in str(jax.devices()[0]).lower() or _time_left(deadline) > 500:
                from liorf_tpu.eval.metrics import ate_rmse as _ate

                _, lp = long_pipe.trajectory_arrays()
                extras["long_ate_rmse_m"] = round(
                    float(_ate(lp[:, 3:6], long_gt[: len(lp)])), 4)
                extras["long_loops"] = int(
                    np.asarray(long_pipe.state.l_count))
        except Exception as e:  # noqa: BLE001
            extras["long_error"] = repr(e)[:200]

    # --- best-effort: ATE (requires the FIRST device->host pull: 30–400 s on
    # the tunneled TPU — runs last, only with a generous remaining budget) --
    if _time_left(deadline) > 420 or "cpu" in str(jax.devices()[0]).lower():
        try:
            from liorf_tpu.eval.metrics import ate_rmse

            _, poses = pipe.trajectory_arrays()
            extras["ate_rmse_m"] = round(
                float(ate_rmse(poses[:, 3:6], gt[: len(poses)])), 4)
        except Exception as e:  # noqa: BLE001
            extras["ate_error"] = repr(e)[:200]

    # FINAL enriched line: same metric/value, so first-line and last-line
    # parsers agree; extras folded in for the record.
    result.update(extras)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
