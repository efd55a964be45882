"""Decompose the N-stream batched tick: host packing vs transfer vs device.

The multistream bench records tick(1)/tick(N); when that ratio collapses
(r4: 0.17, r5 rehearsal: 0.19 in an otherwise healthy session) this probe
says WHICH component moved. Components, measured independently with
block_until_ready timing and NO device->host pulls:

  1. single-stream resident tick (reference point)
  2. N-lane vmapped tick with PRE-STAGED device buffers
     (device execution only: no packing, no transfer)
  3. host->device transfer of the stacked [N, buf] array alone
  4. full MultiStreamPipeline.step() tick (everything)

Run: timeout 900 python scripts/probe_multistream_tick.py  [N]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def main():
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    cache = os.path.join(repo, ".jax_cache", "axon")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import jax.numpy as jnp

    from liorf_tpu.pipeline import SlamConfig
    from liorf_tpu.pipeline.multistream import (
        MultiStreamPipeline,
        resident_step_multi,
    )
    from liorf_tpu.pipeline.resident import frame_buf_size
    from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset

    cfg = SlamConfig(
        scan_capacity=8192, raw_capacity=16384, map_capacity=131072,
        kf_cloud_capacity=4096, near_kf_capacity=32, imu_window=64,
        point_filter_num=1, downsampleRate=1,
        mappingSurfLeafSize=0.3, surroundingKeyframeMapLeafSize=0.3,
        loopClosureEnableFlag=True,
        kf_capacity=64, traj_capacity=64, gps_capacity=16, loop_capacity=16,
    )
    syn = SyntheticDataset(SyntheticConfig(n_frames=40, n_rings=16,
                                           points_per_ring=720))
    scans = [syn.scan(f) for f in range(40)]
    imu = syn.imu_stream()

    def feed(mp, n, n_frames, timed_from, per_tick):
        iis = [0] * n
        t0 = None
        ticks = []
        for f in range(n_frames):
            scan = scans[f]
            for lane in range(n):
                while (iis[lane] < len(imu)
                       and imu[iis[lane]].stamp <= scan.end_time + 0.02):
                    mp.push_imu(lane, imu[iis[lane]])
                    iis[lane] += 1
            if f == timed_from:
                mp.block()
                t0 = time.perf_counter()
            tt = time.perf_counter()
            mp.step([scan] * n)
            if per_tick:
                mp.block()
                if f >= timed_from:
                    ticks.append(time.perf_counter() - tt)
        mp.block()
        return (time.perf_counter() - t0) / (n_frames - timed_from), ticks

    # --- 1. single-stream tick --------------------------------------
    mp1 = MultiStreamPipeline(cfg, n_streams=1)
    tick1, ticks1 = feed(mp1, 1, 40, 8, per_tick=True)
    print(f"tick(1)         {tick1*1e3:8.3f} ms   "
          f"p50 {np.percentile(ticks1,50)*1e3:.3f}  "
          f"p90 {np.percentile(ticks1,90)*1e3:.3f}")

    # --- 4. full N-stream tick (per-tick barrier AND chunked) -------
    mpn = MultiStreamPipeline(cfg, n_streams=n_streams)
    tickn, ticksn = feed(mpn, n_streams, 40, 8, per_tick=True)
    print(f"tick({n_streams}) barrier {tickn*1e3:8.3f} ms   "
          f"p50 {np.percentile(ticksn,50)*1e3:.3f}  "
          f"p90 {np.percentile(ticksn,90)*1e3:.3f}")
    mpc = MultiStreamPipeline(cfg, n_streams=n_streams)
    tickc, _ = feed(mpc, n_streams, 40, 8, per_tick=False)
    print(f"tick({n_streams}) async   {tickc*1e3:8.3f} ms   (no barrier)")

    # --- 2./3. device exec + transfer, isolated ---------------------
    S, W = cfg.raw_cap, cfg.imu_window
    params = mpn.streams[0].params
    states = mpn.states
    buf_np = np.zeros((n_streams, frame_buf_size(S, W)), np.float32)
    nbytes = buf_np.nbytes

    # transfer alone
    for _ in range(3):
        jax.block_until_ready(jnp.asarray(buf_np))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(buf_np))
        ts.append(time.perf_counter() - t0)
    print(f"transfer [{n_streams} x {nbytes//n_streams//1024} KiB]"
          f"  {np.percentile(ts,50)*1e3:8.3f} ms p50")

    # device execution alone: pre-staged buffer, donated state recycled
    buf_dev = jax.block_until_ready(jnp.asarray(buf_np))
    states = resident_step_multi(states, buf_dev, params, S, W)
    jax.block_until_ready(states.traj_count)
    ts = []
    for _ in range(10):
        buf_dev = jnp.asarray(buf_np)
        t0 = time.perf_counter()
        states = resident_step_multi(states, buf_dev, params, S, W)
        jax.block_until_ready(states.traj_count)
        ts.append(time.perf_counter() - t0)
    print(f"device exec ({n_streams} lanes, staged buf)"
          f" {np.percentile(ts,50)*1e3:8.3f} ms p50")

    # host packing alone (shells pack, coordinator stash, no dispatch)
    shells = mpn.streams
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        for sh in shells:
            sh.process_scan(scans[-1])
        mpn._bufs = [None] * n_streams
    print(f"host pack ({n_streams} lanes)      "
          f"{(time.perf_counter()-t0)/reps*1e3:8.3f} ms/tick")


if __name__ == "__main__":
    main()
