"""Instrumented pipeline run: where does the frame time actually go?"""

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

    from liorf_tpu.pipeline import LiorfPipeline, SlamConfig
    from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset
    import liorf_tpu.pipeline.slam as slam_mod
    from liorf_tpu.utils.profiling import StageTimers

    n_frames = int(os.environ.get("PROF_FRAMES", "24"))
    syn = SyntheticDataset(SyntheticConfig(n_frames=n_frames, n_rings=32, points_per_ring=900))
    cfg = SlamConfig(
        scan_capacity=16384, map_capacity=131072, kf_cloud_capacity=8192,
        near_kf_capacity=32, imu_window=64, point_filter_num=1, downsampleRate=1,
        mappingSurfLeafSize=0.3, surroundingKeyframeMapLeafSize=0.3,
        loopClosureEnableFlag=False,
    )
    pipe = LiorfPipeline(cfg)
    timers = StageTimers()

    # wrap the jit entry points with timers
    from liorf_tpu.pipeline import frame_step as fs_mod

    orig_frame = fs_mod.frame_step
    orig_assemble = slam_mod.assemble_local_map
    orig_solve = slam_mod.pg.solve

    def timed_frame(*a, **k):
        with timers.stage("frame_step_call"):
            out = orig_frame(*a, **k)
            jax.block_until_ready(out.pose)
        return out

    def timed_assemble(*a, **k):
        with timers.stage("assemble_local_map"):
            out = orig_assemble(*a, **k)
            jax.block_until_ready(out.xyz)
        return out

    def timed_solve(*a, **k):
        with timers.stage("graph_solve"):
            out = orig_solve(*a, **k)
            jax.block_until_ready(out.ts)
        return out

    slam_mod.frame_step = timed_frame
    slam_mod.assemble_local_map = timed_assemble
    slam_mod.pg.solve = timed_solve

    imu = syn.imu_stream()
    ii = 0
    t_all0 = time.perf_counter()
    for f in range(n_frames):
        scan = syn.scan(f)
        with timers.stage("scan_gen_excluded"):
            pass
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        with timers.stage("process_scan_total"):
            pipe.process_scan(scan)
    total = time.perf_counter() - t_all0

    import json

    print(json.dumps(timers.report(), indent=1), flush=True)
    print("wall total:", round(total, 2), "s for", n_frames, "frames", flush=True)


if __name__ == "__main__":
    main()
