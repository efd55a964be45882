"""Time frame_step and its internal stages with REAL pipeline inputs.

Runs the pipeline a few frames, snapshots the exact device inputs of the
next frame_step call, then times the full program and each sub-stage with
those inputs.
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

    from liorf_tpu.pipeline import LiorfPipeline, SlamConfig
    from liorf_tpu.pipeline import frame_step as fs
    from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset

    print("backend:", jax.devices()[0], flush=True)

    syn = SyntheticDataset(SyntheticConfig(n_frames=8, n_rings=32, points_per_ring=900))
    cfg = SlamConfig(
        scan_capacity=16384, map_capacity=131072, kf_cloud_capacity=8192,
        near_kf_capacity=32, imu_window=64, point_filter_num=1, downsampleRate=1,
        mappingSurfLeafSize=0.3, surroundingKeyframeMapLeafSize=0.3,
        loopClosureEnableFlag=False,
    )
    pipe = LiorfPipeline(cfg)

    captured = {}
    orig = fs.frame_step

    def capture_frame(*a, **k):
        captured["args"] = a
        captured["kwargs"] = k
        return orig(*a, **k)

    import liorf_tpu.pipeline.slam as slam_mod
    slam_mod.frame_step = capture_frame

    imu = syn.imu_stream()
    ii = 0
    for f in range(6):
        scan = syn.scan(f)
        while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
            pipe.push_imu(imu[ii])
            ii += 1
        pipe.process_scan(scan)
        print(f"frame {f} done", flush=True)

    a = captured["args"]
    kw = captured["kwargs"]
    (xyz, rel_t, mask, scan_start, dk_t, dk_gyr, dk_m,
     fu_acc, fu_gyr, fu_dts, fu_m, grid, filt, last_kf) = a[:14]
    params = a[14] if len(a) > 14 else kw["params"]

    def timeit(name, fn, *args, n=5, **kwargs):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:46s} {dt*1000:9.2f} ms", flush=True)
        return out

    print("== full frame_step with real inputs ==", flush=True)
    timeit("frame_step (real)", orig, *a, **kw, n=3)

    print("== stages with real inputs ==", flush=True)
    from liorf_tpu.ops.deskew import deskew_scan, integrate_gyro
    from liorf_tpu.core.voxel import voxel_downsample_xyz
    from liorf_tpu.imu import preintegration as preint, fusion as imu_fusion
    from liorf_tpu.ops import scancontext
    from liorf_tpu.ops.scan_match import scan_to_map

    desk_j = jax.jit(lambda xyz, rt, m, s, t, g, km: deskew_scan(
        xyz, rt, m, s, integrate_gyro(t, g, km)))
    deskewed = timeit("deskew", desk_j, xyz, rel_t, mask, scan_start, dk_t, dk_gyr, dk_m)

    vd_j = jax.jit(lambda d, m: voxel_downsample_xyz(d, m, params.leaf, params.scan_cap))
    ds_xyz, ds_mask = timeit("voxel downsample", vd_j, deskewed, mask)

    pre_j = jax.jit(lambda acc, gyr, dts, m, ba, bg: preint.preintegrate(
        acc, gyr, dts, m, ba, bg, params.fusion.imu))
    pre = timeit("preintegrate", pre_j, fu_acc, fu_gyr, fu_dts, fu_m,
                 filt.mean.ba, filt.mean.bg)

    timeit("scan_to_map (real grid+scan, 30 it)", scan_to_map,
           ds_xyz, ds_mask, grid, jnp.zeros(6), params.match, n=3)
    from liorf_tpu.ops.scan_match import ScanMatchParams
    p1 = params.match._replace(max_iters=1)
    timeit("scan_to_map (max_iters=1)", scan_to_map,
           ds_xyz, ds_mask, grid, jnp.zeros(6), p1, n=3)
    p5 = params.match._replace(max_iters=5)
    timeit("scan_to_map (max_iters=5)", scan_to_map,
           ds_xyz, ds_mask, grid, jnp.zeros(6), p5, n=3)

    sc_j = jax.jit(lambda d, m: scancontext.make_descriptor(d, m))
    timeit("scancontext descriptor", sc_j, deskewed, mask)

    R_l = jnp.eye(3)
    p_l = jnp.zeros(3)
    timeit("fusion_step", imu_fusion.fusion_step, filt, pre, R_l, p_l,
           jnp.asarray(False), params.fusion)


if __name__ == "__main__":
    main()
