"""Command-line interface: run SLAM over a dataset, export trajectory + maps.

The off-ROS equivalent of ``roslaunch liorf run_*.launch`` + ``rosbag play``
+ the save_map service. Examples:

    python -m liorf_tpu.cli run --dataset synthetic --frames 100 --out /tmp/out
    python -m liorf_tpu.cli run --dataset kitti --root /data/2011_09_30_drive_0018_sync \
        --config configs/kitti.yaml --gps --out /tmp/kitti_out
    python -m liorf_tpu.cli eval --est /tmp/out/trajectory_tum.txt --gt gt_tum.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _make_dataset(args):
    if args.dataset == "synthetic":
        from .sensors.synthetic import SyntheticConfig, SyntheticDataset

        syn = SyntheticDataset(SyntheticConfig(n_frames=args.frames))
        return syn, syn.imu_stream(), syn.gps_stream() if args.gps else []
    if args.dataset == "kitti":
        from .sensors.kitti import KittiRawDataset

        ds = KittiRawDataset(args.root)
        return ds, ds.imu_stream(), ds.gps_stream() if args.gps else []
    if args.dataset == "mulran":
        from .sensors.mulran import MulranDataset

        ds = MulranDataset(args.root)
        return ds, ds.imu_stream(), ds.gps_stream() if args.gps else []
    if args.dataset == "rosbag":
        from .pipeline import SlamConfig, load_config
        from .sensors.rosbag import RosbagDataset

        cfg = load_config(args.config) if args.config else SlamConfig()
        ds = RosbagDataset(
            args.root,
            cloud_topic=args.cloud_topic or cfg.pointCloudTopic,
            imu_topic=args.imu_topic or cfg.imuTopic,
            gps_topic=(args.gps_topic or cfg.gpsTopic) if args.gps else None,
            sensor=cfg.sensor,
        )
        return ds, ds.imu_stream(), ds.gps_stream() if args.gps else []
    raise SystemExit(f"unknown dataset {args.dataset}")


def cmd_run(args):
    import jax

    if os.environ.get("JAX_PLATFORMS") and "axon" not in os.environ["JAX_PLATFORMS"]:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_default_matmul_precision", "highest")
    # persistent compilation cache: the per-frame program takes tens of
    # seconds to compile on TPU; caching it makes every run after the
    # first start instantly (XDG cache dir, overridable)
    if jax.config.jax_compilation_cache_dir is None:
        cache = os.environ.get(
            "LIORF_TPU_CACHE",
            os.path.join(
                os.environ.get(
                    "XDG_CACHE_HOME", os.path.expanduser("~/.cache")
                ),
                "liorf_tpu",
                "xla",
            ),
        )
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        except OSError:
            pass  # read-only home: run without the persistent cache

    from .mapping.export import load_checkpoint, save_checkpoint, save_map
    from .pipeline import SlamConfig, load_config, make_pipeline

    cfg = load_config(args.config) if args.config else SlamConfig()
    # device-resident (zero-pull) pipeline when the config allows it
    pipe = make_pipeline(cfg)
    if args.resume:
        load_checkpoint(pipe, args.resume)

    ds, imu, gps = _make_dataset(args)
    n = len(ds) if hasattr(ds, "__len__") else args.frames
    n = min(n, args.frames) if args.frames else n

    timers = None
    if args.profile:
        from .utils.profiling import StageTimers

        timers = StageTimers()
    from contextlib import nullcontext

    stage = timers.stage if timers else (lambda *_a, **_k: nullcontext())

    ii = gi = 0
    t0 = time.perf_counter()
    for f in range(n):
        with stage("ingest"):
            scan = ds.scan(f)
            while ii < len(imu) and imu[ii].stamp <= scan.end_time + 0.02:
                pipe.push_imu(imu[ii])
                ii += 1
            while gi < len(gps) and gps[gi].stamp <= scan.stamp:
                pipe.push_gps(gps[gi])
                gi += 1
        with stage("pack+dispatch"):
            res = pipe.process_scan(scan)
        if args.verbose and f % 10 == 0:
            # resident pipeline keeps results on device (pose=None)
            pose_txt = (
                np.round(res.pose[3:], 2) if res.pose is not None else "(on device)"
            )
            print(f"[{f}/{n}] pose={pose_txt} kf={res.is_keyframe}", file=sys.stderr)
    with stage("device drain"):
        if hasattr(pipe, "block"):
            pipe.block()  # drain async device work before stopping the clock
    elapsed = time.perf_counter() - t0
    if timers:
        print(json.dumps(dict(profile=timers.report())), file=sys.stderr)

    os.makedirs(args.out, exist_ok=True)
    if hasattr(pipe, "sync_store"):
        pipe.sync_store()  # pull keyframe clouds for export (one-time)
    pipe.save_tum(os.path.join(args.out, "trajectory_tum.txt"))
    if args.imu_tum and hasattr(pipe, "imu_rate_trajectory"):
        # IMU-rate odometry stream (the reference's odometry/imu topic,
        # imuPreintegration.cpp:482-505) as a TUM trajectory
        from .core import se3np as _se3np
        from .eval.metrics import save_tum as _save_tum

        it, ip = pipe.imu_rate_trajectory()
        if len(it):
            quats = _se3np.rot_to_quat_wxyz(_se3np.euler_to_rot(ip[:, :3]))
            _save_tum(
                os.path.join(args.out, "imu_rate_tum.txt"), it, ip[:, 3:6], quats
            )
    if args.save_map:
        save_map(pipe, args.out, resolution=args.resolution)
    elif cfg.savePCD:
        # reference parity: auto-export on shutdown when savePCD is set
        # (mapOptmization.cpp:442-450 invokes the save_map service with
        # default resolution into savePCDDirectory). The reference
        # unconditionally prepends $HOME to the configured value (:385 —
        # stock YAMLs ship "/Downloads/LOAM/" meaning "~/Downloads/LOAM/");
        # a leading "~" is honored as the user spelling the same thing.
        raw = cfg.savePCDDirectory
        if raw.startswith("~"):
            dest = os.path.expanduser(raw)
        else:
            dest = os.path.join(os.path.expanduser("~"), raw.lstrip("/"))
        save_map(pipe, dest)
    if args.checkpoint:
        save_checkpoint(pipe, os.path.join(args.out, "checkpoint.pkl"))
    if args.viz:
        from .mapping.viz import export_ply, render_overview

        export_ply(pipe, args.out)
        render_overview(pipe, os.path.join(args.out, "overview.png"))
    print(
        json.dumps(
            dict(
                frames=n,
                keyframes=pipe.store.count,
                scans_per_sec=round(n / elapsed, 2),
                out=args.out,
            )
        )
    )


def cmd_optimize(args):
    """Distributed full-batch pose-graph relaxation of a checkpointed run.

    The live pipeline solves incrementally on one chip; this offline pass
    shards keyframe blocks + factors over a device mesh (explicit
    all_gather/psum_scatter collectives) and rewrites every keyframe pose —
    the pod-scale equivalent of the reference's loop-closure isam bursts
    (mapOptmization.cpp:1521-1531, correctPoses :1611-1642)."""
    import jax

    if os.environ.get("JAX_PLATFORMS") and "axon" not in os.environ["JAX_PLATFORMS"]:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp

    from .dist.shard_map_solver import solve_shard_map
    from .dist.sharded import make_mesh
    from .graph import pose_graph as pg
    from .mapping.export import load_checkpoint, save_checkpoint
    from .pipeline import SlamConfig, load_config, make_pipeline

    cfg = load_config(args.config) if args.config else SlamConfig()
    pipe = make_pipeline(cfg)
    load_checkpoint(pipe, args.checkpoint)
    st = pipe.state
    if st is None:
        raise SystemExit("optimize requires a resident-v1 checkpoint")

    from .core import se3 as se3j

    K = st.kf_poses.shape[0]
    L = st.l_i.shape[0]
    G = st.g_i.shape[0]
    idx = jnp.arange(K, dtype=jnp.int32)
    Rs = se3j.euler_to_rot(st.kf_poses[:, :3])
    e_sqrt = np.concatenate([np.full(3, 1.0e3, np.float32), np.full(3, 1.0e2, np.float32)])
    graph = pg.PoseGraph(
        Rs=Rs,
        ts=st.kf_poses[:, 3:6],
        node_mask=idx < st.kf_count,
        e_i=jnp.concatenate([idx, st.l_i]),
        e_j=jnp.concatenate([jnp.minimum(idx + 1, K - 1), st.l_j]),
        e_Rm=jnp.concatenate([st.e_Rm, st.l_Rm]),
        e_tm=jnp.concatenate([st.e_tm, st.l_tm]),
        e_sqrt_info=jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(e_sqrt), (K, 6)), st.l_sqrt]
        ),
        e_cauchy=jnp.concatenate([jnp.zeros((K,), jnp.float32), st.l_cauchy]),
        e_mask=jnp.concatenate(
            [(idx + 1) < st.kf_count, jnp.arange(L, dtype=jnp.int32) < st.l_count]
        ),
        g_i=st.g_i,
        g_t=st.g_t,
        g_sqrt_info=st.g_sqrt,
        g_mask=jnp.arange(G, dtype=jnp.int32) < st.g_count,
        prior_i=jnp.asarray(0, jnp.int32),
        prior_R=st.prior_R,
        prior_t=st.prior_t,
        prior_sqrt_info=jnp.full((6,), 1.0e2, jnp.float32),
    )
    mesh = make_mesh(args.devices)
    t0 = time.perf_counter()
    solved = solve_shard_map(
        graph, mesh, free_from=0,
        params=pg.SolveParams(gn_iters=args.gn_iters, pcg_iters=args.pcg_iters),
    )
    jax.block_until_ready(solved.ts)
    elapsed = time.perf_counter() - t0

    rpy = se3j.rot_to_euler(solved.Rs)
    new_poses = jnp.concatenate([rpy, solved.ts], axis=-1).astype(jnp.float32)
    keep = (idx < st.kf_count)[:, None]
    pipe.state = st._replace(
        kf_poses=jnp.where(keep, new_poses, st.kf_poses)
    )
    pipe._synced = False
    out = args.out or args.checkpoint
    save_checkpoint(pipe, out)
    print(
        json.dumps(
            dict(
                keyframes=int(st.kf_count),
                devices=len(mesh.devices.ravel()),
                solve_s=round(elapsed, 3),
                out=out,
            )
        )
    )


def cmd_eval(args):
    """evo-equivalent trajectory evaluation: timestamp-associated pairs,
    SE(3) APE (trans + rot) and SE(3) RPE (trans + rot) — the metrics
    behind the reference's demo/kitti05_{ape,rpe}.png plots."""
    from .eval.metrics import (
        associate,
        ate_rmse,
        ate_rot_rmse_deg,
        load_tum,
        rpe_se3,
    )

    t_est, est, q_est = load_tum(args.est)
    t_gt, gt, q_gt = load_tum(args.gt)
    ia, ib = associate(t_est, t_gt, max_diff=args.t_max_diff)
    est, q_est = est[ia], q_est[ia]
    gt, q_gt = gt[ib], q_gt[ib]
    n = len(ia)
    if n < 2:
        raise SystemExit(
            f"only {n} associated pose pairs (t_max_diff={args.t_max_diff}); "
            "check the trajectories share a clock"
        )
    rpe_t, rpe_r = rpe_se3(est, q_est, gt, q_gt, delta=args.delta)
    print(
        json.dumps(
            dict(
                ate_rmse=round(ate_rmse(est, gt), 4),
                ate_rot_rmse_deg=round(
                    ate_rot_rmse_deg(est, q_est, gt, q_gt), 4
                ),
                rpe_rmse=round(rpe_t, 4),
                rpe_rot_rmse_deg=round(rpe_r, 4),
                frames=n,
            )
        )
    )


def main(argv=None):
    p = argparse.ArgumentParser(prog="liorf_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run SLAM over a dataset")
    r.add_argument(
        "--dataset", choices=["synthetic", "kitti", "mulran", "rosbag"], required=True
    )
    r.add_argument("--root", help="dataset root directory (or .bag path for rosbag)")
    r.add_argument("--config", help="reference-format YAML config")
    r.add_argument("--cloud-topic", help="rosbag: PointCloud2 topic (default: config)")
    r.add_argument("--imu-topic", help="rosbag: Imu topic (default: config)")
    r.add_argument("--gps-topic", help="rosbag: NavSatFix topic (default: config)")
    r.add_argument("--resume", help="resume from a checkpoint.pkl")
    r.add_argument(
        "--viz", action="store_true",
        help="export trajectory/map/loops PLYs + overview.png",
    )
    r.add_argument(
        "--profile", action="store_true",
        help="report per-stage host timing (ingest/dispatch/drain) to stderr",
    )
    r.add_argument("--frames", type=int, default=0, help="limit frame count")
    r.add_argument("--gps", action="store_true", help="enable the GPS factor stream")
    r.add_argument("--out", required=True)
    r.add_argument("--save-map", action="store_true")
    r.add_argument(
        "--imu-tum", action="store_true",
        help="also export the IMU-rate odometry stream as imu_rate_tum.txt",
    )
    r.add_argument("--resolution", type=float, default=0.0)
    r.add_argument("--checkpoint", action="store_true")
    r.add_argument("--verbose", action="store_true")
    r.set_defaults(fn=cmd_run)

    o = sub.add_parser(
        "optimize", help="distributed full-batch relaxation of a checkpoint"
    )
    o.add_argument("--checkpoint", required=True, help="resident-v1 checkpoint.pkl")
    o.add_argument("--config", help="reference-format YAML config")
    o.add_argument("--out", help="output checkpoint (default: in-place)")
    o.add_argument("--devices", type=int, default=None, help="mesh size (default: all)")
    o.add_argument("--gn-iters", type=int, default=6)
    o.add_argument("--pcg-iters", type=int, default=96)
    o.set_defaults(fn=cmd_optimize)

    e = sub.add_parser("eval", help="ATE/RPE between TUM trajectories")
    e.add_argument("--est", required=True)
    e.add_argument("--gt", required=True)
    e.add_argument("--delta", type=int, default=10)
    e.add_argument(
        "--t-max-diff", type=float, default=0.02,
        help="max timestamp difference for pose association (s)",
    )
    e.set_defaults(fn=cmd_eval)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
