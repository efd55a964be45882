import os

import numpy as np
import pytest

from liorf_tpu.mapping.export import load_checkpoint, save_checkpoint, save_map
from liorf_tpu.utils.pcdio import load_pcd, save_pcd


def test_pcd_roundtrip(tmp_path, rng):
    path = str(tmp_path / "a.pcd")
    fields = dict(
        x=rng.normal(size=50).astype(np.float32),
        y=rng.normal(size=50).astype(np.float32),
        z=rng.normal(size=50).astype(np.float32),
        intensity=rng.uniform(size=50).astype(np.float32),
    )
    save_pcd(path, fields)
    back = load_pcd(path)
    for k in fields:
        np.testing.assert_allclose(back[k], fields[k], atol=1e-6)


@pytest.mark.slow
def test_save_map_and_checkpoint(tmp_path):
    from test_e2e_synthetic import run_pipeline

    syn, pipe = run_pipeline(n_frames=12)
    out = str(tmp_path / "maps")
    assert save_map(pipe, out, resolution=0.5)
    for name in ("trajectory.pcd", "transformations.pcd", "SurfMap.pcd", "GlobalMap.pcd"):
        assert os.path.exists(os.path.join(out, name))
    traj = load_pcd(os.path.join(out, "trajectory.pcd"))
    assert len(traj["x"]) == pipe.store.count
    gm = load_pcd(os.path.join(out, "GlobalMap.pcd"))
    assert len(gm["x"]) > 100

    # checkpoint/resume: restore into a fresh pipeline, continue processing
    ckpt = str(tmp_path / "state.pkl")
    save_checkpoint(pipe, ckpt)

    from liorf_tpu.pipeline import LiorfPipeline
    from test_e2e_synthetic import small_config

    pipe2 = LiorfPipeline(small_config())
    load_checkpoint(pipe2, ckpt)
    assert pipe2.store.count == pipe.store.count
    np.testing.assert_allclose(pipe2.last_pose, pipe.last_pose)

    scan = syn.scan(12)
    for s in syn.imu_stream():
        if 1.1 <= s.stamp <= scan.end_time + 0.02:
            pipe2.push_imu(s)
    res = pipe2.process_scan(scan)
    assert np.isfinite(res.pose).all()


def test_cli_synthetic(tmp_path):
    from liorf_tpu import cli

    out = str(tmp_path / "out")
    cli.main(
        [
            "run", "--dataset", "synthetic", "--frames", "8",
            "--out", out, "--save-map",
        ]
    )
    assert os.path.exists(os.path.join(out, "trajectory_tum.txt"))
    assert os.path.exists(os.path.join(out, "GlobalMap.pcd"))

    # eval CLI against itself -> zero error
    est = os.path.join(out, "trajectory_tum.txt")
    cli.main(["eval", "--est", est, "--gt", est])


def test_cli_rosbag(tmp_path):
    """End-to-end: synthetic scans serialized into a ROS1 bag -> CLI run."""
    from liorf_tpu import cli
    from liorf_tpu.sensors.synthetic import SyntheticConfig, SyntheticDataset
    from test_rosbag import serialize_imu, serialize_pointcloud2, write_bag

    syn = SyntheticDataset(SyntheticConfig(n_frames=6, n_rings=16, points_per_ring=180))
    msgs = []
    for s in syn.imu_stream():
        if s.stamp < 0.65:
            msgs.append(
                ("/imu_raw", "sensor_msgs/Imu", max(s.stamp, 0.0),
                 serialize_imu(max(s.stamp, 0.0), s.acc, s.gyr, [1, 0, 0, 0]))
            )
    for f in range(6):
        s = syn.scan(f)
        msgs.append(
            ("/points_raw", "sensor_msgs/PointCloud2", s.stamp,
             serialize_pointcloud2(
                 s.stamp, s.xyz, s.intensity,
                 s.ring.astype(np.uint16), s.rel_time.astype(np.float32)))
        )
    msgs.sort(key=lambda m: m[2])
    bag = str(tmp_path / "seq.bag")
    write_bag(bag, msgs)

    out = str(tmp_path / "out")
    cli.main(
        [
            "run", "--dataset", "rosbag", "--root", bag,
            "--cloud-topic", "/points_raw", "--imu-topic", "/imu_raw",
            "--out", out,
        ]
    )
    tum = np.loadtxt(os.path.join(out, "trajectory_tum.txt"))
    assert tum.shape[0] == 6
    assert np.isfinite(tum).all()


def test_cli_resume(tmp_path):
    """CLI --checkpoint then --resume continues a run."""
    from liorf_tpu import cli

    out1 = str(tmp_path / "a")
    cli.main(
        ["run", "--dataset", "synthetic", "--frames", "6",
         "--out", out1, "--checkpoint"]
    )
    ckpt = os.path.join(out1, "checkpoint.pkl")
    assert os.path.exists(ckpt)

    out2 = str(tmp_path / "b")
    cli.main(
        ["run", "--dataset", "synthetic", "--frames", "4",
         "--out", out2, "--resume", ckpt]
    )
    tum = np.loadtxt(os.path.join(out2, "trajectory_tum.txt"))
    assert tum.shape[0] == 10  # 6 checkpointed + 4 new


def test_cli_optimize(tmp_path):
    """run -> checkpoint -> distributed full-batch relaxation -> resume."""
    from liorf_tpu import cli
    from liorf_tpu.mapping.export import load_checkpoint
    from liorf_tpu.pipeline import SlamConfig, make_pipeline

    out = str(tmp_path / "o")
    cli.main(
        ["run", "--dataset", "synthetic", "--frames", "10",
         "--out", out, "--checkpoint"]
    )
    ckpt = os.path.join(out, "checkpoint.pkl")
    opt = os.path.join(out, "optimized.pkl")
    cli.main(
        ["optimize", "--checkpoint", ckpt, "--out", opt,
         "--devices", "8", "--gn-iters", "2", "--pcg-iters", "16"]
    )
    pipe = make_pipeline(SlamConfig())
    load_checkpoint(pipe, opt)
    kf = np.asarray(pipe.state.kf_poses[: int(pipe.state.kf_count)])
    assert np.isfinite(kf).all() and len(kf) >= 2
