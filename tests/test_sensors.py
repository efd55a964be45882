import os

import numpy as np
import pytest

from liorf_tpu.sensors import kitti, mulran, types


def test_velodyne_adapter():
    s = types.from_velodyne(
        10.0, np.zeros((5, 3)), np.ones(5), np.arange(5), np.linspace(0, 0.1, 5)
    )
    assert s.stamp == 10.0
    assert s.rel_time.max() == pytest.approx(0.1)


def test_ouster_adapter_ns_to_s():
    s = types.from_ouster(
        5.0, np.zeros((3, 3)), np.ones(3), np.arange(3), np.array([0, 5e7, 1e8])
    )
    np.testing.assert_allclose(s.rel_time, [0, 0.05, 0.1])


def test_robosense_adapter_absolute_stamps():
    ts = np.array([100.0, 100.05, 100.1])
    s = types.from_robosense(99.0, np.zeros((3, 3)), np.ones(3), np.arange(3), ts)
    assert s.stamp == 100.0
    np.testing.assert_allclose(s.rel_time, [0, 0.05, 0.1])


def test_validate_scan_rejects_nan():
    s = types.from_velodyne(
        0.0, np.array([[np.nan, 0, 0]]), np.ones(1), np.zeros(1), np.zeros(1)
    )
    with pytest.raises(ValueError):
        types.validate_scan(s)


def _write_kitti_drive(root, n_frames=3, n_pts=100, rng=None):
    velo = os.path.join(root, "velodyne_points")
    os.makedirs(os.path.join(velo, "data"))
    oxts = os.path.join(root, "oxts")
    os.makedirs(os.path.join(oxts, "data"))

    def stamp_lines(n, base_s):
        return [
            f"2011-09-30 12:40:{base_s + i * 0.1:09.6f}\n" for i in range(n)
        ]

    with open(os.path.join(velo, "timestamps.txt"), "w") as f:
        f.writelines(stamp_lines(n_frames, 10.0))
    for i in range(n_frames):
        pts = rng.uniform(-20, 20, size=(n_pts, 4)).astype(np.float32)
        pts[:, 3] = 0.5
        pts.tofile(os.path.join(velo, "data", f"{i:010d}.bin"))
    with open(os.path.join(oxts, "timestamps.txt"), "w") as f:
        f.writelines(stamp_lines(n_frames * 2, 10.0))
    for i in range(n_frames * 2):
        row = np.zeros(30)
        row[0], row[1], row[2] = 49.0, 8.4, 110.0  # lat lon alt
        row[11:14] = [0.1, 0.0, 9.8]  # acc
        row[17:20] = [0.0, 0.0, 0.01]  # gyro
        row[23] = 0.5
        np.savetxt(os.path.join(oxts, "data", f"{i:010d}.txt"), row[None])
    return root


def test_kitti_reader(tmp_path, rng):
    root = _write_kitti_drive(str(tmp_path), rng=rng)
    ds = kitti.KittiRawDataset(root)
    assert len(ds) == 3
    s = ds.scan(0)
    assert s.xyz.shape == (100, 3)
    assert s.ring.min() >= 0 and s.ring.max() < 64
    assert (s.rel_time >= 0).all() and (s.rel_time <= 0.1).all()
    imu = ds.imu_stream()
    assert len(imu) == 6
    np.testing.assert_allclose(imu[0].acc, [0.1, 0, 9.8])
    gps = ds.gps_stream()
    assert gps[0].lat == 49.0
    assert gps[0].cov_xyz[0] == pytest.approx(0.25)


def test_kitti_ring_reconstruction():
    # a point at elevation 2 deg must land on the top ring, -24.8 on ring 0
    xyz = np.array(
        [
            [10 * np.cos(np.deg2rad(2.0)), 0, 10 * np.sin(np.deg2rad(2.0))],
            [10 * np.cos(np.deg2rad(-24.8)), 0, 10 * np.sin(np.deg2rad(-24.8))],
        ],
        np.float32,
    )
    s = kitti.scan_from_points(xyz, np.ones(2), 0.0)
    assert s.ring[0] == 63
    assert s.ring[1] == 0


def test_mulran_reader(tmp_path, rng):
    sd = os.path.join(str(tmp_path), "sensor_data")
    os.makedirs(os.path.join(sd, "Ouster"))
    for i in range(2):
        pts = rng.uniform(-20, 20, size=(50, 4)).astype(np.float32)
        pts.tofile(os.path.join(sd, "Ouster", f"{1561000000000000000 + i * 100000000}.bin"))
    with open(os.path.join(sd, "xsens_imu.csv"), "w") as f:
        f.write("1561000000000000000,0,0,0,1,0,0,0,0.01,0.02,0.03,0.1,0.2,9.8\n")
    with open(os.path.join(sd, "gps.csv"), "w") as f:
        f.write("1561000000000000000,37.5,127.0,50.0," + ",".join(["0.04"] * 9) + "\n")

    ds = mulran.MulranDataset(str(tmp_path))
    assert len(ds) == 2
    s = ds.scan(0)
    assert s.xyz.shape == (50, 3)
    imu = ds.imu_stream()
    np.testing.assert_allclose(imu[0].gyr, [0.01, 0.02, 0.03])
    np.testing.assert_allclose(imu[0].acc, [0.1, 0.2, 9.8])
    gps = ds.gps_stream()
    assert gps[0].lat == 37.5
    assert gps[0].cov_xyz[0] == pytest.approx(0.04)
