"""Rosbag reader tests against a bag synthesized in-test."""

import bz2
import struct

import numpy as np
import pytest

from liorf_tpu.sensors import rosbag as rb


# --- minimal bag writer (test fixture) --------------------------------------

def _header(fields: dict[str, bytes]) -> bytes:
    out = b""
    for k, v in fields.items():
        f = k.encode() + b"=" + v
        out += struct.pack("<I", len(f)) + f
    return out


def _record(fields: dict[str, bytes], payload: bytes) -> bytes:
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(payload)) + payload


def _ros_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _ros_header(stamp: float, frame: str = "base") -> bytes:
    secs = int(stamp)
    nsecs = int(round((stamp - secs) * 1e9))
    return struct.pack("<III", 0, secs, nsecs) + _ros_string(frame)


def serialize_pointcloud2(stamp, xyz, intensity, ring, times) -> bytes:
    n = len(xyz)
    fields = [
        ("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1),
        ("intensity", 12, 7, 1), ("ring", 16, 4, 1), ("time", 18, 7, 1),
    ]
    point_step = 22
    buf = _ros_header(stamp)
    buf += struct.pack("<II", 1, n)  # height, width
    buf += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        buf += _ros_string(name) + struct.pack("<IBI", off, dt, cnt)
    buf += struct.pack("<B", 0)  # is_bigendian
    buf += struct.pack("<II", point_step, point_step * n)
    data = bytearray(point_step * n)
    for i in range(n):
        struct.pack_into(
            "<ffffHf", data, i * point_step,
            xyz[i, 0], xyz[i, 1], xyz[i, 2], intensity[i], ring[i], times[i],
        )
    buf += struct.pack("<I", len(data)) + bytes(data)
    return buf


def serialize_imu(stamp, acc, gyr, quat_wxyz) -> bytes:
    buf = _ros_header(stamp)
    qw, qx, qy, qz = quat_wxyz
    buf += struct.pack("<4d", qx, qy, qz, qw)
    buf += struct.pack("<9d", *([0.0] * 9))
    buf += struct.pack("<3d", *gyr)
    buf += struct.pack("<9d", *([0.0] * 9))
    buf += struct.pack("<3d", *acc)
    buf += struct.pack("<9d", *([0.0] * 9))
    return buf


def serialize_navsatfix(stamp, lat, lon, alt, cov_diag) -> bytes:
    buf = _ros_header(stamp)
    buf += struct.pack("<bBH", 0, 0, 1)  # status(hdr-less), service
    # NOTE: NavSatStatus is a nested msg: int8 status + uint16 service
    buf = _ros_header(stamp) + struct.pack("<b", 0) + struct.pack("<H", 1)
    buf += struct.pack("<3d", lat, lon, alt)
    cov = np.zeros((3, 3))
    np.fill_diagonal(cov, cov_diag)
    buf += struct.pack("<9d", *cov.ravel())
    buf += struct.pack("<B", 0)  # position_covariance_type
    return buf


def write_bag(path, messages, compression="none"):
    """messages: list of (topic, datatype, stamp, raw)."""
    topics = {}
    chunk = b""
    for topic, datatype, stamp, raw in messages:
        if topic not in topics:
            cid = len(topics)
            topics[topic] = cid
            conn_payload = _header(
                {
                    "topic": topic.encode(),
                    "type": datatype.encode(),
                    "md5sum": b"0" * 32,
                    "message_definition": b"",
                }
            )
            chunk += _record(
                {"op": b"\x07", "conn": struct.pack("<I", cid), "topic": topic.encode()},
                conn_payload,
            )
        secs = int(stamp)
        nsecs = int(round((stamp - secs) * 1e9))
        chunk += _record(
            {
                "op": b"\x02",
                "conn": struct.pack("<I", topics[topic]),
                "time": struct.pack("<II", secs, nsecs),
            },
            raw,
        )
    payload = bz2.compress(chunk) if compression == "bz2" else chunk
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(
            _record(
                {
                    "op": b"\x03",
                    "index_pos": struct.pack("<Q", 0),
                    "conn_count": struct.pack("<I", len(topics)),
                    "chunk_count": struct.pack("<I", 1),
                },
                b"\x00" * 4096,
            )
        )
        f.write(
            _record(
                {
                    "op": b"\x05",
                    "compression": compression.encode(),
                    "size": struct.pack("<I", len(chunk)),
                },
                payload,
            )
        )


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_bag_roundtrip(tmp_path, rng, compression):
    xyz = rng.uniform(-20, 20, size=(100, 3)).astype(np.float32)
    inten = rng.uniform(0, 1, size=100).astype(np.float32)
    ring = rng.integers(0, 16, size=100).astype(np.uint16)
    times = np.linspace(0, 0.1, 100).astype(np.float32)

    msgs = [
        ("/imu_raw", "sensor_msgs/Imu", 9.99,
         serialize_imu(9.99, [0.1, 0.2, 9.8], [0.01, 0.02, 0.03], [1, 0, 0, 0])),
        ("/points_raw", "sensor_msgs/PointCloud2", 10.0,
         serialize_pointcloud2(10.0, xyz, inten, ring, times)),
        ("/gps/fix", "sensor_msgs/NavSatFix", 10.01,
         serialize_navsatfix(10.01, 47.1, 8.2, 420.0, [0.25, 0.25, 1.0])),
    ]
    path = str(tmp_path / "test.bag")
    write_bag(path, msgs, compression=compression)

    ds = rb.RosbagDataset(
        path, cloud_topic="/points_raw", imu_topic="/imu_raw",
        gps_topic="/gps/fix", sensor="velodyne",
    )
    assert len(ds) == 1
    s = ds.scan(0)
    np.testing.assert_allclose(s.xyz, xyz, atol=1e-6)
    np.testing.assert_allclose(s.intensity, inten, atol=1e-6)
    np.testing.assert_allclose(s.ring, ring)
    np.testing.assert_allclose(s.rel_time, times, atol=1e-6)
    assert s.stamp == pytest.approx(10.0)

    imu = ds.imu_stream()
    assert len(imu) == 1
    np.testing.assert_allclose(imu[0].acc, [0.1, 0.2, 9.8])
    np.testing.assert_allclose(imu[0].gyr, [0.01, 0.02, 0.03])
    assert imu[0].stamp == pytest.approx(9.99, abs=1e-6)

    gps = ds.gps_stream()
    assert len(gps) == 1
    assert gps[0].lat == pytest.approx(47.1)
    np.testing.assert_allclose(gps[0].cov_xyz, [0.25, 0.25, 1.0])


def test_pointcloud2_strided_fields(rng):
    # parse a cloud with an unusual point_step layout via raw serialization
    xyz = rng.normal(size=(10, 3)).astype(np.float32)
    raw = serialize_pointcloud2(
        5.0, xyz, np.ones(10, np.float32), np.zeros(10, np.uint16),
        np.zeros(10, np.float32),
    )
    stamp, fields = rb.parse_pointcloud2(raw)
    assert stamp == pytest.approx(5.0)
    np.testing.assert_allclose(fields["x"], xyz[:, 0], atol=1e-7)
    np.testing.assert_allclose(fields["z"], xyz[:, 2], atol=1e-7)
    assert np.issubdtype(fields["ring"].dtype, np.integer)
