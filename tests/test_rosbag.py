"""Rosbag v2.0 reader + NTU-style converter tests.

A minimal in-test bag WRITER builds format-correct bags (uncompressed and
bz2 chunks) so the dependency-free reader (`io/rosbag.py`) is validated
round-trip — the repo never needs ros to test its real-data path.
"""

import bz2
import struct

import numpy as np
import pytest

from gorio_tpu.io.rosbag import (
    BagMessage,
    RosbagReader,
    convert_rosbag,
    decode_pointcloud2,
    radar_to_livox_extrinsic,
)


# ---------------------------------------------------------------------------
# Minimal bag writer (test-only)
# ---------------------------------------------------------------------------


def _field(name: str, value: bytes) -> bytes:
    payload = name.encode() + b"=" + value
    return struct.pack("<I", len(payload)) + payload


def _record(header_fields: dict, data: bytes) -> bytes:
    header = b"".join(_field(k, v) for k, v in header_fields.items())
    return struct.pack("<I", len(header)) + header + struct.pack("<I", len(data)) + data


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _ros_header(stamp: float, frame: str = "radar") -> bytes:
    s = int(stamp)
    ns = int(round((stamp - s) * 1e9))
    return struct.pack("<III", 7, s, ns) + _string(frame)


def _connection_record(conn: int, topic: str, msgtype: str) -> bytes:
    data = _field("topic", topic.encode()) + _field("type", msgtype.encode()) + _field(
        "md5sum", b"0" * 32
    ) + _field("message_definition", b"")
    return _record(
        {"op": b"\x07", "conn": struct.pack("<I", conn), "topic": topic.encode()},
        data,
    )


def _msg_record(conn: int, stamp: float, payload: bytes) -> bytes:
    s = int(stamp)
    ns = int(round((stamp - s) * 1e9))
    return _record(
        {
            "op": b"\x02",
            "conn": struct.pack("<I", conn),
            "time": struct.pack("<II", s, ns),
        },
        payload,
    )


def _pointcloud_payload(stamp, xyz, channels):
    out = _ros_header(stamp)
    out += struct.pack("<I", len(xyz))
    out += np.asarray(xyz, np.float32).tobytes()
    out += struct.pack("<I", len(channels))
    for name, vals in channels:
        out += _string(name)
        out += struct.pack("<I", len(vals))
        out += np.asarray(vals, np.float32).tobytes()
    return out


def _imu_payload(stamp, quat, gyr, acc):
    return (
        _ros_header(stamp)
        + np.asarray(quat, np.float64).tobytes()
        + np.zeros(9).tobytes()
        + np.asarray(gyr, np.float64).tobytes()
        + np.zeros(9).tobytes()
        + np.asarray(acc, np.float64).tobytes()
    )


def _twist_payload(stamp, lin, ang):
    return (
        _ros_header(stamp)
        + np.asarray(lin, np.float64).tobytes()
        + np.asarray(ang, np.float64).tobytes()
    )


def _navsat_payload(stamp, lat, lon, alt, cov_diag=(1.0, 1.0, 4.0)):
    cov = np.zeros(9)
    cov[[0, 4, 8]] = cov_diag
    return (
        _ros_header(stamp)
        + struct.pack("<bH", 0, 1)
        + struct.pack("<ddd", lat, lon, alt)
        + cov.tobytes()
        + b"\x02"
    )


def write_test_bag(path, compression="none", n_frames=4):
    rng = np.random.default_rng(0)
    records = b""
    records += _connection_record(0, "/radar_enhanced_pcl", "sensor_msgs/PointCloud")
    records += _connection_record(1, "/imu/data", "sensor_msgs/Imu")
    records += _connection_record(2, "/twist", "geometry_msgs/TwistStamped")
    records += _connection_record(3, "/fix", "sensor_msgs/NavSatFix")
    frames = []
    for k in range(n_frames):
        t = 100.0 + 0.1 * k
        xyz = rng.normal(size=(50, 3)).astype(np.float32) * 5
        dop = rng.normal(size=50).astype(np.float32)
        power = (10 + 5 * rng.random(50)).astype(np.float32)
        frames.append((t, xyz, dop, power))
        records += _msg_record(
            0, t, _pointcloud_payload(t, xyz, [("doppler", dop), ("range", dop), ("power", power)])
        )
        records += _msg_record(1, t, _imu_payload(t, [0, 0, 0, 1], [0.1, 0, 0.2], [0, 0, 9.8]))
        records += _msg_record(2, t, _twist_payload(t, [2.0, 0, 0], [0, 0, 0.1]))
        records += _msg_record(3, t, _navsat_payload(t, 1.30 + 1e-5 * k, 103.68, 10.0))
    if compression == "bz2":
        chunk_data = bz2.compress(records)
    elif compression == "lz4":
        from gorio_tpu.io.lz4dec import compress_frame

        chunk_data = compress_frame(records)
    else:
        chunk_data = records
    chunk = _record(
        {
            "op": b"\x05",
            "compression": compression.encode(),
            "size": struct.pack("<I", len(records)),
        },
        chunk_data,
    )
    with open(path, "wb") as fh:
        fh.write(b"#ROSBAG V2.0\n")
        fh.write(_record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                          "conn_count": struct.pack("<I", 4),
                          "chunk_count": struct.pack("<I", 1)}, b" " * 64))
        fh.write(chunk)
    return frames


@pytest.mark.parametrize("compression", ["none", "bz2", "lz4"])
def test_rosbag_roundtrip(tmp_path, compression):
    bag = tmp_path / "test.bag"
    frames = write_test_bag(bag, compression=compression)
    msgs = list(RosbagReader(bag))
    by_topic = {}
    for m in msgs:
        by_topic.setdefault(m.topic, []).append(m)
    assert len(by_topic["/radar_enhanced_pcl"]) == len(frames)
    assert len(by_topic["/imu/data"]) == len(frames)
    pc = by_topic["/radar_enhanced_pcl"][0].msg
    t, xyz, dop, power = frames[0]
    np.testing.assert_allclose(pc.xyz, xyz, rtol=1e-6)
    np.testing.assert_allclose(list(pc.channels.values())[0], dop, rtol=1e-6)
    assert abs(pc.stamp - t) < 1e-6
    imu = by_topic["/imu/data"][0].msg
    np.testing.assert_allclose(imu.angular_velocity, [0.1, 0, 0.2])
    tw = by_topic["/twist"][0].msg
    np.testing.assert_allclose(tw.linear, [2.0, 0, 0])
    nav = by_topic["/fix"][0].msg
    assert abs(nav.latitude - 1.30) < 1e-9


def test_rosbag_topic_filter(tmp_path):
    bag = tmp_path / "test.bag"
    write_test_bag(bag)
    msgs = list(RosbagReader(bag, topics=["/imu/data"]))
    assert msgs and all(m.topic == "/imu/data" for m in msgs)


def test_pointcloud2_decode():
    """PointCloud2 with float32 x/y/z/intensity/doppler at explicit offsets."""
    n = 10
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(n, 5)).astype(np.float32)
    header = _ros_header(5.0)
    payload = header + struct.pack("<II", 1, n) + struct.pack("<I", 5)
    for i, name in enumerate(["x", "y", "z", "intensity", "doppler"]):
        payload += _string(name) + struct.pack("<IBI", i * 4, 7, 1)
    payload += b"\x00" + struct.pack("<II", 20, 20 * n)
    payload += struct.pack("<I", 20 * n) + arr.tobytes()
    payload += b"\x01"
    pc = decode_pointcloud2(payload)
    np.testing.assert_allclose(pc.xyz, arr[:, :3], rtol=1e-6)
    np.testing.assert_allclose(pc.channels["doppler"], arr[:, 4], rtol=1e-6)


def test_radar_to_livox_matches_reference():
    """The extrinsic chain reproduces the reference's matrix product
    (`preprocessing_nodelet_ntu.cpp:107-130`): orthonormal rotation block and
    the Change_Radarframe axis permutation is embedded."""
    T = radar_to_livox_extrinsic()
    R = T[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    assert np.linalg.det(R) > 0.99
    # radar x (forward) maps roughly to livox x: radar frame change sends
    # x->z' then the optical chains map back — sanity: unit vector preserved
    v = R @ np.array([1.0, 0, 0])
    assert abs(np.linalg.norm(v) - 1) < 1e-6
    assert v[0] > 0.95  # forward stays forward on the NTU rig


def test_convert_rosbag(tmp_path):
    bag = tmp_path / "test.bag"
    frames = write_test_bag(bag, compression="bz2", n_frames=5)
    out = tmp_path / "seq"
    n = convert_rosbag(
        bag, out, radar_topic="/radar_enhanced_pcl", imu_topic="/imu/data",
        twist_topic="/twist", gps_topic="/fix", power_threshold=0.0,
    )
    assert n == 5
    grfs = sorted(out.glob("*.grf"))
    assert len(grfs) == 5
    imu = np.load(out / "imu.npz")
    assert imu["gyr_t"].shape == (5,)
    np.testing.assert_allclose(imu["vel"][0], [2.0, 0, 0])
    gps = np.load(out / "gps.npz")
    assert gps["t"].shape == (5,)
    # read a frame back through the native dataset and check the extrinsic
    from gorio_tpu.io.native import NativeDataset

    ds = NativeDataset([str(grfs[0])], capacity=128)
    stamp, xyz, inten, dop = next(iter(ds))
    t0, xyz0, dop0, power0 = frames[0]
    R = radar_to_livox_extrinsic()[:3, :3]
    np.testing.assert_allclose(xyz, (xyz0 @ R.T).astype(np.float32), atol=1e-5)
    np.testing.assert_allclose(dop, dop0, atol=1e-6)


def test_pointcloud2_bigendian_raises():
    """Big-endian PointCloud2 must fail loudly, not decode as garbage
    (advisor r3: is_bigendian was silently discarded)."""
    n = 4
    arr = np.zeros((n, 3), np.float32)
    payload = _ros_header(1.0) + struct.pack("<II", 1, n) + struct.pack("<I", 3)
    for i, name in enumerate(["x", "y", "z"]):
        payload += _string(name) + struct.pack("<IBI", i * 4, 7, 1)
    payload += b"\x01" + struct.pack("<II", 12, 12 * n)  # is_bigendian=1
    payload += struct.pack("<I", 12 * n) + arr.tobytes() + b"\x01"
    with pytest.raises(ValueError, match="big-endian"):
        decode_pointcloud2(payload)


def test_pointcloud2_organized_row_padding():
    """Organized cloud (height>1) with row_step > width*point_step: the
    per-row padding must be stripped, not folded into the point view."""
    h, w = 3, 4
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(h * w, 3)).astype(np.float32)
    point_step, pad = 12, 8
    row_step = w * point_step + pad
    rows = b""
    for r in range(h):
        rows += pts[r * w:(r + 1) * w].tobytes() + b"\xee" * pad
    payload = _ros_header(2.0) + struct.pack("<II", h, w) + struct.pack("<I", 3)
    for i, name in enumerate(["x", "y", "z"]):
        payload += _string(name) + struct.pack("<IBI", i * 4, 7, 1)
    payload += b"\x00" + struct.pack("<II", point_step, row_step)
    payload += struct.pack("<I", len(rows)) + rows + b"\x01"
    pc = decode_pointcloud2(payload)
    np.testing.assert_allclose(pc.xyz, pts, rtol=1e-6)
