"""Real-bag fire drill (VERDICT r4 item 8, the closest achievable rehearsal
for first contact with a real NTU4DRadLM recording).

An INDEPENDENT rosbag-v2.0 writer — implemented here from the published bag
format, sharing no code with `io/rosbag.py`'s reader or the test-roundtrip
writer in test_rosbag.py — synthesizes a full NTU-style bag:

  * eagle-style `sensor_msgs/PointCloud` radar messages whose UNNAMED
    channels carry [0]=doppler, [1]=range, [2]=power (the layout
    `preprocessing_nodelet_ntu.cpp:383,401-402` consumes), with points in the
    RADAR frame (the converter must rotate through Radar_to_livox);
  * `sensor_msgs/Imu` at 100 Hz, `geometry_msgs/TwistWithCovarianceStamped`
    body velocity, `sensor_msgs/NavSatFix` fixes;
  * chunks alternating bz2 / lz4 / uncompressed compression — the lz4 chunks
    use a from-scratch GREEDY MATCH-FINDING block encoder (not the repo's
    literals-only `compress_frame`), so the decoder's match/offset/overlap
    paths are exercised by foreign data;
  * realistic index quirks: connection records inside the first chunk AND
    repeated after the chunk section, index-data records after every chunk,
    chunk-info records at the end — everything a `rosbag record` file has
    that a minimal writer omits.

The drill then runs the REAL user path end to end:
`convert-bag -> slam (loops on) -> evaluate` and asserts the ATE.
"""

import bz2
import struct

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# From-scratch LZ4 (frame + greedy block encoder)
# ---------------------------------------------------------------------------


def lz4_block_greedy(src: bytes) -> bytes:
    """Greedy hash-table LZ4 block encoder (spec-conformant: min match 4,
    last 5 bytes literal, no match beginning in the final 12 bytes)."""
    n = len(src)
    out = bytearray()
    table: dict = {}
    i = 0
    anchor = 0

    def emit(lit_start, lit_end, mlen, offset):
        nonlocal out
        lit = lit_end - lit_start
        ml = mlen - 4 if mlen else 0
        token = (min(lit, 15) << 4) | (min(ml, 15) if mlen else 0)
        out.append(token)
        if lit >= 15:
            rem = lit - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out += src[lit_start:lit_end]
        if mlen:
            out += struct.pack("<H", offset)
            if ml >= 15:
                rem = ml - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    limit = n - 12  # no match may start in the last 12 bytes
    while i < limit:
        key = src[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF and src[cand : cand + 4] == key:
            # extend the match (may not run into the last 5 bytes)
            mmax = n - 5 - i
            mlen = 4
            while mlen < mmax and src[cand + mlen] == src[i + mlen]:
                mlen += 1
            emit(anchor, i, mlen, i - cand)
            i += mlen
            anchor = i
        else:
            i += 1
    emit(anchor, n, 0, 0)  # trailing literals-only sequence
    return bytes(out)


def lz4_frame(content: bytes, block_size: int = 1 << 16) -> bytes:
    out = bytearray(struct.pack("<I", 0x184D2204))
    out += bytes([(1 << 6) | (1 << 5), 4 << 4, 0])  # FLG, BD(64K), hdr "checksum"
    for k in range(0, len(content), block_size):
        raw = content[k : k + block_size]
        blk = lz4_block_greedy(raw)
        if len(blk) < len(raw):
            out += struct.pack("<I", len(blk)) + blk
        else:  # incompressible: stored block (high bit)
            out += struct.pack("<I", len(raw) | 0x80000000) + raw
    out += struct.pack("<I", 0)
    return bytes(out)


# ---------------------------------------------------------------------------
# From-scratch rosbag v2.0 writer
# ---------------------------------------------------------------------------


def _hdr(fields: dict) -> bytes:
    body = b"".join(
        struct.pack("<I", len(k) + 1 + len(v)) + k.encode() + b"=" + v
        for k, v in fields.items()
    )
    return struct.pack("<I", len(body)) + body


def _record(fields: dict, data: bytes) -> bytes:
    return _hdr(fields) + struct.pack("<I", len(data)) + data


def _time(t: float) -> bytes:
    s = int(t)
    return struct.pack("<II", s, int(round((t - s) * 1e9)))


def _ros_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _ros_header(stamp: float, frame: str, seq: int) -> bytes:
    return struct.pack("<I", seq) + _time(stamp) + _ros_string(frame)


def msg_pointcloud(stamp, xyz, doppler, rng, power, seq) -> bytes:
    n = len(xyz)
    out = bytearray(_ros_header(stamp, "eagle", seq))
    out += struct.pack("<I", n)
    out += np.asarray(xyz, "<f4").tobytes()
    out += struct.pack("<I", 3)
    for arr in (doppler, rng, power):  # UNNAMED channels, NTU-eagle style
        out += _ros_string("")
        out += struct.pack("<I", n) + np.asarray(arr, "<f4").tobytes()
    return bytes(out)


def msg_imu(stamp, quat, gyr, acc, seq) -> bytes:
    out = bytearray(_ros_header(stamp, "imu", seq))
    out += np.asarray(quat, "<f8").tobytes()
    out += np.zeros(9, "<f8").tobytes()
    out += np.asarray(gyr, "<f8").tobytes()
    out += np.zeros(9, "<f8").tobytes()
    out += np.asarray(acc, "<f8").tobytes()
    out += np.zeros(9, "<f8").tobytes()
    return bytes(out)


def msg_twist_cov(stamp, lin, ang, seq) -> bytes:
    out = bytearray(_ros_header(stamp, "base", seq))
    out += np.asarray(lin, "<f8").tobytes()
    out += np.asarray(ang, "<f8").tobytes()
    out += np.zeros(36, "<f8").tobytes()
    return bytes(out)


def msg_navsatfix(stamp, lat, lon, alt, seq) -> bytes:
    out = bytearray(_ros_header(stamp, "gps", seq))
    out += struct.pack("<bH", 1, 1)  # STATUS_SBAS_FIX, SERVICE_GPS
    out += struct.pack("<ddd", lat, lon, alt)
    out += (np.eye(3).ravel() * 0.25).astype("<f8").tobytes()
    out += struct.pack("<B", 2)  # COVARIANCE_TYPE_DIAGONAL_KNOWN
    return bytes(out)


class NTUBagWriter:
    """rosbag v2.0 with chunked records, per-chunk index data, chunk-info
    records, and connection records both in-chunk and trailing."""

    COMPRESSIONS = ("bz2", "lz4", "none")

    def __init__(self):
        self.connections = []  # (topic, msgtype, md5-ish)
        self.messages = []  # (conn, t, payload)

    def add_connection(self, topic, msgtype) -> int:
        self.connections.append((topic, msgtype))
        return len(self.connections) - 1

    def add(self, conn, t, payload):
        self.messages.append((conn, t, payload))

    def _conn_record(self, cid) -> bytes:
        topic, msgtype = self.connections[cid]
        sub = _hdr({
            "topic": topic.encode(),
            "type": msgtype.encode(),
            "md5sum": b"0" * 32,
            "message_definition": b"synthetic",
        })
        # connection data = a header-structured blob (no trailing data len)
        body = sub[4:]  # strip the outer length; rosbag stores raw field list
        return _record(
            {"op": b"\x07", "conn": struct.pack("<I", cid),
             "topic": topic.encode()},
            body,
        )

    def write(self, path, msgs_per_chunk=40):
        self.messages.sort(key=lambda m: m[1])
        chunks = [
            self.messages[k : k + msgs_per_chunk]
            for k in range(0, len(self.messages), msgs_per_chunk)
        ]
        blob = bytearray(b"#ROSBAG V2.0\n")
        blob += _record(
            {"op": b"\x03", "index_pos": struct.pack("<Q", 0),
             "conn_count": struct.pack("<I", len(self.connections)),
             "chunk_count": struct.pack("<I", len(chunks))},
            b" " * 4096,  # bag headers are padded in real files
        )
        chunk_infos = []
        for ci, chunk in enumerate(chunks):
            inner = bytearray()
            if ci == 0:  # connections live inside the first chunk
                for cid in range(len(self.connections)):
                    inner += self._conn_record(cid)
            per_conn: dict = {}
            for conn, t, payload in chunk:
                inner += _record(
                    {"op": b"\x02", "conn": struct.pack("<I", conn),
                     "time": _time(t)},
                    payload,
                )
                per_conn.setdefault(conn, []).append(t)
            comp = self.COMPRESSIONS[ci % len(self.COMPRESSIONS)]
            data = bytes(inner)
            if comp == "bz2":
                cdata = bz2.compress(data)
            elif comp == "lz4":
                cdata = lz4_frame(data)
            else:
                cdata = data
            pos = len(blob)
            blob += _record(
                {"op": b"\x05", "compression": comp.encode(),
                 "size": struct.pack("<I", len(data))},
                cdata,
            )
            # index-data records follow each chunk in recorded bags
            for conn, ts in per_conn.items():
                idx = b"".join(_time(t) + struct.pack("<I", 0) for t in ts)
                blob += _record(
                    {"op": b"\x04", "ver": struct.pack("<I", 1),
                     "conn": struct.pack("<I", conn),
                     "count": struct.pack("<I", len(ts))},
                    idx,
                )
            t0 = min(t for _, t, _ in chunk)
            t1 = max(t for _, t, _ in chunk)
            chunk_infos.append((pos, t0, t1, per_conn))
        # trailing section: connections repeated + chunk-info records
        for cid in range(len(self.connections)):
            blob += self._conn_record(cid)
        for pos, t0, t1, per_conn in chunk_infos:
            body = b"".join(
                struct.pack("<II", conn, len(ts)) for conn, ts in per_conn.items()
            )
            blob += _record(
                {"op": b"\x06", "ver": struct.pack("<I", 1),
                 "chunk_pos": struct.pack("<Q", pos),
                 "start_time": _time(t0), "end_time": _time(t1),
                 "count": struct.pack("<I", len(per_conn))},
                body,
            )
        with open(path, "wb") as fh:
            fh.write(blob)


# ---------------------------------------------------------------------------
# Scene -> bag -> convert -> slam -> evaluate
# ---------------------------------------------------------------------------


def _build_bag(path, duration=30.0):
    from scipy.spatial.transform import Rotation

    from gorio_tpu.io.rosbag import radar_to_livox_extrinsic
    from gorio_tpu.io.synthetic import (
        make_world,
        render_radar_scan,
        sample_imu,
        simulate_trajectory,
    )

    traj = simulate_trajectory(seed=91, duration=duration, circuit=True, laps=1.5)
    imu = sample_imu(traj, gyr_rate=100.0, vel_rate=20.0, gyr_std=0.004,
                     vel_std=0.02, seed=92)
    world = make_world(seed=93, n_landmarks=9000, extent=60.0)
    R_rl = radar_to_livox_extrinsic()[:3, :3]

    w = NTUBagWriter()
    c_pcl = w.add_connection("/radar_enhanced_pcl", "sensor_msgs/PointCloud")
    c_imu = w.add_connection("/imu/data", "sensor_msgs/Imu")
    c_twist = w.add_connection(
        "/radar_twist", "geometry_msgs/TwistWithCovarianceStamped"
    )
    c_gps = w.add_connection("/gps/fix", "sensor_msgs/NavSatFix")

    t_base = 1.6e9  # realistic epoch stamps
    stamps = np.arange(0.4, duration - 0.4, 0.2)
    for i, t in enumerate(stamps):
        R, p = traj.interp_pose(np.array([t]))
        v = np.stack([np.interp(t, traj.t, traj.v_body[:, k]) for k in range(3)])
        cloud = render_radar_scan(world, R[0], p[0], v, capacity=1024,
                                  seed=500 + i, dropout=0.2)
        m = np.asarray(cloud.mask)
        xyz_body = np.asarray(cloud.xyz)[m]
        # into the RADAR frame: converter applies R_rl (rotation only)
        xyz_radar = xyz_body @ R_rl  # == (R_rl^T @ x)^T per point
        dop = np.asarray(cloud.doppler)[m]
        inten = np.asarray(cloud.intensity)[m]
        rng = np.linalg.norm(xyz_body, axis=1)
        w.add(c_pcl, t_base + t,
              msg_pointcloud(t_base + t, xyz_radar, dop, rng,
                             np.maximum(inten, 1.0), i))
    for i, (t, g) in enumerate(zip(imu.gyr_t, imu.gyr)):
        q = Rotation.from_matrix(
            traj.R[np.clip(np.searchsorted(traj.t, t) - 1, 0, len(traj.t) - 1)]
        ).as_quat()
        w.add(c_imu, t_base + t, msg_imu(t_base + t, q, g, [0, 0, 9.81], i))
    for i, (t, v) in enumerate(zip(imu.vel_t, imu.vel)):
        w.add(c_twist, t_base + t, msg_twist_cov(t_base + t, v, [0, 0, 0], i))
    lat0, lon0 = 1.3465, 103.6808  # NTU campus
    for i, t in enumerate(np.arange(0.5, duration, 1.0)):
        _, p = traj.interp_pose(np.array([t]))
        lat = lat0 + p[0][1] / 111320.0
        lon = lon0 + p[0][0] / (111320.0 * np.cos(np.deg2rad(lat0)))
        w.add(c_gps, t_base + t,
              msg_navsatfix(t_base + t, lat, lon, 30.0 + p[0][2], i))
    w.write(path)
    # ground truth sidecar for evaluation
    gt = path.parent / "groundtruth.tum"
    with open(gt, "w") as fh:
        for k in range(0, len(traj.t), 100):
            q = Rotation.from_matrix(traj.R[k]).as_quat()
            p = traj.p[k]
            fh.write(
                f"{t_base + traj.t[k]:.6f} {p[0]} {p[1]} {p[2]} "
                f"{q[0]} {q[1]} {q[2]} {q[3]}\n"
            )
    return len(stamps)


def test_lz4_greedy_encoder_roundtrip():
    """The fire drill's independent encoder must round-trip through the
    repo's pure-python frame decoder (match/offset/overlap paths)."""
    from gorio_tpu.io.lz4dec import decompress_frame

    rng = np.random.default_rng(0)
    # compressible (repeating structure), incompressible (random), tiny
    payloads = [
        b"abcabcabcabc" * 500 + bytes(rng.integers(0, 4, 2000, dtype=np.uint8)),
        bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),
        b"x",
        b"",
        np.arange(20000, dtype=np.int32).tobytes(),  # strided structure
    ]
    for p in payloads:
        assert decompress_frame(lz4_frame(p)) == p
    big = b"The quick brown fox jumps over the lazy dog. " * 4000
    f = lz4_frame(big)
    assert len(f) < len(big) // 3  # the encoder actually finds matches
    assert decompress_frame(f) == big


@pytest.mark.slow
def test_bag_fire_drill(tmp_path):
    """convert-bag -> slam (loops on) -> evaluate on a foreign-written bag."""
    from gorio_tpu.cli import main
    from gorio_tpu.io.rosbag import RosbagReader
    from gorio_tpu.io.tum import ate_rmse, load_tum

    bag = tmp_path / "ntu_style.bag"
    n_frames = _build_bag(bag)

    # the reader's own summary must see every topic through all 3 compressions
    summary = RosbagReader(bag).topics_summary()
    assert summary["/radar_enhanced_pcl"][0] == "sensor_msgs/PointCloud"
    assert summary["/radar_enhanced_pcl"][1] == n_frames
    assert summary["/imu/data"][1] > 1000
    assert summary["/gps/fix"][1] >= 25

    seq = tmp_path / "seq"
    main([
        "convert-bag", str(bag), "--output", str(seq),
        "--radar-topic", "/radar_enhanced_pcl", "--imu-topic", "/imu/data",
        "--twist-topic", "/radar_twist", "--gps-topic", "/gps/fix",
    ])
    assert (seq / "imu.npz").exists() and (seq / "gps.npz").exists()
    assert len(list(seq.glob("*.grf"))) == n_frames

    est = seq / "est.tum"
    main([
        "slam", "--dataset", str(seq), "--output", str(est),
        "--fused", "--preprocess", "--preint", "ugpm",
        "--optimize-every", "15",
    ])
    es, ep = load_tum(est)
    gs, gp = load_tum(bag.parent / "groundtruth.tum")
    ate = float(ate_rmse(es, ep, gs, gp))
    # ~90 m circuit path; converter extrinsic round trip + full stack
    assert ate < 1.5, f"fire-drill ATE {ate:.3f} m"
