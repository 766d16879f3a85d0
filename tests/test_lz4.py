"""Vendored LZ4 decoder (io/lz4dec.py): handcrafted block vectors covering
every sequence feature, frame parsing (modern + legacy), malformed-input
errors, and rosbag-reader robustness fuzzing (VERDICT r3 item 6 — survive
first contact with a real bag nobody has seen)."""

import struct

import numpy as np
import pytest

from gorio_tpu.io.lz4dec import (
    MAGIC_FRAME,
    MAGIC_LEGACY,
    compress_frame,
    decompress_block,
    decompress_frame,
)


# ---- block format vectors (hand-assembled per the LZ4 block spec) ----------


def test_block_literals_only():
    # token 0x50: 5 literals, no match (final sequence)
    assert decompress_block(bytes([0x50]) + b"hello") == b"hello"


def test_block_simple_match():
    # "abcd" literals, then match offset 4 len 8 -> "abcd" * 3
    blk = bytes([0x44]) + b"abcd" + struct.pack("<H", 4)
    assert decompress_block(blk) == b"abcd" * 3


def test_block_overlap_rle():
    # 1 literal "x", match offset 1 len 7 -> "x" * 8 (overlap copy)
    blk = bytes([0x13]) + b"x" + struct.pack("<H", 1)
    assert decompress_block(blk) == b"x" * 8


def test_block_extended_lengths():
    # 270 literals (15 + 255 + 0), then match offset 270, len 19 (15+4 w/ ext 0)
    lits = bytes(range(256)) + b"A" * 14
    blk = bytes([0xFF, 255, 0]) + lits + struct.pack("<H", 270) + bytes([0])
    out = decompress_block(blk)
    assert out == lits + lits[:19]


def test_block_rejects_bad_offset():
    with pytest.raises(ValueError, match="offset"):
        decompress_block(bytes([0x14]) + b"x" + struct.pack("<H", 9))
    with pytest.raises(ValueError, match="offset"):
        decompress_block(bytes([0x14]) + b"x" + struct.pack("<H", 0))


def test_block_rejects_truncation():
    with pytest.raises(ValueError):
        decompress_block(bytes([0x90]) + b"shrt")  # 9 literals declared, 4 given
    with pytest.raises(ValueError):
        decompress_block(bytes([0x14]) + b"x" + b"\x01")  # offset cut short


# ---- frame format --------------------------------------------------------


def test_frame_roundtrip_via_own_compressor():
    rng = np.random.default_rng(0)
    content = rng.integers(0, 256, size=200_000, dtype=np.uint8).tobytes()
    assert decompress_frame(compress_frame(content)) == content


def test_frame_empty_content():
    assert decompress_frame(compress_frame(b"")) == b""


def test_frame_with_content_size_and_compressed_blocks():
    """Hand-built frame: FLG with content-size bit, one genuinely compressed
    block (match-bearing) + one uncompressed block."""
    blk = bytes([0x44]) + b"abcd" + struct.pack("<H", 4)  # -> "abcd"*3
    frame = struct.pack("<I", MAGIC_FRAME)
    frame += bytes([(1 << 6) | (1 << 5) | (1 << 3), 4 << 4])  # FLG: v1, indep, csize; BD: 64KB
    frame += struct.pack("<Q", 12 + 3)  # content size (hint)
    frame += b"\x00"  # header checksum (unverified)
    frame += struct.pack("<I", len(blk)) + blk
    frame += struct.pack("<I", 0x80000000 | 3) + b"xyz"  # uncompressed block
    frame += struct.pack("<I", 0)
    assert decompress_frame(frame) == b"abcd" * 3 + b"xyz"


def test_legacy_frame():
    blk = bytes([0x44]) + b"abcd" + struct.pack("<H", 4)
    frame = struct.pack("<I", MAGIC_LEGACY) + struct.pack("<I", len(blk)) + blk
    assert decompress_frame(frame) == b"abcd" * 3


def test_frame_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        decompress_frame(struct.pack("<I", 0xDEADBEEF) + b"\x00" * 8)


def test_frame_missing_endmark():
    f = compress_frame(b"data!")[:-4]
    with pytest.raises(ValueError):
        decompress_frame(f)


# ---- rosbag robustness (fuzz-style) --------------------------------------


def _bag(tmp_path, **kw):
    from test_rosbag import write_test_bag

    p = tmp_path / "t.bag"
    write_test_bag(p, **kw)
    return p


def test_bag_truncated_mid_record(tmp_path):
    """A bag cut mid-record must raise a clean error (or stop), not hang or
    produce garbage frames."""
    from gorio_tpu.io.rosbag import RosbagReader

    p = _bag(tmp_path)
    raw = p.read_bytes()
    cut = tmp_path / "cut.bag"
    cut.write_bytes(raw[: int(len(raw) * 0.6)])
    try:
        msgs = list(RosbagReader(cut))
        # stopping early with fewer messages is acceptable
        assert len(msgs) <= 16
    except Exception as e:
        assert not isinstance(e, (MemoryError, RecursionError))


def test_bag_corrupt_lz4_chunk_raises_cleanly(tmp_path):
    from gorio_tpu.io.rosbag import RosbagReader

    p = _bag(tmp_path, compression="lz4")
    raw = p.read_bytes()
    # cut the tail of the lz4 frame (loses blocks + EndMark): the decoder
    # must raise a clean ValueError, not return silently-short content
    bad = tmp_path / "bad.bag"
    bad.write_bytes(raw[:-40])
    with pytest.raises(Exception) as ei:
        list(RosbagReader(bad))
    assert not isinstance(ei.value, (MemoryError, RecursionError))


def test_bag_unknown_ops_and_padding_skipped(tmp_path):
    """Index/chunk-info records (ops 0x04/0x06) and unknown connection fields
    (latching, callerid) must be skipped, not crash the reader."""
    import test_rosbag as tr
    from gorio_tpu.io.rosbag import RosbagReader

    records = b""
    # connection with extra quirk fields
    data = (
        tr._field("topic", b"/radar_enhanced_pcl")
        + tr._field("type", b"sensor_msgs/PointCloud")
        + tr._field("md5sum", b"f" * 32)
        + tr._field("message_definition", b"...")
        + tr._field("callerid", b"/bag_player")
        + tr._field("latching", b"1")
    )
    records += tr._record(
        {"op": b"\x07", "conn": struct.pack("<I", 0), "topic": b"/radar_enhanced_pcl"},
        data,
    )
    xyz = np.zeros((3, 3), np.float32)
    records += tr._msg_record(0, 5.0, tr._pointcloud_payload(5.0, xyz, []))
    # index data (op 0x04) and chunk info (op 0x06) records interleaved
    records += tr._record({"op": b"\x04", "ver": struct.pack("<I", 1)}, b"\x00" * 12)
    records += tr._record({"op": b"\x06", "ver": struct.pack("<I", 1)}, b"\x00" * 8)
    p = tmp_path / "quirks.bag"
    with open(p, "wb") as fh:
        fh.write(b"#ROSBAG V2.0\n")
        fh.write(tr._record({"op": b"\x03", "index_pos": struct.pack("<Q", 0),
                             "conn_count": struct.pack("<I", 1),
                             "chunk_count": struct.pack("<I", 0)}, b" " * 64))
        fh.write(records)
    msgs = list(RosbagReader(p))
    assert len(msgs) == 1
    assert msgs[0].topic == "/radar_enhanced_pcl"
    np.testing.assert_allclose(msgs[0].msg.xyz, xyz)


def test_bag_md5_mismatch_does_not_block_decoding(tmp_path):
    """The reader keys decoding off the `type` name, not md5sum — a bag
    recorded with a tweaked msg definition still decodes."""
    from gorio_tpu.io.rosbag import RosbagReader

    p = _bag(tmp_path)  # writer already uses a fake md5 of zeros
    msgs = [m for m in RosbagReader(p) if m.topic == "/imu/data"]
    assert len(msgs) == 4
