"""rosbag v2.0 reader: round-trip against a synthesized bag."""

import bz2
import struct

import numpy as np
import pytest

from roborts_slam_tpu.io.rosbag import bag_to_scan_log, read_bag_messages


def _header(fields: dict) -> bytes:
    out = b""
    for k, v in fields.items():
        f = k.encode() + b"=" + v
        out += struct.pack("<I", len(f)) + f
    return out


def _record(fields: dict, data: bytes) -> bytes:
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _ros_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _laserscan_bytes(t: float, ranges: np.ndarray, angle_min=-1.57,
                     angle_inc=0.01, range_min=0.05, range_max=8.0) -> bytes:
    secs, nsecs = int(t), int((t - int(t)) * 1e9)
    beams = len(ranges)
    out = struct.pack("<I", 0)                       # seq
    out += struct.pack("<II", secs, nsecs)
    out += _ros_string("laser")
    out += struct.pack("<7f", angle_min, angle_min + angle_inc * (beams - 1),
                       angle_inc, 0.0, 0.025, range_min, range_max)
    out += struct.pack("<I", beams) + np.asarray(ranges, "<f4").tobytes()
    out += struct.pack("<I", 0)                      # intensities
    return out


def _odometry_bytes(t: float, x: float, y: float, yaw: float) -> bytes:
    secs, nsecs = int(t), int((t - int(t)) * 1e9)
    out = struct.pack("<I", 0)
    out += struct.pack("<II", secs, nsecs)
    out += _ros_string("odom") + _ros_string("base_link")
    qz, qw = np.sin(yaw / 2), np.cos(yaw / 2)
    out += struct.pack("<7d", x, y, 0.0, 0.0, 0.0, qz, qw)
    out += struct.pack("<36d", *([0.0] * 36))        # pose covariance
    # twist omitted — parser doesn't read past the quaternion
    return out


def _write_bag(path, chunked: bool, compression: str = "none"):
    rng = np.random.default_rng(0)
    scans = [(10.0 + 0.1 * i, rng.uniform(0.1, 7.9, 32)) for i in range(5)]
    odoms = [(9.95 + 0.1 * i, 0.1 * i, -0.05 * i, 0.02 * i) for i in range(7)]

    conn_scan = _record({"op": b"\x07", "conn": (0).to_bytes(4, "little"),
                         "topic": b"/scan"},
                        _header({"type": b"sensor_msgs/LaserScan",
                                 "md5sum": b"x", "message_definition": b""}))
    conn_odom = _record({"op": b"\x07", "conn": (1).to_bytes(4, "little"),
                         "topic": b"/odom"},
                        _header({"type": b"nav_msgs/Odometry",
                                 "md5sum": b"x", "message_definition": b""}))
    msgs = b""
    for t, r in scans:
        msgs += _record({"op": b"\x02", "conn": (0).to_bytes(4, "little"),
                         "time": struct.pack("<II", int(t), 0)},
                        _laserscan_bytes(t, r))
    for t, x, y, yaw in odoms:
        msgs += _record({"op": b"\x02", "conn": (1).to_bytes(4, "little"),
                         "time": struct.pack("<II", int(t), 0)},
                        _odometry_bytes(t, x, y, yaw))

    body = conn_scan + conn_odom + msgs
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(_record({"op": b"\x03", "index_pos": (0).to_bytes(8, "little"),
                         "conn_count": (2).to_bytes(4, "little"),
                         "chunk_count": (1).to_bytes(4, "little")},
                        b"\x20" * 4096))
        if chunked:
            if compression == "bz2":
                payload = bz2.compress(body)
            elif compression == "lz4":
                from roborts_slam_tpu.io.lz4 import compress_frame

                payload = compress_frame(body)
            else:
                payload = body
            f.write(_record({"op": b"\x05", "compression": compression.encode(),
                             "size": len(body).to_bytes(4, "little")}, payload))
        else:
            f.write(body)
    return scans, odoms


@pytest.mark.parametrize("chunked,compression", [
    (False, "none"), (True, "none"), (True, "bz2"), (True, "lz4")])
def test_bag_roundtrip(tmp_path, chunked, compression):
    path = str(tmp_path / "test.bag")
    scans, odoms = _write_bag(path, chunked, compression)

    msgs = list(read_bag_messages(path))
    assert sum(m[1] == "sensor_msgs/LaserScan" for m in msgs) == 5
    assert sum(m[1] == "nav_msgs/Odometry" for m in msgs) == 7

    log = bag_to_scan_log(path)
    assert len(log) == 5
    assert log.laser.num_beams == 32
    np.testing.assert_allclose(log.ranges[2], scans[2][1].astype(np.float32))
    np.testing.assert_allclose(log.times, [t for t, _ in scans], atol=1e-6)
    # odometry interpolated at scan times: scan 0 at t=10.0 sits between
    # odom samples at 9.95 (idx 0) and 10.05 (idx 1) -> midpoint
    np.testing.assert_allclose(log.odom[0], [0.05, -0.025, 0.01], atol=1e-9)


def test_lz4_codec_vectors():
    """The pure-python LZ4 codec: known-answer block vectors (match copies,
    overlapping RLE copies, literal runs >= 15) and frame round-trips."""
    from roborts_slam_tpu.io.lz4 import (
        compress_frame, decompress_block, decompress_frame,
    )

    # hand-built block: 4 literals "abcd", then match offset=4 len=8
    # -> "abcd" + "abcdabcd" (overlap-free copy), then literal tail "XYZWV"
    blk = bytes([0x44]) + b"abcd" + struct.pack("<H", 4)
    blk += bytes([0x50]) + b"XYZWV"
    assert decompress_block(blk) == b"abcd" + b"abcdabcd" + b"XYZWV"

    # overlapping copy (offset 1 = RLE): "a" then match offset=1 len=10
    blk = bytes([0x16]) + b"a" + struct.pack("<H", 1) + bytes([0x50]) + b"tail."
    assert decompress_block(blk) == b"a" * 11 + b"tail."

    # frame round-trips across sizes/content types
    rng = np.random.default_rng(0)
    for data in (b"", b"short", b"ab" * 40000,
                 rng.integers(0, 256, 100_000, dtype=np.uint8).tobytes(),
                 (b"laser scan segment " * 5000)):
        assert decompress_frame(compress_frame(data)) == data
