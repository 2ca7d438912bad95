"""Tests for the dependency-free TensorBoard event writer (utils/tb.py).

The reference trainer writes scalar summaries via tensorboardX
(reference engine/trainer.py:132-144); ours hand-encodes the Event proto
and TFRecord framing. The reader in the same module independently
re-parses the wire format and verifies both masked CRC32C checksums, so a
round-trip here checks framing, proto layout, and checksum math at once.
"""
import math
import struct

import pytest

from disprcnn_tpu.utils.tb import SummaryWriter, _crc32c, read_scalars


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors
    assert _crc32c(b"") == 0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_round_trip_scalars(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss_total", 1.5, 10)
    w.add_scalars({"lr": 0.02, "batch_time": 0.33}, 20)
    w.add_scalar("loss_total", 0.75, 30)
    w.close()

    events = read_scalars(w.path)
    assert [step for step, _ in events] == [10, 20, 30]
    assert events[0][1] == {"loss_total": 1.5}
    assert math.isclose(events[1][1]["lr"], 0.02, rel_tol=1e-6)
    assert math.isclose(events[1][1]["batch_time"], 0.33, rel_tol=1e-6)
    assert events[2][1] == {"loss_total": 0.75}


def test_file_version_header_first_record(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.close()
    with open(w.path, "rb") as f:
        data = f.read()
    (n,) = struct.unpack_from("<Q", data, 0)
    payload = data[12:12 + n]
    assert b"brain.Event:2" in payload
    # header-only file yields no scalar events
    assert read_scalars(w.path) == []


def test_corruption_detected(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("x", 1.0, 1)
    w.close()
    with open(w.path, "rb") as f:
        data = bytearray(f.read())
    data[-5] ^= 0xFF  # flip a payload byte of the last record
    bad = tmp_path / "corrupt"
    bad.write_bytes(bytes(data))
    with pytest.raises(ValueError):
        read_scalars(str(bad))
