"""TensorBoard event files: CRC framing, proto round-trip, workspace wiring."""

import struct

import numpy as np

from howl_tpu.utils.tb_events import EventFileWriter, _masked_crc, convert_jsonl, crc32c, read_scalars


def test_crc32c_known_vectors():
    # RFC 3720 test vectors for CRC32C (Castagnoli)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_event_file_round_trip(tmp_path):
    writer = EventFileWriter(tmp_path)
    writer.add_scalar("Training/Loss", 0.5, step=1)
    writer.add_scalar("Training/Loss", 0.25, step=2)
    writer.add_scalar("Dev/Metric/tp_rate", 0.9, step=2)
    writer.close()
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert len(files) == 1
    scalars = read_scalars(files[0])
    assert (1, "Training/Loss", np.float32(0.5)) in scalars
    assert (2, "Dev/Metric/tp_rate", np.float32(0.9)) in scalars
    assert len(scalars) == 3


def test_record_framing_is_tfrecord(tmp_path):
    """Byte-level: uint64 length + masked crc of the length header."""
    writer = EventFileWriter(tmp_path)
    writer.add_scalar("x", 1.0, step=7)
    writer.close()
    raw = next(tmp_path.glob("events.out.tfevents.*")).read_bytes()
    (length,) = struct.unpack_from("<Q", raw, 0)
    (hcrc,) = struct.unpack_from("<I", raw, 8)
    assert hcrc == _masked_crc(raw[:8])
    payload = raw[12 : 12 + length]
    (pcrc,) = struct.unpack_from("<I", raw, 12 + length)
    assert pcrc == _masked_crc(payload)
    # first record is the file_version event "brain.Event:2"
    assert b"brain.Event:2" in payload


def test_workspace_log_scalar_writes_tb_events(tmp_path):
    from howl_tpu.workspace import Workspace

    ws = Workspace(tmp_path / "ws")
    ws.log_scalar("Training/Loss", 1.25, step=0)
    ws.log_scalar("Training/Loss", 0.75, step=1)
    files = list((tmp_path / "ws" / "logs").glob("events.out.tfevents.*"))
    assert len(files) == 1
    values = [v for s, t, v in read_scalars(files[0]) if t == "Training/Loss"]
    assert values == [np.float32(1.25), np.float32(0.75)]
    # jsonl mirror still present
    assert (tmp_path / "ws" / "metrics.jsonl").exists()


def test_convert_jsonl_bridge(tmp_path):
    jsonl = tmp_path / "metrics.jsonl"
    jsonl.write_text('{"step": 3, "name": "a", "value": 2.0}\n{"step": 4, "name": "b", "value": 3.0}\n')
    convert_jsonl(jsonl, tmp_path / "logs")
    scalars = read_scalars(next((tmp_path / "logs").glob("events.out.tfevents.*")))
    assert (3, "a", np.float32(2.0)) in scalars and (4, "b", np.float32(3.0)) in scalars
