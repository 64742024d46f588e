"""TensorBoard event-file writer: framing, CRC, and scalar decoding."""

import glob
import struct

from news_recsys_tpu.utils.tensorboard import SummaryWriter, _masked_crc, crc32c


def read_records(path):
    records = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos < len(data):
        (length,) = struct.unpack_from("<Q", data, pos)
        (hcrc,) = struct.unpack_from("<I", data, pos + 8)
        assert hcrc == _masked_crc(data[pos : pos + 8])
        payload = data[pos + 12 : pos + 12 + length]
        (dcrc,) = struct.unpack_from("<I", data, pos + 12 + length)
        assert dcrc == _masked_crc(payload)
        records.append(payload)
        pos += 12 + length + 4
    return records


def decode_scalars(payload):
    """Minimal protobuf walk: find Summary (field 5) -> Value -> tag/simple_value."""
    out = {}

    def walk(buf, handlers):
        pos = 0
        while pos < len(buf):
            key = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                key |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            field, wire = key >> 3, key & 7
            if wire == 0:
                val = 0
                shift = 0
                while True:
                    b = buf[pos]
                    pos += 1
                    val |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
            elif wire == 1:
                val = buf[pos : pos + 8]
                pos += 8
            elif wire == 2:
                ln = 0
                shift = 0
                while True:
                    b = buf[pos]
                    pos += 1
                    ln |= (b & 0x7F) << shift
                    shift += 7
                    if not b & 0x80:
                        break
                val = buf[pos : pos + ln]
                pos += ln
            elif wire == 5:
                val = buf[pos : pos + 4]
                pos += 4
            else:
                raise ValueError(wire)
            if field in handlers:
                handlers[field](val)

    def on_summary(buf):
        def on_value(vbuf):
            item = {}
            walk(vbuf, {1: lambda v: item.update(tag=v.decode()),
                        2: lambda v: item.update(value=struct.unpack("<f", v)[0])})
            if "tag" in item:
                out[item["tag"]] = item.get("value")
        walk(buf, {1: on_value})

    walk(payload, {5: on_summary})
    return out


def test_crc32c_known_vector():
    # standard test vector: crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"123456789") == 0xE3069283


def test_writer_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train_loss", 0.5, step=1)
    w.add_scalar("train_auc", 0.75, step=1)
    w.add_scalar("train_loss", 0.25, step=2)
    w.close()

    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    records = read_records(files[0])
    assert len(records) == 4  # file_version + 3 scalars
    scalars = [decode_scalars(r) for r in records[1:]]
    assert scalars[0] == {"train_loss": 0.5}
    assert scalars[1] == {"train_auc": 0.75}
    assert scalars[2] == {"train_loss": 0.25}
