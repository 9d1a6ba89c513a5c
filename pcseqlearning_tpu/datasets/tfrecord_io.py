"""Pure-python TFRecord reader/writer (no TensorFlow).

The TFRecord wire format (used by the Waymo Open Dataset release) is:

    uint64 length (little-endian)
    uint32 masked_crc32c(length bytes)
    bytes  data[length]
    uint32 masked_crc32c(data)

per record, with CRC32C (Castagnoli) and the TF masking rotation. The
reference reads these through tf.data.TFRecordDataset
(/root/reference/pcdet/datasets/waymo/waymo_utils.py:219); this module lets
tools/create_waymo_infos.py convert sequences in an environment with no TF
at all, and the writer exists so tests can synthesize real .tfrecord files.
"""

from __future__ import annotations

import struct

_CRC_TABLE = []


def _crc32c_table():
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78  # Castagnoli, reflected
        tab = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if (c & 1) else (c >> 1)
            tab.append(c)
        _CRC_TABLE = tab
    return _CRC_TABLE


def crc32c(data: bytes) -> int:
    tab = _crc32c_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = tab[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def read_tfrecord(path, verify_crc=False):
    """Yield record payload bytes from a TFRecord file."""
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                return
            (length,) = struct.unpack("<Q", header[:8])
            if verify_crc:
                (crc,) = struct.unpack("<I", header[8:12])
                if crc != _masked_crc(header[:8]):
                    raise IOError(f"{path}: corrupt record length crc")
            data = f.read(length)
            if len(data) < length:
                raise IOError(f"{path}: truncated record")
            footer = f.read(4)
            if verify_crc:
                (crc,) = struct.unpack("<I", footer)
                if crc != _masked_crc(data):
                    raise IOError(f"{path}: corrupt record data crc")
            yield data


def write_tfrecord(path, payloads):
    """Write an iterable of bytes payloads as a TFRecord file."""
    with open(path, "wb") as f:
        for data in payloads:
            header = struct.pack("<Q", len(data))
            f.write(header)
            f.write(struct.pack("<I", _masked_crc(header)))
            f.write(data)
            f.write(struct.pack("<I", _masked_crc(data)))
