"""Minimal TensorBoard event-file writer (no tensorboard dependency).

The reference declares a ``runs/`` directory for TensorBoard but never
writes events (its trainer only prints; SURVEY §5 observability gap). This
module closes that intent TPU-side: scalar summaries are hand-encoded as
protobuf ``Event`` records in the TFRecord framing TensorBoard reads
(length + masked-crc32c framing, ``tfevents`` filename contract), so
``tensorboard --logdir runs/`` works against this framework's logs with
zero extra packages in the serving image.

Wire format (stable public contracts):
- TFRecord: uint64 length | masked crc32c(length) | bytes | masked crc32c(bytes)
- Event proto: 1=wall_time(double) 2=step(int64) 5=summary(Summary)
- Summary proto: 1=repeated Value; Value: 1=tag(string) 2=simple_value(float)
"""

from __future__ import annotations

import os
import struct
import time
from pathlib import Path
from typing import Dict, Optional

# ---------------------------------------------------------------------------
# crc32c (Castagnoli), table-driven — TensorBoard's record checksum
# ---------------------------------------------------------------------------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Tiny protobuf encoders (wire types: 0 varint, 1 fixed64, 2 length-delim,
# 5 fixed32)
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _encode_value(tag: str, value: float) -> bytes:
    t = tag.encode("utf-8")
    return (
        _key(1, 2) + _varint(len(t)) + t
        + _key(2, 5) + struct.pack("<f", float(value))
    )


def _encode_event(step: int, scalars: Dict[str, float], wall_time: float) -> bytes:
    values = b"".join(
        _key(1, 2) + _varint(len(v)) + v
        for v in (_encode_value(k, x) for k, x in scalars.items())
    )
    return (
        _key(1, 1) + struct.pack("<d", wall_time)
        + _key(2, 0) + _varint(step & 0xFFFFFFFFFFFFFFFF)
        + _key(5, 2) + _varint(len(values)) + values
    )


class SummaryWriter:
    """Append-only scalar event writer, TensorBoard-compatible.

    >>> w = SummaryWriter("runs/exp1")
    >>> w.add_scalar("train/loss", 0.93, step=1)
    >>> w.add_scalars({"val/auc": 0.8, "val/acc": 0.75}, step=1)
    >>> w.close()
    """

    def __init__(self, log_dir, filename_suffix: str = ""):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        name = f"events.out.tfevents.{int(time.time())}.{os.uname().nodename}{filename_suffix}"
        self.path = self.log_dir / name
        self._f = open(self.path, "ab")
        # TensorBoard expects a leading file-version event.
        self._write_record(
            _key(1, 1) + struct.pack("<d", time.time())
            + _key(3, 2) + _varint(len(b"brain.Event:2")) + b"brain.Event:2"
        )

    def _write_record(self, data: bytes) -> None:
        header = struct.pack("<Q", len(data))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(data)
        self._f.write(struct.pack("<I", _masked_crc(data)))

    def add_scalar(self, tag: str, value: float, step: int,
                   wall_time: Optional[float] = None) -> None:
        self.add_scalars({tag: value}, step, wall_time)

    def add_scalars(self, scalars: Dict[str, float], step: int,
                    wall_time: Optional[float] = None) -> None:
        self._write_record(
            _encode_event(int(step), scalars, wall_time or time.time())
        )

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        if not self._f.closed:
            self._f.flush()
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
