"""Minimal protobuf wire-format reader/writer.

Only what the ONNX format needs: varint (wire type 0), 64-bit (1),
length-delimited (2), 32-bit (5); packed repeated scalars. Schema-driven
like :mod:`rten_tpu.fmt.flatbuf` — message definitions live in
:mod:`rten_tpu.convert.onnx_proto`.
"""

from __future__ import annotations

import struct


def read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def write_varint(value: int) -> bytes:
    if value < 0:
        value &= (1 << 64) - 1  # two's-complement 64-bit, per proto spec
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def signed64(value: int) -> int:
    """Interpret a varint as a signed int64."""
    if value >= 1 << 63:
        value -= 1 << 64
    return value


def iter_fields(buf, start=0, end=None):
    """Yield (field_number, wire_type, value) over a message's bytes.
    Length-delimited values come back as memoryview slices."""
    view = memoryview(buf)
    pos = start
    end = len(buf) if end is None else end
    while pos < end:
        tag, pos = read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            value, pos = read_varint(buf, pos)
        elif wire == 1:
            value = view[pos:pos + 8]
            pos += 8
        elif wire == 2:
            length, pos = read_varint(buf, pos)
            value = view[pos:pos + length]
            pos += length
        elif wire == 5:
            value = view[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, value


def read_packed_varints(data) -> list[int]:
    out = []
    pos = 0
    while pos < len(data):
        value, pos = read_varint(data, pos)
        out.append(value)
    return out


def tag(field: int, wire: int) -> bytes:
    return write_varint(field << 3 | wire)


def field_varint(field: int, value: int) -> bytes:
    return tag(field, 0) + write_varint(value)


def field_bytes(field: int, data: bytes) -> bytes:
    return tag(field, 2) + write_varint(len(data)) + data


def field_string(field: int, text: str) -> bytes:
    return field_bytes(field, text.encode("utf-8"))


def field_float(field: int, value: float) -> bytes:
    return tag(field, 5) + struct.pack("<f", value)


def field_packed_varints(field: int, values) -> bytes:
    body = b"".join(write_varint(int(v)) for v in values)
    return field_bytes(field, body)
