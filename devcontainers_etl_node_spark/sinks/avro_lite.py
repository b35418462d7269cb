"""Minimal stdlib Avro container codec — just enough of the PUBLIC Avro
1.x specification to write and read Apache Iceberg metadata files
(manifest lists and manifests are Avro object-container files; the
environment ships neither avro-python nor the spark-avro module).

Supported schema subset (all Iceberg metadata needs): null, boolean,
int, long (zigzag varints), float, double (IEEE little-endian), bytes,
string, fixed, record, enum, array, map, and unions.  Writer and reader
are both SCHEMA-DRIVEN: the reader parses the schema JSON embedded in
the container header (Avro files are self-describing), so a
round-trip test exercises the spec encoding, not a private convention.

Encoding reference: the Avro specification §Binary Encoding —
zigzag(n) = (n << 1) ^ (n >> 63) as unsigned LEB128 varint; arrays and
maps are blocks of (count, items...) terminated by a zero count; unions
are (branch index, value); records are their fields in declared order.

This is a CORRECTNESS codec for metadata-sized payloads (manifests are
KB-scale), not a data-plane serializer.
"""

from __future__ import annotations

import io
import json
import os
import struct

_MAGIC = b"Obj\x01"


# --------------------------------------------------------------------------
# primitive encoders / decoders
# --------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def _write_varint(buf: io.BytesIO, n: int) -> None:
    u = _zigzag(int(n)) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_varint(buf: io.BytesIO) -> int:
    shift = 0
    u = 0
    while True:
        (b,) = buf.read(1)
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _write_bytes(buf: io.BytesIO, data: bytes) -> None:
    _write_varint(buf, len(data))
    buf.write(data)


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_varint(buf))


# --------------------------------------------------------------------------
# schema-driven value codec
# --------------------------------------------------------------------------


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def write_value(buf: io.BytesIO, schema, value) -> None:
    t = _type_name(schema)
    if t == "union":
        # Iceberg metadata unions are all ["null", X]: None takes the
        # null branch, anything else the first non-null branch
        for i, branch in enumerate(schema):
            if (value is None) == (_type_name(branch) == "null"):
                _write_varint(buf, i)
                write_value(buf, branch, value)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_varint(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(buf, bytes(value))
    elif t == "string":
        _write_bytes(buf, str(value).encode("utf-8"))
    elif t == "fixed":
        data = bytes(value)
        if len(data) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(data)} != {schema['size']}")
        buf.write(data)
    elif t == "enum":
        _write_varint(buf, schema["symbols"].index(value))
    elif t == "record":
        for f in schema["fields"]:
            write_value(buf, f["type"], value.get(f["name"]))
    elif t == "array":
        items = list(value or [])
        if items:
            _write_varint(buf, len(items))
            for it in items:
                write_value(buf, schema["items"], it)
        _write_varint(buf, 0)
    elif t == "map":
        entries = dict(value or {})
        if entries:
            _write_varint(buf, len(entries))
            for k, v in entries.items():
                _write_bytes(buf, str(k).encode("utf-8"))
                write_value(buf, schema["values"], v)
        _write_varint(buf, 0)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def read_value(buf: io.BytesIO, schema):
    t = _type_name(schema)
    if t == "union":
        return read_value(buf, schema[_read_varint(buf)])
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_varint(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][_read_varint(buf)]
    if t == "record":
        return {f["name"]: read_value(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = _read_varint(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                _read_varint(buf)
                n = -n
            out.extend(read_value(buf, schema["items"]) for _ in range(n))
    if t == "map":
        out = {}
        while True:
            n = _read_varint(buf)
            if n == 0:
                return out
            if n < 0:
                _read_varint(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = read_value(buf, schema["values"])
        return out
    raise ValueError(f"unsupported Avro type {t!r}")


# --------------------------------------------------------------------------
# object-container files
# --------------------------------------------------------------------------


def write_container(
    path: str, schema: dict, records: list[dict], metadata: dict[str, str] | None = None
) -> None:
    """One-block Avro object-container file (codec null). ``metadata``
    adds extra header keys (Iceberg stores its own schema/spec JSON
    there)."""
    sync = os.urandom(16)
    buf = io.BytesIO()
    buf.write(_MAGIC)
    meta = {"avro.schema": json.dumps(schema), "avro.codec": "null"}
    meta.update(metadata or {})
    write_value(
        buf,
        {"type": "map", "values": "bytes"},
        {k: v.encode("utf-8") if isinstance(v, str) else v for k, v in meta.items()},
    )
    buf.write(sync)
    payload = io.BytesIO()
    for r in records:
        write_value(payload, schema, r)
    _write_varint(buf, len(records))
    _write_varint(buf, payload.getbuffer().nbytes)
    buf.write(payload.getvalue())
    buf.write(sync)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def read_container(path: str) -> tuple[dict, dict[str, bytes], list]:
    """(schema, header-metadata, records) from an Avro container —
    schema comes from the file's own header, so reading does not depend
    on knowing what wrote it."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{path} is not an Avro container")
    meta = read_value(buf, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    if meta.get("avro.codec", b"null") not in (b"null", None):
        raise ValueError("only the null codec is supported")
    sync = buf.read(16)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = _read_varint(buf)
        _read_varint(buf)  # block byte size
        for _ in range(n):
            records.append(read_value(buf, schema))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch — corrupt container")
    return schema, meta, records
