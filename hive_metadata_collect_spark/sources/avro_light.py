"""Minimal Apache Avro Object Container File (OCF) reader — null codec.

A small, schema-driven implementation of the public Avro 1.11
specification (binary encoding + container format), sufficient to
decode Apache Iceberg manifest-list and manifest files: primitives
(null/boolean/int/long/float/double/string/bytes), records, unions,
arrays, and maps. The Spark distribution in this environment ships the
core Avro *Java* library but NOT the `spark-avro` datasource, and no
Python Avro package is installed — so, following the same discipline
as the real WAV/PPM/Y4M parsers in llm/multimodal.py, the format is
parsed from bytes against its published spec rather than stubbed.

Scale shape: Iceberg metadata trees are decoded MANIFEST-FILE-AT-A-TIME
— exactly the unit Iceberg's own planner parallelizes on — so the
Spark-side integration is `spark.read.format("binaryFile")` over the
metadata directory followed by a per-file decode in a `mapInPandas`
stage: thousands of manifests decode as thousands of independent
tasks, and no single node ever holds more than one manifest's entries.

Spec reference: https://avro.apache.org/docs/1.11.1/specification/
(binary encoding: zig-zag varint longs, length-prefixed UTF-8 strings
and bytes, block-encoded arrays/maps with optional negative-count size
prefix; container: 'Obj\\x01' magic, file-metadata map carrying
avro.schema JSON, 16-byte sync marker between blocks).
"""

from __future__ import annotations

import json
import struct
from typing import Any

_MAGIC = b"Obj\x01"


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    """Zig-zag varint → (value, new_pos)."""
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _read_bytes(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    return buf[pos : pos + n], pos + n


def _read_blocked(buf, pos, read_item):
    """Arrays and maps share Avro's block encoding: a count per block
    (negative count ⇒ |count| items preceded by a byte size, used by
    writers that support skipping), 0-count terminator."""
    items = []
    while True:
        n, pos = _read_long(buf, pos)
        if n == 0:
            return items, pos
        if n < 0:
            n = -n
            _size, pos = _read_long(buf, pos)  # block byte size, unused
        for _ in range(n):
            item, pos = read_item(buf, pos)
            items.append(item)


def _decode(schema: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    """Decode one value of `schema` (parsed Avro JSON) at `pos`."""
    if isinstance(schema, list):  # union: branch index, then value
        idx, pos = _read_long(buf, pos)
        return _decode(schema[idx], buf, pos)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            rec = {}
            for f in schema["fields"]:
                rec[f["name"]], pos = _decode(f["type"], buf, pos)
            return rec, pos
        if t == "array":
            return _read_blocked(
                buf, pos, lambda b, p: _decode(schema["items"], b, p)
            )
        if t == "map":

            def kv(b, p):
                kb, p = _read_bytes(b, p)
                v, p = _decode(schema["values"], b, p)
                return (kb.decode("utf-8"), v), p

            pairs, pos = _read_blocked(buf, pos, kv)
            return dict(pairs), pos
        if t == "fixed":
            n = schema["size"]
            return buf[pos : pos + n], pos + n
        return _decode(t, buf, pos)  # {"type": "long"} wrapper / named
    # primitive by name
    if schema == "null":
        return None, pos
    if schema == "boolean":
        return buf[pos] != 0, pos + 1
    if schema in ("int", "long"):
        return _read_long(buf, pos)
    if schema == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if schema == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if schema == "bytes":
        return _read_bytes(buf, pos)
    if schema == "string":
        b, pos = _read_bytes(buf, pos)
        return b.decode("utf-8"), pos
    raise ValueError(f"unsupported Avro schema node: {schema!r}")


def read_ocf(data: bytes) -> tuple[dict, list[dict]]:
    """Decode an Avro Object Container File → (schema, records).

    Only the 'null' codec is supported — Iceberg writes metadata Avro
    uncompressed by default, and the checked-in fixtures are written
    that way; a deflate container raises rather than mis-decoding.
    """
    if data[:4] != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4

    def kv(b, p):
        kb, p = _read_bytes(b, p)
        vb, p = _read_bytes(b, p)
        return (kb.decode("utf-8"), vb), p

    meta_pairs, pos = _read_blocked(data, pos, kv)
    meta = dict(meta_pairs)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec != "null":
        raise ValueError(f"unsupported Avro codec: {codec}")
    schema = json.loads(meta["avro.schema"])
    sync = data[pos : pos + 16]
    pos += 16

    records: list[dict] = []
    while pos < len(data):
        n, pos = _read_long(data, pos)
        _nbytes, pos = _read_long(data, pos)
        for _ in range(n):
            rec, pos = _decode(schema, data, pos)
            records.append(rec)
        if data[pos : pos + 16] != sync:
            raise ValueError("Avro block sync marker mismatch")
        pos += 16
    return schema, records


# ---------------------------------------------------------------------------
# Writer half — used by tools/make_iceberg_manifests.py to produce the
# checked-in fixtures, and by tests to round-trip the reader. Writing
# through the same spec functions the reader inverts is deliberately
# NOT the correctness argument (that would be circular): the fixture
# is golden-pinned byte-for-byte in tests, and the operator's DuckDB
# oracle reads an independent JSON projection checked in beside it.


def _write_long(v: int) -> bytes:
    acc = (v << 1) ^ (v >> 63)
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _write_bytes(b: bytes) -> bytes:
    return _write_long(len(b)) + b


def _encode(schema: Any, v: Any) -> bytes:
    if isinstance(schema, list):  # union
        for i, branch in enumerate(schema):
            if (v is None) == (branch == "null"):
                if v is None:
                    return _write_long(i)
                return _write_long(i) + _encode(branch, v)
        raise ValueError(f"no union branch for {v!r} in {schema!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return b"".join(
                _encode(f["type"], v[f["name"]]) for f in schema["fields"]
            )
        if t == "array":
            out = b""
            if v:
                out += _write_long(len(v)) + b"".join(
                    _encode(schema["items"], x) for x in v
                )
            return out + _write_long(0)
        if t == "map":
            out = b""
            if v:
                out += _write_long(len(v)) + b"".join(
                    _write_bytes(k.encode("utf-8"))
                    + _encode(schema["values"], val)
                    for k, val in v.items()
                )
            return out + _write_long(0)
        return _encode(t, v)
    if schema == "null":
        return b""
    if schema == "boolean":
        return b"\x01" if v else b"\x00"
    if schema in ("int", "long"):
        return _write_long(v)
    if schema == "double":
        return struct.pack("<d", v)
    if schema == "bytes":
        return _write_bytes(v)
    if schema == "string":
        return _write_bytes(v.encode("utf-8"))
    raise ValueError(f"unsupported Avro schema node: {schema!r}")


def write_ocf(schema: dict, records: list[dict]) -> bytes:
    """Encode records into a single-block null-codec OCF. The sync
    marker is fixed (not random) so fixture bytes are reproducible —
    regenerating the fixture yields an identical file."""
    sync = bytes(range(16))
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": b"null",
    }
    out = bytearray(_MAGIC)
    out += _write_long(len(meta))
    for k, v in meta.items():
        out += _write_bytes(k.encode()) + _write_bytes(v)
    out += _write_long(0)
    out += sync
    body = b"".join(_encode(schema, r) for r in records)
    out += _write_long(len(records)) + _write_long(len(body)) + body + sync
    return bytes(out)
