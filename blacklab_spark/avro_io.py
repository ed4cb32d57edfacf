"""Avro Object Container File codec, pure python/stdlib.

Iceberg's manifest lists and manifest files are Avro container files; this
module is the stdlib-only codec underneath blacklab_spark.iceberg (the
sandbox has no avro/fastavro wheel). Scope: the full Avro 1.11 binary
encoding for the generic data model — records, unions, arrays, maps,
fixed, enums and every primitive — plus the container framing (magic,
header metadata map, sync markers, null/deflate block codecs).

The READER is generic: it decodes by the writer schema embedded in the
file header, so it reads container files from any Avro writer, not just
ours. The WRITER takes a schema (JSON string or parsed dict) and a list
of plain-python records. Schema resolution (separate reader schema) is
out of scope — Iceberg manifests are always read with the embedded
writer schema here; field-id projection happens a layer up.

Spec anchors (Apache Avro 1.11.1 specification, "Binary encoding" +
"Object Container Files"): zigzag varints for int/long, little-endian
IEEE for float/double, length-prefixed bytes/string, block-encoded
arrays/maps with the optional negative-count + byte-size form, union as
branch index + value, container magic ``Obj\\x01``, header map with
``avro.schema``/``avro.codec``, 16-byte sync marker after the header and
after every data block; the ``deflate`` codec is raw RFC 1951 (no zlib
wrapper). Every one of these is pinned by a hand-computed byte test in
tests/test_iceberg.py, so the writer and the generic reader cannot share
a conjugate bug.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# primitive binary encoding


def zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = zigzag_encode(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def read_long(buf) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return zigzag_decode(acc)
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def read_bytes(buf) -> bytes:
    n = read_long(buf)
    if n < 0:
        raise ValueError("negative bytes length")
    out = buf.read(n)
    if len(out) != n:
        raise ValueError("truncated bytes")
    return out


# ---------------------------------------------------------------------------
# generic datum writer/reader driven by a (parsed) schema
#
# Schemas are the standard JSON forms: a string primitive name, a dict with
# "type", or a list (union). Named types may be referenced by name after
# first definition; `names` threads the definitions.


def _schema_type(schema, names: dict):
    if isinstance(schema, str):
        return names.get(schema, schema)
    return schema


def _register(schema: dict, names: dict) -> None:
    nm = schema.get("name")
    if nm:
        ns = schema.get("namespace")
        names[nm] = schema
        if ns:
            names[f"{ns}.{nm}"] = schema


def write_datum(buf: io.BytesIO, datum, schema, names: dict) -> None:
    schema = _schema_type(schema, names)
    if isinstance(schema, list):  # union: pick first matching branch
        idx = _union_branch(datum, schema, names)
        write_long(buf, idx)
        write_datum(buf, datum, schema[idx], names)
        return
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if datum else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(datum))
    elif t == "float":
        buf.write(struct.pack("<f", float(datum)))
    elif t == "double":
        buf.write(struct.pack("<d", float(datum)))
    elif t == "bytes":
        write_bytes(buf, bytes(datum))
    elif t == "string":
        write_bytes(buf, datum.encode("utf-8"))
    elif t == "fixed":
        _register(schema, names)
        if len(datum) != schema["size"]:
            raise ValueError("fixed size mismatch")
        buf.write(bytes(datum))
    elif t == "enum":
        _register(schema, names)
        write_long(buf, schema["symbols"].index(datum))
    elif t == "array":
        if datum:
            write_long(buf, len(datum))
            for item in datum:
                write_datum(buf, item, schema["items"], names)
        write_long(buf, 0)
    elif t == "map":
        if datum:
            write_long(buf, len(datum))
            for k, v in datum.items():
                write_bytes(buf, k.encode("utf-8"))
                write_datum(buf, v, schema["values"], names)
        write_long(buf, 0)
    elif t == "record":
        _register(schema, names)
        for f in schema["fields"]:
            write_datum(buf, datum.get(f["name"]), f["type"], names)
    else:
        raise ValueError(f"unsupported schema type {t!r}")


def _union_branch(datum, union: list, names: dict) -> int:
    def kind(s):
        s = _schema_type(s, names)
        return s if isinstance(s, str) else s["type"]

    if datum is None:
        for i, s in enumerate(union):
            if kind(s) == "null":
                return i
        raise ValueError("None not in union")
    # non-null: prefer the branch whose python type matches
    want = {
        bool: ("boolean",),
        int: ("long", "int"),
        float: ("double", "float"),
        str: ("string", "enum"),
        bytes: ("bytes", "fixed"),
        list: ("array",),
        dict: ("record", "map"),
    }.get(type(datum), ())
    for pref in want:
        for i, s in enumerate(union):
            if kind(s) == pref:
                return i
    for i, s in enumerate(union):
        if kind(s) != "null":
            return i
    raise ValueError("no union branch for datum")


def read_datum(buf, schema, names: dict):
    schema = _schema_type(schema, names)
    if isinstance(schema, list):
        idx = read_long(buf)
        return read_datum(buf, schema[idx], names)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) != b"\x00"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return read_bytes(buf)
    if t == "string":
        return read_bytes(buf).decode("utf-8")
    if t == "fixed":
        _register(schema, names)
        return buf.read(schema["size"])
    if t == "enum":
        _register(schema, names)
        return schema["symbols"][read_long(buf)]
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # negative count: byte size follows (skippable form)
                n = -n
                read_long(buf)
            for _ in range(n):
                out.append(read_datum(buf, schema["items"], names))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                n = -n
                read_long(buf)
            for _ in range(n):
                k = read_bytes(buf).decode("utf-8")
                out[k] = read_datum(buf, schema["values"], names)
    if t == "record":
        _register(schema, names)
        return {f["name"]: read_datum(buf, f["type"], names) for f in schema["fields"]}
    raise ValueError(f"unsupported schema type {t!r}")


# ---------------------------------------------------------------------------
# container files


def write_container(
    schema,
    records: list,
    meta: dict[str, bytes] | None = None,
    codec: str = "deflate",
    sync: bytes | None = None,
    block_records: int = 4096,
) -> bytes:
    """Serialize records into one Avro Object Container File. `meta` adds
    extra header metadata entries (Iceberg puts schema/spec JSON there).
    `sync` pins the 16-byte marker for deterministic output (default: a
    digest of the schema — deterministic, no RNG)."""
    if isinstance(schema, str):
        schema = json.loads(schema)
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    schema_json = json.dumps(schema, separators=(",", ":"))
    if sync is None:
        import hashlib

        sync = hashlib.md5(b"blacklab-avro:" + schema_json.encode()).digest()
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    out = io.BytesIO()
    out.write(MAGIC)
    hdr_meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    hdr_meta.update(meta or {})
    # header metadata is a map<bytes>: one block of len(meta) pairs + end
    write_long(out, len(hdr_meta))
    for k, v in hdr_meta.items():
        write_bytes(out, k.encode())
        write_bytes(out, v)
    write_long(out, 0)
    out.write(sync)
    names: dict = {}
    for lo in range(0, len(records), block_records):
        chunk = records[lo : lo + block_records]
        body = io.BytesIO()
        for rec in chunk:
            write_datum(body, rec, schema, names)
        raw = body.getvalue()
        if codec == "deflate":  # RFC 1951 raw deflate, no zlib wrapper
            c = zlib.compressobj(9, zlib.DEFLATED, -15)
            raw = c.compress(raw) + c.flush()
        write_long(out, len(chunk))
        write_long(out, len(raw))
        out.write(raw)
        out.write(sync)
    return out.getvalue()


def read_container(data: bytes) -> tuple[dict, list, dict[str, bytes]]:
    """Parse an Avro container file -> (writer schema, records, header meta)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro container file")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:
            n = -n
            read_long(buf)
        for _ in range(n):
            k = read_bytes(buf).decode("utf-8")
            meta[k] = read_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    records: list = []
    names: dict = {}
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = read_long(buf)
        size = read_long(buf)
        raw = buf.read(size)
        if len(raw) != size:
            raise ValueError("truncated block")
        if codec == "deflate":
            raw = zlib.decompress(raw, -15)
        body = io.BytesIO(raw)
        for _ in range(count):
            records.append(read_datum(body, schema, names))
        if body.read(1):
            raise ValueError("trailing bytes in block")
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")
    return schema, records, meta
