"""Pure-Python Avro Object Container File codec.

The reference ingests Avro-schema'd records (Pulsar streams carry Avro
payloads — crates/sparrow-runtime/src/streams/pulsar/schema.rs — and
raw_metadata.rs sniffs Avro container files). Spark reads Avro through
the external spark-avro module, which is not bundled in every
distribution; this module implements the container-file format from the
public Avro 1.11 specification so `read_avro` still works (distributed,
via a binaryFile scan + mapInPandas decode) when the jar is absent.

Deliberately NOT a general Avro library:

- types: null, boolean, int, long, float, double, bytes, string, enum
  (decoded to its symbol string), fixed (to bytes), record, array,
  map<string, T>, and 2-branch ["null", T] unions (nullable fields).
  Wider unions are rejected at schema-mapping time with a clear error —
  Spark has no untagged-union column type either.
- logical types: timestamp-micros / timestamp-millis (-> datetime64),
  date (-> date32).
- codecs: null, deflate (raw zlib, wbits=-15 per spec), and snappy
  (from-scratch raw-format decoder per the public snappy
  format_description.txt, + the 4-byte big-endian CRC32 Avro appends;
  the writer emits literal-only snappy, which is valid output and lets
  tests exercise the decode path without python-snappy). zstandard has
  no stdlib implementation and is rejected by name.

Scale posture: Avro is an INGESTION format. At 100 TB the pipeline
converts it once to parquet/Iceberg (exactly what the reference's
prepare step does to all its inputs, prepare.rs:51-76) and scans the
columnar copy thereafter. The distributed read path in readers.py
decodes each .avro file in one executor task — files are the natural
parallelism unit for row-oriented container formats, same as Spark's
own spark-avro FileFormat which splits on sync-marker boundaries.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
SYNC_SIZE = 16

_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}


class AvroError(ValueError):
    pass


# ---------------------------------------------------------------------------
# binary decoder


class _Decoder:
    __slots__ = ("buf", "pos")

    def __init__(self, data: bytes):
        self.buf = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        p = self.pos
        out = self.buf[p : p + n]
        if len(out) != n:
            raise AvroError("truncated Avro data")
        self.pos = p + n
        return out

    def read_long(self) -> int:
        """Zigzag varint (spec: int and long share the encoding)."""
        buf = self.buf
        p = self.pos
        b = buf[p]
        p += 1
        n = b & 0x7F
        shift = 7
        while b & 0x80:
            b = buf[p]
            p += 1
            n |= (b & 0x7F) << shift
            shift += 7
        self.pos = p
        return (n >> 1) ^ -(n & 1)

    def read_boolean(self) -> bool:
        return self.read(1) == b"\x01"

    def read_float(self) -> float:
        return struct.unpack("<f", self.read(4))[0]

    def read_double(self) -> float:
        return struct.unpack("<d", self.read(8))[0]

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())

    def read_string(self) -> str:
        return self.read_bytes().decode("utf-8")

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


class _Encoder:
    __slots__ = ("out",)

    def __init__(self):
        self.out = io.BytesIO()

    def write_long(self, n: int) -> None:
        n = (n << 1) ^ (n >> 63) if n >= 0 else (((-n) << 1) - 1)
        w = self.out.write
        while n & ~0x7F:
            w(bytes(((n & 0x7F) | 0x80,)))
            n >>= 7
        w(bytes((n,)))

    def write_boolean(self, v: bool) -> None:
        self.out.write(b"\x01" if v else b"\x00")

    def write_float(self, v: float) -> None:
        self.out.write(struct.pack("<f", v))

    def write_double(self, v: float) -> None:
        self.out.write(struct.pack("<d", v))

    def write_bytes(self, v: bytes) -> None:
        self.write_long(len(v))
        self.out.write(v)

    def write_string(self, v: str) -> None:
        self.write_bytes(v.encode("utf-8"))

    def getvalue(self) -> bytes:
        return self.out.getvalue()


# ---------------------------------------------------------------------------
# schema-directed value codec


def _resolve_named(schema, names):
    """Dereference named-type references ("MyRecord" used after def)."""
    if isinstance(schema, str) and schema not in _PRIMITIVES:
        try:
            return names[schema]
        except KeyError:
            raise AvroError(f"unknown Avro type reference {schema!r}")
    return schema


def _register_named(schema, names):
    if isinstance(schema, dict) and schema.get("name") and schema.get(
        "type"
    ) in ("record", "enum", "fixed"):
        ns = schema.get("namespace")
        full = f"{ns}.{schema['name']}" if ns else schema["name"]
        names[full] = schema
        names[schema["name"]] = schema


def _read_value(dec: _Decoder, schema, names):
    schema = _resolve_named(schema, names)
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return None
        if t == "boolean":
            return dec.read_boolean()
        if t in ("int", "long"):
            return dec.read_long()
        if t == "float":
            return dec.read_float()
        if t == "double":
            return dec.read_double()
        if t == "bytes":
            return dec.read_bytes()
        if t == "string":
            return dec.read_string()
        raise AvroError(f"unsupported Avro type {t!r}")
    if isinstance(schema, list):  # union: long branch index, then value
        idx = dec.read_long()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union branch {idx} out of range")
        return _read_value(dec, schema[idx], names)
    t = schema["type"]
    if t in _PRIMITIVES:  # e.g. {"type": "long", "logicalType": ...}
        return _read_value(dec, t, names)
    if t == "record":
        _register_named(schema, names)
        return {
            f["name"]: _read_value(dec, f["type"], names)
            for f in schema["fields"]
        }
    if t == "enum":
        _register_named(schema, names)
        return schema["symbols"][dec.read_long()]
    if t == "fixed":
        _register_named(schema, names)
        return dec.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = dec.read_long()
            if n == 0:
                return out
            if n < 0:  # block-size prefix variant
                n = -n
                dec.read_long()
            for _ in range(n):
                out.append(_read_value(dec, schema["items"], names))
    if t == "map":
        out = {}
        while True:
            n = dec.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                dec.read_long()
            for _ in range(n):
                k = dec.read_string()
                out[k] = _read_value(dec, schema["values"], names)
    raise AvroError(f"unsupported Avro type {t!r}")


def _write_value(enc: _Encoder, schema, value, names) -> None:
    schema = _resolve_named(schema, names)
    if isinstance(schema, str):
        t = schema
        if t == "null":
            return
        if t == "boolean":
            return enc.write_boolean(bool(value))
        if t in ("int", "long"):
            return enc.write_long(int(value))
        if t == "float":
            return enc.write_float(float(value))
        if t == "double":
            return enc.write_double(float(value))
        if t == "bytes":
            return enc.write_bytes(bytes(value))
        if t == "string":
            return enc.write_string(value)
        raise AvroError(f"unsupported Avro type {t!r}")
    if isinstance(schema, list):
        # writer picks the first matching branch; None -> the null branch
        for i, branch in enumerate(schema):
            b = _resolve_named(branch, names)
            bt = b if isinstance(b, str) else b.get("type")
            if (value is None) == (bt == "null"):
                enc.write_long(i)
                return _write_value(enc, branch, value, names)
        raise AvroError(f"no union branch for {value!r} in {schema!r}")
    t = schema["type"]
    if t in _PRIMITIVES:
        return _write_value(enc, t, value, names)
    if t == "record":
        _register_named(schema, names)
        for f in schema["fields"]:
            _write_value(enc, f["type"], value[f["name"]], names)
        return
    if t == "enum":
        _register_named(schema, names)
        return enc.write_long(schema["symbols"].index(value))
    if t == "fixed":
        _register_named(schema, names)
        if len(value) != schema["size"]:
            raise AvroError("fixed size mismatch")
        enc.out.write(value)
        return
    if t == "array":
        if value:
            enc.write_long(len(value))
            for item in value:
                _write_value(enc, schema["items"], item, names)
        enc.write_long(0)
        return
    if t == "map":
        if value:
            enc.write_long(len(value))
            for k, v in value.items():
                enc.write_string(k)
                _write_value(enc, schema["values"], v, names)
        enc.write_long(0)
        return
    raise AvroError(f"unsupported Avro type {t!r}")


# ---------------------------------------------------------------------------
# snappy raw format (public spec: format_description.txt). Avro's snappy
# codec is raw-snappy data + 4-byte big-endian CRC32 of the UNCOMPRESSED
# bytes. Decoder handles any conforming stream; the encoder emits
# literal-only output (valid snappy, no back-references) because it only
# exists so tests can exercise the decode path without python-snappy.


def _snappy_uncompress(data: bytes) -> bytes:
    pos = 0
    # preamble: varint uncompressed length
    shift = 0
    ulen = 0
    while True:
        b = data[pos]
        pos += 1
        ulen |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 3-bit len, 11-bit offset
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte LE offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte LE offset
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise AvroError("snappy copy offset out of range")
        start = len(out) - off
        for i in range(ln):  # may overlap itself (run-length style)
            out.append(out[start + i])
    if len(out) != ulen:
        raise AvroError("snappy length mismatch")
    return bytes(out)


def _snappy_compress_literal(data: bytes) -> bytes:
    out = bytearray()
    ln = len(data)
    while ln & ~0x7F:
        out.append((ln & 0x7F) | 0x80)
        ln >>= 7
    out.append(ln)
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + 65536]
        pos += len(chunk)
        cl = len(chunk) - 1
        if cl < 60:
            out.append(cl << 2)
        else:
            out.append(61 << 2)  # 61 = 2-byte length-minus-one follows
            out += cl.to_bytes(2, "little")
        out += chunk
    return bytes(out)


def _avro_snappy_decode(block: bytes) -> bytes:
    body, crc = block[:-4], block[-4:]
    out = _snappy_uncompress(body)
    if zlib.crc32(out).to_bytes(4, "big") != crc:
        raise AvroError("snappy block CRC mismatch")
    return out


def _avro_snappy_encode(raw: bytes) -> bytes:
    return _snappy_compress_literal(raw) + zlib.crc32(raw).to_bytes(4, "big")


# ---------------------------------------------------------------------------
# container file


def _read_header(dec: _Decoder):
    if dec.read(4) != MAGIC:
        raise AvroError("not an Avro object container file (bad magic)")
    meta = {}
    while True:
        n = dec.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            dec.read_long()
        for _ in range(n):
            k = dec.read_string()
            meta[k] = dec.read_bytes()
    sync = dec.read(SYNC_SIZE)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync


def read_container(data: bytes):
    """Decode one Avro container file -> (schema, list of python rows).

    Rows are dicts for record schemas, scalars otherwise.
    """
    dec = _Decoder(data)
    schema, codec, sync = _read_header(dec)
    if codec == "deflate":
        inflate = lambda b: zlib.decompress(b, -15)  # noqa: E731
    elif codec == "snappy":
        inflate = _avro_snappy_decode
    elif codec in ("null", ""):
        inflate = lambda b: b  # noqa: E731
    else:
        raise AvroError(
            f"codec {codec!r} not supported by the pure-Python Avro reader "
            "(null/deflate/snappy are; install spark-avro for zstandard)"
        )
    names: dict = {}
    rows = []
    while not dec.at_end():
        count = dec.read_long()
        size = dec.read_long()
        block = _Decoder(inflate(dec.read(size)))
        for _ in range(count):
            rows.append(_read_value(block, schema, names))
        if dec.read(SYNC_SIZE) != sync:
            raise AvroError("sync marker mismatch (corrupt block boundary)")
    return schema, rows


def _read_varint_file(f) -> int | None:
    """Zig-zag varint from a file object; None at clean EOF."""
    shift = acc = 0
    while True:
        b = f.read(1)
        if not b:
            if shift == 0:
                return None
            raise AvroError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        shift += 7
        if not byte & 0x80:
            break
    return (acc >> 1) ^ -(acc & 1)


def read_header_file(f):
    """Parse an Avro container header from a file object, leaving the
    position at the first block. Returns (schema, codec, sync)."""
    if f.read(4) != MAGIC:
        raise AvroError("not an Avro object container file (bad magic)")
    meta = {}
    while True:
        n = _read_varint_file(f)
        if n == 0 or n is None:
            break
        if n < 0:
            n = -n
            _read_varint_file(f)  # discard the byte-size hint
        for _ in range(n):
            klen = _read_varint_file(f)
            k = f.read(klen).decode()
            vlen = _read_varint_file(f)
            meta[k] = f.read(vlen)
    sync = f.read(SYNC_SIZE)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync


def index_container_blocks(path: str, target_split_bytes: int = 32 << 20):
    """Split an Avro container file on its sync markers WITHOUT
    decoding any payload: walk the per-block (count, size) headers,
    seeking over the compressed data, and group consecutive blocks
    into byte ranges of ~``target_split_bytes``.

    Returns ``(schema, codec, sync, [(offset, length), ...])`` where
    each range starts at a block boundary and ends after a sync marker
    — a range is independently decodable given the header triple. Cost
    is O(#blocks) tiny reads + seeks (a 64 MB-block file indexes at a
    few hundred bytes of IO per GB), so a handful of huge .avro inputs
    no longer serialize ingestion behind single whole-file tasks.
    """
    splits: list[tuple[int, int]] = []
    with open(path, "rb") as f:
        schema, codec, sync = read_header_file(f)
        run_start = None
        run_len = 0
        while True:
            off = f.tell()
            count = _read_varint_file(f)
            if count is None:
                break
            size = _read_varint_file(f)
            f.seek(size, 1)
            if f.read(SYNC_SIZE) != sync:
                raise AvroError("sync marker mismatch (corrupt block boundary)")
            end = f.tell()
            if run_start is None:
                run_start, run_len = off, 0
            run_len = end - run_start
            if run_len >= target_split_bytes:
                splits.append((run_start, run_len))
                run_start, run_len = None, 0
        if run_start is not None and run_len:
            splits.append((run_start, run_len))
    return schema, codec, sync, splits


def decode_block_range(path: str, offset: int, length: int, schema, codec, sync):
    """Decode the blocks in ``[offset, offset+length)`` of a container
    file (a range produced by :func:`index_container_blocks`) into
    python rows — the per-task kernel of the split Avro scan."""
    if codec == "deflate":
        inflate = lambda b: zlib.decompress(b, -15)  # noqa: E731
    elif codec == "snappy":
        inflate = _avro_snappy_decode
    elif codec in ("null", ""):
        inflate = lambda b: b  # noqa: E731
    else:
        raise AvroError(f"codec {codec!r} not supported")
    with open(path, "rb") as f:
        f.seek(offset)
        dec = _Decoder(f.read(length))
    names: dict = {}
    rows = []
    while not dec.at_end():
        count = dec.read_long()
        size = dec.read_long()
        block = _Decoder(inflate(dec.read(size)))
        for _ in range(count):
            rows.append(_read_value(block, schema, names))
        if dec.read(SYNC_SIZE) != sync:
            raise AvroError("sync marker mismatch (corrupt block boundary)")
    return rows


def write_container(
    schema,
    rows,
    codec: str = "deflate",
    block_rows: int = 1000,
    sync: bytes = b"\x00" * SYNC_SIZE,
) -> bytes:
    """Encode rows into an Avro object container file (fixture writer —
    the sandbox has no Avro library to produce test inputs with)."""
    if codec == "deflate":
        deflate = lambda b: zlib.compress(b)[2:-4]  # noqa: E731  strip zlib wrapper
    elif codec == "snappy":
        deflate = _avro_snappy_encode
    elif codec == "null":
        deflate = lambda b: b  # noqa: E731
    else:
        raise AvroError(f"writer supports null/deflate/snappy, not {codec!r}")
    head = _Encoder()
    head.out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    head.write_long(len(meta))
    for k, v in meta.items():
        head.write_string(k)
        head.write_bytes(v)
    head.write_long(0)
    head.out.write(sync)
    names: dict = {}
    rows = list(rows)
    for i in range(0, max(len(rows), 1), block_rows):
        chunk = rows[i : i + block_rows]
        if not chunk:
            break
        enc = _Encoder()
        for r in chunk:
            _write_value(enc, schema, r, names)
        payload = deflate(enc.getvalue())
        head.write_long(len(chunk))
        head.write_long(len(payload))
        head.out.write(payload)
        head.out.write(sync)
    return head.getvalue()


# ---------------------------------------------------------------------------
# Avro schema -> Spark schema


def to_spark_type(schema, names=None):
    """Map an Avro schema node to a (pyspark type, nullable) pair."""
    from pyspark.sql import types as T

    names = names if names is not None else {}
    schema = _resolve_named(schema, names)
    if isinstance(schema, list):
        branches = [
            b for b in schema if _resolve_named(b, names) != "null"
        ]
        if len(schema) - len(branches) != 1 or len(branches) != 1:
            raise AvroError(
                "only [null, T] unions map to a Spark column; got "
                f"{schema!r} (Spark has no untagged-union type)"
            )
        inner, _ = to_spark_type(branches[0], names)
        return inner, True
    if isinstance(schema, str):
        prim = {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
            "null": T.NullType(),
        }
        if schema not in prim:
            raise AvroError(f"unsupported Avro type {schema!r}")
        return prim[schema], False
    t = schema["type"]
    logical = schema.get("logicalType")
    if logical in ("timestamp-micros", "timestamp-millis"):
        return T.TimestampType(), False
    if logical == "date":
        return T.DateType(), False
    if t in _PRIMITIVES:
        return to_spark_type(t, names)
    if t == "record":
        _register_named(schema, names)
        return (
            T.StructType(
                [
                    T.StructField(f["name"], *to_spark_type(f["type"], names))
                    for f in schema["fields"]
                ]
            ),
            False,
        )
    if t == "enum":
        _register_named(schema, names)
        return T.StringType(), False
    if t == "fixed":
        _register_named(schema, names)
        return T.BinaryType(), False
    if t == "array":
        elem, n = to_spark_type(schema["items"], names)
        return T.ArrayType(elem, containsNull=n), False
    if t == "map":
        val, n = to_spark_type(schema["values"], names)
        return T.MapType(T.StringType(), val, valueContainsNull=n), False
    raise AvroError(f"unsupported Avro type {t!r}")


def _logical_converters(schema, names):
    """Per-field value converters for logical types (flat records only —
    nested logical timestamps stay raw longs, same as spark-avro's
    default for unannotated nested readers)."""
    import datetime as _dt

    convs = {}
    schema = _resolve_named(schema, names)
    if not (isinstance(schema, dict) and schema.get("type") == "record"):
        return convs
    for f in schema["fields"]:
        ft = _resolve_named(f["type"], names)
        if isinstance(ft, list):
            nn = [b for b in ft if _resolve_named(b, names) != "null"]
            ft = _resolve_named(nn[0], names) if len(nn) == 1 else ft
        if not isinstance(ft, dict):
            continue
        lt = ft.get("logicalType")
        if lt == "timestamp-micros":
            convs[f["name"]] = lambda v: (
                None
                if v is None
                else _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=v)
            )
        elif lt == "timestamp-millis":
            convs[f["name"]] = lambda v: (
                None
                if v is None
                else _dt.datetime(1970, 1, 1) + _dt.timedelta(milliseconds=v)
            )
        elif lt == "date":
            convs[f["name"]] = lambda v: (
                None
                if v is None
                else _dt.date(1970, 1, 1) + _dt.timedelta(days=v)
            )
    return convs


def rows_to_pandas(schema, rows):
    """Container rows -> pandas DataFrame with logical types applied."""
    import pandas as pd

    names: dict = {}
    sch = _resolve_named(schema, names)
    if not (isinstance(sch, dict) and sch.get("type") == "record"):
        return pd.DataFrame({"value": rows})
    convs = _logical_converters(sch, names)
    cols = [f["name"] for f in sch["fields"]]
    data = {c: [] for c in cols}
    for r in rows:
        for c in cols:
            v = r.get(c)
            conv = convs.get(c)
            data[c].append(conv(v) if conv else v)
    return pd.DataFrame(data, columns=cols)


def read_avro_file(path: str):
    """Read one .avro file -> (avro schema, pandas DataFrame)."""
    with open(path, "rb") as fh:
        schema, rows = read_container(fh.read())
    return schema, rows_to_pandas(schema, rows)


def schema_of_avro_path(path: str):
    """Driver-side: sniff the Avro schema from the first file under
    ``path`` (header-only read — does not decode blocks)."""
    if os.path.isdir(path):
        cands = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".avro") and not f.startswith((".", "_"))
        )
        if not cands:
            raise AvroError(f"no .avro files under {path}")
        path = cands[0]
    with open(path, "rb") as fh:
        head = fh.read(1 << 20)  # header is tiny; 1 MiB covers any schema
    schema, _codec, _sync = _read_header(_Decoder(head))
    return schema


# ---------------------------------------------------------------------------
# single-datum codec (message payloads)


def decode_datum(schema, data: bytes):
    """Decode ONE schema'd Avro datum (no container framing) — the
    payload shape stream messages carry: a Pulsar message body under an
    Avro schema (streams/pulsar/schema.rs deserializes exactly this),
    or a Kafka value sans the 5-byte Confluent registry prefix."""
    names: dict = {}
    _register_named(schema, names)
    dec = _Decoder(data)
    value = _read_value(dec, schema, names)
    if not dec.at_end():
        raise AvroError(
            f"{len(dec.buf) - dec.pos} trailing bytes after datum "
            "(framed/container payload? use read_container)"
        )
    return value


def encode_datum(schema, value) -> bytes:
    """Encode ONE datum to its schema'd Avro bytes (fixture writer for
    message-payload tests — the sandbox has no Avro library)."""
    names: dict = {}
    _register_named(schema, names)
    enc = _Encoder()
    _write_value(enc, schema, value, names)
    return enc.getvalue()
