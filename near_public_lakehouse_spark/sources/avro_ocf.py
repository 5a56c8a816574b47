"""Avro Object Container File writer/reader — real avro bytes without the
spark-avro module.

The reference's hourly public exports are Avro (NEAR Public Datasets.py:
396-409, ``write.format("avro")``). This container's pyspark does not
bundle the external spark-avro DataSource, so rounds 1-3 fell back to
parquet with the same folder contract. This module closes the gap with a
from-scratch implementation of the Avro 1.x binary encoding + Object
Container File format (public spec: https://avro.apache.org/docs/ —
single-byte-level format, ~200 lines):

- **Writer**: one OCF file per partition via ``DataFrame.mapInArrow`` —
  executors serialize Arrow batches straight to avro blocks, nothing goes
  through the driver. Deflate codec (zlib, in the avro spec) by default.
- **Reader**: ``spark.read.format("binaryFile")`` lists + loads the files,
  a second ``mapInArrow`` stage decodes them back to rows — a distributed
  avro scan with Spark-native parallelism (one task per file; at 100 TB
  the same shape spark-avro itself uses).

Both ends are verified against the JVM's own org.apache.avro classes
(bundled with Spark) in tests/test_avro_ocf.py — files we write are read
by the official library and vice versa.

Type mapping (both directions):

  long/int/short/byte <-> long          double/float <-> double/float
  string <-> string                     binary <-> bytes
  boolean <-> boolean                   date <-> int/logicalType=date
  timestamp <-> long/logicalType=timestamp-micros
  decimal(p,s) <-> bytes/logicalType=decimal (big-endian unscaled)
  array<T> <-> array                    struct <-> record
  nullable column <-> union ["null", T]
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from collections.abc import Iterator
from decimal import Decimal
from hashlib import md5

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"
_EPOCH_ORDINAL = 719163  # datetime.date(1970, 1, 1).toordinal()

# ---------------------------------------------------------------------------
# binary encoding primitives


def _zigzag(n: int) -> bytes:
    """Avro long: zigzag-encoded variable-length integer."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_zigzag(buf: io.BytesIO) -> int:
    shift = 0
    u = 0
    while True:
        b = buf.read(1)[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _enc_bytes(b: bytes) -> bytes:
    return _zigzag(len(b)) + b


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_zigzag(buf))


# ---------------------------------------------------------------------------
# Spark schema <-> avro schema

_PRIMITIVES: dict[type, str] = {
    T.LongType: "long",
    # spark-avro (the reference's writer) maps Integer/Short/Byte to avro
    # "int" — match it so exported schemas don't silently widen to long.
    T.IntegerType: "int",
    T.ShortType: "int",
    T.ByteType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.StringType: "string",
    T.BinaryType: "bytes",
    T.BooleanType: "boolean",
}


def _avro_name(s: str) -> str:
    """Sanitize a field-path component into a legal avro name."""
    import re

    out = re.sub(r"[^A-Za-z0-9_]", "_", s)
    return out if out and not out[0].isdigit() else f"_{out}"


_AVRO_NAME_RE = None


def _require_avro_name(s: str) -> None:
    """Avro spec names match [A-Za-z_][A-Za-z0-9_]*. FIELD names must be
    preserved verbatim (they round-trip back into Spark column names), so
    an illegal one is an ERROR with a rename hint — silently writing it
    would produce files org.apache.avro's Schema.Parser rejects, breaking
    the JVM-compatibility contract (r13 review; spark-avro errors the
    same way)."""
    global _AVRO_NAME_RE
    if _AVRO_NAME_RE is None:
        import re

        _AVRO_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    if not _AVRO_NAME_RE.match(s):
        raise ValueError(
            f"column name {s!r} is not a legal avro name "
            "([A-Za-z_][A-Za-z0-9_]*); rename it before export "
            "(df.withColumnRenamed)"
        )


def avro_schema_of(
    schema: T.StructType, name: str = "row", _seen: set[str] | None = None
) -> dict:
    """Spark StructType -> avro record schema (JSON-able dict).

    Nested record names derive from the FIELD PATH (``row_a_b``), which is
    deterministic across processes/reruns (the idempotent-export contract
    needs byte-identical rewrites). Sibling fields whose sanitized paths
    collide (``a.b`` vs ``a_b`` both map to ``row_a_b``) are disambiguated
    with a deterministic numeric suffix — avro's Schema.Parser rejects
    duplicate record names (r13 review). Field names themselves must be
    legal avro names and are validated, not rewritten."""

    def field_type(dt: T.DataType, path: str) -> object:
        if type(dt) in _PRIMITIVES:
            return _PRIMITIVES[type(dt)]
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DecimalType):
            return {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": dt.precision,
                "scale": dt.scale,
            }
        if isinstance(dt, T.ArrayType):
            item = field_type(dt.elementType, f"{path}_item")
            if dt.containsNull:
                item = ["null", item]
            return {"type": "array", "items": item}
        if isinstance(dt, T.StructType):
            rec = path
            if rec in seen:
                i = 2
                while f"{rec}_{i}" in seen:
                    i += 1
                rec = f"{rec}_{i}"
            seen.add(rec)
            return avro_schema_of(dt, name=rec, _seen=seen)
        raise TypeError(f"no avro mapping for Spark type {dt}")

    seen = _seen if _seen is not None else {name}
    fields = []
    for f in schema.fields:
        _require_avro_name(f.name)
        ft = field_type(f.dataType, f"{name}_{_avro_name(f.name)}")
        fields.append(
            {"name": f.name, "type": ["null", ft] if f.nullable else ft}
        )
    return {"type": "record", "name": name, "fields": fields}


def spark_schema_of(avro: dict) -> T.StructType:
    """Avro record schema -> Spark StructType (inverse of avro_schema_of)."""

    def data_type(ft) -> tuple[T.DataType, bool]:
        nullable = False
        if isinstance(ft, list):  # union — only ["null", X] supported
            non_null = [x for x in ft if x != "null"]
            if len(non_null) != 1:
                raise TypeError(f"unsupported avro union {ft}")
            nullable = len(non_null) != len(ft)
            ft = non_null[0]
        if isinstance(ft, str):
            prim = {
                "long": T.LongType(),
                "int": T.IntegerType(),
                "double": T.DoubleType(),
                "float": T.FloatType(),
                "string": T.StringType(),
                "bytes": T.BinaryType(),
                "boolean": T.BooleanType(),
            }
            return prim[ft], nullable
        lt = ft.get("logicalType")
        if lt == "date":
            return T.DateType(), nullable
        if lt == "timestamp-micros":
            return T.TimestampType(), nullable
        if lt == "decimal":
            return T.DecimalType(ft["precision"], ft["scale"]), nullable
        if ft["type"] == "array":
            item_dt, item_null = data_type(ft["items"])
            return T.ArrayType(item_dt, containsNull=item_null), nullable
        if ft["type"] == "record":
            inner_fields = []
            for f in ft["fields"]:
                fdt, fnull = data_type(f["type"])
                inner_fields.append(T.StructField(f["name"], fdt, fnull))
            return T.StructType(inner_fields), nullable
        raise TypeError(f"unsupported avro type {ft}")

    out = []
    for f in avro["fields"]:
        dt, nullable = data_type(f["type"])  # once per field (r13 review)
        out.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(out)


# ---------------------------------------------------------------------------
# value encoders (python-native values, as produced by Arrow .to_pylist())


def _encoder_for(dt: T.DataType):
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return lambda v: _zigzag(int(v))
    if isinstance(dt, T.DoubleType):
        return lambda v: struct.pack("<d", float(v))
    if isinstance(dt, T.FloatType):
        return lambda v: struct.pack("<f", float(v))
    if isinstance(dt, T.StringType):
        return lambda v: _enc_bytes(v.encode("utf-8"))
    if isinstance(dt, T.BinaryType):
        return lambda v: _enc_bytes(bytes(v))
    if isinstance(dt, T.BooleanType):
        return lambda v: b"\x01" if v else b"\x00"
    if isinstance(dt, T.DateType):
        return lambda v: _zigzag(v.toordinal() - _EPOCH_ORDINAL)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # Arrow to_pylist yields tz-naive datetimes already in UTC (session
        # zone is pinned); round-trip through micros-since-epoch.
        import calendar

        def enc_ts(v):
            us = calendar.timegm(v.timetuple()) * 1_000_000 + v.microsecond
            return _zigzag(us)

        return enc_ts
    if isinstance(dt, T.DecimalType):
        scale = dt.scale

        def enc_dec(v: Decimal):
            unscaled = int(v.scaleb(scale).to_integral_value())
            n = max(1, (unscaled.bit_length() + 8) // 8)
            return _enc_bytes(unscaled.to_bytes(n, "big", signed=True))

        return enc_dec
    if isinstance(dt, T.ArrayType):
        item = _encoder_for(dt.elementType)
        if dt.containsNull:
            base = item
            item = lambda v: (b"\x00" if v is None else b"\x02" + base(v))  # noqa: E731

        def enc_arr(v):
            if not len(v):
                return b"\x00"
            return _zigzag(len(v)) + b"".join(item(x) for x in v) + b"\x00"

        return enc_arr
    if isinstance(dt, T.StructType):
        encs = [(f.name, _field_encoder(f)) for f in dt.fields]

        def enc_rec(v):
            # Arrow to_pylist yields dicts for structs
            return b"".join(e(v[name]) for name, e in encs)

        return enc_rec
    raise TypeError(f"no avro encoder for {dt}")


def _field_encoder(f: T.StructField):
    enc = _encoder_for(f.dataType)
    if not f.nullable:
        return enc
    # union ["null", T]: branch index 0 = null, 1 = value
    return lambda v: b"\x00" if v is None else b"\x02" + enc(v)


# ---------------------------------------------------------------------------
# value decoders


def _decoder_for(dt: T.DataType):
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return _read_zigzag
    if isinstance(dt, T.DoubleType):
        return lambda buf: struct.unpack("<d", buf.read(8))[0]
    if isinstance(dt, T.FloatType):
        return lambda buf: struct.unpack("<f", buf.read(4))[0]
    if isinstance(dt, T.StringType):
        return lambda buf: _read_bytes(buf).decode("utf-8")
    if isinstance(dt, T.BinaryType):
        return _read_bytes
    if isinstance(dt, T.BooleanType):
        return lambda buf: buf.read(1) == b"\x01"
    if isinstance(dt, T.DateType):
        from datetime import date

        return lambda buf: date.fromordinal(_EPOCH_ORDINAL + _read_zigzag(buf))
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        from datetime import datetime, timedelta

        epoch = datetime(1970, 1, 1)
        return lambda buf: epoch + timedelta(microseconds=_read_zigzag(buf))
    if isinstance(dt, T.DecimalType):
        scale = dt.scale

        def dec_dec(buf):
            raw = _read_bytes(buf)
            return Decimal(int.from_bytes(raw, "big", signed=True)).scaleb(-scale)

        return dec_dec
    if isinstance(dt, T.ArrayType):
        item = _decoder_for(dt.elementType)
        if dt.containsNull:
            base = item
            item = lambda buf: (None if _read_zigzag(buf) == 0 else base(buf))  # noqa: E731

        def dec_arr(buf):
            out = []
            while True:
                n = _read_zigzag(buf)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix
                    n = -n
                    _read_zigzag(buf)
                out.extend(item(buf) for _ in range(n))

        return dec_arr
    if isinstance(dt, T.StructType):
        decs = [_field_decoder(f) for f in dt.fields]
        names = [f.name for f in dt.fields]
        return lambda buf: {n: d(buf) for n, d in zip(names, decs)}
    raise TypeError(f"no avro decoder for {dt}")


def _field_decoder(f: T.StructField):
    dec = _decoder_for(f.dataType)
    if not f.nullable:
        return dec
    return lambda buf: None if _read_zigzag(buf) == 0 else dec(buf)


# ---------------------------------------------------------------------------
# Object Container File framing


def _write_ocf(out, schema_json: str, field_encoders, rows, sync: bytes, codec: str,
               block_rows: int = 4096) -> int:
    """Stream rows into an OCF; returns row count. `rows` yields tuples."""
    meta = {
        "avro.schema": schema_json.encode(),
        "avro.codec": codec.encode(),
    }
    out.write(MAGIC)
    out.write(_zigzag(len(meta)))
    for k, v in meta.items():
        out.write(_enc_bytes(k.encode()))
        out.write(_enc_bytes(v))
    out.write(b"\x00")
    out.write(sync)

    n_total = 0
    block: list[bytes] = []

    def flush():
        nonlocal n_total
        if not block:
            return
        data = b"".join(block)
        if codec == "deflate":
            data = zlib.compress(data)[2:-4]  # raw deflate per avro spec
        out.write(_zigzag(len(block)))
        out.write(_zigzag(len(data)))
        out.write(data)
        out.write(sync)
        n_total += len(block)
        block.clear()

    for row in rows:
        block.append(b"".join(enc(v) for enc, v in zip(field_encoders, row)))
        if len(block) >= block_rows:
            flush()
    flush()
    return n_total


def iter_ocf_blocks(raw: bytes):
    """(spark schema, block iterator): each yielded item is ONE avro
    block's row dicts — the bounded-memory decode unit (r13 review:
    decoding a whole multi-GB file into one Python list OOMed where the
    format's own block structure already bounds working set)."""
    buf = io.BytesIO(raw)
    if buf.read(4) != MAGIC:
        raise ValueError("not an avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_zigzag(buf)
        if n == 0:
            break
        if n < 0:  # block with byte-size
            n = -n
            _read_zigzag(buf)
        for _ in range(n):
            k = _read_bytes(buf).decode()
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sschema = spark_schema_of(schema)
    decs = [_field_decoder(f) for f in sschema.fields]
    names = [f.name for f in sschema.fields]

    def blocks():
        while True:
            head = buf.read(1)
            if not head:
                break
            buf.seek(-1, 1)
            count = _read_zigzag(buf)
            size = _read_zigzag(buf)
            data = buf.read(size)
            if codec == "deflate":
                data = zlib.decompress(data, -15)
            elif codec != "null":
                raise ValueError(f"unsupported avro codec {codec!r}")
            bbuf = io.BytesIO(data)
            block = [
                {n: d(bbuf) for n, d in zip(names, decs)} for _ in range(count)
            ]
            if buf.read(16) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")
            yield block

    return sschema, blocks()


def decode_ocf(raw: bytes) -> tuple[T.StructType, list[dict]]:
    """Decode one OCF byte string -> (spark schema, row dicts). Whole-file
    convenience over `iter_ocf_blocks` — use the iterator form where the
    file can be large."""
    sschema, blocks = iter_ocf_blocks(raw)
    rows: list[dict] = []
    for block in blocks:
        rows.extend(block)
    return sschema, rows


# ---------------------------------------------------------------------------
# distributed writer / reader

_META_SCHEMA = "path string, n_rows long, n_bytes long"


def write_avro(df: DataFrame, path: str, codec: str = "deflate") -> list[tuple]:
    """Write `df` as avro OCF files, one per partition, under `path`.

    Executed distributed via mapInArrow: each task serializes its Arrow
    batches directly — the driver only collects (path, n_rows, n_bytes)
    per file. Files land on a filesystem path visible to the executors
    (local[*] here; a shared/object-store mount on a real cluster — the
    same constraint any file sink has without a Hadoop FS connector).

    Sync markers are deterministic (md5 of path + partition id), which
    keeps reruns byte-identical — the hourly export contract is
    overwrite-by-hour idempotence (operators/export.py).
    """
    schema = df.schema
    avro = avro_schema_of(schema)
    schema_json = json.dumps(avro)
    encoders = [_field_encoder(f) for f in schema.fields]
    os.makedirs(path, exist_ok=True)
    for old in os.listdir(path):
        if old.endswith(".avro"):
            os.unlink(os.path.join(path, old))

    def write_partition(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        sync = md5(f"{path}|{pid}".encode()).digest()
        n = 0
        with open(fname, "wb") as out:
            def rows():
                nonlocal_batches = batches
                for batch in nonlocal_batches:
                    cols = [c.to_pylist() for c in batch.columns]
                    yield from zip(*cols) if cols else iter(())

            n = _write_ocf(out, schema_json, encoders, rows(), sync, codec)
        size = os.path.getsize(fname)
        yield pa.RecordBatch.from_pylist(
            [{"path": fname, "n_rows": n, "n_bytes": size}]
        )

    meta = df.mapInArrow(write_partition, _META_SCHEMA).collect()
    return [(r.path, r.n_rows, r.n_bytes) for r in meta]


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Distributed avro OCF scan: binaryFile source lists/loads the files
    (one task per file — spark-avro's own parallelism shape), a mapInArrow
    stage decodes. Schema comes from the first file's header (one tiny
    driver-side read, like any self-describing format's footer probe)."""
    files = sorted(
        f for f in os.listdir(path) if f.endswith(".avro")
    )
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    with open(os.path.join(path, files[0]), "rb") as fh:
        schema, _ = decode_ocf(_header_only(fh))

    binary = spark.read.format("binaryFile").load(
        os.path.join(path, "*.avro")
    ).select("content")

    def decode_partition(batches):
        import pyarrow as pa

        arrow_schema = pa.schema(
            [(f.name, _arrow_type(f.dataType)) for f in schema.fields]
        )
        for batch in batches:
            for raw in batch.column(0).to_pylist():
                _, blocks = iter_ocf_blocks(raw)
                for rows in blocks:  # bounded: one avro block at a time
                    if rows:
                        yield pa.RecordBatch.from_pylist(
                            rows, schema=arrow_schema
                        )

    return binary.mapInArrow(decode_partition, schema)


def _header_only(fh) -> bytes:
    """Read EXACTLY the OCF header (magic + metadata map + sync marker) and
    stop before the first data block, so the driver-side schema probe is
    O(header bytes) — never O(file): decode_ocf on the result sees zero
    blocks. The zigzag/bytes readers only need ``.read``, so they work on
    the file handle directly."""
    start = fh.tell()
    if fh.read(4) != MAGIC:
        raise ValueError("not an avro object container file")
    while True:
        n = _read_zigzag(fh)
        if n == 0:
            break
        if n < 0:  # block with byte-size prefix
            n = -n
            _read_zigzag(fh)
        for _ in range(n):
            _read_bytes(fh)  # key
            _read_bytes(fh)  # value
    fh.read(16)  # sync marker
    end = fh.tell()
    fh.seek(start)
    return fh.read(end - start)


def _arrow_type(dt: T.DataType):
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_type

    return to_arrow_type(dt)
