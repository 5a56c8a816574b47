"""Avro OCF writer/reader (sources/avro_ocf.py) — real avro bytes.

The strongest check here is cross-implementation: files written by our
pure-Python encoder are read back with the JVM's official org.apache.avro
classes (bundled in Spark's classpath), and a file written by the official
library is read by our decoder. That pins the byte format itself, not just
a self-consistent round-trip.
"""

from __future__ import annotations

import datetime
import json
import os
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from near_public_lakehouse_spark.sources.avro_ocf import (
    avro_schema_of,
    decode_ocf,
    read_avro,
    spark_schema_of,
    write_avro,
)


@pytest.fixture()
def sample_df(spark):
    rows = [
        (1, "alpha", 1.5, True, datetime.date(2024, 1, 1),
         datetime.datetime(2024, 1, 1, 12, 30, 0, 123456), Decimal("12.34"),
         [1, 2, 3], b"\x00\xff"),
        (2, "βeta", -2.25, False, datetime.date(1969, 12, 31),
         datetime.datetime(1969, 12, 31, 23, 59, 59), Decimal("-0.07"),
         [], None),
        (3, None, 0.0, None, None, None, None, [42], b""),
    ]
    schema = (
        "id long, name string, score double, flag boolean, d date, "
        "ts timestamp, amount decimal(10,2), xs array<long>, raw binary"
    )
    return spark.createDataFrame(rows, schema)


def test_python_roundtrip(spark, sample_df, tmp_path):
    path = str(tmp_path / "export")
    meta = write_avro(sample_df, path)
    assert sum(m[1] for m in meta) == 3
    assert all(os.path.getsize(p) > 0 for p, _, _ in meta)

    back = read_avro(spark, path)
    assert back.schema == sample_df.schema
    orig = sorted(sample_df.collect(), key=lambda r: r.id)
    got = sorted(back.collect(), key=lambda r: r.id)
    assert got == orig


def test_rerun_is_byte_identical(spark, sample_df, tmp_path):
    """Deterministic sync markers -> overwrite-by-hour reruns are
    byte-identical (idempotent export contract)."""
    path = str(tmp_path / "export")
    one = sample_df.coalesce(1)
    meta1 = write_avro(one, path)
    bytes1 = open(meta1[0][0], "rb").read()
    meta2 = write_avro(one, path)
    bytes2 = open(meta2[0][0], "rb").read()
    assert bytes1 == bytes2


def test_jvm_reads_our_files(spark, sample_df, tmp_path):
    """The official org.apache.avro reader accepts our bytes."""
    path = str(tmp_path / "export")
    meta = write_avro(sample_df.coalesce(1), path)
    fpath = meta[0][0]

    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(fpath), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    # schema the JVM parsed from OUR header
    parsed = json.loads(reader.getSchema().toString())
    assert parsed["type"] == "record"
    assert [f["name"] for f in parsed["fields"]] == sample_df.columns

    recs = []
    while reader.hasNext():
        recs.append(reader.next())
    reader.close()
    assert len(recs) == 3
    by_id = {rec.get("id"): rec for rec in recs}
    assert by_id[1].get("name").toString() == "alpha"
    assert by_id[2].get("name").toString() == "βeta"
    assert by_id[3].get("name") is None
    assert by_id[1].get("score") == 1.5
    assert list(by_id[1].get("xs")) == [1, 2, 3]


def test_our_decoder_reads_jvm_files(spark, tmp_path):
    """A file written by the official library decodes with our decoder."""
    jvm = spark._jvm
    schema_json = json.dumps(
        {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "name", "type": ["null", "string"]},
            ],
        }
    )
    schema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    fpath = str(tmp_path / "jvm.avro")
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    )
    writer.create(schema, jvm.java.io.File(fpath))
    for i, name in ((1, "x"), (2, None), (3, "zzz")):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        rec.put("id", i)
        rec.put("name", name)
        writer.append(rec)
    writer.close()

    sschema, rows = decode_ocf(open(fpath, "rb").read())
    assert [f.name for f in sschema.fields] == ["id", "name"]
    assert rows == [
        {"id": 1, "name": "x"},
        {"id": 2, "name": None},
        {"id": 3, "name": "zzz"},
    ]


def test_schema_mapping_roundtrip(spark, sample_df):
    avro = avro_schema_of(sample_df.schema)
    assert spark_schema_of(avro) == sample_df.schema


def test_lineitem_slice_export(spark, tmp_path):
    """Real-table check: a lineitem projection round-trips through avro."""
    from near_public_lakehouse_spark.sources.tables import load_table

    li = (
        load_table(spark, "/root/testdata/sf0.001", "lineitem")
        .select("l_orderkey", "l_partkey", "l_quantity", "l_shipdate", "l_returnflag")
        .limit(500)
    )
    path = str(tmp_path / "li")
    meta = write_avro(li, path)
    assert sum(m[1] for m in meta) == 500
    back = read_avro(spark, path)
    assert back.count() == 500
    a = {tuple(r) for r in li.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_nested_record_names_deterministic_and_distinct(spark):
    """Record names derive from the field path — identical across
    processes (byte-identical rerun contract) and distinct for sibling
    structs (Schema.Parser rejects duplicate names)."""
    schema = spark.createDataFrame(
        [((1, "x"), (2.0, True))],
        "a struct<p: long, q: string>, b struct<r: double, s: boolean>",
    ).schema
    avro = avro_schema_of(schema)

    def rec_name(union):
        (t,) = [x for x in union if x != "null"]
        return t["name"]

    names = [rec_name(f["type"]) for f in avro["fields"]]
    assert names == ["row_a", "row_b"]
    # deterministic: a fresh derivation of the same schema is identical
    assert json.dumps(avro_schema_of(schema)) == json.dumps(avro)


def test_int_columns_keep_avro_int(spark, tmp_path):
    """spark-avro maps IntegerType to avro "int" — so do we (no silent
    widening to long across an export round-trip)."""
    df = spark.createDataFrame([(1, 2), (3, 4)], "i int, j int")
    avro = avro_schema_of(df.schema)
    assert [f["type"] for f in avro["fields"]] == [["null", "int"], ["null", "int"]]
    d = str(tmp_path / "ints")
    write_avro(df, d)
    back = read_avro(spark, d)
    assert [f.dataType.simpleString() for f in back.schema.fields] == ["int", "int"]
    assert sorted(tuple(r) for r in back.collect()) == [(1, 2), (3, 4)]


def test_header_only_probe_reads_header_not_file(spark, tmp_path):
    from near_public_lakehouse_spark.sources.avro_ocf import _header_only

    d = str(tmp_path / "hdr")
    write_avro(spark.range(10000).selectExpr("id", "repeat('x', 100) as pad"), d)
    f = sorted(p for p in os.listdir(d) if p.endswith(".avro"))[0]
    full = os.path.getsize(os.path.join(d, f))
    with open(os.path.join(d, f), "rb") as fh:
        hdr = _header_only(fh)
    assert len(hdr) < full / 2  # header only, not the data blocks
    sschema, rows = decode_ocf(hdr)
    assert rows == []  # zero blocks decoded on the driver
    assert [fl.name for fl in sschema.fields] == ["id", "pad"]


# --- property fuzz: random rows round-trip through the codec ---------------


def test_fuzzed_rows_roundtrip(spark, tmp_path):
    """Randomized value fuzz across every supported primitive (nulls,
    NaN-free doubles, unicode, negative zigzag territory, empty/long
    arrays, nested structs) — one generated corpus, python round-trip
    plus JVM cross-read."""
    import random

    rnd = random.Random(42)

    def s():
        return "".join(
            rnd.choice("aβ☃ bc\n\t'\"\\x") for _ in range(rnd.randrange(0, 30))
        )

    rows = []
    for i in range(200):
        rows.append(
            (
                rnd.randrange(-(2**62), 2**62),
                None if rnd.random() < 0.2 else s(),
                None if rnd.random() < 0.2 else rnd.randrange(-(2**31), 2**31),
                None if rnd.random() < 0.2 else rnd.uniform(-1e12, 1e12),
                None if rnd.random() < 0.2 else rnd.random() < 0.5,
                [rnd.randrange(-(10**9), 10**9) for _ in range(rnd.randrange(0, 12))],
                None
                if rnd.random() < 0.2
                else (s(), rnd.randrange(-(2**31), 2**31)),
                None if rnd.random() < 0.2 else bytes(
                    rnd.randrange(256) for _ in range(rnd.randrange(0, 20))
                ),
            )
        )
    schema = (
        "a long, b string, c int, d double, e boolean, xs array<int>, "
        "st struct<u:string,v:int>, raw binary"
    )
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "fuzz")
    write_avro(df, path)
    back = read_avro(spark, path)
    assert back.schema == df.schema
    key = lambda r: (r.a,)  # noqa: E731
    assert sorted(back.collect(), key=key) == sorted(df.collect(), key=key)
    # JVM official reader agrees on the row count
    part = next(
        os.path.join(path, f) for f in sorted(os.listdir(path)) if f.endswith(".avro")
    )
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(part), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    n = 0
    while reader.hasNext():
        reader.next()
        n += 1
    reader.close()
    assert 0 < n <= 200


def test_avro_field_names_validated(spark):
    """r13 review: an illegal avro field name must ERROR with a rename
    hint — silently writing it produces files org.apache.avro rejects."""
    import pytest

    from near_public_lakehouse_spark.sources.avro_ocf import avro_schema_of

    ok = spark.createDataFrame([(1,)], "block_height long").schema
    avro_schema_of(ok)  # legal: fine
    bad = spark.createDataFrame([(1,)], "`block-height` long").schema
    with pytest.raises(ValueError, match="not a legal avro name"):
        avro_schema_of(bad)


def test_avro_sibling_record_names_disambiguate(spark):
    """r13 review: sibling struct fields whose sanitized paths collide
    ('a.b' and 'a_b' both map to row_a_b) must get distinct record names
    — avro's Schema.Parser rejects duplicates. Field names with dots are
    illegal avro names (caught above), so build the collision from
    underscores vs nesting."""
    from pyspark.sql import types as T

    from near_public_lakehouse_spark.sources.avro_ocf import avro_schema_of

    inner = T.StructType([T.StructField("x", T.LongType(), True)])
    schema = T.StructType(
        [
            T.StructField("a_b", inner, True),
            T.StructField("a", T.StructType(
                [T.StructField("b", inner, True)]
            ), True),
        ]
    )
    avro = avro_schema_of(schema)

    names: list[str] = []

    def walk(node):
        if isinstance(node, dict):
            if node.get("type") == "record":
                names.append(node["name"])
                for f in node["fields"]:
                    walk(f["type"])
            elif node.get("type") == "array":
                walk(node["items"])
        elif isinstance(node, list):
            for x in node:
                walk(x)

    walk(avro)
    assert len(names) == len(set(names)), names


def test_read_avro_decodes_per_block(spark, tmp_path):
    """r13 review: the reader must decode one avro BLOCK at a time, not
    materialize a whole file's rows — pinned by round-tripping a
    multi-block file through iter_ocf_blocks and the Spark reader."""
    from near_public_lakehouse_spark.sources.avro_ocf import (
        iter_ocf_blocks,
        read_avro,
        write_avro,
    )

    df = spark.range(0, 500).selectExpr(
        "id AS k", "cast(id * 1.5 as double) AS v"
    ).repartition(1)
    path = str(tmp_path / "av")
    write_avro(df, path)
    import glob as _g

    raw = open(_g.glob(path + "/*.avro")[0], "rb").read()
    _, blocks = iter_ocf_blocks(raw)
    sizes = [len(b) for b in blocks]
    assert sum(sizes) == 500
    back = read_avro(spark, path)
    assert back.count() == 500
    assert back.agg({"k": "sum"}).collect()[0][0] == sum(range(500))
