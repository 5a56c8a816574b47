"""Regression tests for the r14 versioned-store / delta-reader review
findings: vacuum vs in-flight commits, SCD2 bucket-count validation,
null-safe IN and timestamp pruning, URI-encoded path identity, and the
tail drained-contract."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from near_public_lakehouse_spark.operators import versioned as V


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


# --- vacuum vs in-flight commits --------------------------------------------


def test_vacuum_spares_young_unreferenced_commit_dirs(spark, tmp_path):
    """r14 review: an unreferenced data dir is indistinguishable from a
    concurrent writer's in-flight commit; deleting it corrupts the
    version that writer publishes next. Young orphans survive the
    default vacuum; min_age_seconds=0 restores the old crash-cleanup."""
    t = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a")]), t)
    V.commit_overwrite(_df(spark, [(2, "b")]), t)

    # simulate an in-flight commit: data written, manifest not yet linked
    inflight = os.path.join(t, "data", "deadbeef" * 4)
    os.makedirs(inflight)
    with open(os.path.join(inflight, "part-0.parquet"), "w") as fh:
        fh.write("x")

    removed = V.vacuum(t, retain_last=1)
    # the OLD version's files still vacuum (age-exempt: a manifest
    # references them), the young orphan survives
    assert removed and os.path.isdir(inflight)
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, t, 0)
    assert sorted((r.k, r.v) for r in V.read_version(spark, t).collect()) == [(2, "b")]

    removed2 = V.vacuum(t, retain_last=1, min_age_seconds=0)
    assert not os.path.isdir(inflight)
    assert any("deadbeef" in f for f in removed2)


# --- SCD2 bucket-count validation -------------------------------------------


def test_versioned_scd2_survives_bucket_count_change(spark, tmp_path):
    """r14 review: pruning with a different modulus than the stored
    layout silently produced two conflicting current rows per key. A
    mismatched (or unrecorded) count must take the full-rewrite
    migration path and stay correct."""
    t = str(tmp_path / "dim")
    V.versioned_scd2(
        spark,
        t,
        spark.createDataFrame(
            [(k, "a", 10) for k in range(20)], "k int, v string, seq int"
        ),
        ["k"],
        "seq",
        n_buckets=8,
    )
    assert V._read_manifest(t, 0)["meta"]["scd2_n_buckets"] == 8
    # apply under a DIFFERENT bucket count: migration, not corruption
    V.versioned_scd2(
        spark,
        t,
        spark.createDataFrame([(3, "b", 20)], "k int, v string, seq int"),
        ["k"],
        "seq",
        n_buckets=4,
    )
    cur = V.read_version(spark, t).filter(F.col("__scd_current__"))
    per_key = {r.k: r.v for r in cur.collect()}
    assert len(per_key) == 20 and per_key[3] == "b"
    assert cur.count() == 20  # exactly ONE current row per key
    assert V._read_manifest(t, 1)["meta"]["scd2_n_buckets"] == 4
    # matched count resumes the pruned path and stays correct
    V.versioned_scd2(
        spark,
        t,
        spark.createDataFrame([(5, "c", 30)], "k int, v string, seq int"),
        ["k"],
        "seq",
        n_buckets=4,
    )
    cur = V.read_version(spark, t).filter(F.col("__scd_current__"))
    assert cur.count() == 20
    assert {r.v for r in cur.filter(F.col("k") == 5).collect()} == {"c"}


# --- delta reader pruning ---------------------------------------------------


def _snap(files):
    from near_public_lakehouse_spark.operators.delta_reader import DeltaSnapshot

    schema = {
        "type": "struct",
        "fields": [
            {"name": "c", "type": "string", "nullable": True, "metadata": {}},
            {"name": "ts", "type": "timestamp", "nullable": True, "metadata": {}},
        ],
    }
    return DeltaSnapshot(
        version=0, schema=schema, partition_columns=[], files=files
    )


def test_null_safe_in_pruning_consults_null_count(tmp_path):
    """r14 review: a None member was stripped before the stats check, so
    a file with NULL rows (bounds can't see them) was pruned, and a
    [None]-only list pruned EVERY file vacuously."""
    from near_public_lakehouse_spark.operators.delta_reader import (
        prune_snapshot_files,
    )

    def add(lo, hi, nulls):
        st = {"numRecords": 5, "minValues": {"c": lo}, "maxValues": {"c": hi}}
        if nulls is not None:
            st["nullCount"] = {"c": nulls}
        return {"path": "p", "partitionValues": {}, "stats": json.dumps(st)}

    has_nulls = _snap({"a.parquet": add("archived", "archived", 2)})
    no_nulls = _snap({"b.parquet": add("archived", "archived", 0)})
    unknown = _snap({"c.parquet": add("archived", "archived", None)})

    w = [("c", "in", [None, "active"])]
    assert prune_snapshot_files(has_nulls, w).paths == {"a.parquet"}  # kept
    assert prune_snapshot_files(no_nulls, w).paths == set()  # provably empty
    assert prune_snapshot_files(unknown, w).paths == {"c.parquet"}  # kept

    only_null = [("c", "in", [None])]
    assert prune_snapshot_files(has_nulls, only_null).paths == {"a.parquet"}
    assert prune_snapshot_files(no_nulls, only_null).paths == set()

    empty_in = [("c", "in", [])]  # matches nothing: pruning all is correct
    assert prune_snapshot_files(has_nulls, empty_in).paths == set()


def test_timestamp_pruning_is_chronological_not_lexicographic(tmp_path):
    """r14 review: compliant writers emit '...T12:00:00.000Z' stats; the
    plain string compare pruned a file whose min EQUALS the query."""
    from near_public_lakehouse_spark.operators.delta_reader import (
        prune_snapshot_files,
    )

    st = {
        "numRecords": 5,
        "minValues": {"ts": "2021-06-01T12:00:00.000Z"},
        "maxValues": {"ts": "2021-06-01T13:00:00.000Z"},
    }
    snap = _snap(
        {"a.parquet": {"path": "p", "partitionValues": {}, "stats": json.dumps(st)}}
    )
    keep = prune_snapshot_files(snap, [("ts", "=", "2021-06-01T12:00:00")])
    assert keep.paths == {"a.parquet"}
    gone = prune_snapshot_files(snap, [("ts", "<", "2021-06-01T12:00:00")])
    assert gone.paths == set()
    also_kept = prune_snapshot_files(snap, [("ts", ">=", "2021-06-01 13:00:00")])
    assert also_kept.paths == {"a.parquet"}


def test_dv_filter_survives_spaces_in_table_path(spark, tmp_path):
    """r14 review: _metadata.file_path is a URI (%20 for spaces) while DV
    pairs use raw abspath — on a spaced path the anti-join matched
    nothing and deleted rows resurrected."""
    from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader

    from tests.test_delta_reader import _dv_file, _ser64

    d = str(tmp_path / "dv table")  # note the space
    os.makedirs(os.path.join(d, "_delta_log"))
    spark.createDataFrame(
        [(i, f"r{i}") for i in range(6)], "k long, v string"
    ).coalesce(1).write.parquet(d + "/data")
    part = [f for f in os.listdir(d + "/data") if f.endswith(".parquet")][0]
    os.rename(os.path.join(d, "data", part), os.path.join(d, "part-0.parquet"))
    dv = _dv_file(
        d, _ser64({1, 3}), "00112233-4455-6677-8899-aabbccddeeff", prefix="ab"
    )
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "string", "nullable": True, "metadata": {}},
    ]}
    actions = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "t-dv-sp", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema), "partitionColumns": [],
                      "configuration": {"delta.enableDeletionVectors": "true"},
                      "createdTime": 0}},
        {"add": {"path": "part-0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "stats": json.dumps({"numRecords": 6}),
                 "deletionVector": dv}},
    ]
    with open(os.path.join(d, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")

    df = DeltaLogReader(d).to_df(spark)
    assert {x.k for x in df.collect()} == {0, 2, 4, 5}


def test_partition_reconstruction_survives_spaces_in_path(spark, tmp_path):
    """Same URI-vs-raw identity bug on the partition-value left join:
    every reconstituted partition column came back NULL."""
    from near_public_lakehouse_spark.operators.delta_export import (
        sync_delta_log_from_dir,
    )
    from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader

    d = str(tmp_path / "pt table")
    df = spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d2")], "id long, v string, day string"
    )
    df.write.partitionBy("day").parquet(d)
    assert sync_delta_log_from_dir(d, df.schema.json(), partition_columns=["day"]) == 0
    out = DeltaLogReader(d).to_df(spark)
    assert sorted((r.id, r.day) for r in out.collect()) == [(1, "d1"), (2, "d2")]


# --- tail drained contract --------------------------------------------------


def test_tail_until_drained_returns_empty_when_already_drained(spark, tmp_path):
    s, t = (str(tmp_path / n) for n in ("src", "dst"))
    V.commit_overwrite(_df(spark, [(1, "a")]), s)
    first = V.tail_until_drained(spark, s, t)
    assert len(first) == 1
    again = V.tail_until_drained(spark, s, t)
    assert again == []  # r14 review: used to return [<no-op dict>]
