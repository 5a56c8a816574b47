"""Structural conformance of the `_delta_log` export against the public
Delta transaction-log protocol (delta-io PROTOCOL.md).

This container ships no delta-spark jar, no duckdb-delta extension and no
network, so an external reader cannot run here; these tests instead pin
the exact on-disk structure such a reader consumes: commit naming, action
shapes and ordering, snapshot replay equivalence with the manifest store,
schemaString round-trip, stats fidelity, dataChange semantics, and
byte-identical re-export.
"""

from __future__ import annotations

import json
import os

import pytest

from near_public_lakehouse_spark.operators.delta_export import (
    read_delta_snapshot,
    write_delta_log,
)
from near_public_lakehouse_spark.operators import versioned as V


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def table(spark, tmp_path):
    """A versioned table with appends, an upsert, a compaction and an
    idempotent-txn write — every manifest feature the exporter maps."""
    d = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a"), (2, "b")]), d)
    V.commit_append(_df(spark, [(3, "c")]), d)
    V.versioned_upsert(spark, d, _df(spark, [(2, "B"), (4, "d")]), ["k"])
    V.commit_compact(spark, d, target_files=1)
    return d


def test_commit_files_follow_protocol_naming(table):
    write_delta_log(table)
    log = os.path.join(table, "_delta_log")
    names = sorted(n for n in os.listdir(log) if n.endswith(".json"))
    assert names == [f"{v:020d}.json" for v in V._versions(table)]
    assert all(len(n) == 25 for n in names)  # 20 digits + ".json"


def test_commit_zero_declares_protocol_then_metadata(table):
    write_delta_log(table)
    with open(os.path.join(table, "_delta_log", f"{0:020d}.json")) as fh:
        actions = [json.loads(line) for line in fh if line.strip()]
    assert "protocol" in actions[0]
    assert actions[0]["protocol"] == {"minReaderVersion": 1, "minWriterVersion": 2}
    assert "metaData" in actions[1]
    md = actions[1]["metaData"]
    assert md["format"] == {"provider": "parquet", "options": {}}
    assert md["partitionColumns"] == []
    assert md["id"]  # stable table id
    # every remaining action in commit 0 is an add with the required keys
    for a in actions[2:]:
        assert set(a) == {"add"}
        assert {"path", "partitionValues", "size", "modificationTime", "dataChange"} <= set(
            a["add"]
        )


def test_snapshot_replay_matches_manifest_at_every_version(table):
    write_delta_log(table)
    for v in V._versions(table):
        snap = read_delta_snapshot(table, v)
        assert snap["files"] == set(V.files_for_version(table, v)), f"version {v}"


def test_schema_string_roundtrips_as_spark_struct(spark, table):
    from pyspark.sql.types import StructType

    write_delta_log(table)
    snap = read_delta_snapshot(table)
    st = StructType.fromJson(json.loads(snap["schema"]))
    assert st == V.read_version(spark, table).schema


def test_add_stats_carry_num_records(spark, table):
    write_delta_log(table)
    total = 0
    with open(os.path.join(table, "_delta_log", f"{0:020d}.json")) as fh:
        for line in fh:
            a = json.loads(line)
            if "add" in a and "stats" in a["add"]:
                stats = json.loads(a["add"]["stats"])
                assert stats["numRecords"] >= 0
                total += stats["numRecords"]
    assert total == 2  # v0 wrote 2 rows


def test_compaction_commit_is_data_change_false(table):
    write_delta_log(table)
    compact_v = V._versions(table)[-1]  # fixture compacts last
    with open(os.path.join(table, "_delta_log", f"{compact_v:020d}.json")) as fh:
        actions = [json.loads(line) for line in fh if line.strip()]
    flags = [
        a["add"]["dataChange"] if "add" in a else a["remove"]["dataChange"]
        for a in actions
        if "add" in a or "remove" in a
    ]
    assert flags and not any(flags)


def test_txn_actions_surface_idempotent_writers(spark, tmp_path):
    d = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a")]), d)
    assert V.idempotent_batch_sink(d, "loader")(_df(spark, [(2, "b")]), 7)
    v = V.latest_version(d)
    write_delta_log(d)
    with open(os.path.join(d, "_delta_log", f"{v:020d}.json")) as fh:
        actions = [json.loads(line) for line in fh if line.strip()]
    txns = [a["txn"] for a in actions if "txn" in a]
    assert {"appId": "loader", "version": 7} == {
        k: txns[0][k] for k in ("appId", "version")
    }


def test_reexport_is_byte_identical(table):
    paths = write_delta_log(table)
    before = {p: open(p, "rb").read() for p in paths}
    write_delta_log(table)
    after = {p: open(p, "rb").read() for p in paths}
    assert before == after


def test_external_reader_data_access_shape(spark, table):
    """Simulate the data half of an external reader: scan exactly the
    snapshot's add-file set with a plain parquet reader and compare rows
    against the manifest store's own read."""
    write_delta_log(table)
    snap = read_delta_snapshot(table)
    df = spark.read.parquet(*(os.path.join(table, f) for f in sorted(snap["files"])))
    ours = {tuple(r) for r in V.read_version(spark, table).collect()}
    theirs = {tuple(r) for r in df.collect()}
    assert ours == theirs


def test_scd2_bucketed_table_exports_cleanly(spark, tmp_path):
    """The newest commit shape (bucketed SCD2 with carried-over files)
    exports and replays like any other."""
    d = str(tmp_path / "dim")
    V.versioned_scd2(
        spark,
        d,
        _df(spark, [(i, "a", 10) for i in range(16)], "k int, v string, seq int"),
        ["k"],
        "seq",
        n_buckets=4,
    )
    V.versioned_scd2(
        spark,
        d,
        _df(spark, [(1, "b", 20)], "k int, v string, seq int"),
        ["k"],
        "seq",
        n_buckets=4,
    )
    write_delta_log(d)
    for v in V._versions(d):
        assert read_delta_snapshot(d, v)["files"] == set(V.files_for_version(d, v))
