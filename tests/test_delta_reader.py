"""Round-trip validation of the Delta export through the INDEPENDENT
pure-Python reader (operators/delta_reader.py) — the closest thing to an
external byte-validation the container allows (VERDICT r5 task #5):
export -> from-scratch PROTOCOL.md replay -> same file set, same schema,
same rows as the versioned manifest store, at EVERY version.
"""

from __future__ import annotations

import json
import os

import pytest

from near_public_lakehouse_spark.operators import versioned as V
from near_public_lakehouse_spark.operators.delta_export import write_delta_log
from near_public_lakehouse_spark.operators.delta_reader import (
    DeltaLogReader,
    DeltaProtocolError,
)


def _df(spark, rows, schema="k int, v string"):
    return spark.createDataFrame(rows, schema)


@pytest.fixture()
def table(spark, tmp_path):
    """Versioned table exercising append, upsert, compaction and an
    idempotent txn — the same surface the exporter maps."""
    d = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a"), (2, "b")]), d)
    V.commit_append(_df(spark, [(3, "c")]), d)
    V.versioned_upsert(spark, d, _df(spark, [(2, "B"), (4, "d")]), ["k"])
    V.commit_compact(spark, d, target_files=1)
    write_delta_log(d)
    return d


def test_every_version_round_trips_files_and_schema(table):
    r = DeltaLogReader(table)
    assert r.versions == V._versions(table)
    for v in r.versions:
        snap = r.snapshot(v)
        manifest = V._read_manifest(table, v)
        assert snap.paths == set(manifest["files"]), f"version {v}"
        # schemaString is Spark's own schema JSON — compare parsed forms
        assert snap.schema == json.loads(manifest["schema"]), f"version {v}"


def test_every_version_round_trips_rows(spark, table):
    r = DeltaLogReader(table)
    for v in r.versions:
        via_reader = {tuple(x) for x in r.to_df(spark, v).collect()}
        via_store = {tuple(x) for x in V.read_version(spark, table, version=v).collect()}
        assert via_reader == via_store, f"version {v}"


def test_stats_sum_matches_row_count(spark, table):
    r = DeltaLogReader(table)
    snap = r.snapshot()
    n = snap.num_records()
    assert n is not None
    assert n == V.read_version(spark, table).count()


def test_txn_actions_round_trip(spark, tmp_path):
    d = str(tmp_path / "t")
    sink = V.idempotent_batch_sink(d, app_id="loader")
    sink(_df(spark, [(1, "a")]), 7)
    write_delta_log(d)
    snap = DeltaLogReader(d).snapshot()
    assert snap.txns == {"loader": 7}


def test_reader_is_strict_about_protocol(spark, tmp_path, table):
    # a log demanding reader features we lack must refuse, not misread
    log = os.path.join(table, "_delta_log")
    with open(os.path.join(log, f"{0:020d}.json")) as fh:
        lines = fh.readlines()
    bumped = [
        json.dumps({"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}})
        + "\n"
    ] + lines[1:]
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.writelines(bumped)
    with pytest.raises(DeltaProtocolError, match="reader version"):
        DeltaLogReader(table).snapshot()


def test_reader_rejects_gapped_logs(table):
    log = os.path.join(table, "_delta_log")
    versions = sorted(n for n in os.listdir(log) if n.endswith(".json"))
    assert len(versions) >= 3
    os.remove(os.path.join(log, versions[1]))
    with pytest.raises(DeltaProtocolError, match="contiguous"):
        DeltaLogReader(table)


def test_reader_rejects_unknown_actions(table):
    log = os.path.join(table, "_delta_log")
    last = sorted(n for n in os.listdir(log) if n.endswith(".json"))[-1]
    with open(os.path.join(log, last), "a") as fh:
        fh.write(json.dumps({"mystery": {"x": 1}}) + "\n")
    with pytest.raises(DeltaProtocolError, match="unknown action"):
        DeltaLogReader(table).snapshot()
