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


# --- writer-side NAME-mode column mapping (VERDICT r9 task #7) --------------
# Round-trips go through the INDEPENDENT protocol reader
# (operators/delta_reader.DeltaLogReader), not this module's own replay.


def _mapped_table(spark, tmp_path, column_mapping="name"):
    from near_public_lakehouse_spark.operators.delta_export import (
        sync_delta_log_from_dir,
    )

    d = str(tmp_path / "mapped")
    df = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-01"), (3, "c", "2024-01-02")],
        "id long, val string, day string",
    ).selectExpr("id", "val", "cast(day as date) as day")
    df.write.partitionBy("day").parquet(d)
    v = sync_delta_log_from_dir(
        d, df.schema.json(), partition_columns=["day"], column_mapping=column_mapping
    )
    assert v == 0
    return d, df


def test_sync_name_mapped_publish_roundtrip(spark, tmp_path):
    """Creation with column_mapping='name': identity physical names, ids
    on every field, protocol (2,5), physical partitionValues keys — and
    the independent reader returns rows identical to the parquet read."""
    from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader

    d, df = _mapped_table(spark, tmp_path)
    log = os.path.join(d, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(line) for line in open(log)]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert (proto["minReaderVersion"], proto["minWriterVersion"]) == (2, 5)
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    conf = meta["configuration"]
    assert conf["delta.columnMapping.mode"] == "name"
    fields = json.loads(meta["schemaString"])["fields"]
    ids = [f["metadata"]["delta.columnMapping.id"] for f in fields]
    assert sorted(ids) == [1, 2, 3]
    assert int(conf["delta.columnMapping.maxColumnId"]) == 3
    assert all(
        f["metadata"]["delta.columnMapping.physicalName"] == f["name"] for f in fields
    )
    for a in actions:
        if "add" in a:
            assert list(a["add"]["partitionValues"]) == ["day"]  # physical

    out = DeltaLogReader(d).to_df(spark)
    assert out.columns == ["id", "val", "day"]
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, spark.read.parquet(d).select("id", "val", "day").collect())
    )


def test_walk_sync_not_fooled_by_column_named_remove(spark, tmp_path):
    """`_log_has_removes` must detect remove ACTIONS, not the substring
    '"remove"': a table with a column literally named `remove` (its
    schemaString contains `"name":"remove"`) has no tombstones, so the
    directory-walk re-sync must succeed instead of raising the
    live_files ValueError (ADVICE r12)."""
    from near_public_lakehouse_spark.operators.delta_export import (
        _log_has_removes,
        sync_delta_log_from_dir,
    )
    from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader

    d = str(tmp_path / "rmcol")
    df = spark.createDataFrame(
        [(1, True), (2, False)], "id long, remove boolean"
    )
    df.write.parquet(d)
    assert sync_delta_log_from_dir(d, df.schema.json()) == 0
    assert not _log_has_removes(os.path.join(d, "_delta_log"))

    # append + walk-sync again: must NOT refuse
    spark.createDataFrame([(3, True)], "id long, remove boolean").write.mode(
        "append"
    ).parquet(d)
    assert sync_delta_log_from_dir(d, df.schema.json()) == 1
    assert DeltaLogReader(d).to_df(spark).count() == 3

    # a REAL remove action is still detected
    log = os.path.join(d, "_delta_log")
    with open(os.path.join(log, f"{2:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "remove": {
                        "path": "gone.parquet",
                        "deletionTimestamp": 0,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    assert _log_has_removes(log)


def test_rename_delta_column_is_metadata_only(spark, tmp_path):
    """Logical rename (data column AND partition column): one metaData-only
    commit, zero data files touched, the reader shows the new logical
    names over the same values — then a subsequent sync with the renamed
    producer schema adds files under the OLD physical partitionValues
    key and the round-trip still holds."""
    from near_public_lakehouse_spark.operators.delta_export import (
        rename_delta_column,
        sync_delta_log_from_dir,
    )
    from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader

    d, df = _mapped_table(spark, tmp_path)
    before = {
        os.path.join(r, f)
        for r, _, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet") and "_delta_log" not in r
    }
    v = rename_delta_column(d, {"val": "value", "day": "event_day"})
    assert v == 1
    after = {
        os.path.join(r, f)
        for r, _, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet") and "_delta_log" not in r
    }
    assert before == after  # rename touched no data file

    out = DeltaLogReader(d).to_df(spark)
    assert out.columns == ["id", "value", "event_day"]
    assert {(r.id, r.value, str(r.event_day)) for r in out.collect()} == {
        (1, "a", "2024-01-01"), (2, "b", "2024-01-01"), (3, "c", "2024-01-02"),
    }

    # producer continues under the NEW logical names
    more = spark.createDataFrame(
        [(4, "d", "2024-01-03")], "id long, value string, event_day string"
    ).selectExpr("id", "value", "cast(event_day as date) as event_day")
    more.write.mode("append").partitionBy("event_day").parquet(d)
    v2 = sync_delta_log_from_dir(
        d, more.schema.json(), partition_columns=["event_day"], column_mapping="name"
    )
    assert v2 == 2
    commit2 = [
        json.loads(line)
        for line in open(os.path.join(d, "_delta_log", f"{2:020d}.json"))
    ]
    assert not any("metaData" in a for a in commit2)  # schema unchanged (stripped)
    new_adds = [a["add"] for a in commit2 if "add" in a]
    assert new_adds and all(
        list(a["partitionValues"]) == ["day"] for a in new_adds  # physical key
    )
    out2 = DeltaLogReader(d).to_df(spark)
    assert out2.count() == 4
    assert {r.id for r in out2.filter(F_col_day(out2) == "2024-01-03").collect()} == {4}


def F_col_day(df):
    from pyspark.sql import functions as F

    return F.col("event_day").cast("string")


def test_mapped_schema_evolution_and_refusals(spark, tmp_path):
    """Adding a column on a mapped table assigns a FRESH id past
    maxColumnId and keeps every existing id; drops/in-place type changes
    and renames-without-rename_delta_column are refused loudly."""
    from near_public_lakehouse_spark.operators.delta_export import (
        rename_delta_column,
        sync_delta_log_from_dir,
    )

    d, df = _mapped_table(spark, tmp_path)
    evolved = spark.createDataFrame(
        [(9, "z", "2024-01-04", 1.5)], "id long, val string, day string, score double"
    ).selectExpr("id", "val", "cast(day as date) as day", "score")
    evolved.write.mode("append").partitionBy("day").parquet(d)
    v = sync_delta_log_from_dir(
        d, evolved.schema.json(), partition_columns=["day"], column_mapping="name"
    )
    assert v == 1
    meta = next(
        json.loads(line)["metaData"]
        for line in open(os.path.join(d, "_delta_log", f"{1:020d}.json"))
        if "metaData" in line
    )
    by_name = {
        f["name"]: f["metadata"] for f in json.loads(meta["schemaString"])["fields"]
    }
    assert by_name["score"]["delta.columnMapping.id"] == 4  # fresh, past max 3
    assert by_name["id"]["delta.columnMapping.id"] == 1  # stable
    assert meta["configuration"]["delta.columnMapping.maxColumnId"] == "4"

    dropped = spark.createDataFrame([(1, "2024-01-01")], "id long, day string")
    with pytest.raises(ValueError, match="vanished"):
        sync_delta_log_from_dir(
            d, dropped.schema.json(), partition_columns=["day"], column_mapping="name"
        )
    retyped = evolved.selectExpr("cast(id as int) id", "val", "day", "score")
    with pytest.raises(ValueError, match="type/shape"):
        sync_delta_log_from_dir(
            d, retyped.schema.json(), partition_columns=["day"], column_mapping="name"
        )

    # rename on an UNMAPPED table is refused (data files would orphan)
    plain = str(tmp_path / "plain")
    df.write.parquet(plain)
    sync_delta_log_from_dir(plain, df.schema.json())
    with pytest.raises(ValueError, match="columnMapping"):
        rename_delta_column(plain, {"val": "value"})


def test_sync_name_mapping_refused_on_existing_unmapped_table(spark, tmp_path):
    """ADVICE r10: requesting column_mapping='name' on a table created
    UNMAPPED used to half-apply (protocol only at v0, mode never written
    to configuration) — out-of-spec metadata. It refuses loudly now; an
    unmapped re-sync of the same table still works."""
    from near_public_lakehouse_spark.operators.delta_export import (
        sync_delta_log_from_dir,
    )

    d = str(tmp_path / "plain")
    df = spark.createDataFrame(
        [(1, "a", "2024-01-01")], "id long, val string, day string"
    ).selectExpr("id", "val", "cast(day as date) as day")
    df.write.partitionBy("day").parquet(d)
    assert sync_delta_log_from_dir(d, df.schema.json(), ["day"]) == 0

    with pytest.raises(ValueError, match="no columnMapping mode"):
        sync_delta_log_from_dir(
            d, df.schema.json(), ["day"], column_mapping="name"
        )
    # no bad commit was written, and the unmapped path still syncs
    assert not os.path.exists(os.path.join(d, "_delta_log", f"{1:020d}.json"))
    assert sync_delta_log_from_dir(d, df.schema.json(), ["day"]) is None


def test_write_checkpoint_v2_reader_roundtrip(spark, tmp_path):
    """V2 spec checkpoint written by write_checkpoint_v2 (checkpointMetadata
    + UUID-named top file + add state striped across _sidecars/ parquet):
    the INDEPENDENT protocol reader discovers it from _last_checkpoint,
    replays across it, and returns rows identical to the parquet read —
    and the snapshot AT the checkpoint version equals the raw JSON replay."""
    from near_public_lakehouse_spark.operators.delta_export import (
        read_delta_snapshot,
        sync_delta_log_from_dir,
        write_checkpoint_v2,
    )
    from near_public_lakehouse_spark.operators.delta_reader import DeltaLogReader

    d = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}", f"2024-01-0{i % 3 + 1}") for i in range(9)],
        "id long, val string, day string",
    ).selectExpr("id", "val", "cast(day as date) as day")
    df.write.partitionBy("day").parquet(d)
    assert sync_delta_log_from_dir(d, df.schema.json(), ["day"], checkpoint_interval=None) == 0

    # three more versions: new files landing in one partition each
    import pyarrow as pa
    import pyarrow.parquet as pq

    for v in range(1, 4):
        pq.write_table(
            pa.table({"id": [100 + v], "val": [f"x{v}"]}),
            os.path.join(d, "day=2024-01-01", f"part-extra{v}.parquet"),
        )
        assert (
            sync_delta_log_from_dir(
                d, df.schema.json(), ["day"], checkpoint_interval=None
            )
            == v
        )

    files = write_checkpoint_v2(d, version=2, sidecars=2)
    assert len(files) == 3  # top + 2 sidecars
    assert ".checkpoint.u" in os.path.basename(files[0])
    assert all(os.sep + "_sidecars" + os.sep in p for p in files[1:])

    r = DeltaLogReader(d)
    assert r.checkpoint_version == 2
    assert [os.path.basename(f) for f in r._checkpoint_files] == [
        os.path.basename(files[0])
    ]
    pq_read = spark.read.parquet(d)
    delta_read = r.to_df(spark)
    assert sorted(map(tuple, delta_read.collect())) == sorted(
        map(tuple, pq_read.collect())
    )
    # snapshot AT the checkpoint version == raw JSON replay at it
    assert r.snapshot(2).paths == read_delta_snapshot(d, 2)["files"]


def test_write_checkpoint_v2_sidecar_refusals(spark, tmp_path):
    """Reader-side refusal matrix still bites on v2 checkpoints this
    writer produces: a missing sidecar file and a version-mismatched
    checkpointMetadata both refuse loudly."""
    import json as _json

    import pytest as _pytest

    from near_public_lakehouse_spark.operators.delta_export import (
        sync_delta_log_from_dir,
        write_checkpoint_v2,
    )
    from near_public_lakehouse_spark.operators.delta_reader import (
        DeltaLogReader,
        DeltaProtocolError,
    )

    d = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, val string")
    df.write.parquet(d)
    assert sync_delta_log_from_dir(d, df.schema.json()) == 0
    files = write_checkpoint_v2(d, version=0, sidecars=1)
    os.remove(files[1])  # the only sidecar vanishes
    with _pytest.raises(DeltaProtocolError, match="sidecar"):
        DeltaLogReader(d).snapshot()

    # restore by rewriting the checkpoint, then corrupt the pointer version
    files = write_checkpoint_v2(d, version=0, sidecars=1)
    lc = os.path.join(d, "_delta_log", "_last_checkpoint")
    ptr = _json.load(open(lc))
    # point at a version whose checkpoint doesn't exist
    ptr["version"] = 5
    open(lc, "w").write(_json.dumps(ptr))
    with _pytest.raises(DeltaProtocolError, match="checkpoint"):
        DeltaLogReader(d).snapshot()


def test_sync_seeds_from_v2_checkpoint(spark, tmp_path):
    """After write_checkpoint_v2, the NEXT sync's replay seeds from the
    v2 top file + sidecars: the new commit diffs only the actual change
    (a seed that lost the prior add paths would re-add every file)."""
    import json as _json

    from near_public_lakehouse_spark.operators.delta_export import (
        sync_delta_log_from_dir,
        write_checkpoint_v2,
    )

    d = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}", "2024-01-01") for i in range(4)],
        "id long, val string, day string",
    ).selectExpr("id", "val", "cast(day as date) as day")
    df.write.partitionBy("day").parquet(d)
    assert sync_delta_log_from_dir(d, df.schema.json(), ["day"], checkpoint_interval=None) == 0

    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"id": [99], "val": ["x"]}),
        os.path.join(d, "day=2024-01-01", "part-extra.parquet"),
    )
    assert sync_delta_log_from_dir(d, df.schema.json(), ["day"], checkpoint_interval=None) == 1
    write_checkpoint_v2(d, version=1, sidecars=2)

    pq.write_table(
        pa.table({"id": [100], "val": ["y"]}),
        os.path.join(d, "day=2024-01-01", "part-extra2.parquet"),
    )
    assert (
        sync_delta_log_from_dir(
            d, df.schema.json(), ["day"], touched_partitions=["2024-01-01"],
            checkpoint_interval=None,
        )
        == 2
    )
    actions = [
        _json.loads(line)
        for line in open(os.path.join(d, "_delta_log", f"{2:020d}.json"))
        if line.strip()
    ]
    adds = [a["add"]["path"] for a in actions if "add" in a]
    removes = [a for a in actions if "remove" in a]
    assert adds == ["day=2024-01-01/part-extra2.parquet"]
    assert not removes


# --- r12 review-finding regressions ------------------------------------------


def _merge_logged(spark, d, rows, part, schema="k int, live boolean, v string"):
    """publish_public_table's shape on an arbitrary keyed frame: initial
    overwrite+sync when the table is new, log-authoritative merge after."""
    from near_public_lakehouse_spark.operators.delta_export import (
        sync_delta_log_from_dir,
    )
    from near_public_lakehouse_spark.operators.merge import merge_upsert_logged

    df = _df(spark, rows, schema)
    if not os.path.isdir(os.path.join(d, "_delta_log")):
        df.write.mode("overwrite").partitionBy(part).parquet(d)
        sync_delta_log_from_dir(d, df.schema.json(), partition_columns=[part])
        return df
    from near_public_lakehouse_spark.operators.delta_export import (
        partition_value_str,
    )

    touched, installed = merge_upsert_logged(
        spark, d, df, ["k"], partition_col=part, when_matched_update=True
    )
    sync_delta_log_from_dir(
        d, df.schema.json(), partition_columns=[part] if part else [],
        touched_partitions=[partition_value_str(t) for t in (touched or [])],
        live_files=installed,
    )
    return df


def test_boolean_partition_merge_tombstones_and_prunes(spark, tmp_path):
    """str(True) is 'True' but Spark writes 'live=true': the partition
    serialization must match hive's or superseded generations are never
    tombstoned (duplicate rows) and pruning never engages (O(table)
    reads). Pin: a boolean-partitioned logged merge rewrites its
    partition with the old generation removed, no duplicates, and the
    'in'-pruned snapshot keeps only the touched partition's files."""
    from near_public_lakehouse_spark.operators.delta_reader import (
        DeltaLogReader,
        prune_snapshot_files,
    )

    d = str(tmp_path / "b")
    os.makedirs(d)
    _merge_logged(spark, d, [(1, True, "a"), (2, False, "b")], "live")
    _merge_logged(spark, d, [(1, True, "A2")], "live")  # rewrite live=true
    r = DeltaLogReader(d)
    rows = sorted(tuple(x) for x in r.to_df(spark).collect())
    assert rows == [(1, "A2", True), (2, "b", False)] or rows == sorted(
        [(1, True, "A2"), (2, False, "b")]
    )
    assert r.to_df(spark).count() == 2  # no resurrected duplicates
    # pruning engages on the boolean partition (str literals, as the
    # merge passes them)
    snap = r.snapshot()
    kept = prune_snapshot_files(snap, [("live", "in", ["true"])])
    assert 0 < len(kept.files) < len(snap.files)
    for a in kept.files.values():
        assert a["partitionValues"]["live"] == "true"


def test_int_partition_literal_coercion_prunes(spark, tmp_path):
    """coerce_lit must coerce numeric literals symmetrically with
    coerce_pv: an int-partitioned table pruned with STRING literals (the
    shape merge_upsert_logged passes) keeps only the named partitions
    instead of silently keeping everything."""
    from near_public_lakehouse_spark.operators.delta_reader import (
        DeltaLogReader,
        prune_snapshot_files,
    )

    d = str(tmp_path / "i")
    os.makedirs(d)
    _merge_logged(
        spark, d,
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")],
        "bucket", schema="k int, bucket int, v string",
    )
    snap = DeltaLogReader(d).snapshot()
    kept = prune_snapshot_files(snap, [("bucket", "in", ["10", "30"])])
    got = {a["partitionValues"]["bucket"] for a in kept.files.values()}
    assert got == {"10", "30"}
    assert len(kept.files) < len(snap.files)


def test_vacuum_retain_last_zero_refuses(spark, tmp_path):
    """retain_last=0 would protect nothing and delete the CURRENT
    snapshot's data files; Delta's VACUUM never touches the latest
    version's files, so the call refuses."""
    from near_public_lakehouse_spark.operators.delta_export import (
        vacuum_delta_table,
    )

    d = str(tmp_path / "v")
    os.makedirs(d)
    _merge_logged(spark, d, [(1, True, "a")], "live")
    with pytest.raises(ValueError, match="retain_last"):
        vacuum_delta_table(d, retain_last=0)


def test_walk_sync_refused_on_tombstoned_table(spark, tmp_path):
    """The 'markers predate tombstones' soundness assumption is enforced:
    a directory-walk sync (what a stray legacy marker triggers) on a
    table whose log carries removes raises instead of resurrecting every
    tombstoned generation as live adds."""
    from near_public_lakehouse_spark.operators.delta_export import (
        sync_delta_log_from_dir,
    )

    d = str(tmp_path / "w")
    os.makedirs(d)
    df = _merge_logged(spark, d, [(1, True, "a")], "live")
    _merge_logged(spark, d, [(1, True, "A2")], "live")  # emits removes
    with pytest.raises(ValueError, match="walk sync refused"):
        sync_delta_log_from_dir(d, df.schema.json(), partition_columns=["live"])


def test_vacuum_sweeps_crashed_merge_tmp(spark, tmp_path):
    """A publish that crashed between staging and install leaves the
    sibling __merge_tmp__ copy; vacuum reclaims it (it is never
    log-referenced, and no re-merge may ever come)."""
    from near_public_lakehouse_spark.operators.delta_export import (
        vacuum_delta_table,
    )

    d = str(tmp_path / "c")
    os.makedirs(d)
    _merge_logged(spark, d, [(1, True, "a")], "live")
    tmp = d + ".__merge_tmp__"
    os.makedirs(tmp)
    with open(os.path.join(tmp, "part-crashed.parquet"), "w") as fh:
        fh.write("x")
    vacuum_delta_table(d, retain_last=1)
    assert not os.path.exists(tmp)
