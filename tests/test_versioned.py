"""Versioned parquet tables (operators/versioned.py): atomic commits,
optimistic concurrency, time travel, vacuum, and the MERGE integration —
the transactional contract the reference gets from Delta (SURVEY §2.14),
expressed as a manifest log over plain parquet."""

from __future__ import annotations

import os

import pytest

from near_public_lakehouse_spark.operators import versioned as V


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def test_overwrite_append_and_latest(spark, tmp_path):
    t = str(tmp_path / "t")
    assert V.commit_overwrite(_df(spark, [(1, "a")]), t) == 0
    assert V.commit_append(_df(spark, [(2, "b")]), t) == 1
    assert _rows(V.read_version(spark, t)) == [(1, "a"), (2, "b")]
    assert V.latest_version(t) == 1


def test_time_travel_snapshots_are_immutable(spark, tmp_path):
    t = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a")]), t)
    V.commit_append(_df(spark, [(2, "b")]), t)
    V.commit_overwrite(_df(spark, [(9, "z")]), t)
    assert _rows(V.read_version(spark, t, 0)) == [(1, "a")]
    assert _rows(V.read_version(spark, t, 1)) == [(1, "a"), (2, "b")]
    assert _rows(V.read_version(spark, t, 2)) == [(9, "z")]
    assert _rows(V.read_version(spark, t)) == [(9, "z")]


def test_history_lists_newest_first(spark, tmp_path):
    t = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a")]), t)
    V.commit_append(_df(spark, [(2, "b")]), t)
    h = V.history(t)
    assert [(e["version"], e["operation"]) for e in h] == [(1, "append"), (0, "overwrite")]
    assert all(e["n_files"] >= 1 for e in h)


def test_missing_version_raises(spark, tmp_path):
    t = str(tmp_path / "t")
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, t)
    V.commit_overwrite(_df(spark, [(1, "a")]), t)
    with pytest.raises(FileNotFoundError):
        V.read_version(spark, t, 5)


def test_commit_conflict_retries_to_next_version(spark, tmp_path):
    """Simulate a racing writer by pre-publishing the version the append
    would take; the append must land one version later with both rows
    visible."""
    t = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a")]), t)
    # Racing writer grabs version 1 out from under the append.
    V._publish(
        t,
        1,
        {
            "version": 1,
            "operation": "overwrite",
            "timestamp": 0.0,
            "files": V._read_manifest(t, 0)["files"],
            "schema": V._read_manifest(t, 0)["schema"],
        },
    )
    v = V.commit_append(_df(spark, [(2, "b")]), t)
    assert v == 2
    assert _rows(V.read_version(spark, t)) == [(1, "a"), (2, "b")]


def test_publish_is_create_exclusive(spark, tmp_path):
    t = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a")]), t)
    with pytest.raises(V.CommitConflict):
        V._publish(t, 0, {"version": 0, "operation": "x", "timestamp": 0, "files": [], "schema": "{}"})


def test_orphaned_data_is_invisible_and_vacuumed(spark, tmp_path):
    """A crash between data write and manifest publish leaves an orphan
    commit dir: readers never see it, vacuum reclaims it."""
    t = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a")]), t)
    V._write_data(_df(spark, [(99, "crash")]), t)  # no manifest => orphan
    assert _rows(V.read_version(spark, t)) == [(1, "a")]
    removed = V.vacuum(t, retain_last=1)
    assert removed  # the orphan's files
    assert _rows(V.read_version(spark, t)) == [(1, "a")]


def test_vacuum_drops_old_versions_keeps_history(spark, tmp_path):
    t = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a")]), t)
    V.commit_overwrite(_df(spark, [(2, "b")]), t)
    V.commit_overwrite(_df(spark, [(3, "c")]), t)
    removed = V.vacuum(t, retain_last=1)
    assert removed  # v0+v1 files gone
    assert _rows(V.read_version(spark, t)) == [(3, "c")]
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        V.read_version(spark, t, 0)
    # History (the log) is retained even for vacuumed versions.
    assert [e["version"] for e in V.history(t)] == [2, 1, 0]


def test_vacuum_keeps_files_shared_with_retained_versions(spark, tmp_path):
    """Append reuses prior files: vacuuming after an append must NOT drop
    files the retained snapshot still references."""
    t = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a")]), t)
    V.commit_append(_df(spark, [(2, "b")]), t)
    removed = V.vacuum(t, retain_last=1)
    assert removed == []  # v1 references v0's files too
    assert _rows(V.read_version(spark, t)) == [(1, "a"), (2, "b")]


def test_empty_table_roundtrips_schema(spark, tmp_path):
    t = str(tmp_path / "t")
    empty = _df(spark, []).filter("1 = 0")
    V.commit_overwrite(empty, t)
    got = V.read_version(spark, t)
    assert got.count() == 0
    assert got.schema == empty.schema


def test_versioned_upsert_matches_merge_semantics(spark, tmp_path):
    t = str(tmp_path / "t")
    v0 = V.versioned_upsert(spark, t, _df(spark, [(1, "a"), (2, "b")]), ["k"])
    assert v0 == 0
    v1 = V.versioned_upsert(spark, t, _df(spark, [(2, "B"), (3, "c")]), ["k"])
    assert v1 == 1
    assert _rows(V.read_version(spark, t)) == [(1, "a"), (2, "B"), (3, "c")]
    # Time travel still sees the pre-merge snapshot.
    assert _rows(V.read_version(spark, t, 0)) == [(1, "a"), (2, "b")]


def test_versioned_upsert_insert_only(spark, tmp_path):
    t = str(tmp_path / "t")
    V.versioned_upsert(spark, t, _df(spark, [(1, "a")]), ["k"])
    V.versioned_upsert(
        spark, t, _df(spark, [(1, "CLOBBER"), (2, "b")]), ["k"], when_matched_update=False
    )
    assert _rows(V.read_version(spark, t)) == [(1, "a"), (2, "b")]


def test_read_changes_append_only_feed(spark, tmp_path):
    """Incremental consumers see exactly the appended rows per version,
    tagged with _commit_version."""
    t = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a")]), t)
    V.commit_append(_df(spark, [(2, "b")]), t)
    V.commit_append(_df(spark, [(3, "c")]), t)
    feed = V.read_changes(spark, t, since_version=0)
    assert sorted((r.k, r.v, r._commit_version) for r in feed.collect()) == [
        (2, "b", 1),
        (3, "c", 2),
    ]
    # Full-history read includes the initial write.
    assert sorted(r.k for r in V.read_changes(spark, t).collect()) == [1, 2, 3]
    # Nothing new since the tip: empty frame, schema intact.
    tip = V.read_changes(spark, t, since_version=2)
    assert tip.count() == 0
    assert "_commit_version" in tip.columns


def test_read_changes_change_commit_raises_or_skips(spark, tmp_path):
    t = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a")]), t)
    V.versioned_upsert(spark, t, _df(spark, [(1, "A"), (2, "b")]), ["k"])  # rewrite
    V.commit_append(_df(spark, [(3, "c")]), t)
    with pytest.raises(ValueError, match="rewrote existing rows"):
        V.read_changes(spark, t, since_version=0)
    feed = V.read_changes(spark, t, since_version=0, skip_change_commits=True)
    assert sorted((r.k, r._commit_version) for r in feed.collect()) == [(3, 2)]


def test_compact_is_invisible_to_change_feed(spark, tmp_path):
    """OPTIMIZE contract: compaction reduces files, preserves rows, and a
    change-feed consumer never sees it — no skip flag needed."""
    t = str(tmp_path / "t")
    V.commit_overwrite(_df(spark, [(1, "a")]).repartition(4), t)
    V.commit_append(_df(spark, [(2, "b")]).repartition(4), t)
    before = len(V._read_manifest(t, V.latest_version(t))["files"])
    v = V.commit_compact(spark, t, target_files=1)
    after = len(V._read_manifest(t, v)["files"])
    assert after < before
    assert _rows(V.read_version(spark, t)) == [(1, "a"), (2, "b")]
    assert V.read_changes(spark, t, since_version=1).count() == 0
    # Appends after the compact resume the feed from the compacted base.
    V.commit_append(_df(spark, [(3, "c")]), t)
    assert sorted(r.k for r in V.read_changes(spark, t, since_version=1).collect()) == [3]
    # Old pre-compact files reclaimable; latest still reads.
    V.vacuum(t, retain_last=1)
    assert _rows(V.read_version(spark, t)) == [(1, "a"), (2, "b"), (3, "c")]


def test_versioned_upsert_rederives_after_conflict(spark, tmp_path):
    """If a racing commit lands between snapshot read and publish, the
    upsert must retry against the NEW snapshot — the winner's row has to
    survive into the merge result."""
    t = str(tmp_path / "t")
    V.versioned_upsert(spark, t, _df(spark, [(1, "a")]), ["k"])

    real_commit = V._commit
    raced = {"done": False}

    def racing_commit(table_dir, op, files, base, schema):
        if not raced["done"]:
            raced["done"] = True
            # Racing writer appends (5, "winner") and takes our version.
            V.commit_append(_df(spark, [(5, "winner")]), t)
        return real_commit(table_dir, op, files, base, schema)

    V._commit = racing_commit
    try:
        V.versioned_upsert(spark, t, _df(spark, [(2, "b")]), ["k"])
    finally:
        V._commit = real_commit
    assert _rows(V.read_version(spark, t)) == [(1, "a"), (2, "b"), (5, "winner")]
