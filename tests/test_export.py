"""K4 hourly export: folder scheme, idempotent overwrite, schema round-trip."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

import pytest

from near_public_lakehouse_spark.operators.export import (
    avro_available,
    export_hourly,
    hourly_export_path,
    read_export,
)


def test_hourly_export_roundtrip(spark, tmp_path):
    """Default export format is avro — the reference's actual format
    (NEAR Public Datasets.py:396-409) — through spark-avro when present,
    else through the repo's own OCF implementation."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("bucket"), F.lit("x").alias("tag")
    )
    ts = datetime(2026, 8, 13, 14)
    path = export_hourly(df, str(tmp_path), "accounts", ts)
    assert path == hourly_export_path(str(tmp_path), "avro", "accounts", ts)
    assert "/accounts/2026/08/13/14" in path
    back = read_export(spark, path, "avro")
    assert back.count() == 100
    assert back.columns == ["id", "bucket", "tag"]


@pytest.mark.parametrize("fmt", ["orc", "csv", "parquet", "avro"])
def test_hourly_export_format_roundtrip(spark, tmp_path, fmt):
    """Each builtin format round-trips rows, columns and dtypes (csv needs
    the writer's schema on read — self-describing formats don't)."""
    df = spark.range(50).select(
        F.col("id"),
        (F.col("id") * 2).cast("double").alias("val"),
        F.concat(F.lit("r"), F.col("id")).alias("tag"),
    )
    ts = datetime(2026, 8, 13, 16)
    path = export_hourly(df, str(tmp_path), "metrics", ts, fmt=fmt)
    assert f"/{fmt}/metrics/2026/08/13/16" in path
    back = read_export(spark, path, fmt, schema=df.schema)
    # nullability is reader-dependent; names + types must round-trip
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]
    assert sorted(r.id for r in back.collect()) == list(range(50))
    assert back.filter(F.col("val") != F.col("id") * 2.0).count() == 0


def test_csv_export_rejects_nested_columns(spark, tmp_path):
    df = spark.range(3).select(F.col("id"), F.array(F.lit(1), F.lit(2)).alias("xs"))
    with pytest.raises(ValueError, match="nested"):
        export_hourly(df, str(tmp_path), "bad", datetime(2026, 8, 13, 17), fmt="csv")


def test_hourly_export_idempotent_rerun(spark, tmp_path):
    ts = datetime(2026, 8, 13, 15)
    df1 = spark.range(10).select(F.col("id"))
    df2 = spark.range(7).select(F.col("id"))
    export_hourly(df1, str(tmp_path), "logs", ts)
    path = export_hourly(df2, str(tmp_path), "logs", ts)
    # Rerun of the same hour replaces, never appends.
    assert read_export(spark, path, "avro").count() == 7


def test_export_closed_hours_incremental_and_trailing(spark, tmp_path):
    """Only closed hours export; markers make reruns no-ops; trailing
    re-export rewrites the newest closed hour(s)."""
    import os

    from near_public_lakehouse_spark.operators.export import export_closed_hours

    ns_h = 3_600 * 1_000_000_000
    h0 = 500_000  # hours since epoch
    rows = [(i, (h0 + i // 4) * ns_h + (i % 4) * ns_h // 4) for i in range(12)]  # 3 hours
    df = spark.createDataFrame(rows, "id long, ts long")

    # now = start of h0+2 plus a bit -> with 1h tolerance only h0 is closed
    from datetime import datetime, timezone

    now = datetime.fromtimestamp((h0 + 2) * 3600 + 60, tz=timezone.utc).replace(tzinfo=None)
    written = export_closed_hours(df, str(tmp_path), "events", "ts", now)
    assert len(written) == 1 and "/events/" in written[0]
    assert os.path.exists(os.path.join(written[0], "_EXPORTED"))

    # rerun: marker skips, nothing written
    assert export_closed_hours(df, str(tmp_path), "events", "ts", now) == []

    # time advances: the two later hours close and export
    now2 = datetime.fromtimestamp((h0 + 4) * 3600, tz=timezone.utc).replace(tzinfo=None)
    assert len(export_closed_hours(df, str(tmp_path), "events", "ts", now2)) == 2

    # trailing re-export: newest closed hour rewritten even though marked
    again = export_closed_hours(
        df, str(tmp_path), "events", "ts", now2, reexport_trailing=1
    )
    assert len(again) == 1 and "/events/" in again[0]

    # all three hour folders round-trip through the avro reader
    from near_public_lakehouse_spark.operators.export import read_export

    total = 0
    for h in range(3):
        from datetime import datetime as dt

        from near_public_lakehouse_spark.operators.export import hourly_export_path

        ts = dt.utcfromtimestamp((h0 + h) * 3600)
        total += read_export(spark, hourly_export_path(str(tmp_path), "avro", "events", ts), "avro").count()
    assert total == 12


def test_local_only_paths_fail_loudly(spark, tmp_path):
    """Driver-local control-plane IO (OCF fallback, hour markers) must
    reject object-store URIs instead of writing to a literal './s3:' dir."""
    import datetime

    import pytest

    from near_public_lakehouse_spark.operators.export import (
        export_closed_hours,
        export_hourly,
    )

    df = spark.createDataFrame([(1, 10**15)], "k long, ts long")
    with pytest.raises(ValueError, match="driver-local"):
        export_closed_hours(
            df, "s3://bucket/base", "t", "ts", datetime.datetime(2024, 1, 2)
        )
    if not __import__(
        "near_public_lakehouse_spark.operators.export", fromlist=["avro_available"]
    ).avro_available(spark):
        with pytest.raises(ValueError, match="driver-local"):
            export_hourly(
                df, "gs://bucket/base", "t", datetime.datetime(2024, 1, 2), fmt="avro"
            )
    # windows-style local paths and plain relative/absolute paths still pass
    out = export_hourly(
        df, str(tmp_path / "ok"), "t", datetime.datetime(2024, 1, 2), fmt="parquet"
    )
    assert out


# --- streaming OCF publication sink ----------------------------------------


def _sink_events(spark, root, file_no, rows):
    df = spark.createDataFrame(rows, "event_id long, ts long, event_type string")
    df.coalesce(1).write.mode("overwrite").parquet(f"{root}/b{file_no}")


def test_avro_stream_sink_publishes_closed_hours(spark, tmp_path):
    """The streaming publication sink drains micro-batches into staging and
    publishes each hour once its event-time high-watermark closes it —
    marker-fenced (closed hours are never rewritten on later batches or
    reruns) and exactly-once at the staging layer (one overwritten dir per
    batch id)."""
    import os
    import time

    from near_public_lakehouse_spark.operators.export import (
        avro_stream_sink,
        read_export,
    )

    ns_h = 3_600 * 10**9
    h0 = 490_000
    src = str(tmp_path / "src")
    staging = str(tmp_path / "staging")
    pub = str(tmp_path / "pub")
    ckpt = str(tmp_path / "ckpt")

    _sink_events(
        spark,
        src,
        0,
        [(i, h0 * ns_h + i * ns_h // 8, "click") for i in range(6)]
        + [(10 + i, (h0 + 1) * ns_h + i * ns_h // 4, "view") for i in range(2)],
    )
    _sink_events(spark, src, 1, [(20, (h0 + 3) * ns_h, "click")])

    schema = "event_id long, ts long, event_type string"

    def run():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            # glob the per-batch dirs: FileStreamSource does not recurse
            # into plain (non-partition) subdirectories
            .parquet(f"{src}/b*")
        )
        q = avro_stream_sink(
            stream, staging, pub, "events", "ts", checkpoint_path=ckpt
        )
        q.awaitTermination(120)
        return q

    run()
    # hours h0 and h0+1 closed by the h0+3 high-watermark (tolerance 1h);
    # the h0+3 hour itself is still open
    root = f"{pub}/avro/events"
    hour_dirs = sorted(
        os.path.join(dp, "")[len(root) + 1 :].rstrip("/")
        for dp, dns, fns in os.walk(root)
        if "_EXPORTED" in fns
    )
    assert len(hour_dirs) == 2
    paths = [os.path.join(root, h) for h in hour_dirs]
    assert [read_export(spark, p, "avro").count() for p in paths] == [6, 2]

    # staging is PRUNED down to the open/late window (round-6 ADVICE):
    # batch 0's rows all live in marker-fenced exports now, so its dir is
    # gone; only batch 1 (the still-open h0+3 row) remains
    staged = spark.read.option("basePath", staging).parquet(f"{staging}/batch_id=*")
    assert staged.count() == 1
    assert sorted(
        d for d in os.listdir(staging) if d.startswith("batch_id=")
    ) == ["batch_id=1"]

    # rerun against the same checkpoint: no new batches, no rewrites
    mtimes = {p: os.path.getmtime(os.path.join(p, "_EXPORTED")) for p in paths}
    run()
    assert mtimes == {
        p: os.path.getmtime(os.path.join(p, "_EXPORTED")) for p in paths
    }

    # a later batch closes h0+2 and h0+3 without touching published hours
    time.sleep(0.05)
    _sink_events(
        spark,
        src,
        2,
        [(30, (h0 + 2) * ns_h + ns_h // 2, "view"), (31, (h0 + 5) * ns_h, "click")],
    )
    run()
    hour_dirs2 = sorted(
        os.path.join(dp, "")[len(root) + 1 :].rstrip("/")
        for dp, dns, fns in os.walk(root)
        if "_EXPORTED" in fns
    )
    assert len(hour_dirs2) == 4
    assert mtimes == {
        p: os.path.getmtime(os.path.join(p, "_EXPORTED")) for p in paths
    }
    new_paths = [os.path.join(root, h) for h in hour_dirs2 if os.path.join(root, h) not in paths]
    assert sorted(read_export(spark, p, "avro").count() for p in new_paths) == [1, 1]
