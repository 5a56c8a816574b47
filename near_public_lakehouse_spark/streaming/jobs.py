"""Structured Streaming jobs over the events stream: the reference's
streaming-only surface (SURVEY §2.11) expressed with OSS primitives.

- T1 watermarks: `withWatermark` replaces DLT's `WATERMARK ... DELAY OF
  INTERVAL` (SCD tables.sql:105-110 uses 1 day; FT/NFT events use 30 s).
- J2 interval stream-stream join: both sides watermarked + event-time bound
  in the join condition (SCD tables.sql:105-111).
- T4 RocksDB state store for large join/agg state
  (NEAR Social.sql:8 -> `spark.sql.streaming.stateStore.providerClass`).
- Stream dedup via dropDuplicatesWithinWatermark (the OSS answer to
  ReplacingMergeTree-style dedup, M6).

Event time: `events.ts` is a ns BIGINT; watermarks need TimestampType, so
jobs derive `event_time = timestamp_micros(ts div 1000)` once.

Scale notes: watermark delay bounds state size — without it a stream-stream
join keeps every row forever (the reference's unwatermarked chunk⋈block J1
is flagged in SURVEY §7 as exactly this hazard). RocksDB spills state off
the JVM heap; checkpoints make every query restartable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROCKSDB_CONF = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
}


def enable_rocksdb_state_store(spark: SparkSession) -> None:
    """T4: big-state joins/aggs keep state in RocksDB, not the JVM heap."""
    for k, v in ROCKSDB_CONF.items():
        spark.conf.set(k, v)


def read_events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-stream over parquet event files with the derived event-time
    column. Schema comes from a batch peek (streaming sources need one)."""
    from near_public_lakehouse_spark.session import configure_runtime

    configure_runtime(spark)
    schema = spark.read.parquet(events_dir).schema
    r = spark.readStream
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    import os

    if os.path.isfile(events_dir):
        # FileStreamSource treats a concrete file path as its basePath and
        # rejects it ("must be a directory"). A single-file GLOB anchors
        # basePath to the parent dir instead.
        d, base = os.path.split(events_dir)
        events_dir = os.path.join(d, f"[{base[0]}]{base[1:]}")
    df = r.schema(schema).parquet(events_dir)
    return df.withColumn(
        "event_time",
        F.timestamp_micros(F.floor(F.col("ts").cast("decimal(38,0)") / F.lit(1000)).cast("bigint")),
    )


def hourly_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregate (append-mode capable): the
    streaming twin of queries.events.hourly_event_stats. Late rows beyond
    the watermark are dropped — T5 late-data semantics."""
    return (
        events.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def clicks_with_recent_views(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """J2: watermarked stream-stream inner join with an event-time interval
    bound — each click joined to same-user views from the trailing hour
    (the SCD tables.sql:105-111 `BETWEEN ts AND ts + INTERVAL` shape).

    State for both sides is evicted once the watermark passes the interval
    bound; without the time condition Spark would reject the stream-stream
    join as unbounded."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user_id"),
            F.col("event_time").alias("click_time"),
        )
        .withWatermark("click_time", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("view_user_id"),
            F.col("event_time").alias("view_time"),
        )
        .withWatermark("view_time", watermark)
    )
    return clicks.join(
        views,
        (F.col("click_user_id") == F.col("view_user_id"))
        & (F.col("view_time") <= F.col("click_time"))
        & (F.col("view_time") >= F.col("click_time") - F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("click_id", "view_id", F.col("click_user_id").alias("user_id"))


def deduped_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once-per-key within the watermark horizon:
    dropDuplicatesWithinWatermark on the event id (re-delivered events from
    an at-least-once feed collapse; state is bounded by the watermark)."""
    return events.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory(
    df: DataFrame, name: str, checkpoint: str, output_mode: str = "append"
) -> None:
    """Drain an availableNow stream into an in-memory table (tests)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
