"""SparkSession factory and runtime configuration.

Scale design (the part that must survive a 1000-executor / 100 TB cluster):

- AQE is always on: runtime partition coalescing, skew-join splitting and
  dynamic join-strategy demotion replace hand-tuned shuffle counts.
- ``spark.sql.shuffle.partitions`` defaults to 2x local cores; on a real
  cluster this is overridden (AQE coalesces down, it never splits up, so
  start high).
- Session timezone is pinned to UTC: the reference keeps nanosecond epoch
  longs + derived UTC timestamps/dates (Silver Lake Mainnet.sql:19-22), and
  date partition keys must not depend on the submitting machine's zone.
- ``spark.sql.legacy.parquet.nanosAsLong=true``: the driver testdata stores
  ``events.ts`` as parquet TIMESTAMP(NANOS). Reading nanos as a plain BIGINT
  mirrors the reference's convention (block_timestamp is ns-since-epoch) and
  is deterministic in every timezone.

Everything here is runtime-settable (SQLConf), so `configure_runtime` also
works on a session we did not build (the correctness driver owns its own).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe to (re)apply on a live session.
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Runtime bloom-filter join pruning (InjectRuntimeFilter): a selective
    # filter on one join side seeds a bloom filter evaluated on the other
    # side's scan before its shuffle — the OSS analog of the semi-join
    # reduction the Q21/Q17 shapes want at scale. Default-on in Spark 4.x
    # but pinned so a default change can't silently drop it. Its 10 GiB
    # application-side threshold means it engages exactly where it pays
    # (real-scale fact scans) and stays out of small local runs;
    # tests/test_plan_shapes.py proves the rule fires once past threshold.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Arrow for the few pandas-UDF operators (similarity, multimodal).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ANSI off: the reference SQL relies on permissive casts/try semantics.
    "spark.sql.ansi.enabled": "false",
    # size(NULL) = NULL, not the legacy -1: every text query counts tokens
    # with F.size over a tokenizer that NULL-propagates, and the DuckDB
    # oracles' len() is NULL-in-NULL-out — with the legacy default a
    # NULL-text document silently scores -1 tokens and diverges from the
    # oracle (r15 differential fuzz finding, NULL-text class).
    "spark.sql.legacy.sizeOfNull": "false",
}


def configure_runtime(spark: SparkSession) -> SparkSession:
    """Apply deterministic runtime confs to an existing session."""
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # e.g. conf locked down — engine still works, queries that need
            # the conf (ns parquet reads) will surface a clear error.
            pass
    return spark


def ensure_vendored_protobuf() -> None:
    """Make `google.protobuf` importable from the repo's vendored mini
    runtime (vendor/google/protobuf — public wire-format reimplementation)
    when no real distribution exists: transformWithStateInPandas workers
    need it (pyspark/sql/streaming/proto). Must run BEFORE the JVM
    launches so PYTHONPATH propagates to Python workers; a real installed
    protobuf always wins (the vendor path is appended, not prepended).

    The skip check looks at WHERE the importable module lives, not just
    whether it imports: if this process can import it only because the
    vendor dir is already on sys.path (pytest collection of
    test_mini_protobuf.py does that), the PYTHONPATH export must still
    happen or Spark-spawned Python workers — which inherit env, not
    sys.path — crash on the import (the r8 in-suite-only tws failure)."""
    import importlib.util
    import sys

    vendor = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor")
    if not os.path.isdir(os.path.join(vendor, "google", "protobuf")):
        return
    try:
        spec = importlib.util.find_spec("google.protobuf")
    except ModuleNotFoundError:  # no `google` at all
        spec = None
    origin = getattr(spec, "origin", None) if spec else None
    if origin and not os.path.abspath(origin).startswith(vendor + os.sep):
        return  # a real protobuf distribution is installed; workers will find it
    if vendor not in sys.path:
        sys.path.append(vendor)
    existing = os.environ.get("PYTHONPATH", "")
    if vendor not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{existing}{os.pathsep}{vendor}" if existing else vendor
        )


def get_spark(
    app_name: str = "near-public-lakehouse-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession tuned for the engine.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS then 32 (the driver's bench
    shape). On a real cluster the same code runs unchanged — only
    master/shuffle sizing differ.
    """
    ensure_vendored_protobuf()
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or 32
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", 2 * int(cpus)))
    import tempfile

    warehouse = os.environ.get(
        "SPARK_WAREHOUSE_DIR", os.path.join(tempfile.gettempdir(), "spark-warehouse")
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # Catalog tables (bucketed layouts) land outside the repo tree.
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Local shuffle is memory-backed; compress only over the wire.
        .config("spark.shuffle.compress", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return configure_runtime(spark)
