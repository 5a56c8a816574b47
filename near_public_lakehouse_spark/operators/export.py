"""Public-dataset file exports (K4): hourly folder dumps of published
tables, `<base>/<format>/<table>/<YYYY/MM/DD/HH>/` — the OSS mapping of the
reference's hourly Avro exports to GCS (NEAR Public Datasets.py:396-409).

The Avro DataSource (`spark-avro`) is an external Spark module; this
container's pyspark distribution does not bundle it, so the writer probes
for it at runtime and falls back to parquet with identical layout. The
export contract (path scheme, overwrite-by-hour idempotence, schema
round-trip) is format-independent and is what the tests pin down.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

_AVRO_PROBE: bool | None = None


def avro_available(spark: SparkSession) -> bool:
    """True iff the spark-avro DataSource actually works (functional probe:
    a classpath check is not enough — Spark 4 ships some
    `org.apache.spark.sql.avro` classes without registering the format)."""
    global _AVRO_PROBE
    if _AVRO_PROBE is None:
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="avro_probe_")
        try:
            spark.createDataFrame([(1,)], "id long").write.format("avro").mode(
                "overwrite"
            ).save(f"{d}/probe")
            _AVRO_PROBE = True
        except Exception:
            _AVRO_PROBE = False
        finally:
            shutil.rmtree(d, ignore_errors=True)
    return _AVRO_PROBE


def hourly_export_path(base_path: str, fmt: str, table: str, ts: datetime) -> str:
    """`<base>/<fmt>/<table>/<Y/m/d/H>` — the reference's folder scheme."""
    return f"{base_path}/{fmt}/{table}/{ts.strftime('%Y/%m/%d/%H')}"


def export_hourly(
    df: DataFrame,
    base_path: str,
    table: str,
    ts: datetime,
    fmt: str | None = None,
) -> str:
    """Write one hour's export of `df`; returns the path written.

    Overwrite mode makes the hourly job idempotent (a rerun of the same
    hour replaces, never duplicates — the reference reruns trailing hours
    after late-data MERGEs). `fmt=None` auto-selects avro when present.
    """
    spark = df.sparkSession
    if fmt is None:
        fmt = "avro" if avro_available(spark) else "parquet"
    path = hourly_export_path(base_path, fmt, table, ts)
    df.write.format(fmt).mode("overwrite").save(path)
    return path
