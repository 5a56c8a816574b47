"""SQL-catalog registration (U6): the reference exposes its Python UDFs to
SQL with `spark.udf.register` (FT and NFT events.py:25; Epochs pipeline
:150,281). Same surface here — after `register_sql_functions(spark)`, SQL
text can call the engine's domain functions directly.

Column-expression helpers (ns-time math, decimal money sums, `j()` JSON
path extraction) are intentionally NOT registered: they compile to built-in
Catalyst expressions, so SQL text already has their spellings
(`timestamp_micros`, `get_json_object`, decimal casts) — registering Python
wrappers would move them out of codegen onto the slow path.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the engine's Python UDFs for SQL visibility; returns the
    registered names (idempotent — re-registration replaces)."""
    from near_public_lakehouse_spark.plans.lockup import locked_amount_udf

    spark.udf.register("locked_amount", locked_amount_udf())
    return ["locked_amount"]
