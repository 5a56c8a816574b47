from near_public_lakehouse_spark.testing.compare import compare_with_oracle, duckdb_oracle  # noqa: F401
