"""PySpark-native analytics engine with the query/data-processing
capabilities of ``near/near-public-lakehouse``, rebuilt Spark-first.

Layout:
    session    - SparkSession factory + runtime conf (deterministic, AQE)
    sources    - batch/stream readers (parquet tables, JSON file streams, fixtures)
    functions  - scalar helpers (JSON path, ns-timestamps, decimal math)
    operators  - engine operators (SCD1 upsert, merge, dedup, similarity, text)
    plans      - the NEAR-shaped medallion pipeline (bronze -> silver -> gold)
    streaming  - DLT-replacement pipeline runner (DAG of streaming queries)
    queries    - oracle-checked analytical queries over the driver testdata
"""

__version__ = "0.1.0"

from near_public_lakehouse_spark.session import configure_runtime, get_spark  # noqa: F401
