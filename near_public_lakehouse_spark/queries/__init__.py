from near_public_lakehouse_spark.queries.registry import REGISTRY, Query, all_queries, query  # noqa: F401
