from near_public_lakehouse_spark.sources.tables import TABLES, load_table, load_tables  # noqa: F401
