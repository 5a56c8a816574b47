"""Salted skew joins, date-sliced backfill, and the data dictionary."""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from near_public_lakehouse_spark.operators.backfill import backfill_by_slices, date_slices
from near_public_lakehouse_spark.operators.skew import salted_join

pytestmark = pytest.mark.slow  # r16 two-lane suite: close_round runs the full lane



# --- skew ------------------------------------------------------------------


@pytest.fixture(scope="module")
def skewed_pair(spark):
    """90% of fact rows hit one hot key (the 'system' account pattern)."""
    fact = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("system"))
        .otherwise(F.concat(F.lit("acct"), F.col("id")))
        .alias("account_id"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.createDataFrame(
        [("system", "SYSTEM"), ("acct19", "A19"), ("missing", "M")],
        "account_id string, kind string",
    )
    return fact, dim


def test_salted_inner_join_matches_plain(spark, skewed_pair):
    fact, dim = skewed_pair
    plain = fact.join(dim, "account_id").orderBy("fact_id").collect()
    salted = salted_join(fact, dim, ["account_id"], buckets=8).orderBy("fact_id").collect()
    assert [tuple(r) for r in salted] == [tuple(r) for r in plain]
    assert len(plain) == 1801  # 1800 hot + acct19


def test_salted_left_join_matches_plain(spark, skewed_pair):
    fact, dim = skewed_pair
    plain = fact.join(dim, "account_id", "left").orderBy("fact_id", "kind").collect()
    salted = (
        salted_join(fact, dim, ["account_id"], buckets=8, how="left")
        .orderBy("fact_id", "kind")
        .collect()
    )
    assert [tuple(r) for r in salted] == [tuple(r) for r in plain]
    assert len(plain) == 2000  # left keeps all fact rows


def test_salt_spreads_hot_key(spark, skewed_pair):
    fact, _ = skewed_pair
    from near_public_lakehouse_spark.operators.skew import SALT_COL

    salted = fact.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in fact.columns]), F.lit(8))
    )
    n_buckets = (
        salted.filter(F.col("account_id") == "system").select(SALT_COL).distinct().count()
    )
    assert n_buckets == 8  # the hot key now occupies every salt bucket


# --- backfill --------------------------------------------------------------


def test_date_slices_cover_range_exactly():
    s = date_slices(date(2020, 7, 21), date(2022, 1, 5), 365)
    assert s[0][0] == date(2020, 7, 21) and s[-1][1] == date(2022, 1, 5)
    # contiguous, non-overlapping
    for (_lo, hi), (lo2, _hi) in zip(s, s[1:]):
        assert (lo2 - hi).days == 1
    assert all((hi - lo).days + 1 <= 365 for lo, hi in s)


def test_backfill_slices_equal_one_shot(spark, tmp_path):
    src = spark.range(300).select(
        F.col("id").alias("k"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 90).cast("int")).alias(
            "d"
        ),
        (F.col("id") * 2).alias("v"),
    )
    sliced_path = str(tmp_path / "sliced")
    oneshot_path = str(tmp_path / "oneshot")
    n = backfill_by_slices(
        spark, src, sliced_path, keys=["k"], date_col="d",
        start=date(2024, 1, 1), end=date(2024, 3, 30), slice_days=30,
        partition_col="d",
    )
    assert n == 3
    src.write.mode("overwrite").partitionBy("d").parquet(oneshot_path)
    a = spark.read.parquet(sliced_path).orderBy("k").collect()
    b = spark.read.parquet(oneshot_path).orderBy("k").collect()
    assert [tuple(sorted(r.asDict().items())) for r in a] == [
        tuple(sorted(r.asDict().items())) for r in b
    ]


def test_backfill_slice_rerun_is_idempotent(spark, tmp_path):
    src = spark.range(50).select(
        F.col("id").alias("k"), F.lit("2024-01-01").cast("date").alias("d"), F.col("id").alias("v")
    )
    path = str(tmp_path / "t")
    for _ in range(2):  # rerunning the same slice must not duplicate
        backfill_by_slices(
            spark, src, path, keys=["k"], date_col="d",
            start=date(2024, 1, 1), end=date(2024, 1, 1), partition_col="d",
        )
    assert spark.read.parquet(path).count() == 50


# --- data dictionary -------------------------------------------------------


def test_every_published_view_column_documented(spark, tmp_path_factory):
    from near_public_lakehouse_spark.plans import views
    from near_public_lakehouse_spark.plans.dictionary import (
        data_dictionary_df,
        undocumented_columns,
    )
    from near_public_lakehouse_spark.plans.pipeline import run_batch
    from near_public_lakehouse_spark.sources.fixtures import generate_fixtures

    raw = tmp_path_factory.mktemp("dict_raw")
    out = tmp_path_factory.mktemp("dict_out")
    generate_fixtures(str(raw), n_blocks=8)
    silver = run_batch(spark, str(raw), str(out))

    receipts = views.receipts_view(
        silver.read("silver_receipts"),
        silver.read("silver_receipt_originated_from_transaction"),
        silver.read("silver_transactions"),
        silver.read("silver_execution_outcomes"),
    )
    accounts = views.accounts_view(
        silver.read("silver_transaction_actions"),
        silver.read("silver_action_receipt_actions"),
    )
    assert undocumented_columns("receipts", receipts) == []
    assert undocumented_columns("accounts", accounts) == []

    dd = data_dictionary_df(spark)
    assert dd.filter(F.col("description") == "").count() == 0
    assert dd.count() == len(receipts.columns) + len(accounts.columns)
