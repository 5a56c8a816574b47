"""Published views over the fixture-built silver tables, checked against
independent DuckDB recomputation of the same semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from near_public_lakehouse_spark.plans import views


@pytest.fixture(scope="module")
def silver(spark, tmp_path_factory):
    from near_public_lakehouse_spark.plans.pipeline import run_batch
    from near_public_lakehouse_spark.sources.fixtures import generate_fixtures

    raw = tmp_path_factory.mktemp("views_raw")
    out = tmp_path_factory.mktemp("views_out")
    generate_fixtures(str(raw), n_blocks=40)
    return run_batch(spark, str(raw), str(out))


def test_receipts_view_joins(silver):
    v = views.receipts_view(
        silver.read("silver_receipts"),
        silver.read("silver_receipt_originated_from_transaction"),
        silver.read("silver_transactions"),
        silver.read("silver_execution_outcomes"),
    )
    rows = v.collect()
    assert len(rows) == silver.read("silver_receipts").count()  # left joins keep all
    action = [r for r in rows if r.receipt_kind == "ACTION"]
    # every landed action receipt has an origin tx and an outcome — except
    # receipts converted from the orphan shard's transactions (h=37 s=1
    # never joined a block, so its txs aren't in silver_transactions)
    orphaned = {r.receipt_id for r in action if r.receipt_id.startswith("RCPT000037S1")}
    assert all(
        r.origin_transaction_hash is not None
        for r in action
        if r.receipt_id not in orphaned
    )
    assert len(orphaned) == 2
    assert all(r.receipt_status is not None for r in action)
    # data receipts have no execution outcome (left-join null)
    data = [r for r in rows if r.receipt_kind == "DATA"]
    assert len(data) > 0 and all(r.receipt_status is None for r in data)


def test_accounts_view_latest_wins(silver):
    v = views.accounts_view(
        silver.read("silver_transaction_actions"),
        silver.read("silver_action_receipt_actions"),
    )
    per_account = v.groupBy("account_id").count().filter(F.col("count") > 1).count()
    assert per_account == 0  # one row per account
    assert v.filter(F.col("account_id") == "temp.near").count() == 1


def test_daily_unique_signers_matches_duckdb(silver, spark):
    q = views.daily_unique_signers_of_contract(
        silver.read("silver_receipts"),
        silver.read("silver_action_receipt_actions"),
        "ft.near",
    )
    got = {(str(r.block_date), r.n_unique_signers) for r in q.collect()}

    import duckdb

    con = duckdb.connect()
    rdir = silver.path("silver_receipts")
    adir = silver.path("silver_action_receipt_actions")
    expected = con.execute(
        f"""
        SELECT r.block_date, count(DISTINCT a.signer_account_id) AS n
        FROM parquet_scan('{rdir}/*/*.parquet', hive_partitioning=1) r
        JOIN parquet_scan('{adir}/*/*.parquet', hive_partitioning=1) a
          ON r.receipt_id = a.receipt_id
        WHERE r.receiver_account_id = 'ft.near'
          AND a.action_kind = 'FUNCTION_CALL' AND a.receiver_account_id = 'ft.near'
        GROUP BY r.block_date
        """
    ).fetchall()
    assert got == {(str(d), n) for d, n in expected}
    assert len(got) >= 2  # spans multiple daily partitions


def test_published_blocks_lossy_cast_only_at_edge(silver):
    from near_public_lakehouse_spark.plans.views import published_blocks

    sb = silver.read("silver_blocks")
    # silver keeps u128 as exact strings...
    assert dict(sb.dtypes)["total_supply"] == "string"
    pub = published_blocks(sb)
    # ...the published edge is DOUBLE, same row count, sane values
    assert dict(pub.dtypes)["total_supply"] == "double"
    assert pub.count() == sb.count()
    assert pub.filter(F.col("total_supply") <= 0).count() == 0


def test_event_contract_materialized_views(silver):
    from near_public_lakehouse_spark.plans.views import (
        ft_events_contracts_by_account,
        nft_events_contracts_by_account,
    )

    ft = silver.read("silver_execution_outcome_ft_event_logs")
    mv = ft_events_contracts_by_account(ft)
    assert mv.count() == mv.distinct().count() > 0
    assert set(mv.columns) == {"affected_account_id", "contract_account_id"}

    nft = silver.read("silver_execution_outcome_nft_event_logs")
    nmv = nft_events_contracts_by_account(nft)
    assert set(nmv.columns) == {
        "old_owner_account_id",
        "new_owner_account_id",
        "contract_account_id",
    }
    assert nmv.count() == nmv.distinct().count() > 0


def test_accounts_view_same_block_delete_outranks_transfer(spark):
    """r13 review: a DELETE_ACCOUNT sharing a block_timestamp with the
    deletion-refund TRANSFER must win the tie — the string tie-break had
    TRANSFER alphabetically outranking it, reporting a deleted account
    as active."""
    from near_public_lakehouse_spark.plans.views import accounts_view

    import pyspark.sql.functions as F  # noqa: F401

    rows = spark.createDataFrame(
        [
            ("alice.near", 1000, "CREATE_ACCOUNT"),
            ("alice.near", 2000, "DELETE_ACCOUNT"),
            ("alice.near", 2000, "TRANSFER"),  # refund leg, same block
        ],
        "receiver_account_id string, block_timestamp long, action_kind string",
    )
    empty = rows.limit(0)
    out = {r.account_id: r for r in accounts_view(rows, empty).collect()}
    assert out["alice.near"].is_active is False
    assert out["alice.near"].last_action_kind == "DELETE_ACCOUNT"
