"""Published view layer: the BQ `receipts` / `accounts` views and the
canonical consumer query, re-expressed over the engine's silver tables
(BQ Writer Views & Data Dictionary.py:265-286, 363-388; README.md:48-61).

These are the J9 view-layer joins: plain Spark SQL views over silver
parquet — the published-dataset surface a consumer actually queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def receipts_view(
    receipts: DataFrame,
    origin: DataFrame,
    transactions: DataFrame,
    outcomes: DataFrame,
) -> DataFrame:
    """`receipts` view: receipt details ⟕ origin tx ⟕ transaction ⟕
    execution outcome (BQ Writer Views :265-286).

    Scale notes: all joins are equi-joins on receipt/tx hashes; the fact
    side (receipts) drives, the helper tables are pruned to join columns
    before the shuffle.
    """
    o = origin.select(
        "receipt_id",
        F.col("originated_from_transaction_hash").alias("origin_transaction_hash"),
    )
    t = transactions.select(
        F.col("transaction_hash").alias("t_hash"),
        F.col("signer_account_id").alias("tx_signer_account_id"),
        F.col("status").alias("tx_status"),
    )
    oc = outcomes.select(
        F.col("receipt_id").alias("oc_receipt_id"),
        F.col("status").alias("receipt_status"),
        F.col("gas_burnt").alias("receipt_gas_burnt"),
        F.col("tokens_burnt").alias("receipt_tokens_burnt"),
    )
    return (
        receipts.join(o, "receipt_id", "left")
        .join(t, F.col("origin_transaction_hash") == F.col("t_hash"), "left")
        .join(oc, F.col("receipt_id") == F.col("oc_receipt_id"), "left")
        .select(
            "block_date",
            "block_timestamp",
            "block_height",
            "block_hash",
            "chunk_hash",
            "receipt_id",
            "receipt_kind",
            "predecessor_account_id",
            "receiver_account_id",
            "origin_transaction_hash",
            "tx_signer_account_id",
            "tx_status",
            "receipt_status",
            "receipt_gas_burnt",
            "receipt_tokens_burnt",
        )
    )


def accounts_view(tx_actions: DataFrame, receipt_actions: DataFrame) -> DataFrame:
    """`accounts` view: latest liveness per account from the union of
    create/delete signals (BQ Writer Views :363-388 uses W1 latest-row
    over a UNION; same shape here with unionByName)."""
    def signals(df: DataFrame) -> DataFrame:
        return df.filter(
            F.col("action_kind").isin("CREATE_ACCOUNT", "DELETE_ACCOUNT", "TRANSFER")
        ).select(
            F.col("receiver_account_id").alias("account_id"),
            "block_timestamp",
            (F.col("action_kind") != "DELETE_ACCOUNT").alias("is_active"),
            F.col("action_kind").alias("last_action_kind"),
        )

    from pyspark.sql import Window

    unioned = signals(tx_actions).unionByName(signals(receipt_actions))
    # same-block ties: deletion OUTRANKS creation/transfer — the string
    # tie-break had TRANSFER alphabetically beating DELETE_ACCOUNT, so an
    # account deleted in the same block as its refund transfer reported
    # is_active=true (r13 review)
    w = Window.partitionBy("account_id").orderBy(
        F.desc("block_timestamp"),
        F.desc(F.col("last_action_kind") == "DELETE_ACCOUNT"),
        F.desc("last_action_kind"),
    )
    return (
        unioned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def daily_unique_signers_of_contract(
    receipts: DataFrame, receipt_actions: DataFrame, contract_id: str
) -> DataFrame:
    """THE reference example query (README.md:48-61): daily count of
    distinct signers calling a contract — filter + equi join
    receipts⋈receipt_actions + COUNT(DISTINCT) + group/order.

    Scale notes: the receiver filter lands on both scan sides before the
    join (check PushedFilters); the join key is receipt_id so the shuffle
    carries only matching receipts.
    """
    r = receipts.filter(F.col("receiver_account_id") == contract_id).select(
        "block_date", "receipt_id"
    )
    a = receipt_actions.filter(
        (F.col("action_kind") == "FUNCTION_CALL")
        & (F.col("receiver_account_id") == contract_id)
    ).select("receipt_id", "signer_account_id")
    return (
        r.join(a, "receipt_id")
        .groupBy("block_date")
        .agg(F.countDistinct("signer_account_id").alias("n_unique_signers"))
        .orderBy("block_date")
    )


def published_blocks(silver_blocks: DataFrame) -> DataFrame:
    """K2 publication projection for `blocks`: the ONLY place u128 money
    becomes DOUBLE — the reference deliberately lossy-casts total_supply /
    gas_price at the BQ edge for consumer ergonomics (BQ Writer
    Stream.py:38-50) while silver keeps exact strings. Everything upstream
    of this function must stay exact."""
    return silver_blocks.select(
        "block_date",
        "block_height",
        "block_timestamp",
        "block_timestamp_utc",
        "block_hash",
        "prev_block_hash",
        F.col("total_supply").cast("double").alias("total_supply"),
        F.col("gas_price").cast("double").alias("gas_price"),
        "author_account_id",
    )


def ft_events_contracts_by_account(ft_events: DataFrame) -> DataFrame:
    """M4 materialized view `ft_events_contracts_by_account` (BQ Writer
    Views :452-459): DISTINCT (account, contract) — refreshed here as a
    scheduled batch rebuild (the OSS stand-in for BQ's 60-min auto
    refresh)."""
    return ft_events.select("affected_account_id", "contract_account_id").distinct()


def nft_events_contracts_by_account(nft_events: DataFrame) -> DataFrame:
    """M4 materialized view `nft_events_contracts_by_account` (:505-512):
    DISTINCT (old_owner, new_owner, contract) over NFT transfer legs."""
    return nft_events.select(
        F.col("affected_account_id").alias("old_owner_account_id"),
        F.col("involved_account_id").alias("new_owner_account_id"),
        "contract_account_id",
    ).distinct()
