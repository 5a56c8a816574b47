"""Testnet canonical-STRUCT normalization pipeline (Silver Lake
Testnet.sql:59-111) — the reference's cleanest statement of the chunk
schema, re-expressed as a DataFrame transform.

Where the mainnet silver DAG *flattens* (one table per payload kind), the
testnet pipeline *normalizes in place*: it rebuilds one canonical nested
STRUCT per chunk with explicit CASTs and field order, and stringifies the
open-ended sub-objects (receipts, transactions, receipt_execution_outcomes)
via per-element `TRANSFORM(arr, x -> to_json(x))` so the table schema stays
closed while the payloads stay lossless. This module is the pipeline twin
of that statement: same STRUCT shape, same TRANSFORM/to_json regime, over
the same bronze inputs the mainnet DAG reads — so a fixture test can golden-
compare its output against the flattened mainnet tables.

Our bronze already keeps payload arrays as JSON strings (schemas.py regime
#2), so "stringify" here is a canonicalizing round-trip: parse each element
against the declared DDL, re-serialize with `to_json`. That is exactly what
the reference's `to_json(r)` does to Autoloader's inferred structs — apply
a canonical schema, emit canonical JSON — and it makes the output
byte-stable regardless of the key order the raw feed used.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from near_public_lakehouse_spark.plans.schemas import (
    EXECUTION_OUTCOME_DDL,
    RECEIPT_DDL,
    TRANSACTION_DDL,
)
from near_public_lakehouse_spark.plans.silver import _audit, _ts_cols


def _canonical_header(ch: Column) -> Column:
    """Chunk-header STRUCT rebuild, field-for-field and cast-for-cast the
    reference's (Testnet.sql:61-81): alphabetical field order, BIGINT casts
    on the numeric fields, u128 amounts kept as strings."""
    return F.struct(
        ch["balance_burnt"].alias("balance_burnt"),
        ch["chunk_hash"].alias("chunk_hash"),
        ch["encoded_length"].cast("bigint").alias("encoded_length"),
        ch["encoded_merkle_root"].alias("encoded_merkle_root"),
        ch["gas_limit"].cast("bigint").alias("gas_limit"),
        ch["gas_used"].cast("bigint").alias("gas_used"),
        ch["height_created"].cast("bigint").alias("height_created"),
        ch["height_included"].cast("bigint").alias("height_included"),
        ch["outcome_root"].alias("outcome_root"),
        ch["outgoing_receipts_root"].alias("outgoing_receipts_root"),
        ch["prev_block_hash"].alias("prev_block_hash"),
        ch["prev_state_root"].alias("prev_state_root"),
        ch["rent_paid"].alias("rent_paid"),
        ch["shard_id"].cast("bigint").alias("shard_id"),
        ch["signature"].alias("signature"),
        ch["tx_root"].alias("tx_root"),
        ch["validator_proposals"].cast("array<string>").alias("validator_proposals"),
        ch["validator_reward"].alias("validator_reward"),
    )


def _canonical_state_change(x: Column) -> Column:
    """Per-element state_change STRUCT rebuild (Testnet.sql:86-110): cause
    and change sub-structs with pinned field order; access_key nested one
    level down inside change."""
    return F.struct(
        F.struct(
            x["cause"]["type"].alias("type"),
            x["cause"]["receipt_hash"].alias("receipt_hash"),
            x["cause"]["tx_hash"].alias("tx_hash"),
        ).alias("cause"),
        F.struct(
            x["change"]["account_id"].alias("account_id"),
            x["change"]["amount"].alias("amount"),
            x["change"]["code_hash"].alias("code_hash"),
            x["change"]["locked"].alias("locked"),
            x["change"]["storage_paid_at"].alias("storage_paid_at"),
            x["change"]["storage_usage"].alias("storage_usage"),
            F.struct(
                x["change"]["access_key"]["nonce"].alias("nonce"),
                x["change"]["access_key"]["permission"].alias("permission"),
            ).alias("access_key"),
            x["change"]["public_key"].alias("public_key"),
            x["change"]["key_base64"].alias("key_base64"),
            x["change"]["value_base64"].alias("value_base64"),
            x["change"]["code_base64"].alias("code_base64"),
        ).alias("change"),
        x["type"].alias("type"),
    )


def _canon_json(ddl: str):
    """Canonicalizing per-element serializer: JSON string -> declared
    struct -> canonical JSON (the TRANSFORM(arr, x -> to_json(x)) regime,
    Testnet.sql:81-84)."""

    def inner(el: Column) -> Column:
        return F.to_json(F.from_json(el, f"struct<{ddl}>"))

    return inner


def silver_chunks_testnet(shards: DataFrame, s_blocks: DataFrame, run_ts=None) -> DataFrame:
    """The testnet `silver_chunks` table: block context + flattened header
    hot columns + ONE canonical nested `chunk` STRUCT + normalized
    state_changes — Silver Lake Testnet.sql:40-113.

    Join is chunk.header.prev_block_hash -> block.prev_block_hash, same J1
    equi-join as the mainnet twin (orphan shards drop). The payload arrays
    stay arrays (no explode): this table is the lossless archive the
    flattened tables derive from, which is why the fixture test can
    reconstruct silver_transactions rows from `chunk.transactions` alone.
    """
    ch = F.col("chunk.header")
    b = s_blocks.select(
        "block_date",
        "block_timestamp",
        "block_timestamp_utc",
        "block_height",
        "block_hash",
        F.col("prev_block_hash").alias("__join_prev_hash"),
    )
    joined = shards.join(b, ch["prev_block_hash"] == F.col("__join_prev_hash"), "inner").drop(
        "__join_prev_hash"
    )
    return joined.select(
        "block_date",
        "block_height",
        "block_timestamp",
        "block_timestamp_utc",
        "block_hash",
        *_audit(run_ts),
        ch["chunk_hash"].alias("chunk_hash"),
        ch["shard_id"].cast("bigint").alias("shard_id"),
        ch["signature"].alias("signature"),
        ch["gas_limit"].cast("bigint").alias("gas_limit"),
        ch["gas_used"].cast("bigint").alias("gas_used"),
        F.col("chunk.author").alias("author_account_id"),
        F.struct(
            F.col("chunk.author").alias("author"),
            _canonical_header(ch).alias("header"),
            F.transform(F.col("chunk.receipts"), _canon_json(RECEIPT_DDL)).alias("receipts"),
            F.transform(F.col("chunk.transactions"), _canon_json(TRANSACTION_DDL)).alias(
                "transactions"
            ),
        ).alias("chunk"),
        F.transform(
            F.col("receipt_execution_outcomes"), _canon_json(EXECUTION_OUTCOME_DDL)
        ).alias("receipt_execution_outcomes"),
        F.transform(F.col("state_changes"), _canonical_state_change).alias("state_changes"),
    )
