"""Testnet canonical-STRUCT pipeline twin (Silver Lake Testnet.sql:59-111):
the normalized `silver_chunks_testnet` table must be a lossless archive the
flattened mainnet tables can be reconstructed from, with a canonical
(pinned field order, casts applied) nested schema."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from near_public_lakehouse_spark.plans.pipeline import run_batch
from near_public_lakehouse_spark.plans.schemas import TRANSACTION_DDL
from near_public_lakehouse_spark.sources.fixtures import generate_fixtures

pytestmark = pytest.mark.slow  # r16 two-lane suite: close_round runs the full lane


N_BLOCKS = 60
N_SHARDS = 2


@pytest.fixture(scope="module")
def pipe(spark, tmp_path_factory):
    raw = tmp_path_factory.mktemp("tn_raw")
    generate_fixtures(str(raw), n_blocks=N_BLOCKS, n_shards=N_SHARDS)
    out = tmp_path_factory.mktemp("tn_out")
    return run_batch(spark, str(raw), str(out))


def test_canonical_schema_shape(pipe):
    t = pipe.read("silver_chunks_testnet")
    chunk = t.schema["chunk"].dataType
    header = chunk["header"].dataType
    # Reference pins alphabetical field order in the rebuilt header STRUCT.
    names = [f.name for f in header.fields]
    assert names == sorted(names)
    got_types = {f.name: f.dataType.simpleString() for f in header.fields}
    assert got_types.items() >= {
        "encoded_length": "bigint",
        "gas_limit": "bigint",
        "gas_used": "bigint",
        "height_created": "bigint",
        "height_included": "bigint",
        "shard_id": "bigint",
        "validator_proposals": "array<string>",
    }.items()
    # Open-ended payloads are stringified per element (TRANSFORM + to_json).
    assert chunk["receipts"].dataType.simpleString() == "array<string>"
    assert chunk["transactions"].dataType.simpleString() == "array<string>"
    assert t.schema["receipt_execution_outcomes"].dataType.simpleString() == "array<string>"
    # state_changes stays a typed STRUCT array with the pinned nesting.
    sc = t.schema["state_changes"].dataType.elementType
    assert [f.name for f in sc.fields] == ["cause", "change", "type"]
    assert [f.name for f in sc["cause"].dataType.fields] == ["type", "receipt_hash", "tx_hash"]
    assert "access_key" in [f.name for f in sc["change"].dataType.fields]


def test_same_join_semantics_as_mainnet_chunks(pipe):
    tn = pipe.read("silver_chunks_testnet")
    mn = pipe.read("silver_chunks")
    assert tn.count() == mn.count()  # same J1 join, same orphan drop
    mismatched = (
        tn.select("chunk_hash", "shard_id", "gas_limit", "gas_used", "block_hash")
        .exceptAll(mn.select("chunk_hash", "shard_id", "gas_limit", "gas_used", "block_hash"))
        .count()
    )
    assert mismatched == 0


def test_transactions_reconstruct_from_canonical_chunk(pipe):
    """Exploding chunk.transactions out of the archive table and re-parsing
    the canonical JSON must reproduce silver_transactions' core columns."""
    tn = pipe.read("silver_chunks_testnet")
    rebuilt = (
        tn.select(
            "block_hash",
            "chunk_hash",
            F.posexplode("chunk.transactions").alias("index_in_chunk", "tx_json"),
        )
        .withColumn("tx", F.from_json("tx_json", TRANSACTION_DDL))
        .select(
            "block_hash",
            "chunk_hash",
            "index_in_chunk",
            F.col("tx.transaction.hash").alias("transaction_hash"),
            F.col("tx.transaction.signer_id").alias("signer_account_id"),
            F.col("tx.transaction.nonce").cast("bigint").alias("nonce"),
            F.col("tx.transaction.receiver_id").alias("receiver_account_id"),
        )
    )
    expected = pipe.read("silver_transactions").select(
        "block_hash",
        "chunk_hash",
        "index_in_chunk",
        "transaction_hash",
        "signer_account_id",
        "nonce",
        "receiver_account_id",
    )
    assert rebuilt.count() == expected.count() > 0
    assert rebuilt.exceptAll(expected).count() == 0
    assert expected.exceptAll(rebuilt).count() == 0


def test_state_changes_reconstruct_account_changes(pipe):
    """The normalized state_changes array must carry everything
    silver_account_changes flattens out of the raw feed."""
    tn = pipe.read("silver_chunks_testnet")
    rebuilt = (
        tn.select("block_hash", F.posexplode("state_changes").alias("index_in_block", "sc"))
        .filter(F.col("sc.type") == "account_update")
        .select(
            "block_hash",
            "index_in_block",
            F.col("sc.change.account_id").alias("affected_account_id"),
            F.col("sc.change.amount").alias("nonstaked_balance"),
            F.col("sc.change.locked").alias("staked_balance"),
            F.col("sc.cause.type").alias("cause"),
        )
    )
    expected = pipe.read("silver_account_changes").select(
        "block_hash",
        "index_in_block",
        "affected_account_id",
        "nonstaked_balance",
        "staked_balance",
        "cause",
    )
    assert rebuilt.count() == expected.count() > 0
    assert rebuilt.exceptAll(expected).count() == 0


def test_canonical_json_is_stable(pipe):
    """to_json(from_json(x)) must be a fixed point: re-canonicalizing the
    archived payload changes nothing (byte-stable regardless of raw key
    order)."""
    tn = pipe.read("silver_chunks_testnet")
    drift = tn.select(
        F.explode("chunk.transactions").alias("tx_json")
    ).filter(
        F.to_json(F.from_json("tx_json", f"struct<{TRANSACTION_DDL}>")) != F.col("tx_json")
    )
    assert drift.count() == 0
