"""Data dictionary (M5): published column descriptions.

The reference publishes a per-column data dictionary alongside the BQ
views (BQ Writer Views & Data Dictionary.py:38-51 et seq. — every
published table carries column descriptions). Here the dictionary is a
queryable DataFrame surface, and the test suite enforces the contract the
reference only documents: every column of every published view MUST have a
description (schema drift that forgets the dictionary fails CI).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DICTIONARY: dict[str, dict[str, str]] = {
    "receipts": {
        "block_date": "UTC date of the block (daily partition key)",
        "block_timestamp": "block time, nanoseconds since epoch",
        "block_height": "height of the block containing the receipt",
        "block_hash": "base58 hash of the containing block",
        "chunk_hash": "base58 hash of the containing chunk",
        "receipt_id": "unique id of the receipt (base58)",
        "receipt_kind": "ACTION or DATA",
        "predecessor_account_id": "account that produced the receipt",
        "receiver_account_id": "account the receipt targets",
        "origin_transaction_hash": "hash of the transaction this receipt originated from",
        "tx_signer_account_id": "signer of the origin transaction",
        "tx_status": "origin transaction status (SUCCESS_*/FAILURE/UNKNOWN)",
        "receipt_status": "execution outcome status of the receipt",
        "receipt_gas_burnt": "gas burnt executing the receipt",
        "receipt_tokens_burnt": "tokens burnt executing the receipt (yoctoNEAR string)",
    },
    "accounts": {
        "account_id": "the account (human-readable id)",
        "block_timestamp": "time of the account's latest lifecycle action (ns)",
        "is_active": "false iff the latest lifecycle action was DELETE_ACCOUNT",
        "last_action_kind": "latest lifecycle action kind observed",
    },
}


def data_dictionary_df(spark: SparkSession) -> DataFrame:
    """The dictionary as a (table_name, column_name, description) frame —
    the queryable equivalent of the reference's published dictionary."""
    rows = [
        (t, c, d) for t, cols in DICTIONARY.items() for c, d in cols.items()
    ]
    return spark.createDataFrame(
        rows, "table_name string, column_name string, description string"
    )


def undocumented_columns(view_name: str, df: DataFrame) -> list[str]:
    """Columns of `df` missing a dictionary entry for `view_name`."""
    documented = DICTIONARY.get(view_name, {})
    return [c for c in df.columns if c not in documented]


def stale_documented_columns(view_name: str, df: DataFrame) -> list[str]:
    """The other drift direction (r13 review): dictionary entries whose
    column no longer exists on the view — the published dictionary would
    otherwise keep advertising a removed column forever."""
    documented = DICTIONARY.get(view_name, {})
    have = set(df.columns)
    return [c for c in documented if c not in have]
