"""Explicit bronze schemas for the NEAR-shaped raw JSON stream.

The reference lets Databricks Autoloader infer these (Mainnet
Loader.py:24-26, `cloudFiles.inferColumnTypes`); open-source Structured
Streaming file sources need a declared schema, and FIXTURES.md F1/F2 pin
the canonical shape (derived from the explicit STRUCT rebuild in Silver
Lake Testnet.sql:59-111). Semi-structured payloads (transactions, receipts,
outcomes) stay JSON STRINGS at the bronze edge and are parsed at query time
with `from_json` — exactly the reference's regime #2 (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _s(*fields: StructField) -> StructType:
    return StructType(list(fields))


def _f(name: str, dtype) -> StructField:
    return StructField(name, dtype, True)


S = StringType()
L = LongType()

# F1: one row per `*block.json` file.
BLOCK_SCHEMA = _s(
    _f("author", S),
    _f(
        "header",
        _s(
            _f("height", L),
            _f("timestamp", L),  # ns since epoch
            _f("hash", S),
            _f("prev_hash", S),
            _f("epoch_id", S),
            _f("total_supply", S),  # u128 decimal string
            _f("gas_price", S),  # u128 decimal string
        ),
    ),
    _f("chunks", ArrayType(S)),
)

# F2: one row per `*shard*.json` file. Payload arrays stay JSON strings.
SHARD_SCHEMA = _s(
    _f(
        "chunk",
        _s(
            _f("author", S),
            _f(
                "header",
                _s(
                    _f("chunk_hash", S),
                    _f("shard_id", L),
                    _f("signature", S),
                    _f("gas_limit", L),
                    _f("gas_used", L),
                    _f("height_created", L),
                    _f("height_included", L),
                    _f("prev_block_hash", S),
                    _f("balance_burnt", S),
                    _f("encoded_length", L),
                    _f("encoded_merkle_root", S),
                    _f("outcome_root", S),
                    _f("outgoing_receipts_root", S),
                    _f("prev_state_root", S),
                    _f("rent_paid", S),
                    _f("tx_root", S),
                    _f("validator_proposals", ArrayType(S)),
                    _f("validator_reward", S),
                ),
            ),
            _f("transactions", ArrayType(S)),  # JSON strings, F3
            _f("receipts", ArrayType(S)),  # JSON strings, F4
        ),
    ),
    _f("receipt_execution_outcomes", ArrayType(S)),  # JSON strings, F5
    _f(
        "state_changes",
        ArrayType(
            _s(
                _f("type", S),
                _f("cause", _s(_f("type", S), _f("receipt_hash", S), _f("tx_hash", S))),
                _f(
                    "change",
                    _s(
                        _f("account_id", S),
                        _f("amount", S),
                        _f("locked", S),
                        _f("code_hash", S),
                        _f("storage_paid_at", L),
                        _f("storage_usage", L),
                        _f("access_key", _s(_f("nonce", L), _f("permission", S))),
                        _f("public_key", S),
                        _f("key_base64", S),
                        _f("value_base64", S),
                        _f("code_base64", S),
                    ),
                ),
            )
        ),
    ),
)

# DDL strings for query-time from_json of the payload arrays.
# Transaction element (F3; reference DDL at Silver Lake Mainnet.sql:141).
TRANSACTION_DDL = """
    transaction STRUCT<
        hash: STRING, nonce: BIGINT, public_key: STRING, receiver_id: STRING,
        signature: STRING, signer_id: STRING, actions: ARRAY<STRING>>,
    outcome STRUCT<execution_outcome: STRUCT<
        block_hash: STRING, id: STRING,
        outcome: STRUCT<
            executor_id: STRING, gas_burnt: BIGINT, logs: ARRAY<STRING>,
            receipt_ids: ARRAY<STRING>,
            status: STRUCT<SuccessReceiptId: STRING, SuccessValue: STRING,
                           Failure: STRING>,
            tokens_burnt: STRING>>>
""".strip()

# Receipt element (F4; kind dispatch at Silver Lake Mainnet.sql:449-459).
RECEIPT_DDL = """
    predecessor_id STRING, receiver_id STRING, receipt_id STRING,
    receipt STRUCT<
        Action: STRUCT<
            actions: ARRAY<STRING>, gas_price: STRING,
            input_data_ids: ARRAY<STRING>,
            output_data_receivers: ARRAY<STRUCT<data_id: STRING, receiver_id: STRING>>,
            signer_id: STRING, signer_public_key: STRING>,
        Data: STRUCT<data_id: STRING, data: STRING>>
""".strip()

# Receipt execution outcome element (F5; Silver Lake Mainnet.sql:305).
EXECUTION_OUTCOME_DDL = f"""
    execution_outcome STRUCT<
        block_hash: STRING, id: STRING,
        outcome: STRUCT<
            executor_id: STRING, gas_burnt: BIGINT, logs: ARRAY<STRING>,
            receipt_ids: ARRAY<STRING>,
            status: STRUCT<SuccessReceiptId: STRING, SuccessValue: STRING,
                           Failure: STRING>,
            tokens_burnt: STRING>>,
    receipt STRUCT<{RECEIPT_DDL}>
""".strip()

# EVENT_JSON payload (F7; SCD tables.sql:131-144, FT and NFT events.py:42-68).
EVENT_JSON_DDL = """
    standard STRING, version STRING, event STRING,
    data ARRAY<STRUCT<
        owner_id: STRING, old_owner_id: STRING, new_owner_id: STRING,
        amount: STRING, token_ids: ARRAY<STRING>, amounts: ARRAY<STRING>,
        authorized_id: STRING, memo: STRING,
        account_id: STRING, intent_hash: STRING, referral: STRING>>
""".strip()
