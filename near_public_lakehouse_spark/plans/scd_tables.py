"""Change feeds for the SCD-1 dimension tables (reference `Silver Lake
Mainnet - SCD tables.sql`): each builds the per-event "changes" stream that
operators.scd.apply_changes folds into keyed state.

KEYS / SEQUENCE BY per table mirror the reference exactly:
- silver_accounts        KEYS(account_id)              SEQ block_timestamp (:14-39)
- silver_access_keys     KEYS(account_id, public_key)  SEQ block_timestamp (:48-77)
- silver_action_function_call_methods KEYS(method_name, contract) SEQ ts (:86-116)
- silver_execution_outcome_events KEYS(standard,event,contract) SEQ ts (:125-149)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BLOCK_CTX = ["block_date", "block_timestamp", "block_timestamp_utc", "block_height"]


def accounts_changes(ara: DataFrame) -> DataFrame:
    """CREATE_ACCOUNT / DELETE_ACCOUNT / TRANSFER action receipts ->
    account liveness changes (SCD tables.sql:14-39; P4 `IN` predicate
    at :34). TRANSFER marks implicit-account creation."""
    acts = ara.filter(
        F.col("action_kind").isin("CREATE_ACCOUNT", "DELETE_ACCOUNT", "TRANSFER")
    )
    return acts.select(
        *_BLOCK_CTX,
        F.col("receiver_account_id").alias("account_id"),
        (F.col("action_kind") != "DELETE_ACCOUNT").alias("is_active"),
        F.col("action_kind").alias("last_action_kind"),
        F.col("receipt_id").alias("last_receipt_id"),
    )


def access_keys_changes(ara: DataFrame) -> DataFrame:
    """ADD_KEY / DELETE_KEY -> key state; permission kind dispatch
    FULL_ACCESS vs FUNCTION_CALL from the access_key JSON
    (SCD tables.sql:48-77, permission test at :66-67)."""
    keys = ara.filter(F.col("action_kind").isin("ADD_KEY", "DELETE_KEY"))
    add_pk = F.get_json_object("args", "$.AddKey.public_key")
    del_pk = F.get_json_object("args", "$.DeleteKey.public_key")
    perm = F.get_json_object("args", "$.AddKey.access_key.permission")
    return keys.select(
        *_BLOCK_CTX,
        F.col("receiver_account_id").alias("account_id"),
        F.coalesce(add_pk, del_pk).alias("public_key"),
        (F.col("action_kind") == "ADD_KEY").alias("is_active"),
        F.when(F.col("action_kind") == "DELETE_KEY", F.lit(None).cast("string"))
        .when(perm == "FullAccess", "FULL_ACCESS")
        .when(perm.isNotNull(), "FUNCTION_CALL")
        .alias("permission_kind"),
        F.when(
            perm.isNotNull() & (perm != "FullAccess"),
            F.get_json_object("args", "$.AddKey.access_key.permission.FunctionCall.receiver_id"),
        ).alias("allowed_receiver_id"),
    )


def function_call_methods_changes(ara: DataFrame) -> DataFrame:
    """Latest sighting of each (method_name, contract) pair
    (SCD tables.sql:86-116; status filter lives upstream)."""
    fc = ara.filter(
        (F.col("action_kind") == "FUNCTION_CALL") & F.col("method_name").isNotNull()
    )
    return fc.select(
        *_BLOCK_CTX,
        "method_name",
        F.col("receiver_account_id").alias("contract_account_id"),
        F.col("signer_account_id").alias("last_signer_account_id"),
        F.col("receipt_id").alias("last_receipt_id"),
    )


def execution_outcome_events_changes(parsed_events: DataFrame) -> DataFrame:
    """Latest sighting of each (standard, version, event, contract)
    (SCD tables.sql:125-149; EVENT_JSON extraction + FAILURE exclusion
    happen in plans.events.event_logs)."""
    return parsed_events.select(
        *_BLOCK_CTX,
        "standard",
        "version",
        "event",
        F.col("executor_account_id").alias("contract_account_id"),
    )
