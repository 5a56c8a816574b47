"""Silver-layer transforms: bronze blocks/shards -> typed, flattened,
date-partitioned tables (the reference's `Silver Lake Mainnet.sql` DAG,
re-expressed as composable DataFrame functions).

Every function takes already-loaded DataFrames and returns a DataFrame, so
the same definition runs batch (tests, backfills) or under Structured
Streaming (streaming/runner.py) — mirroring how one DLT definition serves
both refresh modes.

Audit columns: the reference stamps `_dlt_synced_utc = NOW()` per row
(Mainnet.sql:24-25). `NOW()` is non-deterministic, so transforms accept an
explicit `run_ts` (SURVEY §7 hard-parts) and default to omitting the column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from near_public_lakehouse_spark.functions.time import ns_to_date, ns_to_micros
from near_public_lakehouse_spark.plans.schemas import (
    EXECUTION_OUTCOME_DDL,
    RECEIPT_DDL,
    TRANSACTION_DDL,
)

# ---------------------------------------------------------------------------
# shared column builders


def _ts_cols(ns: Column) -> list[Column]:
    """block_timestamp (ns BIGINT) + UTC timestamp + daily partition date —
    Silver Lake Mainnet.sql:19-22."""
    return [
        ns.cast("bigint").alias("block_timestamp"),
        F.timestamp_micros(ns_to_micros(ns)).alias("block_timestamp_utc"),
        ns_to_date(ns).alias("block_date"),
    ]


def _audit(run_ts) -> list[Column]:
    if run_ts is None:
        return []
    return [F.lit(run_ts).cast("timestamp").alias("_synced_utc")]


# Action-kind dispatch: contains() ladder before any JSON parsing —
# the reference's own manual optimization (Mainnet.sql:213-242).
_ACTION_KINDS = [
    ("CreateAccount", "CREATE_ACCOUNT"),
    ("DeployContract", "DEPLOY_CONTRACT"),
    ("Transfer", "TRANSFER"),
    ("Stake", "STAKE"),
    ("AddKey", "ADD_KEY"),
    ("DeleteKey", "DELETE_KEY"),
    ("DeleteAccount", "DELETE_ACCOUNT"),
    ("Delegate", "DELEGATE_ACTION"),  # reference enum value (Mainnet.sql:221,569)
    ("FunctionCall", "FUNCTION_CALL"),
]


def action_kind(action_json: Column) -> Column:
    expr = None
    for needle, kind in _ACTION_KINDS:
        cond = action_json.contains(needle)
        expr = F.when(cond, kind) if expr is None else expr.when(cond, kind)
    return expr.otherwise("UNKNOWN")


def outcome_status(status: Column) -> Column:
    """Status struct -> enum; exactly one variant set, else UNKNOWN
    (Mainnet.sql:162-167,325-330)."""
    return (
        F.when(status["SuccessReceiptId"].isNotNull(), "SUCCESS_RECEIPT_ID")
        .when(status["SuccessValue"].isNotNull(), "SUCCESS_VALUE")
        .when(status["Failure"].isNotNull(), "FAILURE")
        .otherwise("UNKNOWN")
    )


# ---------------------------------------------------------------------------
# core silver tables


def silver_blocks(blocks: DataFrame, run_ts=None) -> DataFrame:
    """Typed block projection — Silver Lake Mainnet.sql:14-32."""
    h = F.col("header")
    return blocks.select(
        *_ts_cols(h["timestamp"]),
        h["height"].cast("bigint").alias("block_height"),
        h["hash"].alias("block_hash"),
        h["prev_hash"].alias("prev_block_hash"),
        h["epoch_id"].alias("epoch_id"),
        h["total_supply"].alias("total_supply"),  # u128 stays STRING
        h["gas_price"].alias("gas_price"),
        F.col("author").alias("author_account_id"),
        *_audit(run_ts),
    )


def silver_chunks(shards: DataFrame, s_blocks: DataFrame, run_ts=None) -> DataFrame:
    """Chunk header projection joined to its block (J1 inner equi join on
    prev_block_hash — Mainnet.sql:41-64). Orphan shards (no matching block)
    drop, as in the reference."""
    ch = F.col("chunk.header")
    c = shards.select(
        ch["chunk_hash"].alias("chunk_hash"),
        ch["signature"].alias("signature"),
        ch["shard_id"].cast("bigint").alias("shard_id"),
        ch["prev_block_hash"].alias("chunk_prev_block_hash"),
        ch["gas_limit"].cast("bigint").alias("gas_limit"),
        ch["gas_used"].cast("bigint").alias("gas_used"),
        ch["height_created"].cast("bigint").alias("height_created"),
        ch["height_included"].cast("bigint").alias("height_included"),
        ch["balance_burnt"].alias("balance_burnt"),
        ch["encoded_length"].cast("bigint").alias("encoded_length"),
        F.col("chunk.author").alias("chunk_author_account_id"),
    )
    b = s_blocks.select(
        "block_date",
        "block_timestamp",
        "block_timestamp_utc",
        "block_height",
        "block_hash",
        "prev_block_hash",
    )
    joined = c.join(b, c.chunk_prev_block_hash == b.prev_block_hash, "inner")
    return joined.select(
        "block_date",
        "block_timestamp",
        "block_timestamp_utc",
        "block_height",
        "block_hash",
        "chunk_hash",
        "signature",
        "shard_id",
        "gas_limit",
        "gas_used",
        "height_created",
        "height_included",
        "balance_burnt",
        "encoded_length",
        "chunk_author_account_id",
        *_audit(run_ts),
    )


def _shard_block_ctx(shards: DataFrame, s_blocks: DataFrame) -> DataFrame:
    """Shards enriched with their block context (the FROM clause every
    payload table shares)."""
    b = s_blocks.select(
        "block_date",
        "block_timestamp",
        "block_timestamp_utc",
        "block_height",
        "block_hash",
        F.col("prev_block_hash").alias("__join_prev_hash"),
    )
    return shards.join(
        b, F.col("chunk.header.prev_block_hash") == F.col("__join_prev_hash"), "inner"
    ).drop("__join_prev_hash")


_BLOCK_CTX = ["block_date", "block_timestamp", "block_timestamp_utc", "block_height", "block_hash"]


def silver_transactions(shards: DataFrame, s_blocks: DataFrame, run_ts=None) -> DataFrame:
    """posexplode(chunk.transactions) + from_json(F3 DDL) + status CASE —
    Mainnet.sql:120-176. Parses ONCE into a struct then projects (the
    reference's repeated-from_json style at :269-273 is flagged as an
    anti-pattern in SURVEY §4; we keep the parse-once CTE shape)."""
    ctx = _shard_block_ctx(shards, s_blocks)
    exploded = ctx.select(
        *_BLOCK_CTX,
        F.col("chunk.header.chunk_hash").alias("chunk_hash"),
        F.col("chunk.header.shard_id").alias("shard_id"),
        F.posexplode("chunk.transactions").alias("index_in_chunk", "tx_json"),
    )
    t = exploded.withColumn("tx", F.from_json("tx_json", TRANSACTION_DDL))
    oc = F.col("tx.outcome.execution_outcome.outcome")
    return t.select(
        *_BLOCK_CTX,
        "chunk_hash",
        "shard_id",
        "index_in_chunk",
        F.col("tx.transaction.hash").alias("transaction_hash"),
        F.col("tx.transaction.signer_id").alias("signer_account_id"),
        F.col("tx.transaction.public_key").alias("signer_public_key"),
        F.col("tx.transaction.nonce").cast("bigint").alias("nonce"),
        F.col("tx.transaction.receiver_id").alias("receiver_account_id"),
        F.col("tx.transaction.signature").alias("signature"),
        outcome_status(oc["status"]).alias("status"),
        F.coalesce(oc["status"]["SuccessReceiptId"], oc["receipt_ids"][0]).alias(
            "converted_into_receipt_id"
        ),
        oc["gas_burnt"].cast("bigint").alias("receipt_conversion_gas_burnt"),
        oc["tokens_burnt"].alias("receipt_conversion_tokens_burnt"),
        *_audit(run_ts),
    )


def silver_transaction_actions(shards: DataFrame, s_blocks: DataFrame, run_ts=None) -> DataFrame:
    """Explode each transaction's action list with kind dispatch —
    Mainnet.sql:180-248."""
    ctx = _shard_block_ctx(shards, s_blocks)
    exploded = ctx.select(
        *_BLOCK_CTX,
        F.posexplode("chunk.transactions").alias("index_in_chunk", "tx_json"),
    ).withColumn("tx", F.from_json("tx_json", TRANSACTION_DDL))
    actions = exploded.select(
        *_BLOCK_CTX,
        F.col("tx.transaction.hash").alias("transaction_hash"),
        F.col("tx.transaction.signer_id").alias("signer_account_id"),
        F.col("tx.transaction.receiver_id").alias("receiver_account_id"),
        F.posexplode("tx.transaction.actions").alias("index_in_action_group", "action_json"),
    )
    return actions.select(
        *_BLOCK_CTX,
        "transaction_hash",
        "signer_account_id",
        "receiver_account_id",
        "index_in_action_group",
        action_kind(F.col("action_json")).alias("action_kind"),
        F.col("action_json").alias("args"),
        F.col("action_json").contains("delegate_action").alias("is_delegate_action"),
        *_audit(run_ts),
    )


def silver_transaction_actions_function_calls(
    tx_actions: DataFrame, run_ts=None
) -> DataFrame:
    """FUNCTION_CALL args decoded: method_name + unbase64(args) —
    Mainnet.sql:252-280 (args decode at :273)."""
    fc = tx_actions.filter(F.col("action_kind") == "FUNCTION_CALL")
    args_b64 = F.get_json_object("args", "$.FunctionCall.args")
    return fc.select(
        *_BLOCK_CTX,
        "transaction_hash",
        "signer_account_id",
        "receiver_account_id",
        "index_in_action_group",
        F.get_json_object("args", "$.FunctionCall.method_name").alias("method_name"),
        args_b64.alias("args_base64"),
        F.unbase64(args_b64).cast("string").alias("args_decoded"),
        F.get_json_object("args", "$.FunctionCall.deposit").alias("deposit"),
        F.get_json_object("args", "$.FunctionCall.gas").cast("bigint").alias("gas"),
        *_audit(run_ts),
    )


def silver_execution_outcomes(shards: DataFrame, s_blocks: DataFrame, run_ts=None) -> DataFrame:
    """Explode receipt_execution_outcomes + from_json(F5) —
    Mainnet.sql:284-337."""
    ctx = _shard_block_ctx(shards, s_blocks)
    exploded = ctx.select(
        *_BLOCK_CTX,
        F.col("chunk.header.chunk_hash").alias("chunk_hash"),
        F.col("chunk.header.shard_id").alias("shard_id"),
        F.posexplode("receipt_execution_outcomes").alias("index_in_chunk", "oc_json"),
    ).withColumn("oc", F.from_json("oc_json", EXECUTION_OUTCOME_DDL))
    o = F.col("oc.execution_outcome.outcome")
    return exploded.select(
        *_BLOCK_CTX,
        "chunk_hash",
        "shard_id",
        "index_in_chunk",
        F.col("oc.execution_outcome.id").alias("receipt_id"),
        o["executor_id"].alias("executor_account_id"),
        o["gas_burnt"].cast("bigint").alias("gas_burnt"),
        o["tokens_burnt"].alias("tokens_burnt"),
        outcome_status(o["status"]).alias("status"),
        o["logs"].alias("logs"),
        o["receipt_ids"].alias("receipt_ids"),
        *_audit(run_ts),
    )


def silver_execution_outcome_logs(outcomes: DataFrame, run_ts=None) -> DataFrame:
    """posexplode(outcome.logs) — Mainnet.sql:341-379."""
    return outcomes.select(
        *_BLOCK_CTX,
        "chunk_hash",
        "shard_id",
        "receipt_id",
        "executor_account_id",
        "status",
        F.posexplode("logs").alias("index_in_execution_outcome_logs", "log"),
        *_audit(run_ts),
    )


def silver_execution_outcome_receipts(outcomes: DataFrame, run_ts=None) -> DataFrame:
    """Receipt lineage edges: outcome -> produced receipt ids —
    Mainnet.sql:383-411."""
    return outcomes.select(
        *_BLOCK_CTX,
        F.col("receipt_id").alias("executed_receipt_id"),
        F.posexplode("receipt_ids").alias("index_in_execution_outcome", "produced_receipt_id"),
        *_audit(run_ts),
    )


def silver_receipts(shards: DataFrame, s_blocks: DataFrame, run_ts=None) -> DataFrame:
    """Explode chunk.receipts with ACTION/DATA kind dispatch (string
    contains before parse — Mainnet.sql:420-459)."""
    ctx = _shard_block_ctx(shards, s_blocks)
    exploded = ctx.select(
        *_BLOCK_CTX,
        F.col("chunk.header.chunk_hash").alias("chunk_hash"),
        F.col("chunk.header.shard_id").alias("shard_id"),
        F.posexplode("chunk.receipts").alias("index_in_chunk", "receipt_json"),
    )
    kind = (
        F.when(F.col("receipt_json").contains('"Action"'), "ACTION")
        .when(F.col("receipt_json").contains('"Data"'), "DATA")
        .otherwise("UNKNOWN")
    )
    r = exploded.withColumn("r", F.from_json("receipt_json", RECEIPT_DDL))
    return r.select(
        *_BLOCK_CTX,
        "chunk_hash",
        "shard_id",
        "index_in_chunk",
        F.col("r.receipt_id").alias("receipt_id"),
        F.col("r.predecessor_id").alias("predecessor_account_id"),
        F.col("r.receiver_id").alias("receiver_account_id"),
        kind.alias("receipt_kind"),
        F.col("receipt_json").alias("receipt"),
        *_audit(run_ts),
    )


def silver_action_receipts(receipts: DataFrame, run_ts=None) -> DataFrame:
    """ACTION receipt detail — Mainnet.sql:487-512."""
    a = receipts.filter(F.col("receipt_kind") == "ACTION").withColumn(
        "r", F.from_json("receipt", RECEIPT_DDL)
    )
    act = F.col("r.receipt.Action")
    return a.select(
        *_BLOCK_CTX,
        "receipt_id",
        "predecessor_account_id",
        "receiver_account_id",
        act["signer_id"].alias("signer_account_id"),
        act["signer_public_key"].alias("signer_public_key"),
        act["gas_price"].alias("gas_price"),
        *_audit(run_ts),
    )


def silver_action_receipt_actions(receipts: DataFrame, run_ts=None) -> DataFrame:
    """Explode ACTION receipt action lists with kind dispatch —
    Mainnet.sql:516-580."""
    a = receipts.filter(F.col("receipt_kind") == "ACTION").withColumn(
        "r", F.from_json("receipt", RECEIPT_DDL)
    )
    exploded = a.select(
        *_BLOCK_CTX,
        "receipt_id",
        "predecessor_account_id",
        "receiver_account_id",
        F.col("r.receipt.Action.signer_id").alias("signer_account_id"),
        F.posexplode("r.receipt.Action.actions").alias("index_in_action_receipt", "action_json"),
    )
    return exploded.select(
        *_BLOCK_CTX,
        "receipt_id",
        "predecessor_account_id",
        "receiver_account_id",
        "signer_account_id",
        "index_in_action_receipt",
        action_kind(F.col("action_json")).alias("action_kind"),
        F.col("action_json").alias("args"),
        F.get_json_object("action_json", "$.FunctionCall.method_name").alias("method_name"),
        *_audit(run_ts),
    )


def silver_data_receipts(receipts: DataFrame, run_ts=None) -> DataFrame:
    """DATA receipt payloads, unbase64-decoded — Mainnet.sql:636-659
    (payload decode at :652)."""
    d = receipts.filter(F.col("receipt_kind") == "DATA").withColumn(
        "r", F.from_json("receipt", RECEIPT_DDL)
    )
    data = F.col("r.receipt.Data")
    return d.select(
        *_BLOCK_CTX,
        "receipt_id",
        "predecessor_account_id",
        "receiver_account_id",
        data["data_id"].alias("data_id"),
        data["data"].alias("data_base64"),
        F.unbase64(data["data"]).cast("string").alias("data_decoded"),
        data["data"].isNull().alias("data_is_null"),
        *_audit(run_ts),
    )


def silver_action_receipt_output_data(receipts: DataFrame, run_ts=None) -> DataFrame:
    """Explode output_data_receivers — Mainnet.sql:663-698."""
    a = receipts.filter(F.col("receipt_kind") == "ACTION").withColumn(
        "r", F.from_json("receipt", RECEIPT_DDL)
    )
    return a.select(
        *_BLOCK_CTX,
        F.col("receipt_id").alias("output_from_receipt_id"),
        F.explode("r.receipt.Action.output_data_receivers").alias("odr"),
    ).select(
        *_BLOCK_CTX,
        "output_from_receipt_id",
        F.col("odr.data_id").alias("output_data_id"),
        F.col("odr.receiver_id").alias("receiver_account_id"),
        *_audit(run_ts),
    )


def silver_action_receipt_input_data(receipts: DataFrame, run_ts=None) -> DataFrame:
    """Explode input_data_ids — Mainnet.sql:702-737."""
    a = receipts.filter(F.col("receipt_kind") == "ACTION").withColumn(
        "r", F.from_json("receipt", RECEIPT_DDL)
    )
    return a.select(
        *_BLOCK_CTX,
        F.col("receipt_id").alias("input_to_receipt_id"),
        F.explode("r.receipt.Action.input_data_ids").alias("input_data_id"),
        *_audit(run_ts),
    )


def silver_validators_receipt_actions(ara: DataFrame, run_ts=None) -> DataFrame:
    """Staking-pool function calls: receiver LIKE ANY pool suffixes +
    method prefix filters — Mainnet.sql:584-632 (P5)."""
    recv = F.col("receiver_account_id")
    method = F.col("method_name")
    return ara.filter(
        (recv.like("%.poolv1.near") | recv.like("%.pool.near"))
        & (
            method.like("deposit%")
            | method.like("unstake%")
            | method.isin("stake", "stake_all", "withdraw", "withdraw_all")
        )
    ).select(
        *_BLOCK_CTX,
        "receipt_id",
        "predecessor_account_id",
        "receiver_account_id",
        "signer_account_id",
        "method_name",
        F.get_json_object("args", "$.FunctionCall.deposit").alias("deposit"),
        *_audit(run_ts),
    )


def silver_account_changes(shards: DataFrame, s_blocks: DataFrame, run_ts=None) -> DataFrame:
    """Explode state_changes, keep account_update rows (P6 filter on
    state_change.type — Mainnet.sql:74-116)."""
    ctx = _shard_block_ctx(shards, s_blocks)
    sc = ctx.select(
        *_BLOCK_CTX,
        F.posexplode("state_changes").alias("index_in_block", "sc"),
    ).filter(F.col("sc.type") == "account_update")
    return sc.select(
        *_BLOCK_CTX,
        "index_in_block",
        F.col("sc.change.account_id").alias("affected_account_id"),
        F.col("sc.change.amount").alias("nonstaked_balance"),
        F.col("sc.change.locked").alias("staked_balance"),
        F.col("sc.change.storage_usage").cast("bigint").alias("storage_usage"),
        F.col("sc.cause.type").alias("cause"),
        F.col("sc.cause.tx_hash").alias("caused_by_transaction_hash"),
        F.col("sc.cause.receipt_hash").alias("caused_by_receipt_id"),
        *_audit(run_ts),
    )


def silver_receipt_originated_from_transaction(
    transactions: DataFrame, outcome_receipts: DataFrame, max_depth: int = 4, run_ts=None
) -> DataFrame:
    """tx -> receipt origin mapping across the receipt graph —
    Mainnet.sql:464-483. Recursion is bounded by re-joining the lineage
    edge table `max_depth` times (SURVEY §1.1: no graph engine needed).

    Scale notes: each hop is one equi-join on receipt_id; depth is the
    protocol's practical call-chain bound, not data size. unionByName +
    dropDuplicates keeps the frontier minimal per hop.
    """
    base = transactions.select(
        "block_date",
        F.col("converted_into_receipt_id").alias("receipt_id"),
        F.col("transaction_hash").alias("originated_from_transaction_hash"),
    ).filter(F.col("receipt_id").isNotNull())
    edges = outcome_receipts.select(
        F.col("executed_receipt_id").alias("parent_receipt_id"),
        F.col("produced_receipt_id").alias("child_receipt_id"),
        F.col("block_date").alias("child_block_date"),
    )
    result = base
    frontier = base
    for _ in range(max_depth):
        nxt = (
            frontier.join(
                edges, frontier.receipt_id == edges.parent_receipt_id, "inner"
            )
            .select(
                F.col("child_block_date").alias("block_date"),
                F.col("child_receipt_id").alias("receipt_id"),
                "originated_from_transaction_hash",
            )
        )
        if nxt.isEmpty():
            break
        result = result.unionByName(nxt).dropDuplicates(["receipt_id"])
        frontier = nxt
    out = result
    if run_ts is not None:
        out = out.withColumn("_synced_utc", F.lit(run_ts).cast("timestamp"))
    return out
