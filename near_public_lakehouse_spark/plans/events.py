"""EVENT_JSON pipelines: FT / NFT / multi-token event extraction and the
NEAR Social parse chain.

Folds the reference's three EVENT_JSON consumers into one operator (SURVEY
§2.13 L3): the SQL FT/NFT tables (FT and NFT events.py:42-68,120-141), the
SCD event-log source (SCD tables.sql:129-149) and the Rust defuse indexer
(event_handler.rs:45-88) all share: trim -> prefix test -> JSON parse ->
standard filter -> FAILURE exclusion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from near_public_lakehouse_spark.functions.json import j
from near_public_lakehouse_spark.plans.schemas import EVENT_JSON_DDL

_BLOCK_CTX = ["block_date", "block_timestamp", "block_timestamp_utc", "block_height", "block_hash"]

EVENT_PREFIX = "EVENT_JSON:"


def event_logs(outcome_logs: DataFrame) -> DataFrame:
    """Parsed EVENT_JSON rows: prefix test + substring + from_json; malformed
    payloads yield a NULL struct and are dropped, never failing the pipeline
    (defensive parsing — SURVEY §5); FAILURE outcomes excluded
    (SCD tables.sql:137)."""
    logs = outcome_logs.filter(
        F.trim(F.col("log")).startswith(EVENT_PREFIX) & (F.col("status") != "FAILURE")
    )
    parsed = logs.withColumn(
        "event", F.from_json(F.substring(F.trim(F.col("log")), len(EVENT_PREFIX) + 1, 1_000_000), EVENT_JSON_DDL)
    )
    return parsed.filter(
        F.col("event").isNotNull() & F.col("event.standard").isNotNull()
    ).select(
        *_BLOCK_CTX,
        "chunk_hash",
        "shard_id",
        "status",
        "receipt_id",
        "executor_account_id",
        "index_in_execution_outcome_logs",
        F.col("event.standard").alias("standard"),
        F.col("event.version").alias("version"),
        F.col("event.event").alias("event"),
        F.col("event.data").alias("data"),
    )


def _event_index(shard_like: F.Column, type_index: int, rn: F.Column) -> F.Column:
    """U1 event-index packing in DECIMAL(38,0) (FT and NFT
    events.py:17-25; BIGINT would overflow — SURVEY §7)."""
    return (
        F.col("block_timestamp").cast("decimal(38,0)") * F.lit(10_000_000_000)
        + shard_like.cast("decimal(38,0)") * F.lit(100_000_000)
        + F.lit(type_index) * F.lit(1_000_000)
        + rn
    ).cast("decimal(38,0)").cast("string")


def silver_execution_outcome_ft_event_logs(parsed_events: DataFrame) -> DataFrame:
    """nep141 double-entry legs: mint -> +amount, burn -> -amount,
    transfer -> (-old, +new) via inline(filter(array(...))) — the fused
    UNION ALL of FT and NFT events.py:57-68 (G4/G6). Amounts are
    DECIMAL(38,0), negation included (the u128 rule)."""
    ft = parsed_events.filter(F.col("standard") == "nep141").select(
        *_BLOCK_CTX,
        "chunk_hash",
        "shard_id",
        "standard",
        "status",
        "receipt_id",
        "executor_account_id",
        "event",
        F.posexplode("data").alias("index_in_data", "d"),
    )
    amount = F.col("d.amount").cast("decimal(38,0)")
    legs = F.array(
        F.struct(
            F.col("d.owner_id").alias("affected_account_id"),
            F.lit(None).cast("string").alias("involved_account_id"),
            amount.alias("delta_amount"),
            (F.col("event") == "ft_mint").alias("keep"),
        ),
        F.struct(
            F.col("d.owner_id").alias("affected_account_id"),
            F.lit(None).cast("string").alias("involved_account_id"),
            (-amount).alias("delta_amount"),
            (F.col("event") == "ft_burn").alias("keep"),
        ),
        F.struct(
            F.col("d.old_owner_id").alias("affected_account_id"),
            F.col("d.new_owner_id").alias("involved_account_id"),
            (-amount).alias("delta_amount"),
            (F.col("event") == "ft_transfer").alias("keep"),
        ),
        F.struct(
            F.col("d.new_owner_id").alias("affected_account_id"),
            F.col("d.old_owner_id").alias("involved_account_id"),
            amount.alias("delta_amount"),
            (F.col("event") == "ft_transfer").alias("keep"),
        ),
    )
    exploded = ft.select(
        *_BLOCK_CTX,
        "chunk_hash",
        "shard_id",
        "standard",
        "status",
        F.col("d.memo").alias("event_memo"),
        "receipt_id",
        F.col("executor_account_id").alias("contract_account_id"),
        "event",
        "index_in_data",
        F.inline(F.filter(legs, lambda s: s.keep)),
    ).drop("keep")
    w = Window.partitionBy("block_hash").orderBy(
        "receipt_id", "index_in_data", "affected_account_id"
    )
    rn = F.row_number().over(w) - 1
    return exploded.select(
        *_BLOCK_CTX,
        "chunk_hash",
        "shard_id",
        "standard",
        # reference FT and NFT events.py:56,98: FT rows carry the literal
        # 'near' token_id (the contract is the denomination)
        F.lit("near").alias("token_id"),
        "status",
        "event_memo",
        _event_index(F.lit(0), 1, rn).alias("event_index"),
        "receipt_id",
        "contract_account_id",
        F.col("event").alias("cause"),
        "affected_account_id",
        "involved_account_id",
        F.col("delta_amount").cast("string").alias("delta_amount"),
    )


def silver_execution_outcome_nft_event_logs(parsed_events: DataFrame) -> DataFrame:
    """nep171 token rows: explode token_ids per event datum — FT and NFT
    events.py:112-141."""
    nft = parsed_events.filter(F.col("standard") == "nep171").select(
        *_BLOCK_CTX,
        "chunk_hash",
        "shard_id",
        "standard",
        "status",
        "receipt_id",
        F.col("executor_account_id").alias("contract_account_id"),
        "event",
        F.posexplode("data").alias("index_in_data", "d"),
    )
    tokens = nft.select(
        *_BLOCK_CTX,
        "chunk_hash",
        "shard_id",
        "standard",
        "status",
        F.col("d.memo").alias("event_memo"),
        F.col("d.authorized_id").alias("authorized_account_id"),
        "receipt_id",
        "contract_account_id",
        "event",
        "index_in_data",
        F.coalesce(F.col("d.new_owner_id"), F.col("d.owner_id")).alias("affected_account_id"),
        F.col("d.old_owner_id").alias("involved_account_id"),
        F.explode("d.token_ids").alias("token_id"),
    )
    w = Window.partitionBy("block_hash").orderBy("receipt_id", "index_in_data", "token_id")
    rn = F.row_number().over(w) - 1
    return tokens.select(
        *_BLOCK_CTX,
        "chunk_hash",
        "shard_id",
        "standard",
        "status",
        "event_memo",
        "authorized_account_id",
        _event_index(F.lit(0), 2, rn).alias("event_index"),
        "receipt_id",
        "contract_account_id",
        F.col("event").alias("cause"),
        "token_id",
        "affected_account_id",
        "involved_account_id",
    )


def silver_nep245_events(parsed_events: DataFrame) -> DataFrame:
    """Multi-token events: zip token_ids x amounts then explode — the
    ClickHouse `arrayJoin(arrayZip(...))` MV re-expressed with
    arrays_zip + explode (SURVEY §2.13 L4 / G7)."""
    mt = parsed_events.filter(F.col("standard") == "nep245").select(
        *_BLOCK_CTX,
        "receipt_id",
        F.col("executor_account_id").alias("contract_account_id"),
        "event",
        F.posexplode("data").alias("index_in_data", "d"),
    )
    zipped = mt.select(
        *_BLOCK_CTX,
        "receipt_id",
        "contract_account_id",
        "event",
        "index_in_data",
        # mt_mint/mt_burn carry owner_id; mt_transfer old/new — the MV's
        # if(event='mt_transfer', ...) pair collapses to coalesce here
        # because the EVENT_JSON struct leaves the absent variant NULL.
        F.coalesce(F.col("d.old_owner_id"), F.col("d.owner_id")).alias("old_owner_id"),
        F.coalesce(F.col("d.new_owner_id"), F.col("d.owner_id")).alias("new_owner_id"),
        F.col("d.memo").alias("memo"),
        F.explode(F.arrays_zip("d.token_ids", "d.amounts")).alias("ta"),
    )
    return zipped.select(
        *_BLOCK_CTX,
        "receipt_id",
        "contract_account_id",
        "event",
        "index_in_data",
        "old_owner_id",
        "new_owner_id",
        "memo",
        F.col("ta.token_ids").alias("token_id"),
        F.col("ta.amounts").cast("decimal(38,0)").cast("string").alias("amount"),
    )


DIP4_DATA_DDL = (
    "array<struct<account_id: string, diff: map<string,double>, "
    "intent_hash: string, referral: string>>"
)


def silver_dip4_token_diff(outcome_logs: DataFrame) -> DataFrame:
    """dip4 token_diff flattening (L4): the diff map becomes ± legs — one
    row per (account, token) with a signed amount. OSS mapping of the
    ClickHouse `JSONExtractKeysAndValues` MV (rust-near-defuse-indexer
    README `mv_silver_dip4_token_diff`): `from_json(... MAP<STRING,DOUBLE>)`
    + map explode with sign split."""
    # Same decoded-events fence as the other dip4 tables — including the
    # contract_id IN ('defuse-alpha.near','intents.near') guard the
    # ClickHouse MV applies; without it any contract emitting dip4-shaped
    # token_diff events would feed referral attribution downstream.
    parsed = _dip4_events(outcome_logs, ("token_diff",)).withColumn(
        "data", F.from_json(F.get_json_object("payload", "$.data"), DIP4_DATA_DDL)
    )
    d = (
        parsed.select(
            *_BLOCK_CTX,
            "receipt_id",
            F.posexplode("data").alias("index_in_data", "d"),
        )
        .select(
            *_BLOCK_CTX,
            "receipt_id",
            "index_in_data",
            F.col("d.account_id").alias("account_id"),
            F.col("d.intent_hash").alias("intent_hash"),
            F.col("d.referral").alias("referral"),
            F.explode("d.diff").alias("token_id", "delta"),
        )
    )
    return d.select(
        *_BLOCK_CTX,
        "receipt_id",
        "index_in_data",
        "account_id",
        "intent_hash",
        "referral",
        "token_id",
        F.col("delta").cast("decimal(38,0)").cast("string").alias("delta_amount"),
        (F.col("delta") < 0).alias("is_outgoing"),
    )


DIP4_CONTRACTS = ("defuse-alpha.near", "intents.near")


def _dip4_events(outcome_logs: DataFrame, events: tuple[str, ...]) -> DataFrame:
    """Shared dip4 fence: EVENT_JSON prefix + success outcomes + the intents
    contracts + the requested event types, payload kept as a JSON string.
    Mirrors the `decoded_events` CTE every defuse MV starts from
    (rust-near-defuse-indexer/README.md `mv_silver_dip4_*`)."""
    logs = outcome_logs.filter(
        F.trim(F.col("log")).startswith(EVENT_PREFIX)
        & (F.col("status") != "FAILURE")
        & F.col("executor_account_id").isin(*DIP4_CONTRACTS)
    )
    payload = F.substring(F.trim(F.col("log")), len(EVENT_PREFIX) + 1, 1_000_000)
    return (
        logs.withColumn("payload", payload)
        .withColumn("standard", F.get_json_object("payload", "$.standard"))
        .withColumn("version", F.get_json_object("payload", "$.version"))
        .withColumn("event", F.get_json_object("payload", "$.event"))
        .filter((F.col("standard") == "dip4") & F.col("event").isin(*events))
    )


def _dip4_ctx() -> list:
    return [
        *_BLOCK_CTX,
        "receipt_id",
        F.col("executor_account_id").alias("contract_account_id"),
        "standard",
        "version",
        "event",
    ]


def silver_dip4_public_keys(outcome_logs: DataFrame) -> DataFrame:
    """dip4 public_key_added / public_key_removed rows. The event data is a
    single object (the MV reads `data data_row` without arrayJoin), so the
    fields come straight off `$.data.*` — rust-near-defuse-indexer
    README.md `mv_silver_dip4_public_keys` (JSON_VALUE + COALESCE '')."""
    d = _dip4_events(outcome_logs, ("public_key_added", "public_key_removed"))
    return d.select(
        *_dip4_ctx(),
        F.coalesce(F.get_json_object("payload", "$.data.account_id"), F.lit("")).alias(
            "account_id"
        ),
        F.coalesce(F.get_json_object("payload", "$.data.public_key"), F.lit("")).alias(
            "public_key"
        ),
    )


def silver_dip4_intents_executed(outcome_logs: DataFrame) -> DataFrame:
    """dip4 intents_executed: one row per executed intent — the MV's
    arrayJoin over the data array (README `mv_silver_dip4_intents_executed`)
    as from_json + posexplode."""
    d = _dip4_events(outcome_logs, ("intents_executed",)).withColumn(
        "data",
        F.from_json(
            F.get_json_object("payload", "$.data"),
            "array<struct<account_id: string, intent_hash: string>>",
        ),
    )
    return d.select(
        *_dip4_ctx(),
        F.posexplode("data").alias("index_in_data", "d"),
    ).select(
        *_BLOCK_CTX,
        "receipt_id",
        "contract_account_id",
        "standard",
        "version",
        "event",
        "index_in_data",
        F.coalesce(F.col("d.account_id"), F.lit("")).alias("account_id"),
        F.coalesce(F.col("d.intent_hash"), F.lit("")).alias("intent_hash"),
    )


def silver_dip4_fee_changed(outcome_logs: DataFrame) -> DataFrame:
    """dip4 fee_changed: single-object data, old/new fee as strings —
    README `silver_mv_dip4_fee_changed`."""
    d = _dip4_events(outcome_logs, ("fee_changed",))
    return d.select(
        *_dip4_ctx(),
        F.coalesce(F.get_json_object("payload", "$.data.old_fee"), F.lit("")).alias("old_fee"),
        F.coalesce(F.get_json_object("payload", "$.data.new_fee"), F.lit("")).alias("new_fee"),
    )


DEFUSE_ASSET_SCHEMA = (
    "blockchain string, contract_address string, decimals bigint, "
    "defuse_asset_id string, price double, price_updated_at timestamp, symbol string"
)


def defuse_assets_from_api(spark, fetch: "object") -> DataFrame:
    """`defuse_assets` price dimension: the MV's daily pull of the token
    price API (README `mv_defuse_assets` — url(...) + arrayJoin(items)),
    with the HTTP call injected like every other network seam in this repo
    (plans/gold.py validators/delegators). `fetch()` returns the decoded
    JSON document: {"items": [{blockchain, contract_address, ...}]}.

    The driver-side call is bounded (one document, ~thousands of assets) —
    a dimension build, not a per-row UDF."""
    items = (fetch() or {}).get("items", [])
    rows = [
        (
            it.get("blockchain"),
            it.get("contract_address"),
            int(it["decimals"]) if it.get("decimals") is not None else None,
            it.get("defuse_asset_id"),
            float(it["price"]) if it.get("price") is not None else None,
            it.get("price_updated_at"),
            it.get("symbol"),
        )
        for it in items
    ]
    df = spark.createDataFrame(
        rows,
        "blockchain string, contract_address string, decimals bigint, "
        "defuse_asset_id string, price double, price_updated_at string, symbol string",
    )
    return df.withColumn("price_updated_at", F.to_timestamp("price_updated_at"))


def gold_view_intents_metrics(
    nep245_events: DataFrame, dip4_token_diff: DataFrame, defuse_assets: DataFrame
) -> DataFrame:
    """Daily intents volume metrics by (symbol, referral, blockchain) —
    README `gold_view_intents_metrics`, re-expressed Spark-first:

    - nep245 legs LEFT JOIN token_diff on the receipt id (referral
      attribution), LEFT JOIN the price dimension on
      date(block_timestamp) = date(price_updated_at) AND token =
      defuse_asset_id (J10 derived-date join);
    - usd_value = amount / 10^decimals * price;
    - the conditional sums (transfer_volume / deposits / withdraws /
      netflow) are one grouped pass with when() — GROUP BY ALL shape.

    Scale notes: the price dimension is tiny (one row per asset x day) —
    broadcast; the distinct guards double-attribution when one receipt
    carries several identical diff rows, and runs on the already-filtered
    legs. One shuffle for the distinct, one for the final groupBy."""
    e = nep245_events.alias("e")
    d = dip4_token_diff.select(
        F.col("receipt_id").alias("d_receipt_id"), "referral"
    ).alias("d")
    a = defuse_assets.alias("a")
    joined = (
        e.join(d, F.col("e.receipt_id") == F.col("d_receipt_id"), "left")
        .join(
            F.broadcast(a),
            (
                F.to_date(F.col("e.block_timestamp_utc"))
                == F.to_date(F.col("a.price_updated_at"))
            )
            & (F.col("e.token_id") == F.col("a.defuse_asset_id")),
            "left",
        )
        .filter(
            ~(
                (F.length(F.coalesce(F.col("referral"), F.lit(""))) == 0)
                & (F.length(F.coalesce(F.col("e.memo"), F.lit(""))) == 0)
            )
        )
    )
    usd_value = (
        F.col("e.amount").cast("double")
        / F.pow(F.lit(10.0), F.col("a.decimals").cast("double"))
        * F.col("a.price")
    )
    decoded = joined.select(
        F.col("e.block_timestamp_utc").alias("block_timestamp_utc"),
        F.col("e.block_hash").alias("block_hash"),
        F.col("e.event").alias("event"),
        F.col("e.memo").alias("memo"),
        F.col("e.old_owner_id").alias("old_owner_id"),
        F.col("e.new_owner_id").alias("new_owner_id"),
        F.col("e.token_id").alias("token_id"),
        usd_value.alias("usd_value"),
        F.col("a.symbol").alias("symbol"),
        F.col("a.blockchain").alias("blockchain"),
        F.col("referral").alias("referral"),
    ).distinct()
    ev = F.col("event")
    return (
        decoded.filter((F.col("symbol") != "") & (F.col("blockchain") != ""))
        .groupBy(
            F.to_date("block_timestamp_utc").alias("day"),
            "symbol",
            F.coalesce("referral", F.lit("Others")).alias("referral"),
            "blockchain",
        )
        .agg(
            F.sum(F.when(ev == "mt_transfer", F.col("usd_value"))).alias("transfer_volume"),
            F.sum(F.when(ev == "mt_mint", F.col("usd_value"))).alias("deposits"),
            (F.sum(F.when(ev == "mt_burn", F.col("usd_value"))) * -1).alias("withdraws"),
            F.sum(
                F.when(ev == "mt_mint", F.col("usd_value")).when(
                    ev == "mt_burn", F.col("usd_value") * -1
                )
            ).alias("netflow"),
        )
        .orderBy("day", "symbol", "referral", "blockchain")
    )


def silver_near_social_txs(ara: DataFrame) -> DataFrame:
    """NEAR Social set() calls: args decoded — NEAR Social.sql:14-33."""
    s = ara.filter(
        (F.col("receiver_account_id") == "social.near") & (F.col("method_name") == "set")
    )
    args_b64 = F.get_json_object("args", "$.FunctionCall.args")
    return s.select(
        *_BLOCK_CTX,
        "receipt_id",
        "predecessor_account_id",
        "signer_account_id",
        F.unbase64(args_b64).cast("string").alias("args_decoded"),
    )


def silver_near_social_txs_parsed(social_txs: DataFrame) -> DataFrame:
    """Dynamic-key explode of the socialDB `data` object.

    The reference uses `explode(json_object_keys(json:data))` + a computed
    JSON path `concat('$[\"',k,'\"]')` (NEAR Social.sql:63-71,78) — but OSS
    `get_json_object` cannot address bracketed/dotted keys ('alice.near').
    The Spark-first equivalent is stronger: parse the open-keyed object as
    MAP<STRING,STRING> (SURVEY §1.3's recommended mapping for open-keyed
    JSON) and explode the map — one parse, key and value in one pass."""
    keyed = social_txs.select(
        *_BLOCK_CTX,
        "receipt_id",
        "signer_account_id",
        F.explode(F.from_json(j(F.col("args_decoded"), "data"), "map<string,string>")).alias(
            "account_id", "account_obj"
        ),
    )
    account_obj = F.col("account_obj")
    return keyed.select(
        *_BLOCK_CTX,
        "receipt_id",
        "signer_account_id",
        "account_id",
        F.get_json_object(account_obj, "$.post.main").alias("post"),
        F.get_json_object(account_obj, "$.profile").alias("profile"),
        F.get_json_object(account_obj, "$.graph").alias("graph"),
        F.get_json_object(account_obj, "$.index").alias("index"),
        account_obj.alias("content"),
    )
