"""Gold / scheduled-batch layer: epochs rollup, validators & delegators
(RPC-backed UDFs with injected clients), staking-reward deltas, lockup
registry and the daily circulating-supply aggregate.

Reference shapes (SURVEY §2): A1 epochs rollup (Epochs and validators
Silver Pipeline.py:49-65), U2/U3 array-returning RPC UDFs (:105-150,
213-281) with 500-row pagination (:268), W3 lag rewards (:345-361), A3
conditional create/delete heights (Aggregated Circulating Supply
Pipeline.py:110-113), A2 latest-block-per-day (:30-36), J7 NULL-tolerant
range join (:211-213), J8 scalar cross join (:384), M1 MERGE publication.

All network I/O is behind injected callables (SURVEY §7: "isolate all
network I/O behind injected clients") — tests pass deterministic fakes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from near_public_lakehouse_spark.plans.lockup import locked_amount_udf

# ---------------------------------------------------------------------------
# epochs rollup (A1)


def silver_epochs(s_blocks: DataFrame) -> DataFrame:
    """Per-epoch rollup: 8 aggregates over one key — the reference's A1
    hash aggregate (Epochs pipeline :49-65; collect_set canonicalized to a
    sorted csv for determinism).

    Scale notes: one shuffle on epoch_id (43,200 blocks/epoch upstream —
    tiny key cardinality); partial aggregation collapses each map task to
    ~1 row per epoch before the exchange.
    """
    return (
        s_blocks.groupBy("epoch_id")
        .agg(
            F.min("block_height").alias("epoch_min_block_height"),
            F.max("block_height").alias("epoch_max_block_height"),
            F.min("block_timestamp").alias("epoch_min_block_timestamp"),
            F.max("block_timestamp").alias("epoch_max_block_timestamp"),
            F.min("block_date").alias("epoch_start_date"),
            F.max("block_date").alias("epoch_end_date"),
            F.countDistinct("author_account_id").alias("n_distinct_authors"),
            F.count(F.lit(1)).alias("n_blocks"),
            F.array_join(F.array_sort(F.collect_set("author_account_id")), ",").alias(
                "authors"
            ),
        )
        .orderBy("epoch_min_block_height")
    )


# ---------------------------------------------------------------------------
# validators / delegators via injected RPC clients (U2 / U3 / S5)

VALIDATOR_SCHEMA = (
    "account_id string, public_key string, is_slashed boolean, stake string, "
    "num_produced_blocks bigint, num_expected_blocks bigint"
)
DELEGATOR_SCHEMA = (
    "account_id string, unstaked_balance string, staked_balance string, can_withdraw boolean"
)

RPC_PAGE_SIZE = 500  # Epochs pipeline :268


def validators_udf(client: Callable[[str], list[dict]]):
    """U2 `get_read_rpc_validators(epoch_id) -> ARRAY<STRUCT<...>>`
    (Epochs pipeline :105-150). `client` is the injected JSON-RPC call."""
    from pyspark.sql.functions import udf
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(f"array<struct<{VALIDATOR_SCHEMA}>>")

    def call(epoch_id: str):
        # the WHOLE call — RPC and row parsing — is the sentinel scope: a
        # malformed payload (None, non-list, '"n/a"' counters) must return
        # the None sentinel like the sibling delegators_udf, not raise in
        # the executor and fail the task 4x (r13 review)
        try:
            rows = client(epoch_id)
            return [
                (
                    r.get("account_id"),
                    r.get("public_key"),
                    bool(r.get("is_slashed", False)),
                    str(r.get("stake", "0")),
                    int(r.get("num_produced_blocks", 0)),
                    int(r.get("num_expected_blocks", 0)),
                )
                for r in rows
            ]
        except Exception:
            return None  # error sentinel — surfaced by the builders below

    return udf(call, schema)


def delegators_udf(client: Callable[[str, int, int, int], list[dict]]):
    """U3 `rpc_call_function_get_accounts(pool, height)` with 500-row
    pagination (Epochs pipeline :213-281). `client(pool, height, from,
    limit)` returns one page; the UDF loops pages like the reference."""
    from pyspark.sql.functions import udf
    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(f"array<struct<{DELEGATOR_SCHEMA}>>")

    def call(pool: str, block_height: int):
        out, start = [], 0
        try:
            while True:
                page = client(pool, block_height, start, RPC_PAGE_SIZE)
                out.extend(
                    (
                        r.get("account_id"),
                        str(r.get("unstaked_balance", "0")),
                        str(r.get("staked_balance", "0")),
                        bool(r.get("can_withdraw", False)),
                    )
                    for r in page
                )
                if len(page) < RPC_PAGE_SIZE:
                    return out
                start += RPC_PAGE_SIZE
        except Exception:
            return None

    return udf(call, schema)


def _raise_on_rpc_failures(tagged: DataFrame, what: str, key: str) -> DataFrame:
    """The None sentinel means an epoch/pool VANISHES from the feed — and
    a LAG-based reward downstream would then book two epochs' growth as
    one (r13 review: plain explode() swallowed the sentinel silently).
    Failures now fail the BUILD with the offending keys (bounded collect:
    failures only), keeping the UDF's task-level no-retry behavior."""
    failed = [r[0] for r in tagged.filter(F.col("__arr__").isNull()).select(key).limit(20).collect()]
    if failed:
        raise RuntimeError(
            f"{what}: RPC failed for {key}={failed} — refusing to publish "
            "a feed with silent gaps (a LAG-based reward would span them)"
        )
    return tagged


def silver_epochs_validators(
    epochs: DataFrame, client: Callable[[str], list[dict]]
) -> DataFrame:
    """Explode the per-epoch validator set (U2 + UDTF idiom:
    array-returning UDF then posexplode — SURVEY §2.12). An RPC failure
    RAISES with the failed epoch ids (see _raise_on_rpc_failures)."""
    tagged = epochs.select(
        "epoch_id",
        "epoch_max_block_height",
        "epoch_end_date",
        validators_udf(client)("epoch_id").alias("__arr__"),
    ).localCheckpoint()  # one UDF execution serves the check AND the explode
    v = _raise_on_rpc_failures(
        tagged, "silver_epochs_validators", "epoch_id"
    ).select(
        "epoch_id",
        "epoch_max_block_height",
        "epoch_end_date",
        F.explode("__arr__").alias("v"),
    )
    return v.select(
        "epoch_id",
        "epoch_max_block_height",
        "epoch_end_date",
        F.col("v.account_id").alias("validator_account_id"),
        F.col("v.public_key").alias("public_key"),
        F.col("v.is_slashed").alias("is_slashed"),
        F.col("v.stake").alias("stake"),
        F.col("v.num_produced_blocks").alias("num_produced_blocks"),
        F.col("v.num_expected_blocks").alias("num_expected_blocks"),
    )


def silver_epochs_validator_delegators(
    validators: DataFrame, client: Callable[[str, int, int, int], list[dict]]
) -> DataFrame:
    """Per-validator delegator extraction (U3; Epochs pipeline :313-321).
    An RPC failure RAISES with the failed pools (see
    _raise_on_rpc_failures)."""
    tagged = validators.select(
        "epoch_id",
        "epoch_max_block_height",
        "validator_account_id",
        delegators_udf(client)(
            "validator_account_id", "epoch_max_block_height"
        ).alias("__arr__"),
    ).localCheckpoint()  # one UDF execution serves the check AND the explode
    d = _raise_on_rpc_failures(
        tagged, "silver_epochs_validator_delegators", "validator_account_id"
    ).select(
        "epoch_id",
        "epoch_max_block_height",
        "validator_account_id",
        F.explode("__arr__").alias("d"),
    )
    return d.select(
        "epoch_id",
        "epoch_max_block_height",
        "validator_account_id",
        F.col("d.account_id").alias("delegator_account_id"),
        F.col("d.unstaked_balance").alias("unstaked_balance"),
        F.col("d.staked_balance").alias("staked_balance"),
        F.col("d.can_withdraw").alias("can_withdraw"),
    )


def silver_daily_delegators_rewards(delegators: DataFrame) -> DataFrame:
    """W3: per-(validator, delegator) staking-reward delta across epochs —
    LAG + coalesce(delta, 0) + clamp at 0 (Epochs pipeline :345-361).
    u128 balances subtract in DECIMAL(38,0), never double."""
    w = Window.partitionBy("validator_account_id", "delegator_account_id").orderBy(
        "epoch_max_block_height"
    )
    staked = F.col("staked_balance").cast("decimal(38,0)")
    delta = staked - F.lag(staked).over(w)
    return delegators.select(
        "epoch_id",
        "epoch_max_block_height",
        "validator_account_id",
        "delegator_account_id",
        "staked_balance",
        F.greatest(F.coalesce(delta, F.lit(0).cast("decimal(38,0)")), F.lit(0).cast("decimal(38,0)"))
        .cast("string")
        .alias("reward"),
    )


# ---------------------------------------------------------------------------
# lockups + circulating supply


def silver_lockups(ara: DataFrame) -> DataFrame:
    """Lockup account registry: conditional MIN(CASE WHEN ...) creation /
    deletion heights per account (A3 — Aggregated Circulating Supply
    Pipeline.py:110-113), fed by `new`/`on_lockup_create` calls on
    `*.lockup.near` receivers (Epochs pipeline :445-498)."""
    lockup_calls = ara.filter(
        F.col("receiver_account_id").like("%.lockup.near")
        & (
            F.col("method_name").isin("new", "on_lockup_create")
            | (F.col("action_kind") == "DELETE_ACCOUNT")
        )
    )
    is_create = F.col("method_name").isin("new", "on_lockup_create")
    is_delete = F.col("action_kind") == "DELETE_ACCOUNT"
    return lockup_calls.groupBy(F.col("receiver_account_id").alias("lockup_account_id")).agg(
        F.min(F.when(is_create, F.col("block_height"))).alias("creation_block_height"),
        F.min(F.when(is_delete, F.col("block_height"))).alias("deletion_block_height"),
        F.min(F.when(is_create, F.col("block_timestamp"))).alias("creation_block_timestamp"),
    )


def daily_latest_blocks(s_blocks: DataFrame) -> DataFrame:
    """A2: latest block per day (Aggregated Circulating Supply
    Pipeline.py:30-36)."""
    return s_blocks.groupBy("block_date").agg(
        F.max("block_height").alias("day_max_block_height"),
        F.max("block_timestamp").alias("day_max_block_timestamp"),
        F.max_by("total_supply", "block_height").alias("day_total_supply"),
    )


def gold_aggregated_circulating_supply(
    s_blocks: DataFrame,
    lockups: DataFrame,
    lockup_state: DataFrame,
) -> DataFrame:
    """Daily circulating supply:

    1. A2 latest block per day;
    2. J7 NULL-tolerant non-equi range join: lockups alive at that height
       (`creation <= h AND (deletion IS NULL OR deletion >= h)` —
       Aggregated Circulating Supply Pipeline.py:211-213);
    3. U4 locked-amount per lockup at the day's timestamp (L1 math);
    4. J8 cross join of 1-row aggregates into the day row (:384).

    `lockup_state` carries (lockup_account_id, state_json, code_hash) —
    the L2 fixture standing in for RPC+Borsh.

    Scale notes: days x alive-lockups is the only fan-out; the build side
    (daily rows) is broadcast so the BroadcastNestedLoopJoin the theta
    predicate forces streams the big side once — same shape the reference
    relies on Photon for.
    """
    days = daily_latest_blocks(s_blocks)
    h = F.col("day_max_block_height")
    # NULL-tolerant on BOTH bounds (r13 review): a lockup created before
    # the dataset's genesis has creation NULL from the conditional MIN —
    # it is alive until its observed deletion, and dropping it overstated
    # circulating supply (balances.silver_lockup_amount_account_daily,
    # the sibling of this join, already kept it).
    alive = lockups.join(
        F.broadcast(days),
        (F.col("creation_block_height").isNull() | (F.col("creation_block_height") <= h))
        & (F.col("deletion_block_height").isNull() | (F.col("deletion_block_height") >= h)),
        "inner",
    ).join(lockup_state, "lockup_account_id", "left")
    locked = alive.withColumn(
        "locked_amount",
        locked_amount_udf()("state_json", F.col("day_max_block_timestamp"), F.col("code_hash")),
    )
    per_day = locked.groupBy("block_date").agg(
        F.sum(F.col("locked_amount").cast("decimal(38,0)")).alias("total_locked"),
        F.count(F.lit(1)).alias("n_lockups"),
        F.count(F.when(F.col("locked_amount").isNull(), 1)).alias("n_errors"),
    )
    # Drive the output from DAYS, not from alive lockups (r13 review): a
    # day with zero alive lockups must still publish a row with
    # total_locked = 0 — the inner join above dropped it entirely.
    daily_locked = days.join(per_day, "block_date", "left").select(
        "block_date",
        "day_max_block_height",
        "day_total_supply",
        "total_locked",
        F.coalesce(F.col("n_lockups"), F.lit(0)).alias("n_lockups"),
        F.coalesce(F.col("n_errors"), F.lit(0)).alias("n_errors"),
    )
    total = F.col("day_total_supply").cast("decimal(38,0)")
    return (
        daily_locked.select(
            "block_date",
            F.col("day_max_block_height").alias("block_height"),
            F.col("day_total_supply").alias("total_supply"),
            F.coalesce(F.col("total_locked"), F.lit(0).cast("decimal(38,0)"))
            .cast("string")
            .alias("total_locked_supply"),
            (total - F.coalesce(F.col("total_locked"), F.lit(0).cast("decimal(38,0)")))
            .cast("string")
            .alias("circulating_supply"),
            "n_lockups",
            "n_errors",
        )
        .orderBy("block_date")
    )
