"""Account-balance and lockup daily tables — the scheduled batch silver
tables of the Epochs pipeline (:560-746) and Circulating Supply pipeline
(:108-323) not already inlined in plans/gold.py:

- silver_deployed_contracts          (NEAR Social.sql:124-146)
- silver_aggregated_lockups          (Aggregated Circulating Supply Pipeline.py:108-118)
- silver_lockup_amount_account_daily (same:218-250, U4 UDF per row)
- silver_lockup_amount_nf_daily      (same:259-323, U5 view-account UDF)
- silver_accounts_with_min_balances  (Epochs and validators Silver Pipeline.py:560-597)
- silver_accounts_daily_ft_balances  (same:612-746, per-date MERGE loop)

All RPC surfaces are injected clients (SURVEY §7 hard-parts); money stays
DECIMAL(38,0)/string until the published `liquid`-style display columns,
which round to 2dp NEAR exactly like the reference.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from near_public_lakehouse_spark.functions.json import j

YOCTO = 10**24
MIN_BALANCE_YOCTO = 10_000 * YOCTO  # "minimum 10,000 NEAR Tokens" (Epochs :571)


def silver_deployed_contracts(ara: DataFrame, outcomes: DataFrame) -> DataFrame:
    """Deployed contracts: DEPLOY_CONTRACT actions joined to their SUCCESS
    execution outcome on (block_date, receipt_id) — the J2 interval join's
    batch twin; the date equality keeps the join partition-pruned
    (NEAR Social.sql:128-146)."""
    deploys = ara.filter(F.col("action_kind") == "DEPLOY_CONTRACT")
    ok = outcomes.filter(F.col("status").startswith("SUCCESS")).select(
        "block_date",
        "receipt_id",
        F.col("block_timestamp_utc").alias("deployed_at_block_timestamp"),
        F.col("block_hash").alias("deployed_at_block_hash"),
    )
    return deploys.join(ok, ["block_date", "receipt_id"]).select(
        "block_date",
        "block_height",
        "block_timestamp",
        "deployed_at_block_timestamp",
        "deployed_at_block_hash",
        F.col("receipt_id").alias("deployed_by_receipt_id"),
        # sha256 of the deployed code (Mainnet.sql:227 computes it the same
        # way when rebuilding DEPLOY_CONTRACT args)
        F.sha2(F.unbase64(j(F.col("args"), "DeployContract.code")), 256).alias(
            "contract_code_sha256"
        ),
        F.col("receiver_account_id").alias("deployed_to_account_id"),
    )


def silver_aggregated_lockups(ara: DataFrame) -> DataFrame:
    """Lockup registry, circulating-supply variant: creation height =
    first CREATE_ACCOUNT/TRANSFER, deletion = first DELETE_ACCOUNT, over
    `%.lockup.near` receivers (A3 conditional MINs — Circulating Supply
    :108-118; the Epochs variant keyed on `new` calls is gold.silver_lockups)."""
    acts = ara.filter(
        F.col("receiver_account_id").like("%.lockup.near")
        & F.col("action_kind").isin("CREATE_ACCOUNT", "DELETE_ACCOUNT", "TRANSFER")
    )
    create = F.col("action_kind").isin("CREATE_ACCOUNT", "TRANSFER")
    return acts.groupBy(F.col("receiver_account_id").alias("account_id")).agg(
        F.min(F.when(create, F.col("block_height"))).alias("creation_block_height"),
        F.min(F.when(F.col("action_kind") == "DELETE_ACCOUNT", F.col("block_height"))).alias(
            "deletion_block_height"
        ),
    )


def silver_lockup_amount_account_daily(
    agg_lockups: DataFrame, daily_blocks: DataFrame, lockup_state: DataFrame
) -> DataFrame:
    """Per-lockup daily locked amount: J7 NULL-tolerant range join (alive
    at the day's height, :211-213) then the L1 lockup math per row (U4 —
    the reference calls a Rust sidecar; here the math is local, state from
    the injected L2 fixture)."""
    from near_public_lakehouse_spark.plans.lockup import locked_amount_udf

    h = F.col("day_max_block_height")
    alive = agg_lockups.join(
        F.broadcast(daily_blocks),
        ((F.col("creation_block_height").isNull()) | (F.col("creation_block_height") <= h))
        & ((F.col("deletion_block_height").isNull()) | (F.col("deletion_block_height") >= h)),
    )
    withstate = alive.join(
        lockup_state.withColumnRenamed("lockup_account_id", "account_id"),
        "account_id",
        "left",
    )
    return withstate.select(
        "block_date",
        F.col("day_max_block_height").alias("computed_at_block_height"),
        F.col("day_max_block_timestamp").alias("computed_at_block_timestamp"),
        "account_id",
        locked_amount_udf()(
            "state_json", F.col("day_max_block_timestamp"), F.col("code_hash")
        ).alias("lockup_amount"),
    )


def view_account_udf(client: Callable[[str, int], str]):
    """U5 `rpc_call_view_account(account_id, block_height) -> STRING`
    (Circulating Supply :259-301): injected HTTP client, error sentinel
    None instead of a task failure (SURVEY §5 defensive parsing)."""

    def call(account_id: str, block_height: int) -> str | None:
        try:
            return client(account_id, block_height)
        except Exception:
            return None

    return F.udf(call, StringType())


NF_ACCOUNTS = ("nf.near", "contributors.near")


def silver_lockup_amount_nf_daily(
    daily_blocks: DataFrame, client: Callable[[str, int], str]
) -> DataFrame:
    """NF + contributors balances per day via the view-account RPC — one
    UDF call per (day, account): driver-bounded rows, never the fact
    stream (Circulating Supply :316-323)."""
    ua = view_account_udf(client)
    cols = [
        ua(F.lit(acct), F.col("day_max_block_height")).alias(
            acct.replace(".", "_") + "_amount"
        )
        for acct in NF_ACCOUNTS
    ]
    return daily_blocks.select(
        "block_date",
        F.col("day_max_block_height").alias("computed_at_block_height"),
        *cols,
    )


def silver_accounts_with_min_balances(
    account_changes: DataFrame, lockups: DataFrame, nf_accounts: list[str]
) -> DataFrame:
    """Registry of accounts that ever held >= 10,000 NEAR nonstaked (or are
    on the NF list), with their lockup account and first qualifying date
    (Epochs :560-575). The NF list is a parameter — the reference reads a
    private `nf_finance.nf_accounts` table."""
    # u128-scale literal must ride as a decimal string: a Python int this
    # large overflows the py4j long in Column comparisons.
    min_bal = F.lit(str(MIN_BALANCE_YOCTO)).cast("decimal(38,0)")
    big = account_changes.filter(
        (
            (F.col("nonstaked_balance").cast("decimal(38,0)") >= min_bal)
            & ~F.col("affected_account_id").like("%.lockup.near")
        )
        | F.col("affected_account_id").isin(list(nf_accounts))
    )
    lk = lockups.select(
        F.col("owner_account_id").alias("affected_account_id"), "lockup_account_id"
    )
    return (
        big.join(lk, "affected_account_id", "left")
        .groupBy("affected_account_id", "lockup_account_id")
        .agg(F.min("block_date").alias("first_account_change_date"))
    )


def silver_accounts_daily_ft_balances(
    amb: DataFrame,
    account_changes: DataFrame,
    rewards: DataFrame,
    epoch_date,
    epoch_block_height: int,
) -> DataFrame:
    """Daily balance snapshot for the min-balance registry at `epoch_date`
    (Epochs :674-714): W1 latest account_change <= date per account, LEFT
    joins to delegator rewards for both the account and its lockup twin;
    liquid = nonstaked / 1e24 rounded 2dp (display column — the exact
    yocto amount stays in `nonstaked_balance`).

    `rewards` carries (delegator_id, epoch_date, unstaked, staked, reward)
    — the per-epoch-date slice of silver_daily_delegators_rewards.

    ``lockup_liquid`` follows the reference's second MERGE pass (Epochs
    :725-740): the LOCKUP account's latest nonstaked balance / 1e24
    rounded 2dp — NULL when the lockup account has no change rows yet,
    0 when the account has no lockup at all (the un-updated initial
    value)."""
    ac = account_changes.filter(F.col("block_date") <= F.lit(epoch_date))
    w = Window.partitionBy("affected_account_id").orderBy(F.desc("block_height"))
    # deterministic tiebreak on lockup_account_id: an owner mapped to
    # multiple lockup rows in `amb` ties on the joined change row, and an
    # unordered rn==1 dropped an arbitrary one per run (r13 review). NEAR
    # lockup accounts are hash-derived 1:1 per owner, so in practice one
    # row survives either way — the order just makes which one stable.
    w_amb = Window.partitionBy("affected_account_id").orderBy(
        F.desc("block_height"), F.asc("lockup_account_id")
    )
    latest = (
        amb.filter(F.col("first_account_change_date") <= F.lit(epoch_date))
        .join(ac, "affected_account_id")
        .withColumn("rn", F.row_number().over(w_amb))
        .filter(F.col("rn") == 1)
    )
    # latest change per LOCKUP account: semi-join first so the window
    # runs over lockup accounts only (registry-bounded, not all accounts)
    lock_ids = (
        amb.filter(F.col("lockup_account_id").isNotNull())
        .select(F.col("lockup_account_id").alias("affected_account_id"))
        .distinct()
    )
    lock_latest = (
        ac.join(lock_ids, "affected_account_id", "left_semi")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("affected_account_id").alias("lockup_account_id"),
            F.round(
                F.col("nonstaked_balance").cast("double") / F.lit(float(YOCTO)), 2
            ).alias("lockup_liquid"),
        )
    )
    # rewards grain is (validator, delegator, epoch): a delegator on
    # multiple validators has several rows — SUM to the account grain
    # before joining, or the left joins fan the snapshot out into
    # duplicate rows per account (r13 review).
    dec = lambda c: F.sum(F.col(c).cast("decimal(38,0)")).cast("string")  # noqa: E731
    r = (
        rewards.filter(F.col("epoch_date") == F.lit(epoch_date))
        .groupBy("delegator_id")
        .agg(
            dec("unstaked").alias("unstaked"),
            dec("staked").alias("staked"),
            dec("reward").alias("reward"),
        )
    )
    r_acct = r.select(
        F.col("delegator_id").alias("affected_account_id"),
        F.col("unstaked").alias("unstaked_not_liquid"),
        F.col("staked").alias("staked"),
        F.col("reward").alias("reward"),
    )
    r_lock = r.select(
        F.col("delegator_id").alias("lockup_account_id"),
        F.col("unstaked").alias("lockup_unstaked_not_liquid"),
        F.col("staked").alias("lockup_staked"),
        F.col("reward").alias("lockup_reward"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    return (
        latest.join(r_acct, "affected_account_id", "left")
        .join(r_lock, "lockup_account_id", "left")
        .join(lock_latest, "lockup_account_id", "left")
        .select(
            F.lit(epoch_date).cast("date").alias("epoch_date"),
            F.lit(epoch_block_height).alias("epoch_block_height"),
            F.col("affected_account_id").alias("account_id"),
            F.round(F.col("nonstaked_balance").cast("double") / F.lit(float(YOCTO)), 2).alias(
                "liquid"
            ),
            F.col("nonstaked_balance"),
            F.col("storage_usage"),
            F.coalesce(F.col("unstaked_not_liquid").cast("decimal(38,0)"), zero)
            .cast("string")
            .alias("unstaked_not_liquid"),
            F.coalesce(F.col("staked").cast("decimal(38,0)"), zero).cast("string").alias("staked"),
            F.coalesce(F.col("reward").cast("decimal(38,0)"), zero).cast("string").alias("reward"),
            "lockup_account_id",
            F.when(F.col("lockup_account_id").isNull(), F.lit(0.0))
            .otherwise(F.col("lockup_liquid"))
            .alias("lockup_liquid"),
            F.coalesce(F.col("lockup_unstaked_not_liquid").cast("decimal(38,0)"), zero)
            .cast("string")
            .alias("lockup_unstaked_not_liquid"),
            F.coalesce(F.col("lockup_staked").cast("decimal(38,0)"), zero)
            .cast("string")
            .alias("lockup_staked"),
            F.coalesce(F.col("lockup_reward").cast("decimal(38,0)"), zero)
            .cast("string")
            .alias("lockup_reward"),
        )
    )
