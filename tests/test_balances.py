"""Scheduled balance/lockup silver tables (Epochs :560-746, Circulating
Supply :108-323): deployed contracts, aggregated lockups, daily lockup
amounts, NF daily amounts, min-balance registry, daily balance snapshot."""

from __future__ import annotations

import hashlib
import json

import pytest
from pyspark.sql import functions as F

from near_public_lakehouse_spark.plans import balances as B

pytestmark = pytest.mark.slow  # r16 two-lane suite: close_round runs the full lane


DAY_NS = 86_400 * 10**9
YOCTO = 10**24


@pytest.fixture(scope="module")
def silver(spark, tmp_path_factory):
    from near_public_lakehouse_spark.plans.pipeline import run_batch
    from near_public_lakehouse_spark.sources.fixtures import generate_fixtures

    raw = tmp_path_factory.mktemp("bal_raw")
    out = tmp_path_factory.mktemp("bal_out")
    generate_fixtures(str(raw), n_blocks=30)
    return run_batch(spark, str(raw), str(out))


def test_deployed_contracts(spark, silver):
    dc = B.silver_deployed_contracts(
        silver.read("silver_action_receipt_actions"),
        silver.read("silver_execution_outcomes"),
    ).collect()
    assert len(dc) > 0
    expected_sha = hashlib.sha256(b"code").hexdigest()  # fixtures deploy b64("code")
    for r in dc:
        assert r.contract_code_sha256 == expected_sha
        assert r.deployed_to_account_id is not None
        assert r.deployed_at_block_hash is not None


def test_aggregated_lockups_and_daily_amounts(spark):
    ara = spark.createDataFrame(
        [
            # foo's lockup created at h=10, deleted at h=50
            (10, "2024-01-01", "foo.lockup.near", "CREATE_ACCOUNT"),
            (11, "2024-01-01", "foo.lockup.near", "TRANSFER"),
            (50, "2024-01-03", "foo.lockup.near", "DELETE_ACCOUNT"),
            # bar's lockup lives from h=30 on
            (30, "2024-01-02", "bar.lockup.near", "TRANSFER"),
            # not a lockup account: ignored
            (5, "2024-01-01", "alice.near", "CREATE_ACCOUNT"),
        ],
        "block_height long, block_date string, receiver_account_id string, action_kind string",
    ).withColumn("block_date", F.col("block_date").cast("date"))
    agg = B.silver_aggregated_lockups(ara)
    rows = {r.account_id: r for r in agg.collect()}
    assert set(rows) == {"foo.lockup.near", "bar.lockup.near"}
    assert rows["foo.lockup.near"].creation_block_height == 10
    assert rows["foo.lockup.near"].deletion_block_height == 50
    assert rows["bar.lockup.near"].deletion_block_height is None

    from near_public_lakehouse_spark.plans.lockup import TRANSFERS_ENABLED_NS

    t0 = TRANSFERS_ENABLED_NS
    daily = spark.createDataFrame(
        [
            ("2024-01-01", 20, t0 + 25 * DAY_NS),
            ("2024-01-04", 60, t0 + 50 * DAY_NS),
        ],
        "block_date string, day_max_block_height long, day_max_block_timestamp long",
    ).withColumn("block_date", F.col("block_date").cast("date"))
    state = json.dumps(
        {"lockup_amount": str(100 * YOCTO), "release_duration": str(100 * DAY_NS)}
    )
    lockup_state = spark.createDataFrame(
        [("foo.lockup.near", state, "other"), ("bar.lockup.near", state, "other")],
        "lockup_account_id string, state_json string, code_hash string",
    )
    out = B.silver_lockup_amount_account_daily(agg, daily, lockup_state).collect()
    got = {(str(r.block_date), r.account_id): r.lockup_amount for r in out}
    # day 1 (h=20): foo alive (created 10, deleted 50); bar not yet (30>20)
    # day 4 (h=60): bar alive; foo deleted (50<60)
    assert set(got) == {
        ("2024-01-01", "foo.lockup.near"),
        ("2024-01-04", "bar.lockup.near"),
    }
    assert got[("2024-01-01", "foo.lockup.near")] == str(75 * YOCTO)  # 25/100 released
    assert got[("2024-01-04", "bar.lockup.near")] == str(50 * YOCTO)


def test_nf_daily_uses_injected_client(spark):
    daily = spark.createDataFrame(
        [("2024-01-01", 20)], "block_date string, day_max_block_height long"
    ).withColumn("block_date", F.col("block_date").cast("date"))

    def client(account: str, height: int) -> str:
        if account == "nf.near":
            return str(7 * YOCTO)
        raise RuntimeError("rpc down")  # -> error sentinel, not task failure

    row = B.silver_lockup_amount_nf_daily(daily, client).collect()[0]
    assert row.nf_near_amount == str(7 * YOCTO)
    assert row.contributors_near_amount is None


def test_min_balance_registry_and_daily_snapshot(spark):
    ac = spark.createDataFrame(
        [
            # whale: 20k NEAR at h=1, 15k at h=2 (latest)
            (1, "2024-01-01", "whale.near", str(20_000 * YOCTO), str(0), 100),
            (2, "2024-01-02", "whale.near", str(15_000 * YOCTO), str(0), 120),
            # small fry: never qualifies
            (1, "2024-01-01", "shrimp.near", str(5 * YOCTO), str(0), 50),
            # nf account qualifies by list membership despite low balance
            (1, "2024-01-01", "nf.near", str(1 * YOCTO), str(0), 70),
            # lockup accounts excluded from the balance rule
            (1, "2024-01-01", "big.lockup.near", str(99_999 * YOCTO), str(0), 60),
        ],
        "block_height long, block_date string, affected_account_id string, "
        "nonstaked_balance string, staked_balance string, storage_usage long",
    ).withColumn("block_date", F.col("block_date").cast("date"))
    lockups = spark.createDataFrame(
        [("whale.near", "whale-lock.near")],
        "owner_account_id string, lockup_account_id string",
    )
    amb = B.silver_accounts_with_min_balances(ac, lockups, nf_accounts=["nf.near"])
    reg = {r.affected_account_id: r for r in amb.collect()}
    assert set(reg) == {"whale.near", "nf.near"}
    assert reg["whale.near"].lockup_account_id == "whale-lock.near"
    assert str(reg["whale.near"].first_account_change_date) == "2024-01-01"

    rewards = spark.createDataFrame(
        [
            ("whale.near", "2024-01-02", str(1 * YOCTO), str(2 * YOCTO), str(3 * YOCTO)),
            ("whale-lock.near", "2024-01-02", str(4 * YOCTO), str(5 * YOCTO), str(6 * YOCTO)),
        ],
        "delegator_id string, epoch_date string, unstaked string, staked string, reward string",
    ).withColumn("epoch_date", F.col("epoch_date").cast("date"))
    snap = B.silver_accounts_daily_ft_balances(
        amb, ac, rewards, epoch_date="2024-01-02", epoch_block_height=2
    )
    rows = {r.account_id: r for r in snap.collect()}
    assert set(rows) == {"whale.near", "nf.near"}
    w = rows["whale.near"]
    assert w.liquid == 15000.0  # latest change <= date wins (W1)
    assert (w.staked, w.reward) == (str(2 * YOCTO), str(3 * YOCTO))
    assert (w.lockup_staked, w.lockup_reward) == (str(5 * YOCTO), str(6 * YOCTO))
    # the lockup account has no change rows in `ac` -> reference second
    # pass leaves lockup_liquid NULL for this row
    assert w.lockup_liquid is None
    n = rows["nf.near"]
    assert n.staked == "0" and n.lockup_account_id is None  # coalesced zeros
    assert n.lockup_liquid == 0.0  # no lockup at all -> the initial 0


def test_daily_snapshot_lockup_liquid_from_lockup_changes(spark):
    """Epochs :725-740 second pass: lockup_liquid = latest nonstaked of
    the LOCKUP account / 1e24 rounded 2dp."""
    ac = spark.createDataFrame(
        [
            (1, "2024-01-01", "whale.near", str(20_000 * YOCTO), str(0), 100),
            # the lockup account's own change rows — latest (h=3) wins
            (2, "2024-01-01", "whale-lock.near", str(10 * YOCTO), str(0), 10),
            (3, "2024-01-02", "whale-lock.near", str(1234 * YOCTO + YOCTO // 4), str(0), 10),
        ],
        "block_height long, block_date string, affected_account_id string, "
        "nonstaked_balance string, staked_balance string, storage_usage long",
    ).withColumn("block_date", F.col("block_date").cast("date"))
    lockups = spark.createDataFrame(
        [("whale.near", "whale-lock.near")],
        "owner_account_id string, lockup_account_id string",
    )
    amb = B.silver_accounts_with_min_balances(ac, lockups, nf_accounts=[])
    rewards = spark.createDataFrame(
        [],
        "delegator_id string, epoch_date date, unstaked string, staked string, reward string",
    )
    snap = B.silver_accounts_daily_ft_balances(
        amb, ac, rewards, epoch_date="2024-01-02", epoch_block_height=3
    )
    rows = {r.account_id: r for r in snap.collect()}
    assert rows["whale.near"].lockup_liquid == 1234.25


def test_daily_snapshot_sums_multi_validator_rewards(spark):
    """r13 review: rewards grain is (validator, delegator, epoch) — a
    delegator staked with TWO validators must yield ONE snapshot row with
    the summed reward, not a fanned-out duplicate per validator."""
    ac = spark.createDataFrame(
        [(1, "2024-01-01", "whale.near", str(20_000 * YOCTO), str(0), 100)],
        "block_height long, block_date string, affected_account_id string, "
        "nonstaked_balance string, staked_balance string, storage_usage long",
    ).withColumn("block_date", F.col("block_date").cast("date"))
    lockups = spark.createDataFrame(
        [], "owner_account_id string, lockup_account_id string"
    )
    amb = B.silver_accounts_with_min_balances(ac, lockups, nf_accounts=[])
    rewards = spark.createDataFrame(
        [
            ("whale.near", "2024-01-02", str(1 * YOCTO), str(2 * YOCTO), str(3 * YOCTO)),
            ("whale.near", "2024-01-02", str(10 * YOCTO), str(20 * YOCTO), str(30 * YOCTO)),
        ],
        "delegator_id string, epoch_date string, unstaked string, staked string, reward string",
    ).withColumn("epoch_date", F.col("epoch_date").cast("date"))
    snap = B.silver_accounts_daily_ft_balances(
        amb, ac, rewards, epoch_date="2024-01-02", epoch_block_height=2
    ).collect()
    assert len(snap) == 1  # no fan-out
    w = snap[0]
    assert (w.staked, w.reward) == (str(22 * YOCTO), str(33 * YOCTO))
