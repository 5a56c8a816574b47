"""Gold layer tests: epochs rollup, RPC-UDF validators/delegators with
deterministic fake clients (incl. >500-row pagination), reward lag,
lockup registry + circulating supply."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from near_public_lakehouse_spark.plans import gold
from near_public_lakehouse_spark.plans.lockup import TRANSFERS_ENABLED_NS

YOCTO = 10**24
DAY_NS = 86_400 * 10**9


@pytest.fixture(scope="module")
def s_blocks(spark):
    import datetime as dt

    day0 = dt.date(2020, 10, 13)
    rows = []
    for h in range(100):
        rows.append(
            (
                f"EPOCH{h // 50}",
                1000 + h,
                TRANSFERS_ENABLED_NS + h * DAY_NS // 4,  # 4 blocks/day
                str(day0 + dt.timedelta(days=h // 4)),
                f"validator{h % 3}.poolv1.near",
                str(10**33 + h),
            )
        )
    df = spark.createDataFrame(
        rows,
        "epoch_id string, block_height long, block_timestamp long, "
        "block_date string, author_account_id string, total_supply string",
    )
    return df.withColumn("block_date", F.to_date("block_date"))


def test_epochs_rollup(spark, s_blocks):
    e = gold.silver_epochs(s_blocks).collect()
    assert len(e) == 2
    first = e[0]
    assert first.epoch_id == "EPOCH0"
    assert (first.epoch_min_block_height, first.epoch_max_block_height) == (1000, 1049)
    assert first.n_blocks == 50 and first.n_distinct_authors == 3
    assert first.authors.split(",") == sorted(first.authors.split(","))


@pytest.fixture(scope="module")
def fake_clients():
    # Defined NESTED so cloudpickle ships them by value — a module-level
    # test function isn't importable on executors.
    def fake_validators_client(epoch_id: str):
        n = 3 if epoch_id == "EPOCH0" else 2
        return [
            {
                "account_id": f"validator{i}.poolv1.near",
                "public_key": f"ed25519:pk{i}",
                "is_slashed": False,
                "stake": str((100 + i) * YOCTO),
                "num_produced_blocks": 10 * (i + 1),
                "num_expected_blocks": 40,
            }
            for i in range(n)
        ]

    def fake_delegators_client(pool: str, height: int, start: int, limit: int):
        # validator0 has 750 delegators -> exercises 500-row pagination
        total = 750 if pool.startswith("validator0") else 3
        page = []
        for i in range(start, min(start + limit, total)):
            page.append(
                {
                    "account_id": f"delegator{i}.near",
                    "unstaked_balance": "0",
                    # stake grows with epoch height -> rewards are positive
                    "staked_balance": str((10 + i) * YOCTO + height * 10**20),
                    "can_withdraw": True,
                }
            )
        return page

    return fake_validators_client, fake_delegators_client


def test_validators_and_delegator_pagination(spark, s_blocks, fake_clients):
    fake_validators_client, fake_delegators_client = fake_clients
    epochs = gold.silver_epochs(s_blocks)
    v = gold.silver_epochs_validators(epochs, fake_validators_client)
    assert v.count() == 3 + 2
    d = gold.silver_epochs_validator_delegators(v, fake_delegators_client)
    counts = {
        (r.epoch_id, r.validator_account_id): r["count"]
        for r in d.groupBy("epoch_id", "validator_account_id").count().collect()
    }
    assert counts[("EPOCH0", "validator0.poolv1.near")] == 750  # paged 500+250
    assert counts[("EPOCH0", "validator1.poolv1.near")] == 3


def test_delegator_rewards_lag(spark, s_blocks, fake_clients):
    fake_validators_client, fake_delegators_client = fake_clients
    epochs = gold.silver_epochs(s_blocks)
    v = gold.silver_epochs_validators(epochs, fake_validators_client)
    d = gold.silver_epochs_validator_delegators(v, fake_delegators_client)
    r = gold.silver_daily_delegators_rewards(d)
    one = r.filter(
        (F.col("validator_account_id") == "validator1.poolv1.near")
        & (F.col("delegator_account_id") == "delegator0.near")
    ).orderBy("epoch_max_block_height").collect()
    assert len(one) == 2
    assert one[0].reward == "0"  # first epoch: lag is null -> coalesce 0
    # second epoch: stake grew by (1099-1049)*1e20
    assert one[1].reward == str((1099 - 1049) * 10**20)


@pytest.fixture(scope="module")
def lockup_world(spark, s_blocks):
    lockups = spark.createDataFrame(
        [
            ("a.lockup.near", 1000, None, TRANSFERS_ENABLED_NS),
            ("b.lockup.near", 1010, 1060, TRANSFERS_ENABLED_NS),  # deleted mid-range
        ],
        "lockup_account_id string, creation_block_height long, "
        "deletion_block_height long, creation_block_timestamp long",
    )
    state = spark.createDataFrame(
        [
            (
                "a.lockup.near",
                json.dumps(
                    {"lockup_amount": str(100 * YOCTO), "release_duration": str(20 * DAY_NS)}
                ),
                "other",
            ),
            (
                "b.lockup.near",
                json.dumps({"lockup_amount": str(40 * YOCTO)}),
                "other",
            ),
        ],
        "lockup_account_id string, state_json string, code_hash string",
    )
    return lockups, state


def test_circulating_supply(spark, s_blocks, lockup_world):
    lockups, state = lockup_world
    cs = gold.gold_aggregated_circulating_supply(s_blocks, lockups, state).collect()
    by_date = {str(r.block_date): r for r in cs}
    # day 0 (heights 1000-1003): both... b not yet created (1010) -> only a
    d0 = by_date["2020-10-13"]
    assert d0.n_lockups == 1
    # a releases linearly over 20 days from T0; at end of day 0 ~ 3/4 day in
    locked0 = int(d0.total_locked_supply)
    assert 0 < locked0 < 100 * YOCTO
    # day 15 (height 1060-1063): b deleted at 1060 is still alive at 1060?
    # deletion_block_height >= h keeps it on the boundary day only if
    # h <= 1060 -> day 15 h=1063 excludes b
    d15 = by_date["2020-10-28"]
    assert d15.n_lockups == 1
    # after 20 days, a fully released -> locked 0
    d24 = by_date["2020-11-06"]
    assert int(d24.total_locked_supply) == 0
    # circulating = total - locked, exact decimal strings
    assert int(d24.circulating_supply) == int(d24.total_supply)
    assert all(r.n_errors == 0 for r in cs)


def test_circulating_supply_zero_lockup_days_and_null_creation(spark, s_blocks):
    """r13 review: (a) a day with ZERO alive lockups must still publish a
    row with total_locked = 0 (the inner join from lockups dropped it);
    (b) a lockup whose creation predates the dataset (creation NULL from
    the conditional MIN) is alive until its observed deletion, matching
    the balances-side twin — dropping it overstated circulating supply."""
    lockups = spark.createDataFrame(
        [("old.lockup.near", None, 1060, None)],
        "lockup_account_id string, creation_block_height long, "
        "deletion_block_height long, creation_block_timestamp long",
    )
    state = spark.createDataFrame(
        [
            (
                "old.lockup.near",
                json.dumps(
                    {
                        "lockup_amount": str(50 * YOCTO),
                        "release_duration": str(20 * DAY_NS),
                    }
                ),
                "other",
            )
        ],
        "lockup_account_id string, state_json string, code_hash string",
    )
    cs = gold.gold_aggregated_circulating_supply(s_blocks, lockups, state).collect()
    by_date = {str(r.block_date): r for r in cs}
    n_days = s_blocks.select("block_date").distinct().count()
    assert len(cs) == n_days  # EVERY day publishes a row
    # pre-deletion day: the unknown-creation lockup counts as alive
    d0 = by_date["2020-10-13"]
    assert d0.n_lockups == 1
    assert 0 < int(d0.total_locked_supply) <= 50 * YOCTO
    # post-deletion day: zero alive lockups, row still present with 0
    d24 = by_date["2020-11-06"]
    assert d24.n_lockups == 0
    assert int(d24.total_locked_supply) == 0
    assert int(d24.circulating_supply) == int(d24.total_supply)


def test_validators_udf_malformed_payload_is_sentinel_and_build_raises(
    spark, s_blocks
):
    """r13 review: row PARSING is inside the sentinel scope (a '"n/a"'
    counter or a None payload must not fail the Spark task), and the
    builder surfaces the failed epochs loudly instead of letting explode
    swallow them (a LAG reward would silently span the gap)."""
    import pytest

    epochs = gold.silver_epochs(s_blocks)

    def flaky(epoch_id: str):
        return None  # malformed: not a list

    with pytest.raises(Exception, match="RPC failed for epoch_id"):
        gold.silver_epochs_validators(epochs, flaky).collect()

    def bad_counters(epoch_id: str):
        return [{"account_id": "v1", "num_produced_blocks": "n/a"}]

    with pytest.raises(Exception, match="RPC failed for epoch_id"):
        gold.silver_epochs_validators(epochs, bad_counters).collect()
